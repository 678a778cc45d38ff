from munit_tpu.losses.losses import (  # noqa: F401
    recon_l1, recon_l1_masked, dis_gan_loss, gen_gan_loss, dis_sr_loss,
    gen_sr_loss, classifier_sr_loss, domain_adv_loss, cross_entropy_loss,
    semantic_seg_loss_masked, vgg_perceptual_loss,
)
