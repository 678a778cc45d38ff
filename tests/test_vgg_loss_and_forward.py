"""VGG perceptual-loss wiring in the gen step (the reference's dead vgg path
revived) + trainer.forward API."""

import numpy as np

import jax
import jax.numpy as jnp

from munit_tpu.config import validate
from munit_tpu.train import MUNITTrainer

CROP = 32


def conf_with(**over):
    base = {
        "gen_state": 1, "guided": 1, "recon_mask": 0, "batch_size": 2,
        "crop_image_height": CROP, "crop_image_width": CROP, "new_size": CROP,
        "gen": {"dim": 16, "mlp_dim": 32, "style_dim": 8, "activ": "relu",
                "n_downsample": 2, "n_res": 2, "pad_type": "reflect"},
        "dis": {"dim": 16, "norm": "none", "activ": "lrelu", "n_layer": 3,
                "gan_type": "lsgan", "num_scales": 2, "pad_type": "reflect"},
    }
    base.update(over)
    return validate(base)


def test_vgg_loss_in_gen_step():
    conf = conf_with(vgg_w=1.0)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    from munit_tpu.nn.vgg import Vgg16
    vgg_params = Vgg16().init(jax.random.PRNGKey(1),
                              jnp.zeros((1, CROP, CROP, 3)))["params"]
    tr.load_vgg(vgg_params)
    rng = np.random.RandomState(0)
    x_a = jnp.asarray(rng.randn(2, CROP, CROP, 3).astype(np.float32))
    x_b = jnp.asarray(rng.randn(2, CROP, CROP, 3).astype(np.float32))
    tr.iterations = 0
    m = tr.gen_update(x_a, x_b)
    assert float(m["loss_gen_vgg_a"]) > 0
    assert np.isfinite(float(m["loss_gen_total"]))


def test_trainer_forward():
    conf = conf_with()
    tr = MUNITTrainer(conf, jax.random.PRNGKey(2))
    rng = np.random.RandomState(2)
    x_a = jnp.asarray(rng.randn(2, CROP, CROP, 3).astype(np.float32))
    x_b = jnp.asarray(rng.randn(2, CROP, CROP, 3).astype(np.float32))
    x_ab, x_ba = tr.forward(x_a, x_b)
    assert x_ab.shape == x_a.shape
    assert x_ba.shape == x_b.shape
    assert np.isfinite(np.asarray(x_ab)).all()


def test_vae_gen_converter():
    import torch
    from munit_tpu.io.torch_import import convert_vae_gen_state_dict
    from munit_tpu.nn import VAEGen
    from tests import torch_mirror as tm

    p = tm.small_gen_params()
    # torch VAEGen mirror: ContentEncoder + Decoder (res_norm 'in')
    enc = tm.make_content_encoder(p["n_downsample"], p["n_res"], 3, p["dim"],
                                  p["activ"], p["pad_type"])
    import torch.nn as nn

    class TVae(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc = enc
            # decoder with instance-norm res blocks
            mods = [tm._res_blocks(p["n_res"], enc.output_dim, "in",
                                   p["activ"], p["pad_type"])]
            dim = enc.output_dim
            for _ in range(p["n_downsample"]):
                mods += [nn.Upsample(scale_factor=2),
                         tm._ConvBlock(dim, dim // 2, 5, 1, 2, "ln",
                                       p["activ"], p["pad_type"])]
                dim //= 2
            mods.append(tm._ConvBlock(dim, 3, 7, 1, 3, "none", "tanh",
                                      p["pad_type"]))
            self.dec = tm._Seq(*mods)

    torch.manual_seed(0)
    tnet = TVae().eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_vae_gen_state_dict(sd, p))

    jnet = VAEGen(input_dim=3, dim=p["dim"], n_downsample=p["n_downsample"],
                  n_res=p["n_res"], activ=p["activ"], pad_type=p["pad_type"])
    rng = np.random.RandomState(1)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        h = tnet.enc(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
        want = tnet.dec(h)
    hid = jnet.apply({"params": params}, jnp.asarray(x),
                     jax.random.PRNGKey(0), method="encode")[0]
    got = jnet.apply({"params": params}, hid, method="decode")
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(want.numpy(), (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-3)
