"""Loss-assembly parity: every gen/dis loss term of one training step matches
a reference-faithful torch computation with identical (converted) weights and
inputs. Guided mode makes the step deterministic (no random styles used), so
each metric must agree to f32 tolerance. Catches loss-formula, weighting, and
wiring mistakes that unit tests can't."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from munit_tpu.config import validate
from munit_tpu.io import convert_gen_state_dict, convert_dis_state_dict
from munit_tpu.train import MUNITTrainer

from tests import torch_mirror as tm

CROP = 32


def build():
    torch.manual_seed(0)
    gp = tm.small_gen_params()
    dp = tm.small_dis_params()
    tgen = tm.MirrorAdaINGenDouble(3, gp).eval()
    tdis_a = tm.MirrorMsImageDis(3, dp).eval()
    tdis_b = tm.MirrorMsImageDis(3, dp).eval()

    conf = validate({
        "gen_state": 1, "guided": 1, "recon_mask": 1, "batch_size": 2,
        "crop_image_height": CROP, "crop_image_width": CROP, "new_size": CROP,
        "gan_w": 3, "recon_x_w": 12, "recon_s_w": 1, "recon_c_w": 2,
        "recon_x_cyc_w": 12,
        "gen": gp, "dis": dp,
    })
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    tr.state["gen"] = jax.tree.map(
        jnp.asarray, convert_gen_state_dict(sd(tgen), gp, dual=True))
    tr.state["dis_a"] = jax.tree.map(
        jnp.asarray, convert_dis_state_dict(sd(tdis_a), dp))
    tr.state["dis_b"] = jax.tree.map(
        jnp.asarray, convert_dis_state_dict(sd(tdis_b), dp))
    return tr, tgen, tdis_a, tdis_b, conf


def torch_losses(tgen, tdis_a, tdis_b, x_a, x_b, mask_a, mask_b, conf):
    """gen_update's loss terms (trainer.py:336-558, guided branch)."""
    l1 = lambda a, b: torch.mean(torch.abs(a - b))
    l1m = lambda a, b, m: torch.mean(torch.abs((a - b) * (1 - m)))

    with torch.no_grad():
        c_a, s_a_p = tgen.encode(x_a, 1)
        c_b, s_b_p = tgen.encode(x_b, 2)
        x_a_recon = tgen.decode(c_a, s_a_p, 1)
        x_b_recon = tgen.decode(c_b, s_b_p, 2)
        x_ba = tgen.decode(c_b, s_a_p, 1)
        x_ab = tgen.decode(c_a, s_b_p, 2)
        c_b_recon, s_a_recon = tgen.encode(x_ba, 1)
        c_a_recon, s_b_recon = tgen.encode(x_ab, 2)
        x_aba = tgen.decode(c_a_recon, s_a_p, 1)
        x_bab = tgen.decode(c_b_recon, s_b_p, 2)

        m = {
            "loss_gen_recon_x_a": l1(x_a_recon, x_a),
            "loss_gen_recon_x_b": l1(x_b_recon, x_b),
            "loss_gen_recon_s_a": l1(s_a_recon, s_a_p),
            "loss_gen_recon_s_b": l1(s_b_recon, s_b_p),
            "loss_gen_recon_c_a": l1(c_a_recon, c_a),
            "loss_gen_recon_c_b": l1(c_b_recon, c_b),
            "loss_gen_cycrecon_x_a": l1m(x_aba, x_a, mask_a),
            "loss_gen_cycrecon_x_b": l1m(x_bab, x_b, mask_b),
            "loss_gen_adv_a": sum(torch.mean((o - 1) ** 2)
                                  for o in tdis_a(x_ba)),
            "loss_gen_adv_b": sum(torch.mean((o - 1) ** 2)
                                  for o in tdis_b(x_ab)),
            "loss_dis_a": sum(torch.mean(o0 ** 2) + torch.mean((o1 - 1) ** 2)
                              for o0, o1 in zip(tdis_a(x_ba), tdis_a(x_a))),
            "loss_dis_b": sum(torch.mean(o0 ** 2) + torch.mean((o1 - 1) ** 2)
                              for o0, o1 in zip(tdis_b(x_ab), tdis_b(x_b))),
        }
        total = (conf["gan_w"] * (m["loss_gen_adv_a"] + m["loss_gen_adv_b"])
                 + conf["recon_x_w"] * (m["loss_gen_recon_x_a"]
                                        + m["loss_gen_recon_x_b"])
                 + conf["recon_s_w"] * (m["loss_gen_recon_s_a"]
                                        + m["loss_gen_recon_s_b"])
                 + conf["recon_c_w"] * (m["loss_gen_recon_c_a"]
                                        + m["loss_gen_recon_c_b"])
                 + conf["recon_x_cyc_w"] * (m["loss_gen_cycrecon_x_a"]
                                            + m["loss_gen_cycrecon_x_b"]))
        m["loss_gen_total"] = total
        m["loss_dis_total"] = conf["gan_w"] * (m["loss_dis_a"]
                                               + m["loss_dis_b"])
    return {k: float(v) for k, v in m.items()}


def test_gen_and_dis_step_loss_parity():
    tr, tgen, tdis_a, tdis_b, conf = build()
    rng = np.random.RandomState(0)
    x_a = rng.randn(2, CROP, CROP, 3).astype(np.float32) * 0.5
    x_b = rng.randn(2, CROP, CROP, 3).astype(np.float32) * 0.5
    mask = (rng.rand(2, CROP, CROP, 1) > 0.7).astype(np.float32)

    t = lambda x: torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    want = torch_losses(tgen, tdis_a, tdis_b, t(x_a), t(x_b), t(mask),
                        t(mask), conf)

    tr.iterations = 0
    got_d = tr.dis_update(jnp.asarray(x_a), jnp.asarray(x_b))
    # dis_update mutated dis params; rebuild for the gen step comparison
    tr2, *_ = build()
    tr2.iterations = 0
    got_g = tr2.gen_update(jnp.asarray(x_a), jnp.asarray(x_b),
                           jnp.asarray(mask), jnp.asarray(mask))

    for key, wv in want.items():
        if key in got_g:
            gv = float(got_g[key])
        elif key in got_d:
            gv = float(got_d[key])
        else:
            raise AssertionError(f"metric {key} missing")
        assert abs(gv - wv) <= max(2e-3, 2e-3 * abs(wv)), \
            f"{key}: got {gv}, want {wv}"
