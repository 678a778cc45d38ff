"""Full train-step parity against the REAL reference ``trainer.py``
(/root/reference/scripts/trainer.py), not the builder's torch mirror —
closing VERDICT r2 "next #2".

The real ``MUNIT_Trainer`` is imported under torch 2.x with the same
injected-imports trick used for extraadam (``extraadam`` pre-exec'd into
sys.modules with its missing names), plus CPU shims for the hard-coded
``.cuda()`` calls and the model-zoo download inside ``Resnet34_8s``.

Covered:
- test A (tiny nets, 64² crops): 4 guided iterations of
  ``dis_update`` + ``gen_update`` (reference trainer.py:1133-1190, :336-616)
  with semantic loss against a shared random-weight frozen segmenter,
  masked cycle loss, plain Adam — every logged loss term AND the updated
  gen/dis params compared each iteration.
- test B (production content width, 256² crops): the sim/real adaptation
  terms — the classifier fool loss inside gen_update (trainer.py:521-536)
  and ``domain_classifier_sr_update`` (trainer.py:1237-1265) — loss values
  and updated classifier params.

Skipped cleanly when /root/reference is not present.
"""

import math
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference/scripts"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="/root/reference not available")

from munit_tpu.config import validate
from munit_tpu.io import convert_gen_state_dict, convert_dis_state_dict
from munit_tpu.io.torch_import import (export_dis_state_dict,
                                       export_gen_state_dict)
from munit_tpu.nn.classifiers import convert_domain_classifier_state_dict
from munit_tpu.nn.resnet import convert_resnet34_8s_state_dict
from munit_tpu.train import MUNITTrainer


def _to_t(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def load_ref_trainer():
    """Import the real trainer.py with its broken/CUDA-bound edges shimmed.
    (Plain function so debug scripts can reuse it outside pytest.)"""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # extraadam.py ships with no import statements (SURVEY §2.3)
    if "extraadam" not in sys.modules:
        from torch.optim.optimizer import Optimizer
        em = types.ModuleType("extraadam")
        em.__dict__.update({"Optimizer": Optimizer, "torch": torch,
                            "math": math})
        exec(compile(open(os.path.join(REF, "extraadam.py")).read(),
                     "extraadam.py", "exec"), em.__dict__)
        sys.modules["extraadam"] = em

    try:
        import torchvision  # noqa: F401
    except ImportError:
        # utils.py only needs transforms.Normalize/Compose on our code paths
        # (seg_transform, utils.py:166-174); stub the rest inert.
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")

        class _Normalize:
            def __init__(self, mean, std, inplace=False):
                self.mean = torch.tensor(mean)
                self.std = torch.tensor(std)

            def __call__(self, t):
                return (t - self.mean[:, None, None]) / \
                    self.std[:, None, None]

        class _Compose:
            def __init__(self, ts):
                self.ts = ts

            def __call__(self, x):
                for t in self.ts:
                    x = t(x)
                return x

        tvt.Normalize, tvt.Compose = _Normalize, _Compose
        for n in ("Resize", "CenterCrop", "ToTensor", "ToPILImage",
                  "RandomHorizontalFlip", "RandomCrop"):
            setattr(tvt, n, type(n, (), {
                "__init__": lambda self, *a, **k: None,
                "__call__": lambda self, x: x}))
        tvf = types.ModuleType("torchvision.transforms.functional")
        tvm = types.ModuleType("torchvision.models")
        tvu = types.ModuleType("torchvision.utils")
        tv.transforms, tvt.functional = tvt, tvf
        tv.models, tv.utils = tvm, tvu
        sys.modules.update({
            "torchvision": tv, "torchvision.transforms": tvt,
            "torchvision.transforms.functional": tvf,
            "torchvision.models": tvm, "torchvision.utils": tvu})

    import resnet as ref_resnet
    import utils as ref_utils

    # domainClassifier builds BasicBlock(256, 128, True) (utils.py:1374-1377)
    # — bool stride, which the reference-era torch coerced to 1 (True == 1:
    # no downsampling, `stride != 1` False) and torch 2.x rejects. Coerce at
    # the conv3x3/conv1x1 seam so torch-2.x builds the same stride-1 net.
    _c3, _c1 = ref_utils.conv3x3, ref_utils.conv1x1
    ref_utils.conv3x3 = lambda i, o, stride=1, **k: _c3(i, o, int(stride), **k)
    ref_utils.conv1x1 = lambda i, o, stride=1: _c1(i, o, int(stride))
    # Resnet34_8s hardcodes pretrained=True → model-zoo download (resnet.py:
    # 308-327); zero-egress environment, so drop the pretrained load. The
    # parity weights come from a shared random checkpoint instead.
    real_resnet34 = ref_resnet.resnet34
    ref_utils.resnet34 = lambda **kw: real_resnet34(
        **{**kw, "pretrained": False})

    import trainer as ref_trainer

    # load_segmentation_model does .to("cuda") (utils.py:930-968)
    def _cpu_load_seg(ckpt_path, classes):
        model = ref_utils.Resnet34_8s(num_classes=classes)
        model.load_state_dict(torch.load(ckpt_path, weights_only=True))
        return model

    ref_trainer.load_segmentation_model = _cpu_load_seg

    # .cuda() tensor calls sprinkled through __init__/updates → identity
    torch.Tensor.cuda = lambda self, *a, **k: self
    return ref_trainer


@pytest.fixture(scope="module")
def ref_trainer_mod():
    orig_cuda = torch.Tensor.cuda
    yield load_ref_trainer()
    torch.Tensor.cuda = orig_cuda


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _base_conf(gen_p, dis_p, crop, **over):
    conf = {
        "lr": 1e-4, "beta1": 0.5, "beta2": 0.999, "weight_decay": 1e-4,
        "init": "kaiming", "optimizer": "adam", "lr_policy": "step",
        "step_size": 100000, "gamma": 0.5, "max_iter": 100,
        "gan_w": 3, "recon_x_w": 12, "recon_s_w": 1, "recon_c_w": 2,
        "recon_x_cyc_w": 12, "vgg_w": 0, "semantic_w": 0, "recon_mask": 0,
        "domain_adv_w": 0, "recon_synth_w": 0,
        "gen_state": 1, "guided": 1, "display_size": 2, "batch_size": 2,
        "input_dim_a": 3, "input_dim_b": 3,
        "new_size": crop, "crop_image_height": crop, "crop_image_width": crop,
        "gen": gen_p, "dis": dis_p,
        "adaptation": {"full_adaptation": 0, "output_classifier_lambda": 0,
                       "output_adv_lambda": 0, "output_classif_freq": 1,
                       "adv_lambda": 0, "dfeat_lambda": 0,
                       "classif_frequency": 15, "sem_seg_lambda": 0},
    }
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(conf.get(k), dict):
            conf[k].update(v)
        else:
            conf[k] = v
    return conf


def _sync_weights(ref_tr, conf, seg_variables=None):
    """Build our trainer and copy the reference trainer's post-init weights
    into it (torch is the source of truth for the shared starting point).

    NOTE the .copy(): jnp.asarray on the CPU backend is ZERO-COPY over
    aligned numpy views, and .detach().numpy() is a view of torch's
    parameter memory — without the copy our param arrays alias torch's
    and silently follow its in-place optimizer steps (contiguous leaves
    like conv biases alias; transposed kernels don't — which produced
    exactly-2·lr bias drift while kernels matched)."""
    sd = lambda m: {k: v.detach().numpy().copy()
                    for k, v in m.state_dict().items()}
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    tr.fused = False
    tr.state["gen"] = jax.tree.map(jnp.asarray, convert_gen_state_dict(
        sd(ref_tr.gen), conf["gen"], dual=True))
    tr.state["dis_a"] = jax.tree.map(jnp.asarray, convert_dis_state_dict(
        sd(ref_tr.dis_a), conf["dis"]))
    tr.state["dis_b"] = jax.tree.map(jnp.asarray, convert_dis_state_dict(
        sd(ref_tr.dis_b), conf["dis"]))
    if seg_variables is not None:
        tr.load_segmenter(seg_variables)
    if conf["adaptation"]["dfeat_lambda"] > 0:
        for dom, mod in (("a", ref_tr.domain_classifier_sr_a),
                         ("b", ref_tr.domain_classifier_sr_b)):
            v = convert_domain_classifier_state_dict(sd(mod))
            tr.state[f"classifier_sr_{dom}"] = jax.tree.map(
                jnp.asarray, v["params"])
            tr.state[f"classifier_sr_{dom}_stats"] = jax.tree.map(
                jnp.asarray, v["batch_stats"])
    return tr


GEN_LOSS_KEYS = {
    "loss_gen_recon_x_a": "loss_gen_recon_x_a",
    "loss_gen_recon_x_b": "loss_gen_recon_x_b",
    "loss_gen_recon_s_a": "loss_gen_recon_s_a",
    "loss_gen_recon_s_b": "loss_gen_recon_s_b",
    "loss_gen_recon_c_a": "loss_gen_recon_c_a",
    "loss_gen_recon_c_b": "loss_gen_recon_c_b",
    "loss_gen_cycrecon_x_a": "loss_gen_cycrecon_x_a",
    "loss_gen_cycrecon_x_b": "loss_gen_cycrecon_x_b",
    "loss_gen_adv_a": "loss_gen_adv_a",
    "loss_gen_adv_b": "loss_gen_adv_b",
    "loss_sem_seg": "loss_sem_seg",
    "loss_classifier_sr": "loss_classifier_adv_sr",
    "loss_gen_total": "loss_gen_total",
}


# style codes are GAP-bottlenecked (1x1 spatial) and their recon loss is a
# difference of nearly-equal small numbers — fp drift accumulates faster
# there across iterations than on any pixel-space term
_LOOSE = {"loss_gen_recon_s_a": 2e-2, "loss_gen_recon_s_b": 2e-2}


def _assert_losses(ref_tr, metrics, it, skip=()):
    for tattr, jkey in GEN_LOSS_KEYS.items():
        if tattr in skip:
            continue
        want = ref_tr.__dict__.get(tattr, getattr(ref_tr, tattr, None))
        if want is None or isinstance(want, int):
            continue
        want = float(want)
        got = float(metrics[jkey])
        tol = _LOOSE.get(tattr, 3e-3)
        assert abs(got - want) <= max(tol, tol * abs(want)), \
            f"iter {it} {tattr}: got {got}, want {want}"


def _assert_params_close(ref_mod_sd, ours_sd, atol, what, n_steps=1,
                         lr=1e-4, grad_sd=None):
    """Drift check aware of Adam's normalization: every step moves every
    element by exactly ±lr·m̂/(√v̂+ε) ≈ ±lr regardless of gradient
    MAGNITUDE, so a parameter whose true gradient is structurally ~0 (conv
    bias feeding InstanceNorm/LN — the norm kills constant shifts) walks
    ±lr per step on the SIGN OF FP NOISE, uncorrelated between torch and
    jax. Those tensors are excluded via ``grad_sd`` (measured gradient
    magnitudes, same key space); everything else must stay inside the
    worst-case flip envelope (2·n_steps·lr per element) with a tight
    per-tensor mean (a mis-wired loss drifts whole tensors by
    ~n_steps·lr)."""
    ceil = 2.2 * n_steps * lr
    checked = 0
    for k, tv in ref_mod_sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if grad_sd is not None and np.abs(grad_sd[k]).max() < 1e-5:
            continue   # structurally-zero gradient: fp-noise random walk
        checked += 1
        d = np.abs(np.asarray(ours_sd[k], np.float64)
                   - tv.detach().numpy().astype(np.float64))
        assert d.max() <= ceil, \
            f"{what}: {k} max drift {d.max():.2e} > Adam bound {ceil:.2e}"
        assert d.mean() <= max(atol, 0.1 * ceil), \
            f"{what}: {k} mean drift {d.mean():.2e} (systematic divergence)"
    assert checked > 0, f"{what}: every tensor skipped as degenerate?"


# ---------------------------------------------------------------------------
# test A — tiny full assembly, 4 iterations, semantic + masked cycle
# ---------------------------------------------------------------------------


def test_real_trainer_four_guided_iterations(ref_trainer_mod, tmp_path):
    gen_p = dict(dim=16, style_dim=8, n_downsample=2, n_res=2, activ="relu",
                 pad_type="reflect", mlp_dim=32)
    dis_p = dict(dim=16, norm="none", activ="lrelu", n_layer=3,
                 gan_type="lsgan", num_scales=2, pad_type="reflect")
    crop = 64

    # shared random segmenter checkpoint (reference format)
    import utils as ref_utils
    torch.manual_seed(0)
    seg_t = ref_utils.Resnet34_8s(num_classes=19)
    ckpt = tmp_path / "seg.pth"
    torch.save(seg_t.state_dict(), str(ckpt))

    conf_t = _base_conf(gen_p, dis_p, crop, semantic_w=3, recon_mask=1,
                        semantic_ckpt_path=str(ckpt))
    torch.manual_seed(1)
    ref_tr = ref_trainer_mod.MUNIT_Trainer(conf_t)
    # NOTE: no ref_tr.train() — the reference loop runs in the post-init
    # mode state (train.py never toggles it): all modules train-mode except
    # the frozen segmenter, which __init__ put in eval (trainer.py:141).

    conf = validate(dict(conf_t))
    seg_vars = jax.tree.map(jnp.asarray, convert_resnet34_8s_state_dict(
        {k: v.numpy() for k, v in seg_t.state_dict().items()}))
    tr = _sync_weights(ref_tr, conf, seg_variables=seg_vars)

    rng = np.random.RandomState(0)
    x_a = (rng.rand(2, crop, crop, 3) * 2 - 1).astype(np.float32)
    x_b = (rng.rand(2, crop, crop, 3) * 2 - 1).astype(np.float32)
    mask_a = (rng.rand(2, crop, crop, 1) > 0.6).astype(np.float32)
    mask_b = (rng.rand(2, crop, crop, 1) > 0.6).astype(np.float32)
    xt_a, xt_b = _to_t(x_a), _to_t(x_b)
    mt_a, mt_b = _to_t(mask_a), _to_t(mask_b)

    # gradient magnitudes (our fused grad surface) classify which params
    # have structurally-zero gradients — pre-norm biases — whose post-Adam
    # values are noise-sign random walks in BOTH frameworks
    gd0, gg0 = tr.dis_gen_grads(jnp.asarray(x_a), jnp.asarray(x_b),
                                jnp.asarray(mask_a), jnp.asarray(mask_b))
    grad_gen_sd = export_gen_state_dict(
        jax.tree.map(np.asarray, gg0), conf["gen"], dual=True)
    grad_dis_sd = {dom: export_dis_state_dict(
        jax.tree.map(np.asarray, gd0[dom]), conf["dis"]) for dom in ("a", "b")}

    def check_params(n_steps, atol):
        ours_gen = export_gen_state_dict(
            jax.tree.map(np.asarray, tr.state["gen"]), conf["gen"], dual=True)
        _assert_params_close(ref_tr.gen.state_dict(), ours_gen, atol, "gen",
                             n_steps=n_steps, grad_sd=grad_gen_sd)
        for dom in ("a", "b"):
            ours_dis = export_dis_state_dict(
                jax.tree.map(np.asarray, tr.state[f"dis_{dom}"]), conf["dis"])
            _assert_params_close(getattr(ref_tr, f"dis_{dom}").state_dict(),
                                 ours_dis, atol, f"dis_{dom}",
                                 n_steps=n_steps, grad_sd=grad_dis_sd[dom])

    for it in range(4):
        ref_tr.iterations = it
        tr.iterations = it
        ref_tr.dis_update(xt_a.clone(), xt_b.clone(), conf_t)
        md = tr.dis_update(jnp.asarray(x_a), jnp.asarray(x_b))
        for key in ("loss_dis_a", "loss_dis_b", "loss_dis_total"):
            want = float(getattr(ref_tr, key))
            got = float(md[key])
            assert abs(got - want) <= max(3e-3, 3e-3 * abs(want)), \
                f"iter {it} {key}: got {got}, want {want}"

        ref_tr.gen_update(xt_a.clone(), xt_b.clone(), conf_t,
                          mt_a.clone(), mt_b.clone())
        mg = tr.gen_update(jnp.asarray(x_a), jnp.asarray(x_b),
                           jnp.asarray(mask_a), jnp.asarray(mask_b))
        _assert_losses(ref_tr, mg, it)
        if it == 0:
            # tight check after ONE dis+gen Adam step — wiring errors
            # (detach placement, λ, optimizer state) show here before
            # GAP-bottleneck fp drift can accumulate sign flips
            check_params(n_steps=1, atol=3e-6)

    # after 4 steps only the Adam-bounded drift envelope applies
    check_params(n_steps=4, atol=4e-5)


# ---------------------------------------------------------------------------
# test B — sim/real adaptation terms at production content width
# ---------------------------------------------------------------------------


def test_real_trainer_adaptation_terms(ref_trainer_mod):
    gen_p = dict(dim=64, style_dim=8, n_downsample=2, n_res=1, activ="relu",
                 pad_type="reflect", mlp_dim=32)
    dis_p = dict(dim=16, norm="none", activ="lrelu", n_layer=2,
                 gan_type="lsgan", num_scales=1, pad_type="reflect")
    crop = 256   # content (B, 64, 64, 256): what domainClassifier expects

    conf_t = _base_conf(gen_p, dis_p, crop, recon_x_cyc_w=0,
                        adaptation={"adv_lambda": 6, "dfeat_lambda": 1})
    torch.manual_seed(2)
    ref_tr = ref_trainer_mod.MUNIT_Trainer(conf_t)

    conf = validate(dict(conf_t))
    tr = _sync_weights(ref_tr, conf)

    rng = np.random.RandomState(1)
    x_a = (rng.rand(2, crop, crop, 3) * 2 - 1).astype(np.float32)
    x_b = (rng.rand(2, crop, crop, 3) * 2 - 1).astype(np.float32)
    xt_a, xt_b = _to_t(x_a), _to_t(x_b)

    for it in range(2):
        ref_tr.iterations = it
        tr.iterations = it
        ref_tr.dis_update(xt_a.clone(), xt_b.clone(), conf_t)
        tr.dis_update(jnp.asarray(x_a), jnp.asarray(x_b))

        ref_tr.gen_update(xt_a.clone(), xt_b.clone(), conf_t)
        mg = tr.gen_update(jnp.asarray(x_a), jnp.asarray(x_b))
        _assert_losses(ref_tr, mg, it,
                       skip=("loss_gen_cycrecon_x_a", "loss_gen_cycrecon_x_b"))

        # train.py:192-204 cadence body (domain_synth=False on real batches)
        ref_tr.domain_classifier_sr_update(xt_a.clone(), xt_b.clone(), False,
                                           conf_t["adaptation"]["dfeat_lambda"],
                                           it + 1)
        mc = tr.domain_classifier_sr_update(
            jnp.asarray(x_a), jnp.asarray(x_b), domain_synth=False,
            lamb=conf_t["adaptation"]["dfeat_lambda"])
        assert "loss_classifier_sr" in mc

    # classifier params after 2 λ-scaled Adam steps (same sign-flip drift
    # envelope as test A: fresh-init BN biases have near-zero grads)
    sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    flat = lambda tree: {jax.tree_util.keystr(p): np.asarray(v) for p, v in
                         jax.tree_util.tree_leaves_with_path(tree)}
    ceil = 2.2 * 2 * 1e-4
    for dom, mod in (("a", ref_tr.domain_classifier_sr_a),
                     ("b", ref_tr.domain_classifier_sr_b)):
        want = flat(convert_domain_classifier_state_dict(sd(mod))["params"])
        got = flat(tr.state[f"classifier_sr_{dom}"])
        for key, wv in want.items():
            d = np.abs(got[key].astype(np.float64) - wv.astype(np.float64))
            assert d.max() <= ceil, \
                f"classifier_sr_{dom}{key}: max drift {d.max():.2e}"
            assert d.mean() <= 0.1 * ceil, \
                f"classifier_sr_{dom}{key}: mean drift {d.mean():.2e}"
