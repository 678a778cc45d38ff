"""TPU-native MUNIT training engine.

Reimplements the reference MUNIT_Trainer (trainer.py:29-1429) as a set of
jitted functional train steps over an explicit state pytree:

- ``dis_step``   ≙ dis_update      (trainer.py:1133-1190)
- ``gen_step``   ≙ gen_update      (trainer.py:336-616) incl. semantic /
  domain-adv / sim-real / synthetic-pair loss terms
- ``dann_step``  ≙ domain_classifier_update       (trainer.py:1192-1235)
- ``classifier_sr_step`` ≙ domain_classifier_sr_update (trainer.py:1237-1265)
- ``output_classifier_sr_step`` ≙ output_domain_classifier_sr_update
  (trainer.py:1267-1284)
- ``seg_head_step`` ≙ segmentation_head_update    (trainer.py:1286-1324)

TPU-first design choices:
- one state pytree donated into each jitted step (no in-place module state);
- ``stop_gradient`` placement mirrors the reference's ``.detach()`` /
  optimizer-partition semantics exactly;
- the ExtraAdam even/odd extrapolation cadence (trainer.py:225-277) is a
  traced bool so a single compiled step serves both phases;
- loss weights and cadence flags are Python constants baked into the traced
  function (they are fixed per config);
- frozen nets (segmenter) are passed as non-donated side inputs.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from munit_tpu.core import init as winit
from munit_tpu.core import ops
from munit_tpu import losses
from munit_tpu.nn import AdaINGen, AdaINGenDual, MsImageDis
from munit_tpu.nn.classifiers import DomainClassifier
from munit_tpu.nn.resnet import ResNet34_8s, SegmentationHead, seg_preprocess
from munit_tpu.optim import extra_adam_init, extra_adam_update
from munit_tpu.optim.schedule import from_config as schedule_from_config

Params = Any


# 19 Cityscapes classes → 10 meta-classes (merge_classes, utils.py:1330-1353).
# Class 0 has no sources → all-zero logits, exactly like the reference.
_MERGE_GROUPS = {9: [14, 15, 16], 8: [13, 17, 18], 7: [11, 12], 6: [10],
                 5: [9], 4: [8], 3: [5, 6, 7], 2: [2, 3, 4], 1: [0, 1], 0: []}


def merge_class_matrix() -> np.ndarray:
    m = np.zeros((19, 10), np.float32)
    for k, srcs in _MERGE_GROUPS.items():
        for s in srcs:
            m[s, k] = 1.0
    return m


class GenBundle:
    """Uniform interface over gen_state 0 (two AdaINGen) and 1 (dual).

    remat ∈ {False, "pads", "hd", True} (measured tradeoffs in BENCH.md):
    - False (default): no remat — fastest at batch 8 (53.5 img/s @ 256²);
    - "pads": jax.checkpoint policy saving EVERYTHING except the
      ``conv_pad``-named padded conv inputs — those copies dominate
      train-step HBM at larger batches; recompute ≈ a pad. Lets batch 16 fit
      in v5e HBM at ~the same throughput;
    - "hd": "pads" plus the decoder upsample-stage buffers (the largest
      512² slabs) — the stage-wise policy that fits HD batch 8;
    - True: full rematerialization (save nothing) — for HD 512² crops
      (SURVEY.md §7 hard part 6)."""

    def __init__(self, conf: Dict, remat=False):
        g = conf["gen"]
        self.gen_state = conf["gen_state"]
        self.style_dim = g["style_dim"]
        self.remat = remat
        self._pad_policy = jax.checkpoint_policies.save_any_names_but_these(
            "conv_pad")
        # "hd": stage-wise policy for 512² crops — additionally drop the
        # decoder upsample-stage buffers (the largest HD slabs; tagged in
        # nn/generator.py Decoder). Everything else is stored, so the
        # recompute is bounded to pads + nearest-upsample gathers + the two
        # up convs per decode (VERDICT r2 #5).
        self._hd_policy = jax.checkpoint_policies.save_any_names_but_these(
            "conv_pad", "dec_up_in", "dec_up_act", "pt_slab")
        kernel_init = winit.by_name(conf.get("init", "kaiming"))
        kwargs = dict(input_dim=conf["input_dim_a"], dim=g["dim"],
                      style_dim=g["style_dim"], n_downsample=g["n_downsample"],
                      n_res=g["n_res"], mlp_dim=g["mlp_dim"], activ=g["activ"],
                      pad_type=g["pad_type"], kernel_init=kernel_init)
        if self.gen_state == 1:
            self.module = AdaINGenDual(**kwargs)
        else:
            self.module = AdaINGen(**kwargs)
        # Standalone submodule defs for the wide (batched) train-step path:
        # identical hyperparams and param names, so the AdaINGenDual param
        # subtrees apply directly.
        from munit_tpu.nn.generator import (ContentEncoder, Decoder,
                                            StyleEncoder)
        from munit_tpu.nn.blocks import MLP
        content_dim = g["dim"] * (2 ** g["n_downsample"])
        self._style_def = StyleEncoder(4, g["dim"], g["style_dim"],
                                       g["activ"], g["pad_type"], kernel_init)
        self._content_def = ContentEncoder(
            g["n_downsample"], g["n_res"], g["dim"], "in", g["activ"],
            g["pad_type"], kernel_init)
        self._dec_def = Decoder(
            g["n_downsample"], g["n_res"], content_dim, conf["input_dim_a"],
            "adain", g["activ"], g["pad_type"], kernel_init)
        self._mlp_def = MLP(self._dec_def.num_adain_params, g["mlp_dim"], 3,
                            g["activ"], kernel_init)

    # ------------------------------------------------------- wide fast path
    #
    # The train steps issue MANY short conv→norm chains (4 encodes, 6
    # decodes, 4 dis applies, 4 segmenter passes per gen step). The TPU is
    # latency-bound on those chains, not FLOP-bound (BENCH.md r1: 25% MFU,
    # insensitive to batch and activation dtype). The wide path batches every
    # same-weight pair into one call (fake+real per dis, both domains through
    # the shared style encoder / frozen segmenter, per-domain decode pairs)
    # and optionally stacks the two domain branches with vmap (grouped
    # convs), halving chain count again. Identical math per sample — only
    # the batch dimension of each kernel launch changes.

    def _maybe_remat(self, run):
        if self.remat is True:
            return jax.checkpoint(run)
        if self.remat == "pads":
            return jax.checkpoint(run, policy=self._pad_policy)
        if self.remat == "hd":
            return jax.checkpoint(run, policy=self._hd_policy)
        return run

    def style_encode(self, params: Params, x: jax.Array) -> jax.Array:
        """Shared style encoder on an arbitrary batch (gen_state=1 only)."""
        run = self._maybe_remat(
            lambda p, x: self._style_def.apply({"params": p}, x))
        return run(params["enc_style"], x)

    def content_encode_pair(self, params: Params, x1: jax.Array,
                            x2: jax.Array, stacked: bool):
        """(enc1(x1), enc2(x2)); stacked=True runs both branches as ONE
        vmapped (grouped-conv) chain."""
        if stacked:
            def run(p1, p2, xs):
                ps = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
                return jax.vmap(lambda p, x: self._content_def.apply(
                    {"params": p}, x))(ps, xs)
            c = self._maybe_remat(run)(params["enc1_content"],
                                       params["enc2_content"],
                                       jnp.stack([x1, x2]))
            return c[0], c[1]
        run = self._maybe_remat(
            lambda p, x: self._content_def.apply({"params": p}, x))
        return run(params["enc1_content"], x1), run(params["enc2_content"], x2)

    def decode_domain(self, params: Params, domain: int, c: jax.Array,
                      s: jax.Array) -> jax.Array:
        """One domain's decoder on an arbitrary batch of (content, style)."""
        d = "1" if domain == 1 else "2"

        def run(pd, pm, c, s):
            return self._dec_def.apply(
                {"params": pd}, c, self._mlp_def.apply({"params": pm}, s))
        return self._maybe_remat(run)(params[f"dec{d}"], params[f"mlp{d}"],
                                      c, s)

    def decode_pair_stacked(self, params: Params, c1, s1, c2, s2):
        """dec1(c1, s1) and dec2(c2, s2) as ONE vmapped chain (equal batch)."""
        def run(p1, p2, cs, ss):
            ps = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
            return jax.vmap(lambda p, c, s: self._dec_def.apply(
                {"params": p["dec"]}, c,
                self._mlp_def.apply({"params": p["mlp"]}, s)))(ps, cs, ss)
        out = self._maybe_remat(run)(
            {"dec": params["dec1"], "mlp": params["mlp1"]},
            {"dec": params["dec2"], "mlp": params["mlp2"]},
            jnp.stack([c1, c2]), jnp.stack([s1, s2]))
        return out[0], out[1]

    def init(self, rng: jax.Array, sample: jax.Array) -> Params:
        if self.gen_state == 1:
            def touch_both(mdl, x):
                c1, s = mdl.encode(x, 1)
                c2, _ = mdl.encode(x, 2)
                return mdl.decode(c1, s, 1), mdl.decode(c2, s, 2)
            return self.module.init(rng, sample, method=touch_both)["params"]
        ra, rb = jax.random.split(rng)
        return {"a": self.module.init(ra, sample)["params"],
                "b": self.module.init(rb, sample)["params"]}

    def encode(self, params: Params, x: jax.Array, domain: int):
        def run(params, x):
            if self.gen_state == 1:
                return self.module.apply({"params": params}, x, domain,
                                         method="encode")
            p = params["a"] if domain == 1 else params["b"]
            return self.module.apply({"params": p}, x, method="encode")
        # _maybe_remat so the narrow (wide=0, HD-default) path honors the
        # "hd" stage policy too — r4 shipped it only on the wide helpers,
        # which left the unfused/chunked step's dominant decoder buffers
        # uncovered (VERDICT r4 weak #5)
        return self._maybe_remat(run)(params, x)

    def decode(self, params: Params, c: jax.Array, s: jax.Array, domain: int):
        def run(params, c, s):
            if self.gen_state == 1:
                return self.module.apply({"params": params}, c, s, domain,
                                         method="decode")
            p = params["a"] if domain == 1 else params["b"]
            return self.module.apply({"params": p}, c, s, method="decode")
        return self._maybe_remat(run)(params, c, s)


class MUNITTrainer:
    """Python driver owning config, module defs, jitted steps, and cadences."""

    def __init__(self, conf: Dict, rng: jax.Array,
                 image_size: Optional[int] = None, dtype=jnp.float32,
                 remat: Optional[bool] = None):
        self.conf = conf
        self.dtype = dtype
        if remat is None:
            # HD crops (>=512²) needed decoder rematerialization (§7 item 6)
            # UNTIL the lane-packed decoder tail (core/packed_tail.py):
            # with the tail packed (auto-on for >=512-px outputs) the
            # [B,512,512,{128,64}] materializations are gone, batch-8 HD
            # fits with NO remat, and no-remat is fastest (26.9 vs 24.0
            # img/s under remat — BENCH.md r3 HD table). Keep remat=True
            # only when the packed tail is disabled.
            import os as _os2
            packed_off = (_os2.environ.get("MUNIT_PACKED_TAIL", "auto") == "0"
                          or conf["gen"]["pad_type"] != "reflect")
            remat = conf["crop_image_height"] >= 512 and packed_off
        self.guided = conf["guided"]
        self.gan_type = conf["dis"]["gan_type"]
        self.crop = image_size or conf["crop_image_height"]
        self.style_dim = conf["gen"]["style_dim"]
        self.use_extra = "extra" in conf["optimizer"]
        self.recon_mask = conf["recon_mask"] == 1
        self.semantic_w = conf["semantic_w"] > 0
        self.domain_adv_w = conf["domain_adv_w"] > 0
        ad = conf["adaptation"]
        self.full_adaptation = ad["full_adaptation"] == 1
        self.use_classifier_sr = ad["dfeat_lambda"] > 0
        self.use_output_classifier_sr = ad["output_classifier_lambda"] > 0
        self.train_seg = ad["sem_seg_lambda"] > 0
        self.lr_schedule = schedule_from_config(conf)
        self.iterations = 0
        # Wide (batched) step forwards: 0 = one call per reference forward,
        # 1 = batch every same-weight pair (fake+real per dis, both domains
        # through shared style enc / frozen segmenter, per-domain decode
        # pairs), 2 = additionally stack the two domain branches with vmap
        # (grouped convs). Identical per-sample math; fewer, wider kernel
        # launches (the r1 bottleneck was chain count — BENCH.md).
        import os as _os
        # HD crops run faster narrow: the wide 2x-batch 512² slabs lose
        # (BENCH.md r3 HD tables: wide=1 23.3 vs wide=0 26.9 img/s with the
        # packed tail; OOM pre-packed). Explicit `wide:` or MUNIT_WIDE wins.
        default_wide = 0 if conf.get("crop_image_height", 256) >= 512 else 1
        self.wide = int(_os.environ.get(
            "MUNIT_WIDE", str(conf.get("wide", default_wide))))
        if conf["gen_state"] != 1:
            self.wide = 0
        # Fused dis+gen step on gen iterations (one shared generator
        # forward; see _dis_gen_step_impl). MUNIT_FUSED=0 falls back to the
        # two separate steps (identical math & rng stream).
        self.fused = _os.environ.get(
            "MUNIT_FUSED", str(conf.get("fused", 1))) in ("1", 1, True)
        # Gradient accumulation (config `grad_accum: K`, munit_tpu
        # extension): the dis/gen steps average gradients over K sequential
        # micro-batches of batch_size/K (lax.scan — one micro-batch of
        # activation residuals live at a time), trading compute for HBM to
        # fit large effective batches on one chip. Exact for every
        # full-count-mean loss term (the mean of equal-chunk means IS the
        # full-batch value) — which is every shipped term EXCEPT the
        # BatchNorm-classifier ones: `adaptation.adv_lambda > 0` (shipped in
        # config_256/config_HD/FeatureDA*) and `domain_adv_w > 0` run the
        # DomainClassifier with train-mode BN (current-batch statistics), so
        # each micro-batch normalizes with its own chunk stats and those
        # gradients deviate from grad_accum=1 (warned below; docs/PARITY.md).
        # Forces the unfused two-step path: the fused step's shared-vjp
        # whole-batch forward is exactly the memory shape K>1 avoids.
        self.grad_accum = int(_os.environ.get(
            "MUNIT_GRAD_ACCUM", str(conf.get("grad_accum", 1))))
        # Env-derived values bypass config.validate(): re-check here with the
        # same messages so MUNIT_GRAD_ACCUM fails fast, not at trace time.
        if self.grad_accum < 1:
            raise ValueError(
                f"grad_accum must be a positive int, got {self.grad_accum!r}")
        if conf["batch_size"] % self.grad_accum:
            raise ValueError(
                f"batch_size ({conf['batch_size']}) must be divisible by "
                f"grad_accum ({self.grad_accum})")
        # K>1 no longer forces the unfused path (r4 did; VERDICT r4 #2):
        # the fused step now chunks BOTH of its phases under lax.scan —
        # phase A accumulates dis grads over K inference forwards, D steps,
        # phase B accumulates gen grads over K vjp forwards against the
        # UPDATED D — exactly the unfused pair's math in ONE jit.
        # MUNIT_ACCUM_SHARED_FWD=1 opts into the single-shared-vjp-forward
        # variant (one forward per micro-batch serving both dis and gen
        # grads): ~1 forward/chunk cheaper, but the gen adversarial terms
        # are then evaluated against the PRE-update D (docs/PARITY.md #12b).
        self.accum_shared_fwd = _os.environ.get(
            "MUNIT_ACCUM_SHARED_FWD",
            str(conf.get("accum_shared_fwd", 0))) in ("1", 1, True)
        # MUNIT_ACCUM_CHUNK_DIS=1 / `accum_chunk_dis: 1`: ALSO chunk the
        # dis-grad computations (the dis-only step and the fused step's
        # phase A) at grad_accum > 1. Exact either way (the dis loss is a
        # full-count mean); chunking them multiplies their launch-bound
        # chain count by K, so it is OFF by default — it exists for
        # HBM-tight configs where phase A's full-batch inference slabs are
        # the last few hundred MB over capacity (HD 512² K=2: full-batch
        # phase A misses by 437 MB; chunked fits — BENCH.md r5).
        self.accum_chunk_dis = _os.environ.get(
            "MUNIT_ACCUM_CHUNK_DIS",
            str(conf.get("accum_chunk_dis", 0))) in ("1", 1, True)
        if self.grad_accum > 1:
            if ad["adv_lambda"] > 0 or conf["domain_adv_w"] > 0:
                import warnings
                warnings.warn(
                    "grad_accum > 1 with a train-mode BatchNorm classifier "
                    "loss (adaptation.adv_lambda > 0 or domain_adv_w > 0): "
                    "each micro-batch normalizes with its own chunk "
                    "statistics, so these gradients deviate from "
                    "grad_accum=1 (all other shipped terms stay exact). "
                    "See docs/PARITY.md.", stacklevel=2)
        # Opt-in: int8 generator forward in the dis-only steps (the fakes
        # are detached there; see _dis_step_impl). Deviates from reference
        # numerics — never the default, never set by any shipped config.
        self.int8_dis_fakes = _os.environ.get("MUNIT_INT8_DIS", "0") == "1"

        from munit_tpu.config import dis_pyramid_floor, _pyramid_msg
        if dis_pyramid_floor(conf) < 1:
            # training with a zero-size dis scale is guaranteed-NaN; raise
            # here (validate() only warns — eval configs never build D)
            raise ValueError(_pyramid_msg(conf))

        self.gen = GenBundle(conf, remat=remat)
        d = conf["dis"]
        self.dis = MsImageDis(
            input_dim=conf["input_dim_a"], n_layer=d["n_layer"], dim=d["dim"],
            norm=d["norm"], activ=d["activ"], num_scales=d["num_scales"],
            pad_type=d["pad_type"], gan_type=d["gan_type"],
            kernel_init=winit.gaussian)
        self.dann_def = DomainClassifier()
        self.seg_model_def = ResNet34_8s(num_classes=19)
        self.seg_head_def = SegmentationHead(num_classes=10)
        self.merge_m = jnp.asarray(merge_class_matrix())

        self.frozen: Dict[str, Any] = {}  # e.g. "seg": segmenter variables
        # one compiled init: eager per-leaf dispatch is slow on remote TPUs
        self.state = jax.jit(self._init_state)(rng)
        self._build_steps()

    # ------------------------------------------------------------------ init

    def _init_state(self, rng: jax.Array) -> Dict[str, Any]:
        conf = self.conf
        keys = jax.random.split(rng, 12)
        sample = jnp.zeros((1, self.crop, self.crop, conf["input_dim_a"]),
                           self.dtype)
        display = int(conf["display_size"])
        state: Dict[str, Any] = {
            "step": jnp.zeros((), jnp.int32),
            "rng": keys[0],
            "gen": self.gen.init(keys[1], sample),
            "dis_a": self.dis.init(keys[2], sample)["params"],
            "dis_b": self.dis.init(keys[3], sample)["params"],
            "display_s_a": jax.random.normal(keys[4], (display, self.style_dim)),
            "display_s_b": jax.random.normal(keys[5], (display, self.style_dim)),
        }
        state["gen_opt"] = extra_adam_init(state["gen"])
        state["dis_opt"] = extra_adam_init(
            {"a": state["dis_a"], "b": state["dis_b"]})

        g = conf["gen"]
        cdim = g["dim"] * (2 ** g["n_downsample"])
        cres = self.crop // (2 ** g["n_downsample"])
        content = jnp.zeros((1, cres, cres, cdim), self.dtype)
        if self.domain_adv_w:
            v = self.dann_def.init(keys[6], content)
            state["dann"] = v["params"]
            state["dann_stats"] = v.get("batch_stats", {})
            state["dann_opt"] = extra_adam_init(state["dann"])
        if self.use_classifier_sr:
            va = self.dann_def.init(keys[7], content)
            vb = self.dann_def.init(keys[8], content)
            state["classifier_sr_a"] = va["params"]
            state["classifier_sr_b"] = vb["params"]
            state["classifier_sr_a_stats"] = va.get("batch_stats", {})
            state["classifier_sr_b_stats"] = vb.get("batch_stats", {})
            state["classif_sr_opt"] = extra_adam_init(
                {"a": state["classifier_sr_a"], "b": state["classifier_sr_b"]})
        if self.use_output_classifier_sr:
            state["output_classifier_sr_a"] = self.dis.init(keys[9], sample)["params"]
            state["output_classifier_sr_b"] = self.dis.init(keys[10], sample)["params"]
            state["output_classif_sr_opt"] = extra_adam_init(
                {"a": state["output_classifier_sr_a"],
                 "b": state["output_classifier_sr_b"]})
        if self.train_seg:
            v = self.seg_head_def.init(keys[11], content)
            state["seg_head"] = v["params"]
            state["seg_head_stats"] = v.get("batch_stats", {})
            state["seg_opt"] = extra_adam_init(state["seg_head"])
        return state

    def load_segmenter(self, variables: Dict[str, Any]):
        """Attach frozen Cityscapes segmenter variables ({params, batch_stats}).

        The tree is device_put once here; it is then passed into every
        jitted step as a non-donated ARGUMENT (never closed over — closure
        would bake ~170 MB of weights into the traced graph as constants,
        the r3 compile-time regression). Under a mesh, re-place it with
        ``replicate_state(mesh, trainer.frozen)`` alongside the state."""
        self.frozen["seg"] = jax.tree.map(jnp.asarray, variables)

    def load_vgg(self, params: Dict[str, Any]):
        """Attach frozen VGG16 params for the perceptual loss (vgg_w > 0).
        The reference's loader was dead (utils.py:911-914); this path is live."""
        self.frozen["vgg"] = jax.tree.map(jnp.asarray, params)

    # ------------------------------------------------------------ optimizer

    def _opt_kwargs(self):
        c = self.conf
        return dict(b1=c["beta1"], b2=c["beta2"], eps=1e-8,
                    weight_decay=c["weight_decay"])

    def _opt_update(self, grads, opt_state, params, lr, extrapolate):
        return extra_adam_update(grads, opt_state, params, lr,
                                 extrapolate=extrapolate, **self._opt_kwargs())

    # ------------------------------------------------------------ forwards

    def _cross_decode(self, gen_params, x_a, x_b, s_a, s_b):
        """Shared encode + cross-decode used by both dis and gen steps
        (trainer.py:1148-1175). Returns codes and cross images."""
        if self.wide >= 1:
            bsz = x_a.shape[0]
            s = self.gen.style_encode(gen_params,
                                      jnp.concatenate([x_a, x_b]))
            s_a_p, s_b_p = s[:bsz], s[bsz:]
            c_a, c_b = self.gen.content_encode_pair(gen_params, x_a, x_b,
                                                    self.wide >= 2)
            sa_use = s_a_p if self.guided == 1 else s_a
            sb_use = s_b_p if self.guided == 1 else s_b
            if self.wide >= 2:
                x_ba, x_ab = self.gen.decode_pair_stacked(
                    gen_params, c_b, sa_use, c_a, sb_use)
            else:
                x_ba = self.gen.decode_domain(gen_params, 1, c_b, sa_use)
                x_ab = self.gen.decode_domain(gen_params, 2, c_a, sb_use)
            return c_a, s_a_p, c_b, s_b_p, x_ba, x_ab
        c_a, s_a_p = self.gen.encode(gen_params, x_a, 1)
        c_b, s_b_p = self.gen.encode(gen_params, x_b, 2)
        if self.guided == 1:
            x_ba = self.gen.decode(gen_params, c_b, s_a_p, 1)
            x_ab = self.gen.decode(gen_params, c_a, s_b_p, 2)
        else:
            x_ba = self.gen.decode(gen_params, c_b, s_a, 1)
            x_ab = self.gen.decode(gen_params, c_a, s_b, 2)
        return c_a, s_a_p, c_b, s_b_p, x_ba, x_ab

    def _gen_forward(self, gen_params, x_a, x_b, s_a, s_b, use_cyc: bool):
        """The gen-step generator forward (trainer.py:366-430): within-domain
        recon, cross decode, re-encode, cycle decode. Returns a dict of all
        intermediate tensors. Wide path batches same-weight calls."""
        g = {}
        if self.wide >= 1:
            bsz = x_a.shape[0]
            s = self.gen.style_encode(gen_params,
                                      jnp.concatenate([x_a, x_b]))
            s_a_p, s_b_p = s[:bsz], s[bsz:]
            c_a, c_b = self.gen.content_encode_pair(gen_params, x_a, x_b,
                                                    self.wide >= 2)
            sa_use = s_a_p if self.guided == 1 else s_a
            sb_use = s_b_p if self.guided == 1 else s_b
            # wave-1 decodes: [recon | cross] per domain, one call each
            c1 = jnp.concatenate([c_a, c_b])
            s1 = jnp.concatenate([s_a_p, sa_use])
            c2 = jnp.concatenate([c_b, c_a])
            s2 = jnp.concatenate([s_b_p, sb_use])
            if self.wide >= 2:
                out1, out2 = self.gen.decode_pair_stacked(gen_params,
                                                          c1, s1, c2, s2)
            else:
                out1 = self.gen.decode_domain(gen_params, 1, c1, s1)
                out2 = self.gen.decode_domain(gen_params, 2, c2, s2)
            x_a_recon, x_ba = out1[:bsz], out1[bsz:]
            x_b_recon, x_ab = out2[:bsz], out2[bsz:]
            # wave-2 encodes of the fakes
            s_r = self.gen.style_encode(gen_params,
                                        jnp.concatenate([x_ba, x_ab]))
            s_a_recon, s_b_recon = s_r[:bsz], s_r[bsz:]
            c_b_recon, c_a_recon = self.gen.content_encode_pair(
                gen_params, x_ba, x_ab, self.wide >= 2)
            x_aba = x_bab = None
            if use_cyc:
                if self.wide >= 2:
                    x_aba, x_bab = self.gen.decode_pair_stacked(
                        gen_params, c_a_recon, s_a_p, c_b_recon, s_b_p)
                else:
                    x_aba = self.gen.decode_domain(gen_params, 1,
                                                   c_a_recon, s_a_p)
                    x_bab = self.gen.decode_domain(gen_params, 2,
                                                   c_b_recon, s_b_p)
        else:
            gen = self.gen
            c_a, s_a_p = gen.encode(gen_params, x_a, 1)
            c_b, s_b_p = gen.encode(gen_params, x_b, 2)
            x_a_recon = gen.decode(gen_params, c_a, s_a_p, 1)
            x_b_recon = gen.decode(gen_params, c_b, s_b_p, 2)
            if self.guided == 1:
                x_ba = gen.decode(gen_params, c_b, s_a_p, 1)
                x_ab = gen.decode(gen_params, c_a, s_b_p, 2)
            else:
                x_ba = gen.decode(gen_params, c_b, s_a, 1)
                x_ab = gen.decode(gen_params, c_a, s_b, 2)
            c_b_recon, s_a_recon = gen.encode(gen_params, x_ba, 1)
            c_a_recon, s_b_recon = gen.encode(gen_params, x_ab, 2)
            x_aba = x_bab = None
            if use_cyc:
                x_aba = gen.decode(gen_params, c_a_recon, s_a_p, 1)
                x_bab = gen.decode(gen_params, c_b_recon, s_b_p, 2)
        g.update(c_a=c_a, c_b=c_b, s_a_p=s_a_p, s_b_p=s_b_p,
                 x_a_recon=x_a_recon, x_b_recon=x_b_recon, x_ba=x_ba,
                 x_ab=x_ab, c_a_recon=c_a_recon, c_b_recon=c_b_recon,
                 s_a_recon=s_a_recon, s_b_recon=s_b_recon, x_aba=x_aba,
                 x_bab=x_bab)
        return g

    def _dis_apply(self, params, x):
        return self.dis.apply({"params": params}, x)

    def _dis_apply_fr(self, params, x_fake, x_real):
        """One dis apply over concat(fake, real) → (outs_fake, outs_real)
        per scale. Same math as two applies; one chain of kernel launches."""
        bsz = x_fake.shape[0]
        outs = self.dis.apply({"params": params},
                              jnp.concatenate([x_fake, x_real]))
        return [o[:bsz] for o in outs], [o[bsz:] for o in outs]

    def _dis_apply_stacked(self, pa, pb, xa, xb):
        """dis_a(xa) and dis_b(xb) as one vmapped (grouped-conv) chain."""
        ps = jax.tree.map(lambda a, b: jnp.stack([a, b]), pa, pb)
        outs = jax.vmap(
            lambda p, x: tuple(self.dis.apply({"params": p}, x)))(
                ps, jnp.stack([xa, xb]))
        return [o[0] for o in outs], [o[1] for o in outs]

    def _dann_apply(self, params, stats, c, train=True):
        out, updates = self.dann_def.apply(
            {"params": params, "batch_stats": stats}, c, train,
            mutable=["batch_stats"])
        return out, updates["batch_stats"]

    def _segment(self, img_pm1, frozen=None):
        """Frozen segmenter logits (B,H,W,19) from a [-1,1] image.

        ``frozen`` is the frozen-net pytree threaded through the jitted step
        as a real (non-donated) ARGUMENT — closing over ``self.frozen``
        instead bakes the ~170 MB of ResNet34 weights into the traced graph
        as StableHLO constants, which ballooned the fused step to 174 MB of
        IR / 338 MB of serialized executable and dominated both trace
        (~155 s) and compile (~233 s) wall time. Eager callers (sample
        overlays) may omit it.

        By default the backward through the semantic loss stores the frozen
        ResNet34's activations (fits at 256²/batch 8 since the bf16/pad-
        residual fixes; +1.7% measured, BENCH.md). MUNIT_SEG_REMAT=1
        rematerializes instead — recompute the forward in the backward for a
        large HBM saving — for HD crops or bigger batches."""
        seg_vars = (frozen if frozen is not None else self.frozen)["seg"]

        def run(seg_vars, img):
            return self.seg_model_def.apply(seg_vars, seg_preprocess(img))
        if _os.environ.get("MUNIT_SEG_REMAT", "0") == "1":
            run = jax.checkpoint(run)
        return run(seg_vars, img_pm1)

    # -------------------------------------------------------------- steps

    def _build_steps(self):
        c = self.conf
        ad = c["adaptation"]
        hw = {k: float(c[k]) for k in
              ("gan_w", "recon_x_w", "recon_s_w", "recon_c_w", "recon_x_cyc_w",
               "vgg_w", "semantic_w", "domain_adv_w", "recon_synth_w")}
        hw["adv_lambda"] = float(ad["adv_lambda"])
        hw["output_adv_lambda"] = float(ad["output_adv_lambda"])
        self.hw = hw

        # "extrapolate" is static: the ExtraAdam even/odd parity is known at
        # dispatch time, and specializing the jit halves the optimizer-update
        # math and lets XLA alias the untouched params_copy on update phases
        # (BENCH.md r3). Two compiles per step, both persistent-cached.
        donate = dict(donate_argnums=(0,))
        # MUNIT_COMPILER_OPTS="xla_flag=value,..." threads backend compiler
        # option overrides into every jitted train step — the only way to
        # reach server-side XLA flags on a remote (PJRT-tunneled) TPU, where
        # client XLA_FLAGS either doesn't propagate or is rejected outright
        # by the local build.
        opts = _os.environ.get("MUNIT_COMPILER_OPTS", "")
        if opts:
            donate["compiler_options"] = dict(
                kv.split("=", 1) for kv in opts.split(",") if "=" in kv)
        self._dis_step = jax.jit(self._dis_step_impl,
                                 static_argnames=("extrapolate",), **donate)
        self._gen_step = jax.jit(
            self._gen_step_impl,
            static_argnames=("synth", "has_sem_gt", "extrapolate"), **donate)
        self._dis_gen_step = jax.jit(
            self._dis_gen_step_impl,
            static_argnames=("synth", "has_sem_gt", "extrapolate"), **donate)
        if self.domain_adv_w:
            self._dann_step = jax.jit(self._dann_step_impl,
                                      static_argnames=("extrapolate",),
                                      **donate)
        if self.use_classifier_sr:
            self._classifier_sr_step = jax.jit(
                self._classifier_sr_step_impl,
                static_argnames=("domain_synth", "extrapolate"), **donate)
        if self.use_output_classifier_sr:
            self._output_classifier_sr_step = jax.jit(
                self._output_classifier_sr_step_impl, **donate)
        if self.train_seg:
            self._seg_head_step = jax.jit(self._seg_head_step_impl,
                                          static_argnames=("extrapolate",),
                                          **donate)

    # --- gradient accumulation --------------------------------------------

    def _accum_grads(self, chunk_fn, xs):
        """Average ``chunk_fn(**chunk) -> (grads, metrics)`` over
        K = self.grad_accum sequential micro-batches (equal slices of the
        leading batch dim of every array in ``xs``). ALL K chunks run
        inside ONE lax.scan (the zero carry comes from eval_shape — no
        compute): r4 unrolled the first chunk to define the carry, which
        put a second full copy of the chunk graph beside the scan body and
        the allocator reserved BOTH backward working sets (the HD K=2 OOM
        showed duplicate 132 MB decode slabs from the unrolled copy and
        the while body simultaneously). One micro-batch of autodiff
        residuals live at any point is the HBM saving that is this
        feature's point. Chunk means average to the exact full-batch value
        for every full-count-mean loss (all shipped terms); 0 + g ≡ g in
        IEEE, so the zero init does not perturb the sum."""
        K = self.grad_accum
        bsz = next(iter(xs.values())).shape[0]
        if bsz % K:
            raise ValueError(f"batch {bsz} not divisible by grad_accum {K}")
        split = {k: v.reshape((K, bsz // K) + v.shape[1:])
                 for k, v in xs.items()}
        if K == 1:
            return chunk_fn(**{k: v[0] for k, v in split.items()})

        def body(carry, chunk):
            g, m = chunk_fn(**chunk)
            cg, cm = carry
            return (jax.tree.map(jnp.add, cg, g),
                    jax.tree.map(jnp.add, cm, m)), None

        if getattr(self, "_accum_unroll_first", False):
            # Throughput variant (the shared-fwd opt-in uses it: measured
            # 84.3 vs 66.2 img/s at 256² K=2): chunk 0 unrolled beside a
            # scan over chunks 1..K-1. XLA schedules the unrolled copy
            # ~free of while-loop overhead, but the allocator reserves
            # BOTH backward working sets — this is what OOM'd HD K=2, so
            # the memory-lever paths keep the single-scan form below.
            carry = chunk_fn(**{k: v[0] for k, v in split.items()})
            carry, _ = jax.lax.scan(
                body, carry, {k: v[1:] for k, v in split.items()})
            inv = 1.0 / K
            return (jax.tree.map(lambda v: v * inv, carry[0]),
                    jax.tree.map(lambda v: v * inv, carry[1]))
        shapes = jax.eval_shape(lambda c: chunk_fn(**c),
                                {k: v[0] for k, v in split.items()})
        zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        carry, _ = jax.lax.scan(body, zeros, split)
        inv = 1.0 / K
        return (jax.tree.map(lambda v: v * inv, carry[0]),
                jax.tree.map(lambda v: v * inv, carry[1]))

    # --- discriminator -----------------------------------------------------

    def _dis_step_impl(self, state, x_a, x_b, lr, extrapolate):
        rng, k1, k2 = jax.random.split(state["rng"], 3)
        bsz = x_a.shape[0]
        s_a = jax.random.normal(k1, (bsz, self.style_dim), x_a.dtype)
        s_b = jax.random.normal(k2, (bsz, self.style_dim), x_b.dtype)

        dis_params = {"a": state["dis_a"], "b": state["dis_b"]}

        def chunk_grads(x_a, x_b, s_a, s_b):
            # The dis step's generator forward is pure inference (the fakes
            # are detached below, trainer.py:1178) — MUNIT_INT8_DIS=1 opts
            # it into the dynamic-W8A8 quantized convs (core/ops.py
            # conv_quant). OFF by default: the fakes the discriminator
            # trains on then differ from the reference's bf16/f32 numerics
            # by the ~1% quantization error.
            with ops.conv_quant(self.int8_dis_fakes):
                *_, x_ba, x_ab = self._cross_decode(state["gen"], x_a, x_b,
                                                    s_a, s_b)
            x_ba = jax.lax.stop_gradient(x_ba)  # ≙ .detach() trainer.py:1178
            x_ab = jax.lax.stop_gradient(x_ab)
            return jax.grad(self._dis_loss, has_aux=True)(
                dis_params, x_ba, x_ab, x_a, x_b)

        # The dis-only step no longer chunks by default at grad_accum > 1
        # (r5): its loss is a full-count mean, so the chunk-mean equals the
        # full-batch gradient EXACTLY, and its memory is inference-scale
        # (the generator forward keeps no residuals — the fakes are
        # stop-gradded). Chunking it only multiplied the launch-latency-
        # bound chain count by K (r4 K=2 ran the whole cycle at 63.95 vs
        # 121.91 img/s; BENCH.md r5). accum_chunk_dis restores chunking
        # for HBM-tight configs. Styles above are drawn full-batch, so the
        # rng stream is unchanged either way.
        if self.grad_accum > 1 and self.accum_chunk_dis:
            grads, metrics = self._accum_grads(
                chunk_grads, dict(x_a=x_a, x_b=x_b, s_a=s_a, s_b=s_b))
        else:
            grads, metrics = chunk_grads(x_a, x_b, s_a, s_b)
        new_params, new_opt = self._opt_update(
            grads, state["dis_opt"], dis_params, lr, extrapolate)
        state["dis_a"], state["dis_b"] = new_params["a"], new_params["b"]
        state["dis_opt"] = new_opt
        state["rng"] = rng
        return state, metrics

    # --- generator ---------------------------------------------------------

    def _semantic_targets(self, x_a, x_b, sem_gt_a, sem_gt_b, has_sem_gt,
                          frozen=None):
        """Pseudo-label targets from the FROZEN segmenter on the source
        images (trainer.py:741). No gradient flows through them, so they are
        computed OUTSIDE the differentiated closure — halves segmenter work
        in the gen step vs the reference's inline computation."""
        if has_sem_gt:
            return sem_gt_a.astype(jnp.int32), sem_gt_b.astype(jnp.int32)
        if self.wide >= 1:
            bsz = x_a.shape[0]
            t = jnp.argmax(self._segment(jnp.concatenate([x_a, x_b]),
                                         frozen), axis=-1)
            t_a, t_b = t[:bsz], t[bsz:]
        else:
            t_a = jnp.argmax(self._segment(x_a, frozen), axis=-1)
            t_b = jnp.argmax(self._segment(x_b, frozen), axis=-1)
        return jax.lax.stop_gradient(t_a), jax.lax.stop_gradient(t_b)

    def _sem_loss_from_logits(self, logits, target, mask, has_sem_gt):
        if has_sem_gt:
            logits = jnp.einsum("bhwc,cd->bhwd", logits, self.merge_m)
            n_cls = 10
        else:
            n_cls = 19
        if not self.full_adaptation and mask is not None:
            m = ops.resize_nearest(mask, (self.crop, self.crop))[..., 0]
            return losses.semantic_seg_loss_masked(logits, target, m, n_cls)
        return losses.cross_entropy_loss(logits, target)

    def _semantic_loss(self, img_tr, target, mask, has_sem_gt, frozen=None):
        """compute_semantic_seg_loss (trainer.py:706-771). NHWC logits;
        gradient flows through the translated image only."""
        return self._sem_loss_from_logits(self._segment(img_tr, frozen),
                                          target, mask, has_sem_gt)

    def _semantic_loss_pair(self, img1, t1, m1, img2, t2, m2, has_sem_gt,
                            frozen=None):
        """Both translated images through ONE frozen-segmenter pass."""
        if self.wide >= 1:
            bsz = img1.shape[0]
            logits = self._segment(jnp.concatenate([img1, img2]), frozen)
            return (self._sem_loss_from_logits(logits[:bsz], t1, m1,
                                               has_sem_gt)
                    + self._sem_loss_from_logits(logits[bsz:], t2, m2,
                                                 has_sem_gt))
        return (self._semantic_loss(img1, t1, m1, has_sem_gt, frozen)
                + self._semantic_loss(img2, t2, m2, has_sem_gt, frozen))

    def _dis_loss(self, dis_params, x_ba, x_ab, x_a, x_b):
        """calc_dis_loss over both discriminators (trainer.py:1133-1190)."""
        bsz = x_a.shape[0]
        if self.wide >= 2:
            outs_a, outs_b = self._dis_apply_stacked(
                dis_params["a"], dis_params["b"],
                jnp.concatenate([x_ba, x_a]),
                jnp.concatenate([x_ab, x_b]))
            la = losses.dis_gan_loss([o[:bsz] for o in outs_a],
                                     [o[bsz:] for o in outs_a],
                                     self.gan_type)
            lb = losses.dis_gan_loss([o[:bsz] for o in outs_b],
                                     [o[bsz:] for o in outs_b],
                                     self.gan_type)
        elif self.wide == 1:
            fa, ra = self._dis_apply_fr(dis_params["a"], x_ba, x_a)
            fb, rb = self._dis_apply_fr(dis_params["b"], x_ab, x_b)
            la = losses.dis_gan_loss(fa, ra, self.gan_type)
            lb = losses.dis_gan_loss(fb, rb, self.gan_type)
        else:
            la = losses.dis_gan_loss(
                self._dis_apply(dis_params["a"], x_ba),
                self._dis_apply(dis_params["a"], x_a), self.gan_type)
            lb = losses.dis_gan_loss(
                self._dis_apply(dis_params["b"], x_ab),
                self._dis_apply(dis_params["b"], x_b), self.gan_type)
        total = self.hw["gan_w"] * (la + lb)
        return total, {"loss_dis_a": la, "loss_dis_b": lb,
                       "loss_dis_total": total}

    def _dis_gen_step_impl(self, state, frozen, x_a, x_b, mask_a, mask_b,
                           sem_gt_a, sem_gt_b, lr, extrapolate, synth: bool,
                           has_sem_gt: bool):
        """Fused dis_update + gen_update at one iteration, sharing ONE
        generator forward: at a given iteration the two reference steps run
        on identical gen params and inputs (dis_update only touches D —
        trainer.py:1133-1190 then :336-616), so the gen-step forward both
        produces the dis step's fakes (stop-grad) and carries the gen
        gradients. D is updated FIRST and the gen adversarial terms are
        evaluated against the UPDATED D, exactly like the reference's
        sequential ordering. The rng stream advances exactly as the two
        separate steps would (dis draws, then gen draws)."""
        hw = self.hw
        bsz = x_a.shape[0]
        rng_mid, d1, d2 = jax.random.split(state["rng"], 3)
        rng, g1, g2 = jax.random.split(rng_mid, 3)
        s_a_d = jax.random.normal(d1, (bsz, self.style_dim), x_a.dtype)
        s_b_d = jax.random.normal(d2, (bsz, self.style_dim), x_b.dtype)
        s_a_g = jax.random.normal(g1, (bsz, self.style_dim), x_a.dtype)
        s_b_g = jax.random.normal(g2, (bsz, self.style_dim), x_b.dtype)
        use_cyc = hw["recon_x_cyc_w"] > 0
        if self.grad_accum > 1:
            return self._dis_gen_step_accum(
                state, frozen, x_a, x_b, mask_a, mask_b, sem_gt_a, sem_gt_b,
                lr, extrapolate, synth, has_sem_gt, rng,
                s_a_d, s_b_d, s_a_g, s_b_g, use_cyc)
        sem_tgt_a = sem_tgt_b = None
        if self.semantic_w:
            sem_tgt_a, sem_tgt_b = self._semantic_targets(
                x_a, x_b, sem_gt_a, sem_gt_b, has_sem_gt, frozen)

        fw, pullback = jax.vjp(
            lambda p: self._gen_forward(p, x_a, x_b, s_a_g, s_b_g, use_cyc),
            state["gen"])

        sg = jax.lax.stop_gradient
        if self.guided == 1:
            # dis fakes ≡ the gen forward's cross decodes (same params,
            # same exemplar styles)
            x_ba_d, x_ab_d = sg(fw["x_ba"]), sg(fw["x_ab"])
        else:
            # unguided: the dis step draws its OWN random styles
            x_ba_d = sg(self.gen.decode(state["gen"], sg(fw["c_b"]),
                                        s_a_d, 1))
            x_ab_d = sg(self.gen.decode(state["gen"], sg(fw["c_a"]),
                                        s_b_d, 2))

        dis_params = {"a": state["dis_a"], "b": state["dis_b"]}
        grads_d, m_dis = jax.grad(self._dis_loss, has_aux=True)(
            dis_params, x_ba_d, x_ab_d, x_a, x_b)
        new_dis, new_dis_opt = self._opt_update(
            grads_d, state["dis_opt"], dis_params, lr, extrapolate)

        def gen_loss(fw_):
            return self._gen_loss_from_fw(
                fw_, state, new_dis["a"], new_dis["b"], x_a, x_b, mask_a,
                mask_b, s_a_g, s_b_g, sem_tgt_a, sem_tgt_b, synth,
                has_sem_gt, use_cyc, frozen)

        fw_bar, m_gen = jax.grad(gen_loss, has_aux=True)(fw)
        (gen_grads,) = pullback(fw_bar)
        new_gen, new_gen_opt = self._opt_update(
            gen_grads, state["gen_opt"], state["gen"], lr, extrapolate)

        state["dis_a"], state["dis_b"] = new_dis["a"], new_dis["b"]
        state["dis_opt"] = new_dis_opt
        state["gen"] = new_gen
        state["gen_opt"] = new_gen_opt
        state["rng"] = rng
        return state, {**m_dis, **m_gen}

    def _dis_gen_step_accum(self, state, frozen, x_a, x_b, mask_a, mask_b,
                            sem_gt_a, sem_gt_b, lr, extrapolate, synth,
                            has_sem_gt, rng, s_a_d, s_b_d, s_a_g, s_b_g,
                            use_cyc):
        """Fused dis+gen step with K-chunked gradient accumulation
        (VERDICT r4 #2). Style codes were drawn for the FULL batch by the
        caller (so the rng stream is bit-identical to K=1 and to the
        unfused pair); _accum_grads slices them per chunk.

        Default (exact — ≡ the unfused dis_update/gen_update pair, and ≡
        K=1 for every full-count-mean loss term): phase A computes the dis
        grads from ONE full-batch generator INFERENCE forward (the fakes
        are stop-gradded, so no gen residuals are ever live, and the dis
        loss is a full-count mean — chunking it would be exact but only
        multiplies the launch-latency-bound chain count by K); D is then
        updated; phase B accumulates gen grads over K vjp forwards whose
        adversarial terms see the UPDATED D — the reference's dis-then-gen
        ordering (trainer.py:1133-1190, :336-616). One micro-batch of gen
        autodiff residuals is live at any point, which is the HBM saving
        that is grad_accum's point; the cost vs K=1 is one extra inference
        forward — the price of exactness (the adversarial gen gradient
        needs post-update D, but D's update needs all the fakes first, and
        keeping K chunks of vjp residuals across that barrier is precisely
        the memory grad_accum exists to avoid).

        MUNIT_ACCUM_SHARED_FWD=1: ONE shared vjp forward per micro-batch
        serving both dis and gen grads (saves the phase-A forward). The
        gen adversarial terms are then evaluated against the PRE-update D
        — a documented deviation (docs/PARITY.md #12b) of the same class
        as the grad-accum BN-stats one; every non-adversarial term is
        unchanged."""
        dis_params = {"a": state["dis_a"], "b": state["dis_b"]}
        sg = jax.lax.stop_gradient

        def sem_targets_chunk(x_a, x_b, sem_gt_a, sem_gt_b):
            # per-chunk pseudo-labels: the frozen segmenter is per-sample,
            # so these equal the full-batch targets
            if self.semantic_w:
                return self._semantic_targets(x_a, x_b, sem_gt_a, sem_gt_b,
                                              has_sem_gt, frozen)
            return None, None

        xs_all = dict(x_a=x_a, x_b=x_b, mask_a=mask_a, mask_b=mask_b,
                      sem_gt_a=sem_gt_a, sem_gt_b=sem_gt_b,
                      s_a_d=s_a_d, s_b_d=s_b_d, s_a_g=s_a_g, s_b_g=s_b_g)

        if self.accum_shared_fwd:
            def shared_chunk(x_a, x_b, mask_a, mask_b, sem_gt_a, sem_gt_b,
                             s_a_d, s_b_d, s_a_g, s_b_g):
                sem_tgt_a, sem_tgt_b = sem_targets_chunk(
                    x_a, x_b, sem_gt_a, sem_gt_b)
                fw, pullback = jax.vjp(
                    lambda p: self._gen_forward(p, x_a, x_b, s_a_g, s_b_g,
                                                use_cyc), state["gen"])
                if self.guided == 1:
                    x_ba_d, x_ab_d = sg(fw["x_ba"]), sg(fw["x_ab"])
                else:
                    x_ba_d = sg(self.gen.decode(state["gen"], sg(fw["c_b"]),
                                                s_a_d, 1))
                    x_ab_d = sg(self.gen.decode(state["gen"], sg(fw["c_a"]),
                                                s_b_d, 2))
                grads_d, m_dis = jax.grad(self._dis_loss, has_aux=True)(
                    dis_params, x_ba_d, x_ab_d, x_a, x_b)

                def gen_loss(fw_):
                    # pre-update D: the chunk's vjp residuals cannot
                    # outlive the D update (see docstring)
                    return self._gen_loss_from_fw(
                        fw_, state, dis_params["a"], dis_params["b"], x_a,
                        x_b, mask_a, mask_b, s_a_g, s_b_g, sem_tgt_a,
                        sem_tgt_b, synth, has_sem_gt, use_cyc, frozen)

                fw_bar, m_gen = jax.grad(gen_loss, has_aux=True)(fw)
                (grads_g,) = pullback(fw_bar)
                return {"d": grads_d, "g": grads_g}, {**m_dis, **m_gen}

            # unrolled-first-chunk scheduling: the shared-fwd variant is a
            # pure throughput opt-in (84.3 vs 66.2 img/s at 256² K=2), not
            # the HBM lever — memory-tight configs use the exact path
            self._accum_unroll_first = True
            try:
                grads, metrics = self._accum_grads(shared_chunk, xs_all)
            finally:
                self._accum_unroll_first = False
            new_dis, new_dis_opt = self._opt_update(
                grads["d"], state["dis_opt"], dis_params, lr, extrapolate)
            new_gen, new_gen_opt = self._opt_update(
                grads["g"], state["gen_opt"], state["gen"], lr, extrapolate)
        else:
            # Phase A runs the FULL batch by default (r5): the dis loss is
            # a full-count mean (chunk-mean ≡ full-batch exactly) and the
            # inference forward keeps no residuals, so chunking it bought
            # no memory and multiplied the launch-latency-bound chain
            # count by K. Only phase B — the gen vjp, whose residuals ARE
            # the HBM pressure grad_accum exists to relieve — chunks.
            # accum_chunk_dis chunks phase A too, for configs where the
            # full-batch inference slabs are the last few hundred MB over
            # HBM (HD 512² K=2 — BENCH.md r5).
            def dis_chunk(x_a, x_b, s_a_d, s_b_d, **_unused):
                with ops.conv_quant(self.int8_dis_fakes):
                    *_, x_ba_d, x_ab_d = self._cross_decode(
                        state["gen"], x_a, x_b, s_a_d, s_b_d)
                return jax.grad(self._dis_loss, has_aux=True)(
                    dis_params, sg(x_ba_d), sg(x_ab_d), x_a, x_b)

            if self.accum_chunk_dis:
                grads_d, m_dis = self._accum_grads(dis_chunk, dict(
                    x_a=x_a, x_b=x_b, s_a_d=s_a_d, s_b_d=s_b_d))
            else:
                grads_d, m_dis = dis_chunk(x_a, x_b, s_a_d, s_b_d)
            new_dis, new_dis_opt = self._opt_update(
                grads_d, state["dis_opt"], dis_params, lr, extrapolate)

            def gen_chunk(x_a, x_b, mask_a, mask_b, sem_gt_a, sem_gt_b,
                          s_a_g, s_b_g, **_unused):
                sem_tgt_a, sem_tgt_b = sem_targets_chunk(
                    x_a, x_b, sem_gt_a, sem_gt_b)

                def loss_fn(gen_params):
                    fw = self._gen_forward(gen_params, x_a, x_b, s_a_g,
                                           s_b_g, use_cyc)
                    return self._gen_loss_from_fw(
                        fw, state, new_dis["a"], new_dis["b"], x_a, x_b,
                        mask_a, mask_b, s_a_g, s_b_g, sem_tgt_a, sem_tgt_b,
                        synth, has_sem_gt, use_cyc, frozen)

                return jax.grad(loss_fn, has_aux=True)(state["gen"])

            grads_g, m_gen = self._accum_grads(gen_chunk, xs_all)
            new_gen, new_gen_opt = self._opt_update(
                grads_g, state["gen_opt"], state["gen"], lr, extrapolate)
            metrics = {**m_dis, **m_gen}

        state["dis_a"], state["dis_b"] = new_dis["a"], new_dis["b"]
        state["dis_opt"] = new_dis_opt
        state["gen"] = new_gen
        state["gen_opt"] = new_gen_opt
        state["rng"] = rng
        return state, metrics

    def dis_gen_grads(self, x_a, x_b, mask_a=None, mask_b=None):
        """Pre-optimizer gradients of one fused dis+gen step — no state
        change. Parity/debug surface: sharded-vs-unsharded comparison of
        these trees is exact to float-summation tolerance, with no Adam
        m/√v normalization to amplify ~0 gradients into ±lr sign flips, so
        spatial-halo errors below 2·lr cannot hide behind the optimizer.
        Both losses are taken against the CURRENT discriminators (the real
        step updates D first; irrelevant for sharding parity). Guided mode
        only."""
        assert self.guided == 1, "dis_gen_grads supports guided mode only"
        z_img = jnp.zeros_like(x_a[..., :1])
        mask_a = mask_a if mask_a is not None else z_img
        mask_b = mask_b if mask_b is not None else z_img
        use_cyc = self.hw["recon_x_cyc_w"] > 0

        def run(state, frozen, x_a, x_b, mask_a, mask_b):
            bsz = x_a.shape[0]
            rng_mid, _, _ = jax.random.split(state["rng"], 3)
            _, g1, g2 = jax.random.split(rng_mid, 3)
            s_a_g = jax.random.normal(g1, (bsz, self.style_dim), x_a.dtype)
            s_b_g = jax.random.normal(g2, (bsz, self.style_dim), x_b.dtype)
            sem_tgt_a = sem_tgt_b = None
            if self.semantic_w:
                z_sem = jnp.zeros(x_a.shape[:3], jnp.int32)
                sem_tgt_a, sem_tgt_b = self._semantic_targets(
                    x_a, x_b, z_sem, z_sem, False, frozen)
            fw, pullback = jax.vjp(
                lambda p: self._gen_forward(p, x_a, x_b, s_a_g, s_b_g,
                                            use_cyc), state["gen"])
            sg = jax.lax.stop_gradient
            dis_params = {"a": state["dis_a"], "b": state["dis_b"]}
            grads_d, _ = jax.grad(self._dis_loss, has_aux=True)(
                dis_params, sg(fw["x_ba"]), sg(fw["x_ab"]), x_a, x_b)

            def gen_loss(fw_):
                return self._gen_loss_from_fw(
                    fw_, state, dis_params["a"], dis_params["b"], x_a, x_b,
                    mask_a, mask_b, s_a_g, s_b_g, sem_tgt_a, sem_tgt_b,
                    False, False, use_cyc, frozen)

            fw_bar, _ = jax.grad(gen_loss, has_aux=True)(fw)
            (gen_grads,) = pullback(fw_bar)
            return grads_d, gen_grads

        return jax.jit(run)(self.state, self.frozen, x_a, x_b, mask_a,
                            mask_b)

    def _gen_step_impl(self, state, frozen, x_a, x_b, mask_a, mask_b,
                       sem_gt_a, sem_gt_b, lr, extrapolate, synth: bool,
                       has_sem_gt: bool):
        conf = self.conf
        hw = self.hw
        rng, k1, k2 = jax.random.split(state["rng"], 3)
        bsz = x_a.shape[0]
        s_a = jax.random.normal(k1, (bsz, self.style_dim), x_a.dtype)
        s_b = jax.random.normal(k2, (bsz, self.style_dim), x_b.dtype)
        use_cyc = hw["recon_x_cyc_w"] > 0

        def chunk_grads(x_a, x_b, mask_a, mask_b, sem_gt_a, sem_gt_b,
                        s_a, s_b):
            if self.semantic_w:
                # per-chunk pseudo-labels: the frozen segmenter is
                # per-sample, so these equal the full-batch targets
                sem_tgt_a, sem_tgt_b = self._semantic_targets(
                    x_a, x_b, sem_gt_a, sem_gt_b, has_sem_gt, frozen)
            else:
                sem_tgt_a = sem_tgt_b = None

            def loss_fn(gen_params):
                fw = self._gen_forward(gen_params, x_a, x_b, s_a, s_b,
                                       use_cyc)
                return self._gen_loss_from_fw(
                    fw, state, state["dis_a"], state["dis_b"], x_a, x_b,
                    mask_a, mask_b, s_a, s_b, sem_tgt_a, sem_tgt_b, synth,
                    has_sem_gt, use_cyc, frozen)

            return jax.grad(loss_fn, has_aux=True)(state["gen"])

        if self.grad_accum > 1:
            grads, metrics = self._accum_grads(chunk_grads, dict(
                x_a=x_a, x_b=x_b, mask_a=mask_a, mask_b=mask_b,
                sem_gt_a=sem_gt_a, sem_gt_b=sem_gt_b, s_a=s_a, s_b=s_b))
        else:
            grads, metrics = chunk_grads(x_a, x_b, mask_a, mask_b, sem_gt_a,
                                         sem_gt_b, s_a, s_b)
        new_gen, new_opt = self._opt_update(
            grads, state["gen_opt"], state["gen"], lr, extrapolate)
        state["gen"] = new_gen
        state["gen_opt"] = new_opt
        state["rng"] = rng
        return state, metrics

    def _gen_loss_from_fw(self, fw, state, dis_a, dis_b, x_a, x_b, mask_a,
                          mask_b, s_a, s_b, sem_tgt_a, sem_tgt_b,
                          synth: bool, has_sem_gt: bool, use_cyc: bool,
                          frozen=None):
        """gen_update loss assembly (reference trainer.py:336-616) over a
        precomputed generator forward ``fw``. Discriminator params are passed
        explicitly so the fused dis+gen step can evaluate the adversarial
        terms against the freshly-updated discriminators (the reference runs
        dis_update before gen_update at the same iteration)."""
        hw = self.hw
        c_a, c_b = fw["c_a"], fw["c_b"]
        s_a_p, s_b_p = fw["s_a_p"], fw["s_b_p"]
        x_a_recon, x_b_recon = fw["x_a_recon"], fw["x_b_recon"]
        x_ba, x_ab = fw["x_ba"], fw["x_ab"]
        c_a_recon, c_b_recon = fw["c_a_recon"], fw["c_b_recon"]
        s_a_recon, s_b_recon = fw["s_a_recon"], fw["s_b_recon"]

        m = {}
        m["loss_gen_recon_x_a"] = losses.recon_l1(x_a_recon, x_a)
        m["loss_gen_recon_x_b"] = losses.recon_l1(x_b_recon, x_b)
        if self.guided == 1:
            m["loss_gen_recon_s_a"] = losses.recon_l1(s_a_recon, s_a_p)
            m["loss_gen_recon_s_b"] = losses.recon_l1(s_b_recon, s_b_p)
        else:
            m["loss_gen_recon_s_a"] = losses.recon_l1(s_a_recon, s_a)
            m["loss_gen_recon_s_b"] = losses.recon_l1(s_b_recon, s_b)
        m["loss_gen_recon_c_a"] = losses.recon_l1(c_a_recon, c_a)
        m["loss_gen_recon_c_b"] = losses.recon_l1(c_b_recon, c_b)

        if use_cyc:
            x_aba, x_bab = fw["x_aba"], fw["x_bab"]
            if self.recon_mask:
                m["loss_gen_cycrecon_x_a"] = losses.recon_l1_masked(
                    x_aba, x_a, mask_a)
                m["loss_gen_cycrecon_x_b"] = losses.recon_l1_masked(
                    x_bab, x_b, mask_b)
            else:
                m["loss_gen_cycrecon_x_a"] = losses.recon_l1(x_aba, x_a)
                m["loss_gen_cycrecon_x_b"] = losses.recon_l1(x_bab, x_b)
        else:
            m["loss_gen_cycrecon_x_a"] = jnp.zeros(())
            m["loss_gen_cycrecon_x_b"] = jnp.zeros(())

        # synthetic-pair alignment loss (trainer.py:452-464): L1 on the
        # pixel-aligned region of the Unity pair
        if synth:
            aligned = (jnp.sum(jnp.abs(x_a - x_b), axis=-1, keepdims=True)
                       == 0).astype(x_a.dtype)
            m["loss_gen_recon_synth"] = (
                losses.recon_l1_masked(x_ab, x_b, 1.0 - aligned) +
                losses.recon_l1_masked(x_ba, x_a, 1.0 - aligned))
        else:
            m["loss_gen_recon_synth"] = jnp.zeros(())

        if self.wide >= 2:
            outs_ba, outs_ab = self._dis_apply_stacked(
                dis_a, dis_b, x_ba, x_ab)
            m["loss_gen_adv_a"] = losses.gen_gan_loss(outs_ba,
                                                      self.gan_type)
            m["loss_gen_adv_b"] = losses.gen_gan_loss(outs_ab,
                                                      self.gan_type)
        else:
            m["loss_gen_adv_a"] = losses.gen_gan_loss(
                self._dis_apply(dis_a, x_ba), self.gan_type)
            m["loss_gen_adv_b"] = losses.gen_gan_loss(
                self._dis_apply(dis_b, x_ab), self.gan_type)

        if hw["vgg_w"] > 0:
            from munit_tpu.nn.vgg import Vgg16, vgg_preprocess
            vgg = Vgg16()
            vgg_params = (frozen if frozen is not None
                          else self.frozen)["vgg"]
            feats = lambda img: vgg.apply(
                {"params": vgg_params}, vgg_preprocess(img))
            m["loss_gen_vgg_a"] = losses.vgg_perceptual_loss(
                feats(x_ba), feats(x_b))
            m["loss_gen_vgg_b"] = losses.vgg_perceptual_loss(
                feats(x_ab), feats(x_a))
        else:
            m["loss_gen_vgg_a"] = jnp.zeros(())
            m["loss_gen_vgg_b"] = jnp.zeros(())

        if self.semantic_w:
            m["loss_sem_seg"] = self._semantic_loss_pair(
                x_ab, sem_tgt_a, mask_a, x_ba, sem_tgt_b, mask_b,
                has_sem_gt, frozen)
        else:
            m["loss_sem_seg"] = jnp.zeros(())

        if self.domain_adv_w:
            # anonymize content codes (minimize=False; trainer.py:511-519)
            out_a, _ = self._dann_apply(state["dann"],
                                        state["dann_stats"], c_a)
            out_b, _ = self._dann_apply(state["dann"],
                                        state["dann_stats"], c_b)
            m["domain_adv_loss_gen"] = losses.domain_adv_loss(
                out_a, out_b, minimize=False)
        else:
            m["domain_adv_loss_gen"] = jnp.zeros(())

        if hw["adv_lambda"] > 0:
            out_a, _ = self._dann_apply(state["classifier_sr_a"],
                                        state["classifier_sr_a_stats"], c_a)
            out_b, _ = self._dann_apply(state["classifier_sr_b"],
                                        state["classifier_sr_b_stats"], c_b)
            m["loss_classifier_adv_sr"] = losses.classifier_sr_loss(
                out_a, out_b, domain_synth=synth, fool=True)
        else:
            m["loss_classifier_adv_sr"] = jnp.zeros(())

        if hw["output_adv_lambda"] > 0:
            m["loss_output_classifier_adv_sr"] = (
                losses.gen_sr_loss(self._dis_apply(
                    state["output_classifier_sr_a"], x_ba)) +
                losses.gen_sr_loss(self._dis_apply(
                    state["output_classifier_sr_b"], x_ab)))
        else:
            m["loss_output_classifier_adv_sr"] = jnp.zeros(())

        total = (hw["gan_w"] * (m["loss_gen_adv_a"] + m["loss_gen_adv_b"])
                 + hw["recon_x_w"] * (m["loss_gen_recon_x_a"]
                                      + m["loss_gen_recon_x_b"])
                 + hw["recon_s_w"] * (m["loss_gen_recon_s_a"]
                                      + m["loss_gen_recon_s_b"])
                 + hw["recon_c_w"] * (m["loss_gen_recon_c_a"]
                                      + m["loss_gen_recon_c_b"])
                 + hw["recon_x_cyc_w"] * (m["loss_gen_cycrecon_x_a"]
                                          + m["loss_gen_cycrecon_x_b"])
                 + hw["vgg_w"] * (m["loss_gen_vgg_a"]
                                  + m["loss_gen_vgg_b"])
                 + hw["semantic_w"] * m["loss_sem_seg"]
                 + hw["domain_adv_w"] * m["domain_adv_loss_gen"]
                 + hw["recon_synth_w"] * m["loss_gen_recon_synth"]
                 + hw["adv_lambda"] * m["loss_classifier_adv_sr"]
                 + hw["output_adv_lambda"]
                 * m["loss_output_classifier_adv_sr"])
        m["loss_gen_total"] = total
        return total, m

    # --- aux classifiers ----------------------------------------------------

    def _dann_step_impl(self, state, x_a, x_b, lr, extrapolate):
        """Train the A/B domain classifier to classify content codes."""
        c_a, _ = self.gen.encode(state["gen"], x_a, 1)
        c_b, _ = self.gen.encode(state["gen"], x_b, 2)
        c_a = jax.lax.stop_gradient(c_a)
        c_b = jax.lax.stop_gradient(c_b)

        def loss_fn(params):
            out_a, stats_a = self._dann_apply(params, state["dann_stats"], c_a)
            out_b, stats_b = self._dann_apply(params, stats_a, c_b)
            loss = losses.domain_adv_loss(out_a, out_b, minimize=True)
            return loss, (loss, stats_b, out_a, out_b)

        grads, (loss, new_stats, out_a, out_b) = jax.grad(
            loss_fn, has_aux=True)(state["dann"])
        new_params, new_opt = self._opt_update(
            grads, state["dann_opt"], state["dann"], lr, extrapolate)
        state["dann"] = new_params
        state["dann_stats"] = new_stats
        state["dann_opt"] = new_opt
        metrics = {"domain_class_loss": loss,
                   "prob_a_as_a": jax.nn.sigmoid(out_a[0, 0]),
                   "prob_b_as_b": jax.nn.sigmoid(out_b[0, 0])}
        return state, metrics

    def _classifier_sr_step_impl(self, state, x_a, x_b, lamb, lr, extrapolate,
                                 domain_synth: bool):
        # Only the content codes feed the classifier loss (the style-encode
        # half of encode() is dead and DCE'd); content_encode_pair runs the
        # two encoders as one chain (stacked under MUNIT_CLS_STACKED=1 A/B).
        stacked = _os.environ.get("MUNIT_CLS_STACKED", "0") == "1"
        c_a, c_b = self.gen.content_encode_pair(state["gen"], x_a, x_b,
                                                stacked)
        c_a = jax.lax.stop_gradient(c_a)   # ≙ .detach() trainer.py:1258
        c_b = jax.lax.stop_gradient(c_b)

        def loss_fn(params):
            out_a, sa = self._dann_apply(params["a"],
                                         state["classifier_sr_a_stats"], c_a)
            out_b, sb = self._dann_apply(params["b"],
                                         state["classifier_sr_b_stats"], c_b)
            loss = lamb * losses.classifier_sr_loss(
                out_a, out_b, domain_synth=domain_synth, fool=False)
            return loss, (sa, sb, loss)

        params = {"a": state["classifier_sr_a"], "b": state["classifier_sr_b"]}
        grads, (sa, sb, loss) = jax.grad(loss_fn, has_aux=True)(params)
        new_params, new_opt = self._opt_update(
            grads, state["classif_sr_opt"], params, lr, extrapolate)
        state["classifier_sr_a"] = new_params["a"]
        state["classifier_sr_b"] = new_params["b"]
        state["classifier_sr_a_stats"] = sa
        state["classifier_sr_b_stats"] = sb
        state["classif_sr_opt"] = new_opt
        return state, {"loss_classifier_sr": loss}

    def _output_classifier_sr_step_impl(self, state, x_ar, x_as, x_br, x_bs,
                                        lamb, lr):
        def loss_fn(params):
            loss = lamb * (
                losses.dis_sr_loss(self._dis_apply(params["b"], x_bs),
                                   self._dis_apply(params["b"], x_br)) +
                losses.dis_sr_loss(self._dis_apply(params["a"], x_as),
                                   self._dis_apply(params["a"], x_ar)))
            return loss, loss

        params = {"a": state["output_classifier_sr_a"],
                  "b": state["output_classifier_sr_b"]}
        grads, loss = jax.grad(loss_fn, has_aux=True)(params)
        # plain .step() in the reference (trainer.py:1279) — no extrapolation
        new_params, new_opt = self._opt_update(
            grads, state["output_classif_sr_opt"], params, lr, False)
        state["output_classifier_sr_a"] = new_params["a"]
        state["output_classifier_sr_b"] = new_params["b"]
        state["output_classif_sr_opt"] = new_opt
        return state, {"loss_output_classifier_sr": loss}

    def _seg_head_step_impl(self, state, x_a, x_b, target_a, target_b, lamb,
                            lr, extrapolate):
        c_a, _ = self.gen.encode(state["gen"], x_a, 1)
        c_b, _ = self.gen.encode(state["gen"], x_b, 2)
        c_a = jax.lax.stop_gradient(c_a)
        c_b = jax.lax.stop_gradient(c_b)

        def head(params, stats, c):
            out, updates = self.seg_head_def.apply(
                {"params": params, "batch_stats": stats}, c,
                mutable=["batch_stats"])
            return ops.resize_bilinear(out, (self.crop, self.crop)), \
                updates["batch_stats"]

        def loss_fn(params):
            out_a, sa = head(params, state["seg_head_stats"], c_a)
            out_b, sb = head(params, sa, c_b)
            loss = lamb * (
                losses.cross_entropy_loss(out_a, target_a.astype(jnp.int32)) +
                losses.cross_entropy_loss(out_b, target_b.astype(jnp.int32)))
            return loss, (sb, loss)

        grads, (new_stats, loss) = jax.grad(loss_fn, has_aux=True)(
            state["seg_head"])
        new_params, new_opt = self._opt_update(
            grads, state["seg_opt"], state["seg_head"], lr, extrapolate)
        state["seg_head"] = new_params
        state["seg_head_stats"] = new_stats
        state["seg_opt"] = new_opt
        return state, {"loss_semantic_head": loss}

    # ------------------------------------------------------------- driving

    def _phase(self):
        """ExtraAdam parity: even iteration → extrapolation (trainer.py:229).

        Returns a PYTHON bool: each step jit specializes on the phase
        (static_argnames), so the compiled update emits only the taken
        branch and, on update phases, aliases the untouched params_copy
        instead of rewriting it (two compiles per step, both cached)."""
        return bool(self.use_extra and (self.iterations % 2 == 0))

    def _lr(self):
        return jnp.asarray(self.lr_schedule(self.iterations), jnp.float32)

    def dis_update(self, x_a, x_b):
        lr = self._lr()
        self.state, metrics = self._dis_step(self.state, x_a, x_b,
                                             lr, self._phase())
        # Observability addition over the reference (which never logs lr):
        # the effective StepLR value in effect for this iteration.
        metrics = dict(metrics, lr=lr)
        return metrics

    def gen_update(self, x_a, x_b, mask_a=None, mask_b=None, synth=False,
                   sem_gt_a=None, sem_gt_b=None):
        z_img = jnp.zeros_like(x_a[..., :1])
        z_sem = jnp.zeros(x_a.shape[:3], jnp.int32)
        has_gt = sem_gt_a is not None
        self.state, metrics = self._gen_step(
            self.state, self.frozen, x_a, x_b,
            mask_a if mask_a is not None else z_img,
            mask_b if mask_b is not None else z_img,
            sem_gt_a if has_gt else z_sem,
            sem_gt_b if has_gt else z_sem,
            self._lr(), self._phase(), synth=bool(synth),
            has_sem_gt=bool(has_gt))
        return metrics

    def dis_gen_update(self, x_a, x_b, mask_a=None, mask_b=None,
                       synth=False, sem_gt_a=None, sem_gt_b=None):
        """Fused dis_update + gen_update (one shared generator forward,
        reference-ordered). Returns merged metrics of both updates.

        With ``grad_accum > 1`` the step runs its two chunked-accumulation
        phases (``_dis_gen_step_accum``): exact vs the unfused pair, one
        micro-batch of autodiff residuals live at a time."""
        lr = self._lr()
        z_img = jnp.zeros_like(x_a[..., :1])
        z_sem = jnp.zeros(x_a.shape[:3], jnp.int32)
        has_gt = sem_gt_a is not None
        self.state, metrics = self._dis_gen_step(
            self.state, self.frozen, x_a, x_b,
            mask_a if mask_a is not None else z_img,
            mask_b if mask_b is not None else z_img,
            sem_gt_a if has_gt else z_sem,
            sem_gt_b if has_gt else z_sem,
            lr, self._phase(), synth=bool(synth), has_sem_gt=bool(has_gt))
        return dict(metrics, lr=lr)

    def domain_classifier_update(self, x_a, x_b):
        self.state, metrics = self._dann_step(self.state, x_a, x_b,
                                              self._lr(), self._phase())
        return metrics

    def domain_classifier_sr_update(self, x_a, x_b, domain_synth, lamb):
        self.state, metrics = self._classifier_sr_step(
            self.state, x_a, x_b, jnp.asarray(lamb, jnp.float32), self._lr(),
            self._phase(), domain_synth=bool(domain_synth))
        return metrics

    def output_domain_classifier_sr_update(self, x_ar, x_as, x_br, x_bs):
        lamb = self.conf["adaptation"]["output_classifier_lambda"]
        self.state, metrics = self._output_classifier_sr_step(
            self.state, x_ar, x_as, x_br, x_bs,
            jnp.asarray(lamb, jnp.float32), self._lr())
        return metrics

    def segmentation_head_update(self, x_a, x_b, target_a, target_b):
        lamb = self.conf["adaptation"]["sem_seg_lambda"]
        self.state, metrics = self._seg_head_step(
            self.state, x_a, x_b, target_a, target_b,
            jnp.asarray(lamb, jnp.float32), self._lr(), self._phase())
        return metrics

    # ------------------------------------------------------------ sampling

    def forward(self, x_a, x_b):
        """Translation with the fixed display styles (MUNIT_Trainer.forward,
        trainer.py:307-334): returns (x_ab, x_ba)."""
        gen_params = self.state["gen"]
        c_a, s_a_fake = self.gen.encode(gen_params, x_a, 1)
        c_b, s_b_fake = self.gen.encode(gen_params, x_b, 2)
        n = x_a.shape[0]
        s_a = self.state["display_s_a"][:n]
        s_b = self.state["display_s_b"][:n]
        x_ba = self.gen.decode(gen_params, c_b, s_a, 1)
        x_ab = self.gen.decode(gen_params, c_a, s_b, 2)
        return x_ab, x_ba

    def sample_fid(self, x_a, x_b):
        """Guided a→b translation with style from the paired b image
        (trainer.py:1087-1131), batched instead of the reference's
        per-image python loop."""
        gen_params = self.state["gen"]
        c_a, _ = self.gen.encode(gen_params, x_a, 1)
        _, s_b = self.gen.encode(gen_params, x_b, 2)
        return self.gen.decode(gen_params, c_a, s_b, 2)

    def sample(self, x_a, x_b, rng=None):
        """Visualization columns (trainer.py:773-928, guided flavor):
        (x, recon, x_ab1, x_ab2) per direction. Random-style variants use a
        fresh rng when guided == 0."""
        gen_params = self.state["gen"]
        gen = self.gen
        c_a, s_a_p = gen.encode(gen_params, x_a, 1)
        c_b, s_b_p = gen.encode(gen_params, x_b, 2)
        x_a_recon = gen.decode(gen_params, c_a, s_a_p, 1)
        x_b_recon = gen.decode(gen_params, c_b, s_b_p, 2)
        if self.guided == 1:
            x_ab1 = x_ab2 = gen.decode(gen_params, c_a, s_b_p, 2)
            x_ba1 = x_ba2 = gen.decode(gen_params, c_b, s_a_p, 1)
        else:
            n = x_a.shape[0]
            s_a1 = self.state["display_s_a"][:n]
            s_b1 = self.state["display_s_b"][:n]
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            k1, k2 = jax.random.split(rng)
            s_a2 = jax.random.normal(k1, (n, self.style_dim))
            s_b2 = jax.random.normal(k2, (n, self.style_dim))
            x_ab1 = gen.decode(gen_params, c_a, s_b1, 2)
            x_ab2 = gen.decode(gen_params, c_a, s_b2, 2)
            x_ba1 = gen.decode(gen_params, c_b, s_a1, 1)
            x_ba2 = gen.decode(gen_params, c_b, s_a2, 1)
        if self.semantic_w and "seg" in self.frozen:
            # 12-column layout with Cityscapes seg overlays
            # (trainer.py:854-928): per direction (x, recon, seg(x), xy1,
            # seg(xy1), xy2). Overlays are [0,1] RGB like the reference's
            # ToTensor'd colormaps.
            from munit_tpu.eval.segmap import decode_segmap
            import numpy as np

            def overlay(img):
                labels = np.asarray(jnp.argmax(self._segment(img), axis=-1))
                rgb = np.stack([decode_segmap(l) for l in labels])
                return jnp.asarray(rgb.astype(np.float32) / 255.0)

            return (x_a, x_a_recon, overlay(x_a), x_ab1, overlay(x_ab1),
                    x_ab2, x_b, x_b_recon, overlay(x_b), x_ba1,
                    overlay(x_ba1), x_ba2)
        return (x_a, x_a_recon, x_ab1, x_ab2, x_b, x_b_recon, x_ba1, x_ba2)

    def update_learning_rate(self):
        """No-op kept for reference-API parity: lr is a pure function of
        ``self.iterations``, which the training loop sets to the 0-based
        iteration index (train.py:157,327-328 semantics — during iteration
        ``it``, ``trainer.iterations == it``; StepLR stepped it+1 times gives
        lr0 * gamma^((it + 1) // step_size), torch-pinned in
        tests/test_optim.py)."""
