"""munit_tpu — TPU-native multimodal unsupervised image-to-image translation.

A from-scratch JAX/Flax/optax/Pallas framework with the capabilities of the
ClimateChangeAI MUNIT fork (reference: /root/reference): guided (exemplar-style)
translation, dual-content-encoder generators with a shared style encoder, masked
cycle consistency, semantic-consistency training against a frozen segmenter,
sim→real domain adaptation, ExtraAdam extragradient optimization, and FID/IS/CIS
evaluation — redesigned TPU-first:

- NHWC layouts, bf16-capable convs on the MXU, functional AdaIN (no module
  mutation — the reference mutates decoder state at networks.py:223-239).
- Single jitted train steps with donated state; cadence logic stays in Python.
- Data parallelism via ``jax.sharding.Mesh`` + NamedSharding with gradient
  ``psum`` compiled onto ICI; no explicit communication backend.
- Pallas kernels for the norm-heavy hot ops where XLA under-fuses.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import munit_tpu` light)."""
    top = {
        "MUNITTrainer": ("munit_tpu.train", "MUNITTrainer"),
        "GenBundle": ("munit_tpu.train", "GenBundle"),
        "get_config": ("munit_tpu.config", "get_config"),
        "make_mesh": ("munit_tpu.dist", "make_mesh"),
        "TranslationService": ("munit_tpu.serve", "TranslationService"),
    }
    if name in top:
        import importlib
        mod, attr = top[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'munit_tpu' has no attribute '{name}'")
