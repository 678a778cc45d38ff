from munit_tpu.kernels.norms import (  # noqa: F401
    instance_norm_fused, adain_fused, whole_layer_norm_fused,
    pallas_available,
)
