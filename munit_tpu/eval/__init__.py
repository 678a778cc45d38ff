from munit_tpu.eval.fid import (  # noqa: F401
    sqrt_newton_schulz, frechet_distance, compute_fid_from_pools,
    prepare_inception_metrics,
)
from munit_tpu.eval.scores import inception_score, conditional_inception_score  # noqa: F401
from munit_tpu.eval.slerp import slerp, get_slerp_interp  # noqa: F401
from munit_tpu.eval.kid import kid  # noqa: F401
from munit_tpu.eval.sample import make_grid, write_2images  # noqa: F401
