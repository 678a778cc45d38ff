from munit_tpu.utils.logging import MetricLogger, Timer  # noqa: F401
from munit_tpu.utils.misc import (prepare_sub_folder, get_model_list,  # noqa: F401
                                  eformat)
