from munit_tpu.optim.extra_adam import ExtraAdamState, extra_adam_init, extra_adam_update, adam  # noqa: F401
from munit_tpu.optim.schedule import step_lr  # noqa: F401
