from munit_tpu.train.trainer import MUNITTrainer, GenBundle  # noqa: F401
