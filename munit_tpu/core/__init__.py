from munit_tpu.core import ops, init  # noqa: F401
