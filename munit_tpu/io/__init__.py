from munit_tpu.io.torch_import import (  # noqa: F401
    convert_gen_state_dict, convert_dis_state_dict, load_torch_checkpoint,
)
