from vsr_tpu.convert.torch_sttn import (
    convert_sttn_state_dict,
    load_sttn_checkpoint,
)
from vsr_tpu.convert.params_io import load_params, save_params

__all__ = [
    "convert_sttn_state_dict",
    "load_sttn_checkpoint",
    "load_params",
    "save_params",
]
