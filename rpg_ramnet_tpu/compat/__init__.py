from .torch_import import (
    state_dict_to_params, params_to_state_dict,
    load_torch_checkpoint, load_params_from_checkpoint,
)

__all__ = [
    "state_dict_to_params", "params_to_state_dict",
    "load_torch_checkpoint", "load_params_from_checkpoint",
]
