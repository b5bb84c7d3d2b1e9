from vpt_tpu.checkpoint.torch_import import (
    cast_params,
    load_model_parameters,
    save_model_parameters,
    load_weights,
    state_dict_to_variables,
    variables_to_state_dict,
    save_weights,
)

__all__ = [
    "cast_params",
    "load_model_parameters",
    "save_model_parameters",
    "load_weights",
    "state_dict_to_variables",
    "variables_to_state_dict",
    "save_weights",
]
