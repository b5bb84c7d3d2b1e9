from vpt_tpu.actions.buttons import Buttons, SyntheticButtons
from vpt_tpu.actions.quantizer import CameraQuantizer, QuantizationScheme
from vpt_tpu.actions.transformer import ActionTransformer
from vpt_tpu.actions.mapping import (
    ActionMapping,
    CameraHierarchicalMapping,
    IDMActionMapping,
)
from vpt_tpu.actions.json_actions import (
    CAMERA_SCALER,
    KEYBOARD_BUTTON_MAPPING,
    NOOP_ACTION,
    json_action_to_env_action,
)

__all__ = [
    "Buttons",
    "SyntheticButtons",
    "CameraQuantizer",
    "QuantizationScheme",
    "ActionTransformer",
    "ActionMapping",
    "CameraHierarchicalMapping",
    "IDMActionMapping",
    "CAMERA_SCALER",
    "KEYBOARD_BUTTON_MAPPING",
    "NOOP_ACTION",
    "json_action_to_env_action",
]
