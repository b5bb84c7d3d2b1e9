"""Device-side decode of sampled joint actions to the factored env space.

The host decode path (CameraHierarchicalMapping.to_factored →
ActionTransformer.policy2env) is two table gathers + mu-law expansion — pure
elementwise math that can run inside the jitted step, so the device returns
ONE env-ready array instead of two index arrays.  That halves the
device→host transfers per step (each costs a full RTT on remote-attached
TPUs) and removes the host decode from the rollout critical path.

Output layout: (B, 22) float32 — columns [0:20] the Buttons.ALL binary
vector, columns [20:22] the camera (pitch, yaw) in degrees.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from vpt_tpu.actions.buttons import Buttons
from vpt_tpu.actions.mapping import CameraHierarchicalMapping
from vpt_tpu.actions.quantizer import CameraQuantizer


class DeviceActionDecoder:
    """Precomputes the joint→factored tables as device constants."""

    def __init__(self, mapper: CameraHierarchicalMapping, quantizer: CameraQuantizer):
        self.mapper = mapper
        self.quantizer = quantizer
        self._buttons_table = jnp.asarray(mapper.BUTTON_IDX_TO_FACTORED, jnp.float32)
        self._camera_off = jnp.asarray(mapper.BUTTON_IDX_TO_CAMERA_META_OFF)
        self._camera_table = jnp.asarray(mapper.CAMERA_IDX_TO_FACTORED, jnp.int32)
        self._null_bin = mapper.camera_null_bin

    def decode(self, buttons_joint: jnp.ndarray, camera_joint: jnp.ndarray) -> jnp.ndarray:
        """(B,) joint indices → (B, 22) [20 buttons, camera dy, camera dx]°.

        jit-compatible; exactly mirrors to_factored + policy2env
        (vpt_tpu/actions/mapping.py + quantizer undiscretize).
        """
        buttons = self._buttons_table[buttons_joint]  # (B, 20)
        cam_bins = self._camera_table[camera_joint]  # (B, 2)
        off = self._camera_off[buttons_joint][:, None]  # (B, 1) camera meta off
        cam_bins = jnp.where(off, self._null_bin, cam_bins)
        cam_deg = self.quantizer.undiscretize(cam_bins.astype(jnp.float32), xp=jnp)
        return jnp.concatenate([buttons, cam_deg.astype(jnp.float32)], axis=1)


def env_action_from_decoded(decoded: np.ndarray) -> Dict[str, np.ndarray]:
    """(B, 22) device output → the env-format dict (host-side assembly only)."""
    out = {name: decoded[:, i].astype(np.int64) for i, name in enumerate(Buttons.ALL)}
    out["camera"] = decoded[:, 20:22].astype(np.float64)
    return out
