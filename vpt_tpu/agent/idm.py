"""IDMAgent: inverse-dynamics model wrapper (reference: inverse_dynamics_model.py).

Labels video frames with the actions the player took.  Frames are processed in
fixed windows (default 128) through the bidirectional IDM; the whole window is
one jitted forward — embarrassingly batch-parallel, which is exactly the axis
the TPU runtime scales (stack windows on the batch dim and/or shard them over
the mesh for labeling throughput).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.actions import ActionTransformer, IDMActionMapping
from vpt_tpu.checkpoint import load_weights, state_dict_to_variables
from vpt_tpu.config import ACTION_TRANSFORMER_KWARGS, AGENT_RESOLUTION, PolicyConfig
from vpt_tpu.models.heads import dict_sample, head_specs_from_space
from vpt_tpu.models.policy import InverseActionPolicy, policy_initial_state
from vpt_tpu.ops.resize import resize_image
from vpt_tpu.spaces import DictType


class IDMAgent:
    """Predicts the actions a human took in a video (reference:
    inverse_dynamics_model.py:21-95)."""

    def __init__(
        self,
        idm_net_kwargs: Dict[str, Any],
        pi_head_kwargs: Dict[str, Any],
        device=None,  # API compat
        compute_dtype: str = "float32",
        params_dtype: str = "float32",
    ):
        self.params_dtype = params_dtype
        self.action_mapper = IDMActionMapping(n_camera_bins=11)
        self.action_transformer = ActionTransformer(**ACTION_TRANSFORMER_KWARGS)
        self.cfg = PolicyConfig.from_kwargs(dict(idm_net_kwargs)).replace(
            compute_dtype=compute_dtype
        )
        self.temperature = float(pi_head_kwargs.get("temperature", 1.0))
        space = DictType(**self.action_mapper.get_action_space_update())
        self.head_specs = head_specs_from_space(space)
        self.policy = InverseActionPolicy(
            cfg=self.cfg, head_specs=self.head_specs, temperature=self.temperature
        )
        self.variables = None
        self.hidden_state = policy_initial_state(self.cfg, 1)
        self._forward = self._build_forward()

    def _build_forward(self):
        policy, specs = self.policy, self.head_specs

        def forward(variables, img, first, state):
            out, state = policy.apply(variables, img, first, state)
            # deterministic argmax decode (reference: policy.py:448-458 with
            # deterministic=True)
            action = dict_sample(jax.random.PRNGKey(0), out["pi_logits"], specs, deterministic=True)
            return action, out["pi_logits"], state

        return jax.jit(forward)

    def _ensure_variables(self, t: int = 2):
        if self.variables is None:
            img = jnp.zeros((1, t) + tuple(self.cfg.img_shape), jnp.uint8)
            state = policy_initial_state(self.cfg, 1)
            self.variables = jax.jit(self.policy.init)(
                jax.random.PRNGKey(0), img, jnp.zeros((1, t), bool), state
            )

    def load_weights(self, path: str) -> None:
        self._ensure_variables()
        sd = load_weights(path)
        self.variables, report = state_dict_to_variables(sd, variables=self.variables)
        from vpt_tpu.checkpoint import cast_params

        self.variables = cast_params(self.variables, self.params_dtype)
        if report["unexpected"] or report["shape_mismatch"]:
            print(
                f"[vpt_tpu] load_weights: ignored {len(report['unexpected'])} unexpected keys, "
                f"{len(report['shape_mismatch'])} shape mismatches"
            )
        self.reset()

    def reset(self) -> None:
        self.hidden_state = policy_initial_state(self.cfg, 1)

    def _video_obs_to_agent(self, video_frames) -> np.ndarray:
        imgs = [resize_image(frame, (self.cfg.img_shape[1], self.cfg.img_shape[0])) for frame in video_frames]
        return np.stack(imgs)[None]  # (1, N, 128, 128, 3)

    def _agent_action_to_env(self, agent_action) -> Dict[str, np.ndarray]:
        action = {
            "buttons": np.asarray(agent_action["buttons"]),
            "camera": np.asarray(agent_action["camera"]),
        }
        factored = self.action_mapper.to_factored(action)
        return self.action_transformer.policy2env(factored)

    def predict_actions(self, video_frames: np.ndarray) -> Dict[str, np.ndarray]:
        """Predict actions for (N, H, W, C) frames → MineRL action dict with
        (1, N) leading dims (reference: inverse_dynamics_model.py:74-95)."""
        self._ensure_variables()
        img = self._video_obs_to_agent(video_frames)
        first = np.zeros((1, img.shape[1]), bool)
        action, _, self.hidden_state = self._forward(
            self.variables, jnp.asarray(img), jnp.asarray(first), self.hidden_state
        )
        return self._agent_action_to_env(jax.tree.map(np.asarray, action))
