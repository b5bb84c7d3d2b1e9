"""MineRLAgent: env-facing wrapper around the policy (reference: agent.py).

TPU-native runtime design: the per-frame hot loop is ONE jitted step function
whose carry is (recurrent state, PRNG key); the host only resizes the frame
(cv2-bit-exact fixed-point numpy / native C++), ships uint8 bytes to the
device, and decodes the sampled joint action indices back through the
precomputed mapping tables.  The same step function serves 1 env or a batch
of N parallel env streams (the KV caches simply gain a leading batch dim) —
the batched-rollout runtime of BASELINE.json config #5.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.actions import ActionTransformer, CameraHierarchicalMapping
from vpt_tpu.config import (
    ACTION_TRANSFORMER_KWARGS,
    AGENT_RESOLUTION,
    FOUNDATION_PI_HEAD_KWARGS,
    FOUNDATION_POLICY_KWARGS,
    PolicyConfig,
)
from vpt_tpu.models.heads import dict_sample, head_specs_from_space
from vpt_tpu.models.policy import MinecraftAgentPolicy, policy_initial_state
from vpt_tpu.spaces import DictType
from vpt_tpu.checkpoint import cast_params, load_weights, state_dict_to_variables

ENV_KWARGS = dict(  # reference: agent.py:47-54
    fov_range=[70, 70],
    frameskip=1,
    gamma_range=[2, 2],
    guiscale_range=[1, 1],
    resolution=[640, 360],
    cursor_size_range=[16.0, 16.0],
)

# Names the MineRL env must expose (reference: agent.py:56-81); values checked
# only when the env provides a gym action space.
TARGET_ACTION_NAMES = {
    "ESC", "attack", "back", "camera", "drop", "forward",
    "hotbar.1", "hotbar.2", "hotbar.3", "hotbar.4", "hotbar.5",
    "hotbar.6", "hotbar.7", "hotbar.8", "hotbar.9",
    "inventory", "jump", "left", "pickItem", "right",
    "sneak", "sprint", "swapHands", "use",
}



def validate_env(env) -> None:
    """Check the MineRL env matches the recording setup (reference:
    agent.py:84-97).  No-op for envs without the expected attributes."""
    task = getattr(env, "task", None)
    if task is not None:
        for key, value in ENV_KWARGS.items():
            if key == "frameskip":
                continue
            if getattr(task, key, value) != value:
                raise ValueError(f"MineRL environment setting {key} does not match {value}")
    space = getattr(env, "action_space", None)
    spaces_dict = getattr(space, "spaces", None)
    if spaces_dict is not None:
        names = set(spaces_dict.keys())
        if names != TARGET_ACTION_NAMES:
            raise ValueError(
                f"MineRL action space does not match. Expected actions {TARGET_ACTION_NAMES}"
            )


class MineRLAgent:
    """Plays Minecraft from pixels with persistent recurrent state.

    :param env: optional MineRL env to validate against
    :param policy_kwargs: raw ``.model`` kwargs dict (falls back to the
        published foundation settings, reference: agent.py:16-36)
    :param pi_head_kwargs: e.g. {"temperature": 2.0}
    :param batch_size: number of parallel env streams sharing this agent
    :param compute_dtype: "float32" (parity) or "bfloat16" (TPU throughput)
    :param resize_on_device: resize raw env frames inside the jitted step
        (float bilinear, ≤1 intensity step from the cv2-exact host path).
        Essential when the host can't keep up — this image has ONE cpu core,
        capping host-side resize at ~5k frames/sec while the chip serves ~7k.
    :param mesh: optional ``jax.sharding.Mesh`` for multi-chip serving —
        parameters replicate, the stream (batch) axis AND the per-stream KV
        caches shard over the mesh's data axes, and the step runs SPMD
        (SURVEY §2 "Consequence for the build": the batched-rollout runtime
        with the KV cache as a sharded persistent device array).  Equality
        with single-device serving is proven by
        tests/test_agent.py::test_mesh_sharded_serving_matches_single_device.
    """

    def __init__(
        self,
        env=None,
        device=None,  # accepted for reference API compatibility; JAX manages placement
        policy_kwargs: Optional[Dict[str, Any]] = None,
        pi_head_kwargs: Optional[Dict[str, Any]] = None,
        batch_size: int = 1,
        seed: int = 0,
        compute_dtype: str = "float32",
        resize_on_device: bool = False,
        ring_cache: bool = True,
        decode_on_device: bool = True,
        params_dtype: str = "float32",
        quantize_dense: bool = False,
        mesh=None,
    ):
        self.mesh = mesh
        if mesh is not None:
            n_data = int(
                np.prod([mesh.shape[a] for a in ("dp", "fsdp") if a in mesh.axis_names])
            )
            assert batch_size % max(n_data, 1) == 0, (
                f"batch_size {batch_size} must divide over the mesh's "
                f"{n_data} data-parallel devices"
            )
        self.params_dtype = params_dtype
        # int8 trunk serving (ops/int8.py): the t=1 decode is weight-read-
        # bound, so int8 kernels quarter the dominant HBM traffic
        # (measured +11% over f32 params at 64 streams, 2x width)
        self.quantize_dense = quantize_dense
        self._quantized = False
        self.resize_on_device = resize_on_device
        # decode sampled joint actions to the factored env space inside the
        # jitted step: ONE (B, 23) device→host transfer per step (buttons,
        # camera degrees, vpred) instead of three — each transfer costs a
        # full RTT on remote-attached TPUs
        self.decode_on_device = decode_on_device
        # rotating decode cache: one slot written per step instead of a full
        # cache shift (numerically equivalent; see tests/test_ring_cache.py)
        self.ring_cache = ring_cache
        if env is not None:
            validate_env(env)
        self.batch_size = batch_size
        self.action_mapper = CameraHierarchicalMapping(n_camera_bins=11)
        self.action_transformer = ActionTransformer(**ACTION_TRANSFORMER_KWARGS)

        policy_kwargs = dict(policy_kwargs or FOUNDATION_POLICY_KWARGS)
        pi_head_kwargs = dict(pi_head_kwargs or FOUNDATION_PI_HEAD_KWARGS)
        self.cfg = PolicyConfig.from_kwargs(policy_kwargs).replace(compute_dtype=compute_dtype)
        self.temperature = float(pi_head_kwargs.get("temperature", 1.0))
        space = DictType(**self.action_mapper.get_action_space_update())
        self.head_specs = head_specs_from_space(space)
        self.policy = MinecraftAgentPolicy(
            cfg=self.cfg, head_specs=self.head_specs, temperature=self.temperature
        )

        # resolution follows the model's img_shape ((h, w, c) → cv2 (w, h));
        # 128×128 for all published checkpoints (reference: agent.py:14)
        self._resolution = (self.cfg.img_shape[1], self.cfg.img_shape[0])
        self._rng = jax.random.PRNGKey(seed)
        if mesh is not None:
            from vpt_tpu.parallel.mesh import replicated

            self._rng = jax.device_put(self._rng, replicated(mesh))
        self.variables = None
        self.hidden_state = self._place_state(
            policy_initial_state(self.cfg, batch_size, ring=ring_cache)
        )
        self._step = self._build_step()
        self._resize_pool = None
        if batch_size > 1:
            from concurrent.futures import ThreadPoolExecutor

            # the native resize releases the GIL → real parallelism
            self._resize_pool = ThreadPoolExecutor(max_workers=min(16, batch_size))

    # ------------------------------------------------------------------ setup

    def _place_state(self, state):
        """Commit recurrent-state leaves to the mesh: per-stream KV caches
        shard on the data axes, scalar leaves (ring indices) replicate.
        No-op without a mesh."""
        if self.mesh is None:
            return state
        from vpt_tpu.parallel.mesh import batch_sharded, replicated

        sh, repl = batch_sharded(self.mesh), replicated(self.mesh)
        return jax.tree.map(
            lambda x: jax.device_put(x, repl if getattr(x, "ndim", 1) == 0 else sh),
            state,
        )

    def _place_params(self, variables):
        if self.mesh is None or variables is None:
            return variables
        from vpt_tpu.parallel.mesh import replicated

        return jax.device_put(variables, replicated(self.mesh))

    def _place_data(self, x):
        if self.mesh is None:
            return jnp.asarray(x)
        from vpt_tpu.parallel.mesh import batch_sharded

        return jax.device_put(np.asarray(x), batch_sharded(self.mesh))

    def _build_step(self):
        policy, specs = self.policy, self.head_specs
        resolution = self._resolution
        on_device = self.resize_on_device
        decoder = None
        if self.decode_on_device:
            from vpt_tpu.actions.device_decode import DeviceActionDecoder

            decoder = DeviceActionDecoder(self.action_mapper, self.action_transformer.quantizer)

        def step(variables, img, first, state, key, stochastic):
            if on_device:
                from vpt_tpu.ops.resize import resize_bilinear_jnp

                img = resize_bilinear_jnp(img, resolution)
            out, state = policy.apply(variables, img, first, state)
            logits = jax.tree.map(lambda x: x[:, -1], out["pi_logits"])
            key, sub = jax.random.split(key)
            action = dict_sample(sub, logits, specs, deterministic=not stochastic)
            if decoder is not None:
                decoded = decoder.decode(action["buttons"][:, 0], action["camera"][:, 0])
                packed = jnp.concatenate(
                    [decoded, out["vpred"][:, -1].astype(jnp.float32)], axis=1
                )
                return packed, state, key
            return action, out["vpred"][:, -1], state, key

        # donate the recurrent state: the KV caches update in place instead of
        # being copied every step (4 blocks × 2 × (B, maxlen, hid) per policy)
        return jax.jit(step, static_argnames=("stochastic",), donate_argnums=(3,))

    def _ensure_variables(self, quantize: bool = True):
        if self.variables is None:
            img = jnp.zeros((1, 1) + tuple(self.cfg.img_shape), jnp.uint8)
            state = policy_initial_state(self.cfg, 1)
            self.variables = jax.jit(self.policy.init)(
                jax.random.PRNGKey(0), img, jnp.zeros((1, 1), bool), state
            )
            self.variables = self._place_params(
                cast_params(self.variables, self.params_dtype)
            )
        if quantize:
            self._maybe_quantize()

    def _maybe_quantize(self) -> None:
        """Swap to the int8 serving graph: derive the quantized variable tree
        from the loaded float one and rebuild the jitted step."""
        if not self.quantize_dense or self._quantized or self.variables is None:
            return
        from vpt_tpu.ops.int8 import quantize_variables

        qpolicy = MinecraftAgentPolicy(
            cfg=self.cfg.replace(quantize_dense=True),
            head_specs=self.head_specs,
            temperature=self.temperature,
        )
        img = jnp.zeros((1, 1) + tuple(self.cfg.img_shape), jnp.uint8)
        state = policy_initial_state(self.cfg, 1)
        template = jax.eval_shape(
            qpolicy.init, jax.random.PRNGKey(0), img, jnp.zeros((1, 1), bool), state
        )
        self.variables = self._place_params(quantize_variables(self.variables, template))
        self.policy = qpolicy
        self._step = self._build_step()
        self._quantized = True

    def load_weights(self, path: str) -> None:
        """Load a reference ``.weights`` file (strict=False) and reset state."""
        if self._quantized:
            # reload needs the float layout back; rebuild from scratch
            self.variables, self._quantized = None, False
            self.policy = MinecraftAgentPolicy(
                cfg=self.cfg, head_specs=self.head_specs, temperature=self.temperature
            )
            self._step = self._build_step()
        self._ensure_variables(quantize=False)
        sd = load_weights(path)
        self.variables, report = state_dict_to_variables(
            sd, variables=jax.tree.map(np.asarray, self.variables)
        )
        self.variables = self._place_params(cast_params(self.variables, self.params_dtype))
        if report["unexpected"] or report["shape_mismatch"]:
            print(
                f"[vpt_tpu] load_weights: ignored {len(report['unexpected'])} unexpected keys, "
                f"{len(report['shape_mismatch'])} shape mismatches"
            )
        self._maybe_quantize()
        self.reset()

    def reset(self) -> None:
        """Reset recurrent state for all streams (reference: agent.py:137-139)."""
        self.hidden_state = self._place_state(
            policy_initial_state(self.cfg, self.batch_size, ring=self.ring_cache)
        )

    # ------------------------------------------------------------ conversions

    def _env_obs_to_agent(self, minerl_obs) -> np.ndarray:
        """(batched) env obs → (B, 1, 128, 128, 3) uint8 frames.

        Resizing runs through the native C++ kernel (cv2-bit-exact), threaded
        across streams — the numpy path alone (≈1.4 ms/frame) would bottleneck
        the 64-stream device step."""
        from vpt_tpu.data.video import native_resize_u8

        povs = minerl_obs if isinstance(minerl_obs, list) else [minerl_obs]
        if self.resize_on_device:
            return np.stack([o["pov"] for o in povs])[:, None]
        if self._resize_pool is not None and len(povs) > 1:
            frames = list(
                self._resize_pool.map(lambda o: native_resize_u8(o["pov"], self._resolution), povs)
            )
        else:
            frames = [native_resize_u8(o["pov"], self._resolution) for o in povs]
        return np.stack(frames)[:, None]

    def _agent_action_to_env(self, agent_action) -> Dict[str, np.ndarray]:
        action = {
            "buttons": np.asarray(agent_action["buttons"]),
            "camera": np.asarray(agent_action["camera"]),
        }
        factored = self.action_mapper.to_factored(action)
        return self.action_transformer.policy2env(factored)

    def _env_action_to_agent(self, minerl_action_transformed, check_if_null: bool = False):
        """Env action → joint-space action arrays (reference: agent.py:166-188)."""
        minerl_action = self.action_transformer.env2policy(minerl_action_transformed)
        if check_if_null:
            if np.all(minerl_action["buttons"] == 0) and np.all(
                minerl_action["camera"] == self.action_transformer.camera_zero_bin()
            ):
                return None
        if minerl_action["camera"].ndim == 1:
            minerl_action = {k: v[None] for k, v in minerl_action.items()}
        return self.action_mapper.from_factored(minerl_action)

    # ------------------------------------------------------------------- step

    def get_action(self, minerl_obs, first: Optional[np.ndarray] = None, stochastic: bool = True):
        """One policy step; returns a MineRL action dict (a list of dicts when
        the agent was built with batch_size > 1)."""
        self._ensure_variables()
        img = self._env_obs_to_agent(minerl_obs)
        b = img.shape[0]
        assert b == self.batch_size, f"got {b} obs for batch_size {self.batch_size}"
        if first is None:
            first = np.zeros((b, 1), bool)
        else:
            first = np.asarray(first, bool).reshape(b, 1)
        if self.decode_on_device:
            handle = self._dispatch_prepared(img, first, stochastic,
                                             as_list=isinstance(minerl_obs, list))
            return self.collect_action(handle)
        action, vpred, self.hidden_state, self._rng = self._step(
            self.variables, self._place_data(img), self._place_data(first), self.hidden_state,
            self._rng, stochastic,
        )
        self._last_vpred = np.asarray(vpred)
        env_action = self._agent_action_to_env(jax.tree.map(np.asarray, action))
        if isinstance(minerl_obs, list):
            return [
                {k: v[i] for k, v in env_action.items()} for i in range(b)
            ]
        return {k: v[0] for k, v in env_action.items()}

    def dispatch_action(self, minerl_obs, first: Optional[np.ndarray] = None, stochastic: bool = True):
        """Async half of get_action: enqueue the device step and return a
        handle WITHOUT waiting for the result.  Pair with collect_action to
        overlap host work (env stepping, frame prep) with device compute —
        requires decode_on_device (single packed output)."""
        assert self.decode_on_device, "dispatch/collect requires decode_on_device=True"
        self._ensure_variables()
        img = self._env_obs_to_agent(minerl_obs)
        b = img.shape[0]
        assert b == self.batch_size, f"got {b} obs for batch_size {self.batch_size}"
        if first is None:
            first = np.zeros((b, 1), bool)
        else:
            first = np.asarray(first, bool).reshape(b, 1)
        return self._dispatch_prepared(img, first, stochastic,
                                       as_list=isinstance(minerl_obs, list))

    def _dispatch_prepared(self, img, first, stochastic, as_list: bool):
        packed, self.hidden_state, self._rng = self._step(
            self.variables, self._place_data(img), self._place_data(first), self.hidden_state,
            self._rng, stochastic,
        )
        try:
            packed.copy_to_host_async()  # start the D2H early where supported
        except Exception:
            pass
        return (packed, as_list)

    def initial_group_state(self):
        """Fresh recurrent state for one batch_size-wide stream group —
        pair with ``dispatch_action(..., state=...)`` to drive several
        independent groups through one agent (GroupedRolloutRunner)."""
        return self._place_state(
            policy_initial_state(self.cfg, self.batch_size, ring=self.ring_cache)
        )

    def dispatch_action_with_state(self, minerl_obs, state, first=None, stochastic: bool = True):
        """Explicit-state dispatch: like dispatch_action but the recurrent
        state is the caller's, not ``self.hidden_state``.  Returns
        (handle, new_state).  Lets one agent (one compiled step) serve many
        round-robin stream groups whose D2H transfers overlap."""
        assert self.decode_on_device, "dispatch/collect requires decode_on_device=True"
        self._ensure_variables()
        img = self._env_obs_to_agent(minerl_obs)
        b = img.shape[0]
        assert b == self.batch_size, f"got {b} obs for batch_size {self.batch_size}"
        if first is None:
            first = np.zeros((b, 1), bool)
        else:
            first = np.asarray(first, bool).reshape(b, 1)
        packed, new_state, self._rng = self._step(
            self.variables, self._place_data(img), self._place_data(first), state,
            self._rng, stochastic,
        )
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
        return (packed, isinstance(minerl_obs, list)), new_state

    def collect_action(self, handle):
        """Sync half: wait for a dispatch_action handle and decode to env
        actions (a list iff the dispatched obs was a list — same convention
        as get_action)."""
        from vpt_tpu.actions.device_decode import env_action_from_decoded

        packed, as_list = handle
        packed = np.asarray(packed)
        self._last_vpred = packed[:, 22:23]
        env_action = env_action_from_decoded(packed)
        if as_list:
            return [{k: v[i] for k, v in env_action.items()} for i in range(self.batch_size)]
        return {k: v[0] for k, v in env_action.items()}

    def predict_value(self, minerl_obs, first: Optional[np.ndarray] = None) -> np.ndarray:
        """Value estimate for the given observation(s) — the reference's
        MinecraftAgentPolicy.v (policy.py:330-339).  Advances hidden state."""
        self.get_action(minerl_obs, first=first, stochastic=True)
        return self._last_vpred[:, 0] if self.batch_size > 1 else float(self._last_vpred[0, 0])
