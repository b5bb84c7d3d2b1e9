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
        quantize_dense: bool = False,
        mesh=None,
    ):
        self.params_dtype = params_dtype
        self.quantize_dense = quantize_dense
        self._quantized = False
        # Multi-chip labeling: windows are independent, so scale-out is pure
        # data parallelism — replicate the params over ``mesh``, shard the
        # window (batch) axis on dp, and predict_actions_batched runs SPMD.
        self.mesh = mesh
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

    def _input_shape(self):
        """Raw (h, w, c) video input shape (NOT img_shape, whose channel slot
        declares the conv3d OUTPUT count — see models/policy.py)."""
        from vpt_tpu.models.policy import idm_input_shape

        return idm_input_shape(self.cfg)

    def _ensure_variables(self, t: int = 2):
        if self.variables is None:
            img = jnp.zeros((1, t) + self._input_shape(), jnp.uint8)
            state = policy_initial_state(self.cfg, 1)
            self.variables = jax.jit(self.policy.init)(
                jax.random.PRNGKey(0), img, jnp.zeros((1, t), bool), state
            )

    def _maybe_quantize(self) -> None:
        """Swap to the int8 serving graph: derive the quantized variable tree
        from the (already loaded) float one and rebuild the jitted forward.

        Weight quantization is symmetric per-output-channel; activations are
        quantized per row inside each layer (vpt_tpu/ops/int8.py).
        """
        if not self.quantize_dense or self._quantized or self.variables is None:
            return
        from vpt_tpu.ops.int8 import quantize_variables

        qpolicy = InverseActionPolicy(
            cfg=self.cfg.replace(quantize_dense=True),
            head_specs=self.head_specs,
            temperature=self.temperature,
        )
        t = 2
        img = jnp.zeros((1, t) + self._input_shape(), jnp.uint8)
        state = policy_initial_state(self.cfg, 1)
        template = jax.eval_shape(
            qpolicy.init, jax.random.PRNGKey(0), img, jnp.zeros((1, t), bool), state
        )
        self.variables = quantize_variables(self.variables, template)
        self.policy = qpolicy
        self._forward = self._build_forward()
        self._quantized = True

    def load_weights(self, path: str) -> None:
        if self._quantized:
            # reload needs the float layout back; rebuild from scratch
            self.variables, self._quantized = None, False
            self.policy = InverseActionPolicy(
                cfg=self.cfg, head_specs=self.head_specs, temperature=self.temperature
            )
            self._forward = self._build_forward()
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
        self._maybe_quantize()
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
        self._maybe_quantize()
        img = self._video_obs_to_agent(video_frames)
        first = np.zeros((1, img.shape[1]), bool)
        action, _, self.hidden_state = self._forward(
            self.variables, jnp.asarray(img), jnp.asarray(first), self.hidden_state
        )
        return self._agent_action_to_env(jax.tree.map(np.asarray, action))

    def predict_actions_batched(self, windows: np.ndarray) -> Dict[str, np.ndarray]:
        """Label a stack of already-resized windows (B, N, 128, 128, 3) in ONE
        forward — the batch axis is the throughput axis the TPU scales.

        Windows are independent (the bidirectional IDM carries no state across
        them), so a fresh zero state is used per call.

        :returns: MineRL action dict with (B, N) leading dims.
        """
        return self.collect_actions(self.dispatch_actions_batched(windows))

    def dispatch_actions_batched(self, windows: np.ndarray):
        """Async half of :meth:`predict_actions_batched`: launch the jitted
        forward and return the device handles WITHOUT blocking.  jax dispatch
        is asynchronous, so the host returns immediately while the device
        labels — callers overlap video decode of the next windows with the
        compute of these (StreamingIDMLabeler double-buffers on exactly this).
        Pair with :meth:`collect_actions`."""
        self._ensure_variables()
        self._maybe_quantize()
        b = windows.shape[0]
        state = policy_initial_state(self.cfg, b)
        first = np.zeros(windows.shape[:2], bool)
        img = jnp.asarray(windows)
        first = jnp.asarray(first)
        if self.mesh is not None:
            from vpt_tpu.parallel.mesh import batch_sharded, replicated, seq_sharded

            n_sp = int(self.mesh.shape.get("sp", 1))
            n_batch = self.mesh.devices.size // n_sp
            if b % n_batch == 0:
                # windows shard over the batch axes; with an sp axis the
                # 128-frame TIME dim also shards — the per-frame CNN (the
                # FLOPs bulk, ~65 of 67.5 GFLOP/frame at 4x) partitions over
                # T for free, and SPMD all-gathers K/V inside the
                # bidirectional window attention
                data_sh = seq_sharded(self.mesh) if n_sp > 1 else batch_sharded(self.mesh)
                self.variables = jax.device_put(self.variables, replicated(self.mesh))
                img = jax.device_put(img, data_sh)
                first = jax.device_put(first, data_sh)
                state = jax.device_put(state, batch_sharded(self.mesh))
        action, _, _ = self._forward(self.variables, img, first, state)
        for x in action.values():
            try:
                x.copy_to_host_async()
            except Exception:
                pass  # backend without async D2H: collect_actions still works
        return action

    def collect_actions(self, handle) -> Dict[str, np.ndarray]:
        """Blocking half of :meth:`dispatch_actions_batched`: read the device
        results back and decode to the MineRL action dict."""
        return self._agent_action_to_env(jax.tree.map(np.asarray, handle))


class StreamingIDMLabeler:
    """Label arbitrarily long videos with overlap-stitched IDM windows.

    The IDM attends bidirectionally inside an N-frame window (reference
    policy.py:374-392 with mask "none"), so frames near a window edge see
    context on one side only.  The reference CLI labels disjoint windows
    (run_inverse_dynamics_model.py:146), accepting degraded boundary frames.
    This labeler slides the window by ``stride`` ≤ ``window`` frames and
    emits each window's CENTRAL predictions — every emitted label (outside
    the video head/tail) has ≥ (window−stride)//2 frames of context on both
    sides.  ``stride == window`` degrades exactly to disjoint windows.

    Ownership: the window starting at s owns output region
    [s + lo, s + lo + stride) with lo = (window − stride)//2, extended to
    index 0 for the first window.  Whatever the complete windows did not
    cover by end of video is owned by one final tail window built from the
    LAST ``window`` frames (so tail frames keep full left context).

    Ready windows are stacked ``window_batch`` at a time on the batch axis
    and labeled in one jitted forward (`IDMAgent.predict_actions_batched`) —
    the TPU throughput axis.

    Usage::

        labeler = StreamingIDMLabeler(agent, window=128, stride=64)
        for frame in frames:                     # raw (H, W, C) uint8
            for idx, action in labeler.feed(frame):
                ...                              # global index, env action
        for idx, action in labeler.finish():
            ...
    """

    def __init__(self, agent: IDMAgent, window: int = 128,
                 stride: Optional[int] = None, window_batch: int = 1,
                 max_inflight: int = 1):
        stride = window if stride is None else stride
        assert 0 < stride <= window, (stride, window)
        assert window <= agent.cfg.timesteps, (
            f"window {window} exceeds the IDM's trained geometry "
            f"timesteps={agent.cfg.timesteps}"
        )
        assert window_batch >= 1
        assert max_inflight >= 1
        self.agent = agent
        self.window = window
        self.stride = stride
        self.window_batch = window_batch
        # How many window-batch forwards may be ENQUEUED on the device at
        # once.  Each enqueued execution holds its own temp/activation
        # allocation, so this multiplies the HBM footprint: at the 4x IDM's
        # wb=8 geometry one forward is ~8.7 GB of temps and max_inflight=2
        # OOMs a 16 GB chip (measured round 5, ROADMAP "IDM labeling
        # memory").  max_inflight=1 still overlaps host decode with device
        # compute — dispatch is async and the harvest of forward N happens
        # just before dispatching N+1 — it only serializes back-to-back
        # dispatches, which the wb sweep shows costs ~0 fps.
        self.max_inflight = max_inflight
        self._lo = (window - stride) // 2
        from collections import deque

        self._history = deque(maxlen=window)  # last `window` resized frames
        self._next_win_start = 0              # start of the next window to cut
        self._n_fed = 0
        self._emitted = 0                     # next global index to emit
        self._pending = []                    # (win_start, (N,h,w,3)) windows
        self._inflight = []                   # [(group, device handle)], ≤ 1

    def _resize(self, frame: np.ndarray) -> np.ndarray:
        shape = self.agent.cfg.img_shape
        return resize_image(frame, (shape[1], shape[0]))

    def _harvest_one(self, out):
        """Block on the oldest in-flight group's device results and emit its
        owned labels."""
        group, handle = self._inflight.pop(0)
        actions = self.agent.collect_actions(handle)
        for row, (win_start, _) in enumerate(group):
            begin = max(self._emitted, 0 if win_start == 0 else win_start + self._lo)
            end = win_start + self._lo + self.stride
            out.extend(
                (i, {k: v[row, i - win_start] for k, v in actions.items()})
                for i in range(begin, end)
            )
            self._emitted = max(self._emitted, end)

    def _label_pending(self, flush: bool = False):
        """Dispatch full window_batch groups (all pending when flushing),
        double-buffered: one group stays in flight on the device while the
        caller decodes the next stride of video — the host decode and the
        device forward overlap, so end-to-end labeling runs at
        max(decode, compute) instead of their sum.  Emission order is
        unchanged (groups harvest FIFO, one behind dispatch)."""
        out = []
        while self._pending and (flush or len(self._pending) >= self.window_batch):
            group = self._pending[: self.window_batch]
            del self._pending[: self.window_batch]
            # make room BEFORE dispatching: at most ``max_inflight``
            # executions (each with its own temp allocation) are enqueued
            while len(self._inflight) >= self.max_inflight:
                self._harvest_one(out)
            stack = np.stack([w for _, w in group])
            if len(group) < self.window_batch:
                # pad the flush-time ragged group to the full window_batch so
                # EVERY dispatch reuses the one compiled wb-sized executable.
                # A ragged batch would compile a second program — and odd
                # batch sizes hit pathological XLA:TPU tilings: at the 4x
                # IDM's wb=8 geometry the leftover B=7 program materializes
                # two 7 GB f32 layout copies around the firstconv GroupNorm
                # (17.5 G > the chip's 15.75 G HBM, measured round 5) while
                # the B=8 program runs in a fraction of that.  Padding rows'
                # outputs are never read (_harvest_one walks ``group``).
                pad = np.broadcast_to(
                    stack[-1:], (self.window_batch - len(group),) + stack.shape[1:]
                )
                stack = np.concatenate([stack, pad], axis=0)
            handle = self.agent.dispatch_actions_batched(stack)
            self._inflight.append((group, handle))
        if flush:
            while self._inflight:
                self._harvest_one(out)
        return out

    def feed(self, frame: np.ndarray):
        """Add one raw frame; returns labels that became final as a list of
        (global frame index, MineRL action dict), in order."""
        return self.feed_resized(self._resize(frame))

    def feed_resized(self, frame: np.ndarray):
        """:meth:`feed` for a frame ALREADY at the agent resolution — the
        fast path for callers that decode+resize natively in batches
        (``VideoReader.read_batch``), keeping per-frame Python/ctypes resize
        off the labeling hot loop (tools/label_videos.py, bench idm-e2e)."""
        expect = tuple(self.agent.cfg.img_shape[:2]) + (3,)
        assert frame.shape == expect, (
            f"feed_resized expects {expect} frames, got {frame.shape} "
            "(use feed() for raw video frames)"
        )
        self._history.append(frame)
        self._n_fed += 1
        while self._n_fed - self._next_win_start >= self.window:
            # history holds exactly [._n_fed - window, ._n_fed) ⊇ this window
            offset = self._next_win_start - (self._n_fed - len(self._history))
            frames = list(self._history)[offset: offset + self.window]
            self._pending.append((self._next_win_start, np.stack(frames)))
            self._next_win_start += self.stride
        return self._label_pending()

    def finish(self):
        """Flush pending windows, then cover any remaining tail frames with
        one final window of the last ``window`` frames."""
        out = self._label_pending(flush=True)
        if self._emitted < self._n_fed:
            tail = list(self._history)          # min(window, n_fed) frames
            tail_start = self._n_fed - len(tail)
            stack = np.stack(tail)[None]
            if len(tail) == self.window and self.window_batch > 1:
                # full-length tail: pad the batch axis so this reuses the
                # compiled wb-sized executable instead of compiling (and
                # possibly mis-tiling — see _label_pending) a B=1 program
                pad = np.broadcast_to(
                    stack, (self.window_batch - 1,) + stack.shape[1:]
                )
                stack = np.concatenate([stack, pad], axis=0)
            actions = self.agent.predict_actions_batched(stack)
            out.extend(
                (i, {k: v[0, i - tail_start] for k, v in actions.items()})
                for i in range(self._emitted, self._n_fed)
            )
            self._emitted = self._n_fed
        return out


# Resolution the published IDM expects its source videos at (reference:
# run_inverse_dynamics_model.py:155 asserts 640x360 before labeling).
IDM_REQUIRED_RESOLUTION = (640, 360)


def action_jsonl_row(action: Dict[str, Any]) -> Dict[str, Any]:
    """The on-disk schema for one labeled action: env-action arrays as plain
    lists, ready for ``json.dumps({"frame": i, "action": row})``.

    The single definition shared by ``run_inverse_dynamics_model.py --out``
    and ``tools/label_videos.py`` so the corpus tool can never diverge from
    the single-video CLI."""
    return {name: np.asarray(v).tolist() for name, v in action.items()}
