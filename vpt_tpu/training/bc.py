"""Behavioural-cloning fine-tuning (reference: behavioural_cloning.py).

TPU-native upgrades over the reference's loop:

  * truly batched, sequence-chunked training (T=128 windows — the geometry
    the architecture was built for, agent.py:33) instead of per-sample
    gradient accumulation of batch-size-1 graphs;
  * one jitted train step, data-parallel over the device mesh: batch and
    recurrent state are sharded on ``dp``, parameters replicated, XLA psums
    the gradients over ICI; pass a mesh with an ``fsdp`` (and/or ``tp``) axis
    to shard parameters + Adam moments instead (parallel/fsdp.py) when the
    config outgrows replicated-Adam HBM;
  * recurrent state carried across an episode's consecutive chunks
    (truncated-BPTT at chunk boundaries, vs the reference's 1-step
    truncation at behavioural_cloning.py:111);
  * optimizer-equivalent of the reference's torch Adam(weight_decay=…):
    gradient clip 5.0 → L2 term added to the gradient → Adam moments
    (torch's Adam applies weight_decay as an L2 gradient term, NOT AdamW);
  * mid-run checkpoints with optimizer state + data cursor, preemption-safe.

Hyperparameters default to the reference's ("taken from the OpenAI VPT
paper", behavioural_cloning.py:26-40).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vpt_tpu.actions.mapping import CameraHierarchicalMapping
from vpt_tpu.checkpoint import load_model_parameters, load_weights, save_weights, state_dict_to_variables
from vpt_tpu.config import PolicyConfig
from vpt_tpu.models.heads import dict_logprob, head_specs_from_space
from vpt_tpu.models.policy import MinecraftAgentPolicy, policy_initial_state
from vpt_tpu.parallel.mesh import (
    batch_sharded,
    cross_host_barrier,
    device_zeros_like_tree,
    host_tree,
    place_host_array,
    make_mesh,
    place_local_batch,
    replicated,
    seq_sharded,
)
from vpt_tpu.spaces import DictType
from vpt_tpu.utils.metrics import MetricsLogger


@dataclasses.dataclass
class BCHyperparams:
    learning_rate: float = 0.000181   # reference: behavioural_cloning.py:37
    weight_decay: float = 0.039428    # reference: behavioural_cloning.py:38
    max_grad_norm: float = 5.0        # reference: behavioural_cloning.py:39
    epochs: int = 2                   # reference: behavioural_cloning.py:25
    batch_size: int = 8               # reference: behavioural_cloning.py:27
    chunk_len: int = 128              # sequence window (reference trains T=1)
    loss_report_rate: int = 100       # reference: behavioural_cloning.py:35
    checkpoint_every: int = 0         # steps between mid-run checkpoints (0 = off)
    checkpoint_dir: Optional[str] = None


class DevicePrefetcher:
    """Overlap host→device batch transfer with device compute.

    A background thread pulls host batches from ``iterator``, casts them to
    the training dtypes, and ``device_put``s them with the dp sharding while
    the previous step runs on the chip.  Depth 2 is enough: steady-state
    throughput becomes max(compute, transfer) instead of their sum.  (On the
    tunneled dev chip the transfer RTT dominates a naive loop by ~5x; on a
    real TPU host PCIe makes this nearly free — either way the overlap is the
    correct production input pipeline.)
    """

    _STOP = object()

    def __init__(self, iterator, sharding, depth: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._sharding = sharding
        self._err = None

        def run():
            try:
                for batch in iterator:
                    self._q.put(self._place(batch))
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._STOP)

        self._thread = threading.Thread(target=run, daemon=True, name="batch-prefetch")
        self._thread.start()

    def _place(self, batch):
        placed = {
            "frames": batch["frames"],
            "buttons": batch["buttons"].astype(np.int32),
            "camera": batch["camera"].astype(np.int32),
            "firsts": batch["firsts"].astype(bool),
            "mask": batch["mask"].astype(bool),
        }
        placed = place_local_batch(placed, self._sharding)
        # pass host-only metadata (episode_ids, data cursor) through untouched
        for key, value in batch.items():
            if key not in placed:
                placed[key] = value
        return placed

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._STOP:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def inject_episode_firsts(batch: Dict[str, np.ndarray], last_episode: np.ndarray, chunk_len: int) -> np.ndarray:
    """Mark a chunk's first step as an episode start when its stream moved to
    a new trajectory (the loader's per-chunk flag covers within-trajectory
    resets; the cross-trajectory transition is only visible to the consumer).
    Mutates ``batch['firsts']``; returns the new per-stream episode ids."""
    new_episode = batch["episode_ids"] != last_episode
    batch["firsts"] = batch["firsts"] | new_episode[:, None] & (
        np.arange(chunk_len)[None] == 0
    )
    return batch["episode_ids"]


def make_optimizer(hp: BCHyperparams) -> optax.GradientTransformation:
    """clip → +wd·θ → Adam → −lr·update == torch clip_grad_norm_ +
    Adam(lr, weight_decay) (reference: behavioural_cloning.py:63-67, 121-123)."""
    return optax.chain(
        optax.clip_by_global_norm(hp.max_grad_norm),
        optax.add_decayed_weights(hp.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-hp.learning_rate),
    )


class BCTrainer:
    """Sequence-chunked data-parallel BC fine-tuning."""

    def __init__(
        self,
        policy_kwargs: Dict[str, Any],
        pi_head_kwargs: Dict[str, Any],
        hp: Optional[BCHyperparams] = None,
        mesh=None,
        compute_dtype: str = "float32",
        remat: bool = False,
        cnn_scan_chunks: int = 0,
        qat_dense: bool = False,
        seed: int = 0,
    ):
        self.hp = hp or BCHyperparams()
        self.mesh = mesh if mesh is not None else make_mesh()
        self.cfg = PolicyConfig.from_kwargs(dict(policy_kwargs)).replace(
            compute_dtype=compute_dtype, remat=remat, cnn_scan_chunks=cnn_scan_chunks
        )
        self.temperature = float(pi_head_kwargs.get("temperature", 1.0))
        self.action_mapper = CameraHierarchicalMapping(n_camera_bins=11)
        space = DictType(**self.action_mapper.get_action_space_update())
        self.head_specs = head_specs_from_space(space)
        self.policy = MinecraftAgentPolicy(
            cfg=self.cfg, head_specs=self.head_specs, temperature=self.temperature
        )
        self.optimizer = make_optimizer(self.hp)
        # QAT: train against the int8-rounded dense weights (straight-through
        # gradients) so the quantize_dense serving path loses no fidelity
        self.qat_dense = qat_dense
        self._seed = seed
        self.variables = None
        self.opt_state = None
        self.step_count = 0
        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------ setup

    @property
    def _tp(self) -> int:
        return int(self.mesh.shape.get("tp", 1))

    @property
    def _fsdp(self) -> int:
        return int(self.mesh.shape.get("fsdp", 1))

    @property
    def _params_sharded(self) -> bool:
        return self._tp > 1 or self._fsdp > 1

    def _place_variables(self, variables):
        from vpt_tpu.parallel.fsdp import place_variables

        return place_variables(variables, self.mesh)

    def _init_opt_state(self, params):
        """Adam moments placed exactly like their parameters (see
        parallel/fsdp.py:init_opt_state for why this must be eager)."""
        from vpt_tpu.parallel.fsdp import init_opt_state

        return init_opt_state(self.optimizer, params, self.mesh)

    def init(self):
        if self.variables is not None:
            return
        img = jnp.zeros((1, 1) + tuple(self.cfg.img_shape), jnp.uint8)
        state = policy_initial_state(self.cfg, 1)
        self.variables = jax.jit(self.policy.init)(
            jax.random.PRNGKey(self._seed), img, jnp.zeros((1, 1), bool), state
        )
        self.variables = self._place_variables(self.variables)
        self.opt_state = self._init_opt_state(self.variables["params"])

    def load_weights(self, path: str):
        self.init()
        sd = load_weights(path)
        self.variables, report = state_dict_to_variables(sd, variables=host_tree(self.variables))
        self.variables = self._place_variables(self.variables)
        return report

    @classmethod
    def from_files(cls, in_model: str, in_weights: Optional[str] = None, **kw) -> "BCTrainer":
        policy_kwargs, pi_head_kwargs = load_model_parameters(in_model)
        trainer = cls(policy_kwargs, pi_head_kwargs, **kw)
        trainer.init()
        if in_weights:
            trainer.load_weights(in_weights)
        return trainer

    # ------------------------------------------------------------------- step

    def _qat_mask(self):
        """Exact set of kernels the int8 serving graph quantizes, derived
        from the quantize_dense model's variable template (shapes only — no
        real init)."""
        from vpt_tpu.ops.int8 import quantized_kernel_mask

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
        float_template = jax.eval_shape(
            self.policy.init, jax.random.PRNGKey(0), img, jnp.zeros((1, 1), bool), state
        )
        return quantized_kernel_mask(float_template["params"], template["params"])

    def _build_train_step(self):
        policy, specs, optimizer = self.policy, self.head_specs, self.optimizer
        qat_mask = self._qat_mask() if self.qat_dense else None

        def loss_fn(params, stats, batch, state):
            if qat_mask is not None:
                from vpt_tpu.ops.int8 import fake_quant_dense_params

                params = fake_quant_dense_params(params, mask=qat_mask)
            variables = {"params": params, "stats": stats}
            out, state_out = policy.apply(
                variables, batch["frames"], batch["firsts"], state
            )
            actions = {
                "buttons": batch["buttons"][..., None],
                "camera": batch["camera"][..., None],
            }
            logp = dict_logprob(out["pi_logits"], actions, specs)  # (B, T)
            mask = batch["mask"].astype(jnp.float32)
            # normalize by B·T: at T=1 this is exactly the reference's
            # sum(-logprob)/BATCH_SIZE accumulation (behavioural_cloning.py:117)
            loss = -(logp * mask).sum() / (logp.shape[0] * logp.shape[1])
            return loss, state_out

        def train_step(variables, opt_state, batch, state):
            (loss, state_out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                variables["params"], variables["stats"], batch, state
            )
            grad_norm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, variables["params"])
            # The BC loss is -logprob only: the value head receives no
            # gradient, and torch's Adam skips grad-less params entirely —
            # not even weight decay touches them (reference
            # behavioural_cloning.py:101-119 never backprops through
            # v_prediction).  Mirror that exactly so BC fine-tuning
            # preserves a checkpoint's value function bit-for-bit
            # (proven end-to-end in tests/test_bc_loss_curve_parity.py).
            updates = {
                k: (jax.tree.map(jnp.zeros_like, v) if k == "value_head" else v)
                for k, v in updates.items()
            }
            params = optax.apply_updates(variables["params"], updates)
            # detach the carried state (truncated BPTT at chunk boundary)
            state_out = jax.tree.map(jax.lax.stop_gradient, state_out)
            return {"params": params, "stats": variables["stats"]}, opt_state, state_out, loss, grad_norm

        if self._params_sharded:
            # params carry explicit tp/fsdp shardings on the arrays themselves;
            # jit propagates them (and the data batch shardings) through SPMD:
            # weight all-gathers on use, gradient reduce-scatter onto the
            # fsdp shards, and donation keeps params/moments in place
            return jax.jit(train_step, donate_argnums=(0, 1, 3))
        data_sh = seq_sharded(self.mesh)     # (B, T, …): batch over dp×fsdp, time over sp
        state_sh = batch_sharded(self.mesh)  # recurrent state: batch axis only
        repl = replicated(self.mesh)
        return jax.jit(
            train_step,
            in_shardings=(repl, repl, data_sh, state_sh),
            out_shardings=(repl, repl, state_sh, repl, repl),
            donate_argnums=(0, 1, 3),
        )

    def train_step(self, batch: Dict[str, np.ndarray], state):
        """One optimizer step on a (B, T) batch; returns (state, loss, grad_norm).

        Accepts host numpy batches (placed synchronously) or batches already
        placed by :class:`DevicePrefetcher` (no extra transfer)."""
        self.init()
        if isinstance(batch["frames"], jax.Array):
            batch = {k: batch[k] for k in ("frames", "buttons", "camera", "firsts", "mask")}
        else:
            batch = {
                "frames": batch["frames"],
                "buttons": batch["buttons"].astype(np.int32),
                "camera": batch["camera"].astype(np.int32),
                "firsts": batch["firsts"].astype(bool),
                "mask": batch["mask"].astype(bool),
            }
            batch = place_local_batch(batch, seq_sharded(self.mesh))
        self.variables, self.opt_state, state, loss, grad_norm = self._train_step(
            self.variables, self.opt_state, batch, state
        )
        self.step_count += 1
        return state, loss, grad_norm

    def train_step_flops(self, batch: Dict[str, np.ndarray], state):
        """Exact XLA FLOPs of one compiled train step (None when the platform
        can't report cost analysis).  Roofline denominator for bench.py."""
        from vpt_tpu.utils.profiling import compiled_flops

        self.init()
        try:
            batch = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x), batch_sharded(self.mesh)), dict(batch)
            )
        except Exception:
            return None
        return compiled_flops(self._train_step, self.variables, self.opt_state, batch, state)

    def initial_state(self, batch_size: int):
        """``batch_size`` is GLOBAL (all hosts' streams together)."""
        if jax.process_count() > 1:
            # some of the sharding's devices aren't addressable from this
            # host: build the zeros as a global computation, not a device_put
            return device_zeros_like_tree(
                lambda: policy_initial_state(self.cfg, batch_size),
                batch_sharded(self.mesh),
            )
        state = policy_initial_state(self.cfg, batch_size)
        return jax.device_put(state, batch_sharded(self.mesh))

    # ------------------------------------------------------------- evaluation

    def _build_eval_step(self):
        policy, specs = self.policy, self.head_specs
        # Under QAT the train loss sees fake-quantized dense kernels; score
        # held-out NLL under the same weight numerics (and the same numerics
        # int8 serving will use), not the raw float params.
        qat_mask = self._qat_mask() if self.qat_dense else None

        def eval_step(variables, batch, state):
            if qat_mask is not None:
                from vpt_tpu.ops.int8 import fake_quant_dense_params

                variables = dict(variables)
                variables["params"] = fake_quant_dense_params(
                    variables["params"], mask=qat_mask
                )
            out, state_out = policy.apply(
                variables, batch["frames"], batch["firsts"], state
            )
            actions = {
                "buttons": batch["buttons"][..., None],
                "camera": batch["camera"][..., None],
            }
            logp = dict_logprob(out["pi_logits"], actions, specs)
            mask = batch["mask"].astype(jnp.float32)
            return -(logp * mask).sum(), mask.sum(), state_out

        return jax.jit(eval_step)

    def evaluate(self, data_dir: str, max_batches: Optional[int] = None,
                 labels_dir: Optional[str] = None) -> Dict[str, float]:
        """Held-out BC objective over a dataset directory: mask-weighted
        negative log-likelihood per frame (no gradient, no parameter update).

        Comparability caveat: the loader's round-robin trajectory partition
        (and its stop-at-first-exhausted-stream epoch end) depend on
        ``hp.batch_size``, so different batch sizes score different frame
        subsets.  Compare runs at the SAME batch size — or batch_size=1,
        which scores every trajectory end to end; the reported ``frames``
        count makes coverage explicit either way."""
        from vpt_tpu.data.loader import SequenceDataLoader

        self.init()
        if getattr(self, "_eval_step", None) is None:
            self._eval_step = self._build_eval_step()
        eval_step = self._eval_step
        # multi-host: hp.batch_size is GLOBAL, exactly as in train() — each
        # process loads its disjoint stream shard and contributes it via
        # place_local_batch; nll/frames come back replicated (global sums)
        nproc, pid = jax.process_count(), jax.process_index()
        assert self.hp.batch_size % nproc == 0, (
            f"global batch_size {self.hp.batch_size} must divide over {nproc} processes"
        )
        local_bs = self.hp.batch_size // nproc
        loader = SequenceDataLoader(
            data_dir, batch_size=local_bs, chunk_len=self.hp.chunk_len,
            n_epochs=1, seed=self._seed,
            resolution=(self.cfg.img_shape[1], self.cfg.img_shape[0]),
            shard_id=pid, num_shards=nproc,
            labels_dir=labels_dir,
        )
        state = self.initial_state(self.hp.batch_size)
        last_episode = np.full(local_bs, -1, np.int64)
        nll_sum, frames = 0.0, 0.0
        n_batches = 0
        try:
            for batch in loader:
                last_episode = inject_episode_firsts(batch, last_episode, self.hp.chunk_len)
                placed = {
                    "frames": batch["frames"],
                    "buttons": batch["buttons"].astype(np.int32),
                    "camera": batch["camera"].astype(np.int32),
                    "firsts": batch["firsts"].astype(bool),
                    "mask": batch["mask"].astype(bool),
                }
                # addressable-shard-aware placement, same as train_step — a
                # bare device_put fails on a multi-host mesh where some of
                # the sharding's devices live on other hosts
                placed = place_local_batch(placed, seq_sharded(self.mesh))
                nll, n, state = eval_step(self.variables, placed, state)
                nll_sum += float(nll)
                frames += float(n)
                n_batches += 1
                if max_batches and n_batches >= max_batches:
                    break
        finally:
            loader.close()
        return {
            "nll_per_frame": nll_sum / max(frames, 1.0),
            "frames": int(frames),
            "batches": n_batches,
        }

    # -------------------------------------------------------------------- run

    def train(
        self,
        data_dir: str,
        out_weights: str,
        metrics: Optional[MetricsLogger] = None,
        resume_dir: Optional[str] = None,
        labels_dir: Optional[str] = None,
    ):
        """Full fine-tuning run over a contractor dataset directory — or,
        with ``labels_dir``, over IDM-pseudo-labeled video (the VPT paper's
        web-video BC stage: videos in ``data_dir``, ``tools/label_videos.py``
        jsonl in ``labels_dir``).

        Multi-host (after ``maybe_initialize_distributed``): ``hp.batch_size``
        stays the GLOBAL batch; each process loads its own disjoint shard of
        ``batch_size / process_count`` streams (the loader's global stream
        grid makes the union identical to a single-host run) and contributes
        it to the global batch via ``place_local_batch``.  Process 0 writes
        checkpoints/weights; every other process records only its data shard's
        cursor under ``<checkpoint_dir>/shard<p>``.  Assumes the usual pod
        setup where ``checkpoint_dir`` is shared storage (GCS/NFS)."""
        from vpt_tpu.checkpoint import native as native_ckpt
        from vpt_tpu.data.loader import SequenceDataLoader

        hp = self.hp
        self.init()
        nproc, pid = jax.process_count(), jax.process_index()
        assert hp.batch_size % nproc == 0, (
            f"global batch_size {hp.batch_size} must divide over {nproc} processes"
        )
        local_bs = hp.batch_size // nproc
        metrics = metrics or MetricsLogger()
        start_traj = 0
        resume_state = None
        if resume_dir:
            # the template preserves the optax namedtuple pytree structure —
            # a bare orbax restore returns nested dicts/lists that the jitted
            # train step (and optimizer.update) cannot consume
            template = {
                "variables": host_tree(self.variables),
                "opt_state": host_tree(self.opt_state),
            }
            payload, data_state = native_ckpt.restore_checkpoint(resume_dir, template=template)
            if payload is not None:
                self.variables = self._place_variables(payload["variables"])
                # place restored moments exactly like a fresh optimizer.init
                # would (replicated, or tp/fsdp-sharded following the params)
                ref_state = self._init_opt_state(self.variables["params"])
                self.opt_state = jax.tree.map(
                    lambda ref, x: place_host_array(x, ref.sharding), ref_state, payload["opt_state"]
                )
                if data_state:
                    if pid > 0:
                        # this process's own shard cursor (written alongside
                        # process 0's full checkpoint); keep process 0's
                        # step_count if the shard cursor is missing
                        # pinned to the STEP rank 0's restore actually
                        # picked: the shard dir's latest may be newer when a
                        # preemption landed between the ranks' writes, which
                        # would silently desync the data shards
                        shard_state = native_ckpt.restore_data_state(
                            os.path.join(resume_dir, f"shard{pid}"),
                            step=data_state.get("step_count"),
                        )
                        data_state = shard_state or {
                            k: data_state[k]
                            for k in ("n_trajectories_dispatched", "step_count")
                            if k in data_state
                        }
                    start_traj = int(data_state.get("n_trajectories_dispatched", 0))
                    self.step_count = int(data_state.get("step_count", 0))
                    # exact per-stream cursor (trajectory, chunks consumed);
                    # falls back to the coarse whole-trajectory cursor for
                    # checkpoints written before it existed
                    if data_state.get("streams"):
                        resume_state = {
                            "streams": data_state["streams"],
                            "shard": data_state.get("shard", [0, 1]),
                        }

        loader = SequenceDataLoader(
            data_dir,
            batch_size=local_bs,
            chunk_len=hp.chunk_len,
            n_epochs=hp.epochs,
            seed=self._seed,
            start_trajectory=start_traj,
            resume_state=resume_state,
            resolution=(self.cfg.img_shape[1], self.cfg.img_shape[0]),
            shard_id=pid,
            num_shards=nproc,
            labels_dir=labels_dir,
        )

        # Preemption safety: SIGTERM/SIGINT triggers a final checkpoint before
        # exit (TPU pods get preempted; the reference loses all progress).
        import signal

        stop_requested = {"flag": False}

        def _request_stop(signum, frame):
            stop_requested["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:  # non-main thread
                pass
        state = self.initial_state(hp.batch_size)
        # reset stream state when its episode changes (local streams only;
        # each process injects firsts for the rows it contributes)
        last_episode = np.full(local_bs, -1, np.int64)
        start = time.time()
        loss_sum, frames_seen = 0.0, 0

        def with_episode_firsts(batches):
            # runs inside the prefetch thread: snapshot the loader's cursor
            # per batch so checkpoints record TRAINED progress, not the
            # prefetch queue's read-ahead
            nonlocal last_episode
            for batch in batches:
                batch["_cursor"] = loader.state()
                last_episode = inject_episode_firsts(batch, last_episode, hp.chunk_len)
                yield batch

        data_cursor = loader.state()
        try:
            # H2D transfer of batch k+1 overlaps the device compute of step k
            synced = False
            for batch in DevicePrefetcher(
                with_episode_firsts(loader), seq_sharded(self.mesh)
            ):
                data_cursor = batch.pop("_cursor")
                if not synced:
                    # first batch: loader-startup skew is unbounded, and a
                    # rank reaching the first collective >30s early trips
                    # gloo's context-init window (parallel/mesh.py)
                    cross_host_barrier(f"bc_first_step_{self.step_count}")
                    synced = True
                state, loss, grad_norm = self.train_step(batch, state)
                loss_sum += float(loss)
                frames_seen += int(batch["mask"].sum())
                if self.step_count % hp.loss_report_rate == 0:
                    dt = time.time() - start
                    metrics.log(
                        step=self.step_count,
                        loss=loss_sum / hp.loss_report_rate,
                        grad_norm=float(grad_norm),
                        frames_per_sec=frames_seen / max(dt, 1e-9),
                        wall_time=dt,
                    )
                    loss_sum = 0.0
                checkpoint_now = (
                    hp.checkpoint_every
                    and self.step_count % hp.checkpoint_every == 0
                    and hp.checkpoint_dir
                )
                if checkpoint_now or (stop_requested["flag"] and hp.checkpoint_dir):
                    cursor = {**data_cursor, "step_count": self.step_count}
                    # host_tree runs on EVERY rank: when fsdp/tp shards cross
                    # hosts it issues a global-mesh allgather, and a collective
                    # entered by rank 0 alone would deadlock the pod — only
                    # the file write is rank-gated
                    vars_host = host_tree(self.variables)
                    opt_host = host_tree(self.opt_state)
                    # collective: every rank joins orbax's save sync (a
                    # rank-0-only call would hang the pod); orbax elects the
                    # writer, rank 0 adds the cursor, others their shard's
                    native_ckpt.save_checkpoint(
                        hp.checkpoint_dir,
                        self.step_count,
                        vars_host,
                        opt_state=opt_host,
                        data_state=cursor if pid == 0 else None,
                    )
                    if pid > 0:
                        native_ckpt.save_data_state(
                            os.path.join(hp.checkpoint_dir, f"shard{pid}"),
                            self.step_count,
                            cursor,
                        )
                if stop_requested["flag"]:
                    metrics.log(event="preempted", step=self.step_count)
                    break
        finally:
            loader.close()
            for sig, handler in old_handlers.items():
                signal.signal(sig, handler)
        final_vars = host_tree(self.variables)  # all ranks join the allgather
        if pid == 0:
            save_weights(out_weights, final_vars)
        return self.step_count
