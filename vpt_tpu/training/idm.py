"""Inverse-dynamics-model training — the VPT pipeline stage the reference
ships only the OUTPUT of.

The reference consumes a PRE-trained IDM (run_inverse_dynamics_model.py,
README.md:81-99: "4x_idm.weights"); the VPT recipe that produced it — train
an IDM on a small contractor-labeled corpus, then pseudo-label web-scale
video for behavioural cloning — has no public training code.  This module
closes that loop so the whole pipeline runs end-to-end in one framework:

    contractor mp4+jsonl ──IDMTrainer──▶ idm.weights
    unlabeled mp4 corpus ──tools/label_videos.py (that IDM)──▶ action jsonl
    video + pseudo-labels ──BCTrainer──▶ policy.weights ──PPOTrainer──▶ RL

Differences from BC training (training/bc.py), all forced by the model:

  * the IDM attends BIDIRECTIONALLY inside its window (attention_mask_style
    "none", reference policy.py:374-392), so windows are independent
    training examples — no recurrent state is carried between chunks, no
    episode-first injection, and ``firsts`` is all-False exactly as the
    labeling forward passes it (agent/idm.py);
  * targets are the FACTORED action space the IDM predicts (20 binary
    buttons + 2×11 camera bins, IDMActionMapping) rather than the joint
    8641/121 indices; the loader's joint indices are converted per batch via
    ``CameraHierarchicalMapping.to_factored``'s exact gather tables, so IDM
    targets are bit-consistent with the labels BC itself trains on;
  * there is no value head, so no grad-masking quirk applies.

Hyperparameters default to the BC fine-tuning values (the VPT paper does not
publish the IDM schedule; these are this framework's choice, not a
reference constant — documented as such).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vpt_tpu.actions.mapping import CameraHierarchicalMapping, IDMActionMapping
from vpt_tpu.checkpoint import (
    load_model_parameters,
    load_weights,
    save_weights,
    state_dict_to_variables,
)
from vpt_tpu.config import PolicyConfig
from vpt_tpu.models.heads import dict_logprob, head_specs_from_space
from vpt_tpu.models.policy import (
    InverseActionPolicy,
    idm_input_shape,
    policy_initial_state,
)
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
from vpt_tpu.training.bc import DevicePrefetcher, make_optimizer
from vpt_tpu.utils.metrics import MetricsLogger


@dataclasses.dataclass
class IDMHyperparams:
    # optimizer values shared with BC fine-tuning (training/bc.py:48-50);
    # the paper publishes no IDM schedule — ours, not a reference constant
    learning_rate: float = 0.000181
    weight_decay: float = 0.039428
    max_grad_norm: float = 5.0
    epochs: int = 2
    batch_size: int = 8
    window: int = 128                 # frames per training example; must be
    #                                   ≤ the config's timesteps (the
    #                                   published IDM's geometry is 128)
    loss_report_rate: int = 100
    checkpoint_every: int = 0
    checkpoint_dir: Optional[str] = None


def factored_targets(buttons_joint: np.ndarray, camera_joint: np.ndarray,
                     mapper: CameraHierarchicalMapping) -> Dict[str, np.ndarray]:
    """Joint (…,) indices → the IDM's factored targets.

    Uses the joint mapping's own ``to_factored`` (gather tables +
    camera-meta nulling), so the IDM learns to predict exactly the labels
    the BC stage consumes — including the quirk that sub-threshold camera
    motion is nulled when the camera meta-button is off."""
    fac = mapper.to_factored({
        "buttons": np.asarray(buttons_joint)[..., None],
        "camera": np.asarray(camera_joint)[..., None],
    })
    return {
        "buttons": fac["buttons"].astype(np.int32),   # (…, 20) in {0, 1}
        "camera": fac["camera"].astype(np.int32),     # (…, 2) bins in [0, 11)
    }


class IDMTrainer:
    """Window-batched data-parallel IDM training (InverseActionPolicy)."""

    def __init__(
        self,
        idm_net_kwargs: Dict[str, Any],
        pi_head_kwargs: Dict[str, Any],
        hp: Optional[IDMHyperparams] = None,
        mesh=None,
        compute_dtype: str = "float32",
        remat: bool = False,
        cnn_scan_chunks: int = 0,
        qat_dense: bool = False,
        seed: int = 0,
    ):
        self.hp = hp or IDMHyperparams()
        self.mesh = mesh if mesh is not None else make_mesh()
        self.cfg = PolicyConfig.from_kwargs(dict(idm_net_kwargs)).replace(
            compute_dtype=compute_dtype, remat=remat, cnn_scan_chunks=cnn_scan_chunks
        )
        assert self.hp.window <= self.cfg.timesteps, (
            f"window {self.hp.window} exceeds the model geometry "
            f"timesteps={self.cfg.timesteps}"
        )
        self.temperature = float(pi_head_kwargs.get("temperature", 1.0))
        # factored space the IDM predicts + the joint mapping whose tables
        # convert the loader's indices into those targets
        self.action_mapper = IDMActionMapping(n_camera_bins=11)
        self.joint_mapper = CameraHierarchicalMapping(n_camera_bins=11)
        space = DictType(**self.action_mapper.get_action_space_update())
        self.head_specs = head_specs_from_space(space)
        self.policy = InverseActionPolicy(
            cfg=self.cfg, head_specs=self.head_specs, temperature=self.temperature
        )
        self.optimizer = make_optimizer(self.hp)
        self.qat_dense = qat_dense
        self._seed = seed
        self.variables = None
        self.opt_state = None
        self.step_count = 0
        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------ setup

    @property
    def _params_sharded(self) -> bool:
        return int(self.mesh.shape.get("tp", 1)) > 1 or int(self.mesh.shape.get("fsdp", 1)) > 1

    def _place_variables(self, variables):
        from vpt_tpu.parallel.fsdp import place_variables

        return place_variables(variables, self.mesh)

    def _template_args(self, t: int = 2):
        img = jnp.zeros((1, t) + idm_input_shape(self.cfg), jnp.uint8)
        state = policy_initial_state(self.cfg, 1)
        return img, jnp.zeros((1, t), bool), state

    def init(self):
        if self.variables is not None:
            return
        img, first, state = self._template_args()
        self.variables = jax.jit(self.policy.init)(
            jax.random.PRNGKey(self._seed), img, first, state
        )
        self.variables = self._place_variables(self.variables)
        from vpt_tpu.parallel.fsdp import init_opt_state

        self.opt_state = init_opt_state(self.optimizer, self.variables["params"], self.mesh)

    def load_weights(self, path: str):
        """Warm-start from a ``.weights`` file (e.g. the published 4x IDM,
        or a previous run's output)."""
        self.init()
        sd = load_weights(path)
        self.variables, report = state_dict_to_variables(
            sd, variables=host_tree(self.variables)
        )
        self.variables = self._place_variables(self.variables)
        return report

    @classmethod
    def from_files(cls, in_model: str, in_weights: Optional[str] = None, **kw) -> "IDMTrainer":
        net_kwargs, pi_head_kwargs = load_model_parameters(in_model)
        trainer = cls(net_kwargs, pi_head_kwargs, **kw)
        trainer.init()
        if in_weights:
            trainer.load_weights(in_weights)
        return trainer

    # ------------------------------------------------------------------- step

    def _qat_mask(self):
        from vpt_tpu.ops.int8 import quantized_kernel_mask

        qpolicy = InverseActionPolicy(
            cfg=self.cfg.replace(quantize_dense=True),
            head_specs=self.head_specs,
            temperature=self.temperature,
        )
        img, first, state = self._template_args()
        template = jax.eval_shape(qpolicy.init, jax.random.PRNGKey(0), img, first, state)
        float_template = jax.eval_shape(self.policy.init, jax.random.PRNGKey(0), img, first, state)
        return quantized_kernel_mask(float_template["params"], template["params"])

    def _build_train_step(self):
        policy, specs, optimizer = self.policy, self.head_specs, self.optimizer
        qat_mask = self._qat_mask() if self.qat_dense else None

        def loss_fn(params, extra_collections, batch, state):
            if qat_mask is not None:
                from vpt_tpu.ops.int8 import fake_quant_dense_params

                params = fake_quant_dense_params(params, mask=qat_mask)
            variables = {"params": params, **extra_collections}
            # windows are independent: fresh zero state, firsts all-False —
            # exactly the labeling-time forward (agent/idm.py predict_actions)
            out, _ = policy.apply(
                variables, batch["frames"], jnp.zeros(batch["frames"].shape[:2], bool), state
            )
            logp = dict_logprob(
                out["pi_logits"],
                {"buttons": batch["buttons"], "camera": batch["camera"]},
                specs,
            )  # (B, T)
            mask = batch["mask"].astype(jnp.float32)
            return -(logp * mask).sum() / (logp.shape[0] * logp.shape[1])

        def train_step(variables, opt_state, batch, state):
            params = variables["params"]
            extra = {k: v for k, v in variables.items() if k != "params"}
            loss, grads = jax.value_and_grad(loss_fn)(params, extra, batch, state)
            grad_norm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return {"params": params, **extra}, opt_state, loss, grad_norm

        if self._params_sharded:
            return jax.jit(train_step, donate_argnums=(0, 1))
        data_sh = seq_sharded(self.mesh)
        state_sh = batch_sharded(self.mesh)
        repl = replicated(self.mesh)
        return jax.jit(
            train_step,
            in_shardings=(repl, repl, data_sh, state_sh),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(0, 1),
        )

    def _prepare_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Host-side target conversion: joint loader indices → factored IDM
        targets (exact to_factored gather tables), dtype-normalized."""
        targets = factored_targets(batch["buttons"], batch["camera"], self.joint_mapper)
        return {
            "frames": batch["frames"],
            "buttons": targets["buttons"],
            "camera": targets["camera"],
            # unused by the IDM forward (windows are unconditioned) but kept
            # so DevicePrefetcher's fixed key set can place the batch
            "firsts": np.zeros(np.asarray(batch["mask"]).shape, bool),
            "mask": np.asarray(batch["mask"]).astype(bool),
        }

    def train_step(self, batch: Dict[str, np.ndarray], state=None):
        """One optimizer step on a (B, T) window batch with JOINT action
        indices (the loader's format); returns (loss, grad_norm).

        Batches already carrying factored int32 targets as jax arrays (from
        the train() prefetcher) are consumed without re-conversion."""
        self.init()
        if state is None:
            state = self.initial_state(np.asarray(batch["frames"]).shape[0])
        if not isinstance(batch["frames"], jax.Array):
            batch = self._prepare_batch(batch)
            batch = place_local_batch(batch, seq_sharded(self.mesh))
        # one jit signature for both call paths: the prefetcher's extra
        # "firsts" key (placement-only) is dropped before the compiled step
        batch = {k: batch[k] for k in ("frames", "buttons", "camera", "mask")}
        self.variables, self.opt_state, loss, grad_norm = self._train_step(
            self.variables, self.opt_state, batch, state
        )
        self.step_count += 1
        return loss, grad_norm

    def initial_state(self, batch_size: int):
        """``batch_size`` is GLOBAL (all hosts' windows together)."""
        if jax.process_count() > 1:
            return device_zeros_like_tree(
                lambda: policy_initial_state(self.cfg, batch_size),
                batch_sharded(self.mesh),
            )
        return jax.device_put(
            policy_initial_state(self.cfg, batch_size), batch_sharded(self.mesh)
        )

    def train_step_flops(self, batch, state):
        from vpt_tpu.utils.profiling import compiled_flops

        self.init()
        return compiled_flops(self._train_step, self.variables, self.opt_state, batch, state)

    # ------------------------------------------------------------- evaluation

    def _build_eval_step(self):
        policy, specs = self.policy, self.head_specs
        qat_mask = self._qat_mask() if self.qat_dense else None

        def eval_step(variables, batch, state):
            if qat_mask is not None:
                from vpt_tpu.ops.int8 import fake_quant_dense_params

                variables = dict(variables)
                variables["params"] = fake_quant_dense_params(variables["params"], mask=qat_mask)
            out, _ = policy.apply(
                variables, batch["frames"], jnp.zeros(batch["frames"].shape[:2], bool), state
            )
            logits = out["pi_logits"]
            logp = dict_logprob(
                logits, {"buttons": batch["buttons"], "camera": batch["camera"]}, specs
            )
            mask = batch["mask"].astype(jnp.float32)
            # deterministic argmax agreement, the labeling-time decode
            button_hit = (jnp.argmax(logits["buttons"], -1) == batch["buttons"]).all(-1)
            camera_hit = (jnp.argmax(logits["camera"], -1) == batch["camera"]).all(-1)
            return (
                -(logp * mask).sum(),
                (button_hit * mask).sum(),
                (camera_hit * mask).sum(),
                mask.sum(),
            )

        return jax.jit(eval_step)

    def evaluate(self, data_dir: str, max_batches: Optional[int] = None) -> Dict[str, float]:
        """Held-out NLL per frame plus exact-match rates of the argmax decode
        (all 20 buttons right / both camera bins right) — the quantities that
        decide whether the IDM is good enough to pseudo-label a corpus."""
        from vpt_tpu.data.loader import SequenceDataLoader

        self.init()
        if getattr(self, "_eval_step", None) is None:
            self._eval_step = self._build_eval_step()
        loader = SequenceDataLoader(
            data_dir, batch_size=self.hp.batch_size, chunk_len=self.hp.window,
            n_epochs=1, seed=self._seed,
            resolution=(self.cfg.img_shape[1], self.cfg.img_shape[0]),
        )
        state = self.initial_state(self.hp.batch_size)
        nll, btn, cam, frames, n_batches = 0.0, 0.0, 0.0, 0.0, 0
        try:
            for batch in loader:
                placed = jax.tree.map(
                    lambda x: jax.device_put(x, seq_sharded(self.mesh)),
                    self._prepare_batch(batch),
                )
                a, b, c, n = self._eval_step(self.variables, placed, state)
                nll += float(a)
                btn += float(b)
                cam += float(c)
                frames += float(n)
                n_batches += 1
                if max_batches and n_batches >= max_batches:
                    break
        finally:
            loader.close()
        frames = max(frames, 1.0)
        return {
            "nll_per_frame": nll / frames,
            "button_exact_match": btn / frames,
            "camera_exact_match": cam / frames,
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
    ):
        """Full training run over a contractor-labeled dataset directory
        (mp4 + jsonl pairs, the same layout BC trains on).

        Multi-host: same contract as BCTrainer.train — ``hp.batch_size`` is
        the GLOBAL batch, each process loads a disjoint stream shard, process
        0 writes checkpoints/weights, others record their shard cursor under
        ``<checkpoint_dir>/shard<p>`` (shared storage assumed)."""
        import os
        import signal

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
            template = {
                "variables": host_tree(self.variables),
                "opt_state": host_tree(self.opt_state),
            }
            payload, data_state = native_ckpt.restore_checkpoint(resume_dir, template=template)
            if payload is not None:
                self.variables = self._place_variables(payload["variables"])
                from vpt_tpu.parallel.fsdp import init_opt_state

                ref_state = init_opt_state(self.optimizer, self.variables["params"], self.mesh)
                self.opt_state = jax.tree.map(
                    lambda ref, x: place_host_array(x, ref.sharding), ref_state, payload["opt_state"]
                )
                if data_state:
                    if pid > 0:
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
                    if data_state.get("streams"):
                        resume_state = {
                            "streams": data_state["streams"],
                            "shard": data_state.get("shard", [0, 1]),
                        }

        loader = SequenceDataLoader(
            data_dir,
            batch_size=local_bs,
            chunk_len=hp.window,
            n_epochs=hp.epochs,
            seed=self._seed,
            start_trajectory=start_traj,
            resume_state=resume_state,
            resolution=(self.cfg.img_shape[1], self.cfg.img_shape[0]),
            shard_id=pid,
            num_shards=nproc,
        )

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
        start = time.time()
        loss_sum, frames_seen = 0.0, 0

        def with_targets(batches):
            # runs inside the prefetch thread: joint→factored conversion and
            # cursor snapshot overlap the device step
            for batch in batches:
                prepared = self._prepare_batch(batch)
                prepared["_cursor"] = loader.state()
                yield prepared

        data_cursor = loader.state()
        try:
            synced = False
            for batch in DevicePrefetcher(with_targets(loader), seq_sharded(self.mesh)):
                data_cursor = batch.pop("_cursor")
                if not synced:
                    # see BCTrainer.train: align ranks before the first
                    # cross-host collective (gloo's ~30s init window)
                    cross_host_barrier(f"idm_first_step_{self.step_count}")
                    synced = True
                loss, grad_norm = self.train_step(batch, state)
                loss_sum += float(loss)
                # global SPMD sum, NOT np.asarray: the mask is a global array
                # whose shards span other hosts under multi-process meshes
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
                    # host_tree on EVERY rank (cross-host fsdp/tp leaves
                    # allgather collectively); only the write is rank-gated
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
