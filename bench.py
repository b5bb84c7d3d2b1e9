"""Benchmark: the BASELINE.json metric suite on the real chip.

Prints ONE JSON line.  A bare ``python bench.py`` runs the full suite —
3x-policy rollout (the BASELINE headline, README.md:55 is the 3x model),
2x rollout, 4x IDM labeling, and 1x BC training — with the 3x rollout as
the top-level value and the rest under ``"suite"``:

  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N,
   "suite": {...}}

Individual metrics remain addressable via ``--metric rollout|idm|bc|...``.

``vs_baseline`` compares against a torch-CPU measurement of the same
architecture (the reference implementation's framework on the only hardware
it can run on in this image — no CUDA, and the reference's A100 numbers are
unpublished); ``vs_baseline_is`` spells this out.  The honest device-limit
comparison is ``mxu_utilization`` against the measured chip ceiling.  The
torch number is measured once and cached in ``BENCH_BASELINE.json``; pass
--remeasure-baseline to refresh it.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial

import numpy as np

# the coupled bc-e2e leg runs loader workers next to jit compiles on what may
# be a 1-core host; a starved worker must not fail the whole suite artifact
os.environ.setdefault("VPT_QUEUE_TIMEOUT", "120")

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")

N_STREAMS = 64
# Best 3x serving geometry from the round-3 stream-axis sweep (docs/ROADMAP.md
# "Stream-axis sweep"): 2x peaks at 64 streams (6520 fps) and degrades
# monotonically beyond; 3x gains +9.7% at 128 (2637 fps — the wider trunk is
# more weight-read-bound per stream, so doubling the streams amortizes weight
# reads) and saturates there (256 ≈ 128 within noise).
N_STREAMS_3X = 128
WARMUP_STEPS = 5
MEASURE_STEPS = 60


def compiled_flops(jitted, *args):
    """Exact XLA FLOPs for one call of a jitted function (None if the
    platform can't report cost analysis)."""
    from vpt_tpu.utils.profiling import compiled_flops as _impl

    return _impl(jitted, *args)


def measure_ceiling_tflops(iters: int = 256, n: int = 4096) -> float:
    """This chip's sustained bf16 matmul ceiling, measured (chained scan of
    n³ matmuls defeats the axon tunnel's async-dispatch timing trap)."""
    import jax
    import jax.numpy as jnp

    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def chained(a, b):
        def body(c, _):
            return jnp.tanh(c @ b), None
        c, _ = jax.lax.scan(body, a, None, length=iters)
        return c

    out = chained(a, b)
    np.asarray(out[0, :2])  # warm + force
    t0 = time.perf_counter()
    out = chained(a, b)
    np.asarray(out[0, :2])
    dt = time.perf_counter() - t0
    return 2 * n**3 * iters / dt / 1e12


def cached_ceiling_tflops(remeasure: bool = False) -> float:
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    if not remeasure and cache.get("ceiling_tflops_bf16"):
        return float(cache["ceiling_tflops_bf16"])
    ceiling = measure_ceiling_tflops()
    cache["ceiling_tflops_bf16"] = round(ceiling, 2)
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f)
    return ceiling


def roofline_fields(fps, flops_per_item, ceiling_tflops):
    """fps × FLOPs/frame vs the measured chip ceiling."""
    if not flops_per_item or not ceiling_tflops:
        return {}
    achieved = fps * flops_per_item / 1e12
    return {
        "model_gflops_per_frame": round(flops_per_item / 1e9, 2),
        "achieved_tflops": round(achieved, 2),
        "ceiling_tflops": round(ceiling_tflops, 2),
        "mxu_utilization": round(achieved / ceiling_tflops, 4),
    }


def bench_tpu(n_streams: int = N_STREAMS, compute_dtype: str = "bfloat16", width: int = 2,
              params_dtype: str = "float32", quantize_dense: bool = False,
              pool_impl: str = "xla"):
    import jax
    import jax.numpy as jnp

    from vpt_tpu.actions.mapping import CameraHierarchicalMapping
    from vpt_tpu.config import FOUNDATION_POLICY_KWARGS, PolicyConfig
    from vpt_tpu.models.heads import dict_sample, head_specs_from_space
    from vpt_tpu.models.policy import MinecraftAgentPolicy, policy_initial_state
    from vpt_tpu.spaces import DictType

    cfg = PolicyConfig.from_kwargs(FOUNDATION_POLICY_KWARGS).replace(
        compute_dtype=compute_dtype, hidsize=1024 * width, impala_width=4 * width,
        pool_impl=pool_impl,
    )
    mapper = CameraHierarchicalMapping(n_camera_bins=11)
    specs = head_specs_from_space(DictType(**mapper.get_action_space_update()))
    model = MinecraftAgentPolicy(cfg=cfg, head_specs=specs, temperature=2.0)

    img = jnp.zeros((n_streams, 1, 128, 128, 3), jnp.uint8)
    first = jnp.zeros((n_streams, 1), bool)
    state = policy_initial_state(cfg, n_streams, ring=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, first, state)
    if quantize_dense:
        # the t=1 decode is weight-read-bound (the 2x trunk reads ~1.6 GB of
        # f32 dense weights per step); int8 kernels quarter that traffic
        from vpt_tpu.ops.int8 import quantize_variables

        qmodel = MinecraftAgentPolicy(
            cfg=cfg.replace(quantize_dense=True), head_specs=specs, temperature=2.0
        )
        template = jax.eval_shape(qmodel.init, jax.random.PRNGKey(0), img, first, state)
        variables = jax.device_put(
            quantize_variables(jax.tree.map(np.asarray, variables), template)
        )
        model = qmodel
    elif params_dtype != "float32":
        from vpt_tpu.checkpoint import cast_params

        variables = cast_params(variables, params_dtype)

    # donate the recurrent state (like the serving path, agent/agent.py):
    # without it XLA must copy every ring cache before its slot write —
    # ~48 MB per block per step at 3x — because the input buffer is live
    @partial(jax.jit, donate_argnums=(3,))
    def step(variables, img, first, state, key):
        out, state = model.apply(variables, img, first, state)
        logits = jax.tree.map(lambda x: x[:, -1], out["pi_logits"])
        key, sub = jax.random.split(key)
        action = dict_sample(sub, logits, specs)
        return action, state, key

    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    frames = [
        jnp.asarray(rng.integers(0, 255, (n_streams, 1, 128, 128, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    # warmup/compile; NOTE: on the tunneled 'axon' platform block_until_ready
    # does not actually wait, so completion is forced by a host transfer
    for i in range(WARMUP_STEPS):
        action, state, key = step(variables, frames[i % 4], first, state, key)
    np.asarray(action["buttons"])

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        action, state, key = step(variables, frames[i % 4], first, state, key)
    np.asarray(action["buttons"])  # single D2H closes the dependency chain
    dt = time.perf_counter() - t0
    flops = compiled_flops(step, variables, frames[0], first, state, key)
    return n_streams * MEASURE_STEPS / dt, (flops / n_streams if flops else None)


IDM_4X_KWARGS = dict(
    # Representative 4x-width IDM architecture (the published checkpoint
    # ships its own kwargs in 4x_idm.model — unavailable offline).  Pinned to
    # the only published size fact: the paper's IDM is a 0.5B-parameter
    # model.  4x width (hidsize 4096, impala_width 16, 32 heads, conv3d
    # front, bidirectional) with 4 residual blocks would be 0.89B; at
    # n_recurrence_layers=2 the model lands at 0.482B — the 0.5B class the
    # throughput headline must benchmark (asserted in
    # tests/test_full_geometry_parity.py::test_idm_4x_bench_arch_param_count).
    # Expected delta vs the real 4x_idm.model once egress exists: depth
    # (n_recurrence_layers) and possibly attention_memory_size are the only
    # free axes; width/conv3d/head structure follow the documented 4x scaling.
    hidsize=4096,
    impala_width=16,
    impala_chans=[16, 32, 32],
    # reference convention: img_shape[2] declares the IMPALA input channel
    # count = conv3d OUTPUT channels (the published 4x IDM ships [128,128,128])
    img_shape=[128, 128, 128],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1},
    n_recurrence_layers=2,
    timesteps=128,
    attention_heads=32,
    attention_memory_size=256,
    recurrence_type="transformer",
    attention_mask_style="none",
    conv3d_params={"inchan": 3, "outchan": 128, "kernel_size": [5, 1, 1], "padding": [2, 0, 0]},
    use_pre_lstm_ln=False,
)


def bench_idm(window: int = 128, n_windows: int = 4, compute_dtype: str = "bfloat16",
              quantize_dense: bool = False, window_batch: int = 1,
              pool_impl: str = "xla"):
    """IDM labeling throughput: frames/sec for 128-frame-window batches
    (BASELINE.json config #3).  ``quantize_dense`` serves the trunk's dense
    layers from int8 weights (2x MXU peak, half the weight HBM traffic);
    ``window_batch`` stacks independent windows on the batch axis per
    forward (StreamingIDMLabeler's window_batch)."""
    import jax
    import jax.numpy as jnp

    from vpt_tpu.actions.mapping import IDMActionMapping
    from vpt_tpu.config import PolicyConfig
    from vpt_tpu.models.heads import dict_sample, head_specs_from_space
    from vpt_tpu.models.policy import InverseActionPolicy, policy_initial_state
    from vpt_tpu.spaces import DictType

    cfg = PolicyConfig.from_kwargs(IDM_4X_KWARGS).replace(
        compute_dtype=compute_dtype, pool_impl=pool_impl)
    mapper = IDMActionMapping(n_camera_bins=11)
    specs = head_specs_from_space(DictType(**mapper.get_action_space_update()))
    model = InverseActionPolicy(cfg=cfg, head_specs=specs, temperature=1.0)

    wb = window_batch
    img = jnp.zeros((wb, window, 128, 128, 3), jnp.uint8)
    first = jnp.zeros((wb, window), bool)
    state = policy_initial_state(cfg, wb)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, first, state)
    if quantize_dense:
        from vpt_tpu.ops.int8 import quantize_variables

        qmodel = InverseActionPolicy(
            cfg=cfg.replace(quantize_dense=True), head_specs=specs, temperature=1.0
        )
        template = jax.eval_shape(qmodel.init, jax.random.PRNGKey(0), img, first, state)
        variables = quantize_variables(jax.tree.map(np.asarray, variables), template)
        variables = jax.device_put(variables)
        model = qmodel

    @jax.jit
    def label(variables, img, state):
        out, state = model.apply(variables, img, first, state)
        return dict_sample(jax.random.PRNGKey(0), out["pi_logits"], specs, deterministic=True), state

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (wb, window, 128, 128, 3), dtype=np.uint8))
    action, state = label(variables, frames, state)
    np.asarray(action["buttons"])
    t0 = time.perf_counter()
    for _ in range(n_windows):
        action, state = label(variables, frames, state)
    np.asarray(action["buttons"])
    dt = time.perf_counter() - t0
    flops = compiled_flops(label, variables, frames, state)
    return wb * window * n_windows / dt, (flops / (wb * window) if flops else None)


def bench_bc_train(batch: int = 8, chunk: int = 32, steps: int = 10,
                   compute_dtype: str = "bfloat16", width: int = 1,
                   remat: bool = None, pool_impl: str = "xla"):
    """Sequence-chunked BC training throughput (frames/sec) for the
    foundation architecture at ``width`` (BASELINE.json config #4's compute
    core).  width≥2 at chunk 128 needs CNN scan-chunking to fit 16 GB.

    ``remat`` defaults by geometry: at B·T=256 frames the step fits HBM at
    every width with ALL activations saved, and dropping remat+scan is pure
    recompute savings — measured +18% at 1x (4356 → 5130 fps), +22% at 2x
    (1749 → 2128), +33% at 3x (785 → 1044, despite the 0.5B model's ~8.5 GB
    f32 Adam state resident).  B·T=1024 (the T=128 chunks) does NOT fit
    un-remat'd at 2x (XLA asks 63.5 GB of 15.75 GB HBM) and keeps the
    body-remat'd CNN scan.  Selective remat was also measured and LOST:
    saving the coarse (≤32×32) CNN feature maps as backward residuals was
    -1..-4% everywhere, and un-remat'ing only the transformer blocks was
    within noise — when the step doesn't fit, full remat is the fastest
    fit-making policy on this chip; when it fits, save everything."""
    import jax

    from vpt_tpu.config import FOUNDATION_POLICY_KWARGS
    from vpt_tpu.parallel.mesh import make_mesh
    from vpt_tpu.training.bc import BCHyperparams, BCTrainer

    kwargs = dict(FOUNDATION_POLICY_KWARGS, hidsize=1024 * width,
                  impala_width=4 * width, pool_impl=pool_impl)
    hp = BCHyperparams(batch_size=batch, chunk_len=chunk)
    # Measured fit boundary: activation memory is ~linear in frame count B·T
    # and in width (CNN channel count), so `frames · width` is the proxy.
    # Fits un-remat'd (measured): 1x at B·T=1024 (B=32/T=32 → 5485 fps),
    # 2x and 3x at B·T=256.  Does not fit: 2x at B·T=1024 (63.5 GB asked).
    small = batch * chunk * width <= 1024
    scan_chunks = 0 if small else 8
    if remat is None:
        remat = not small
    trainer = BCTrainer(kwargs, {"temperature": 2.0}, hp=hp,
                        mesh=make_mesh(), compute_dtype=compute_dtype, remat=remat,
                        cnn_scan_chunks=scan_chunks)
    trainer.init()
    rng = np.random.default_rng(0)
    b = {
        "frames": rng.integers(0, 255, (batch, chunk, 128, 128, 3), dtype=np.uint8),
        "buttons": rng.integers(0, 8641, (batch, chunk)).astype(np.int32),
        "camera": rng.integers(0, 121, (batch, chunk)).astype(np.int32),
        "firsts": np.zeros((batch, chunk), bool),
        "mask": np.ones((batch, chunk), bool),
    }
    state = trainer.initial_state(batch)
    # TWO warmup steps: the first compiles; the second recompiles once as the
    # donated-and-returned variables/opt_state/state settle into their
    # steady-state device formats (a benign one-time cost per process)
    state, loss, _ = trainer.train_step(b, state)
    state, loss, _ = trainer.train_step(b, state)
    float(loss)

    # Steady-state pipelined throughput: the trainer's DevicePrefetcher
    # overlaps H2D with compute, so the device-resident step rate is the
    # sustained number.  Two pre-placed buffers emulate the depth-2 queue.
    from vpt_tpu.parallel.mesh import batch_sharded

    sh = batch_sharded(trainer.mesh)
    placed = [
        jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), dict(b)) for _ in range(2)
    ]
    state, loss, _ = trainer.train_step(placed[0], state)  # settle batch format
    float(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss, _ = trainer.train_step(placed[i % 2], state)
    float(loss)  # force completion
    dt = time.perf_counter() - t0

    # honest transfer cost, reported alongside (a tunneled dev chip is H2D-
    # bound; a real TPU host is not).  The force must be a D2H of a value
    # that depends on EVERY uploaded leaf — block_until_ready does not wait
    # on this platform, and reading back one tiny leaf would not wait for
    # the dominant frames transfer.  A device-side reduction over all leaves
    # pulls back one scalar whose value requires every upload to complete.
    import jax.numpy as jnp

    def _upload_and_force(batch):
        moved = jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), batch)
        float(sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(moved)))

    _upload_and_force(dict(b))  # untimed: compiles the cast/sum reductions
    t0 = time.perf_counter()
    _upload_and_force(dict(b))
    h2d_seconds = time.perf_counter() - t0

    flops = trainer.train_step_flops(placed[0], state)
    fps = batch * chunk * steps / dt
    return fps, (flops / (batch * chunk) if flops else None), h2d_seconds, scan_chunks


def bench_rollout_e2e(n_streams: int = N_STREAMS, width: int = 2,
                      compute_dtype: str = "bfloat16", steps: int = 30,
                      n_groups: int = 4) -> float:
    """Whole-system serving: mock envs -> host resize -> device step ->
    device-side decode -> env actions, through the public agent API.
    Streams run as round-robin groups so D2H round trips overlap host work
    (GroupedRolloutRunner)."""
    from vpt_tpu.agent import MineRLAgent
    from vpt_tpu.agent.rollout import GroupedRolloutRunner, MockMinecraftEnv
    from vpt_tpu.config import FOUNDATION_POLICY_KWARGS

    kwargs = dict(FOUNDATION_POLICY_KWARGS, hidsize=1024 * width, impala_width=4 * width)
    agent = MineRLAgent(policy_kwargs=kwargs, pi_head_kwargs={"temperature": 2.0},
                        batch_size=n_streams // n_groups, compute_dtype=compute_dtype)
    runner = GroupedRolloutRunner(
        agent, [MockMinecraftEnv(seed=i) for i in range(n_streams)], n_groups=n_groups
    )
    runner.run(3)  # compile + warm
    return runner.run(steps)


def bench_single_env(n_steps: int = 40, width: int = 1) -> float:
    """BASELINE config #1: single-env ``get_action`` loop at 1x width through
    the public agent API (host resize → device step → device-side decode →
    one packed D2H) — the geometry run_agent.py serves a live MineRL env at.
    Directly comparable to the reference MineRLAgent.get_action loop
    (bench_torch_reference.measure_single_env_fps)."""
    from vpt_tpu.agent import MineRLAgent
    from vpt_tpu.config import FOUNDATION_POLICY_KWARGS

    kwargs = dict(FOUNDATION_POLICY_KWARGS, hidsize=1024 * width, impala_width=4 * width)
    # float32, matching run_agent.py's single-stream default
    agent = MineRLAgent(policy_kwargs=kwargs, pi_head_kwargs={"temperature": 2.0},
                        batch_size=1)
    rng = np.random.default_rng(0)
    pool = [{"pov": rng.integers(0, 255, (360, 640, 3), dtype=np.uint8)} for _ in range(4)]
    for i in range(3):
        agent.get_action(pool[i % 4])
    t0 = time.perf_counter()
    for i in range(n_steps):
        agent.get_action(pool[i % 4])
    return n_steps / (time.perf_counter() - t0)


def _bc_e2e_fixture(n_traj: int, frames_per_traj: int) -> str:
    """Synthetic contractor corpus for the coupled-BC benchmark (cached in
    /tmp): 640x360 mp4 + jsonl, every step non-null, periodic GUI segments so
    the cursor-composite path runs."""
    root = f"/tmp/vpt_bench_bc_e2e_{n_traj}x{frames_per_traj}"
    if os.path.exists(os.path.join(root, "done")):
        return root
    from vpt_tpu.data.video import VideoWriter

    os.makedirs(root, exist_ok=True)
    keys = ["key.keyboard.w", "key.keyboard.a", "key.keyboard.s", "key.keyboard.d"]
    rng = np.random.default_rng(3)
    pool = [rng.integers(0, 255, (360, 640, 3), dtype=np.uint8) for _ in range(8)]
    for j in range(n_traj):
        base = os.path.join(root, f"traj{j}")
        with VideoWriter(base + ".mp4", 640, 360, fps=20) as w:
            for i in range(frames_per_traj):
                w.write(pool[(i + j) % len(pool)])
        with open(base + ".jsonl", "w") as f:
            for i in range(frames_per_traj):
                row = {"keyboard": {"keys": [keys[(i + j) % len(keys)]]},
                       "mouse": {"x": 320.0, "y": 180.0, "dx": float(i % 5 - 2),
                                 "dy": 1.0, "buttons": [], "newButtons": []},
                       "hotbar": 0, "isGuiOpen": (i // 32) % 4 == 3}
                f.write(json.dumps(row) + "\n")
    with open(os.path.join(root, "done"), "w") as f:
        f.write("ok")
    return root


def bench_bc_e2e(batch: int = 8, chunk: int = 32, width: int = 1,
                 compute_dtype: str = "bfloat16", n_batches: int = 12,
                 measure_loader_only: bool = True):
    """COUPLED BC training: SequenceDataLoader (host decode + fixups + resize,
    one worker per stream) → DevicePrefetcher (H2D overlap) → train steps.
    The proof that the host data plane actually feeds training — the device-
    resident ceiling is ``--metric bc``; the gap is the host plane.

    Returns (coupled_fps, loader_only_fps)."""
    from vpt_tpu.config import FOUNDATION_POLICY_KWARGS
    from vpt_tpu.data.loader import SequenceDataLoader
    from vpt_tpu.parallel.mesh import batch_sharded, make_mesh
    from vpt_tpu.training.bc import BCHyperparams, BCTrainer, DevicePrefetcher

    frames_per_traj = n_batches * chunk
    data_dir = _bc_e2e_fixture(batch, frames_per_traj)

    kwargs = dict(FOUNDATION_POLICY_KWARGS, hidsize=1024 * width, impala_width=4 * width)
    hp = BCHyperparams(batch_size=batch, chunk_len=chunk)
    trainer = BCTrainer(kwargs, {"temperature": 2.0}, hp=hp, mesh=make_mesh(),
                        compute_dtype=compute_dtype, remat=False)
    trainer.init()

    # warm/compile on a synthetic batch of the same shapes (untimed)
    rng = np.random.default_rng(0)
    warm = {
        "frames": rng.integers(0, 255, (batch, chunk, 128, 128, 3), dtype=np.uint8),
        "buttons": rng.integers(0, 8641, (batch, chunk)).astype(np.int32),
        "camera": rng.integers(0, 121, (batch, chunk)).astype(np.int32),
        "firsts": np.zeros((batch, chunk), bool),
        "mask": np.ones((batch, chunk), bool),
    }
    state = trainer.initial_state(batch)
    state, loss, _ = trainer.train_step(warm, state)
    state, loss, _ = trainer.train_step(warm, state)
    float(loss)

    loader = SequenceDataLoader(data_dir, batch_size=batch, chunk_len=chunk,
                                n_epochs=1, seed=0)
    prefetcher = DevicePrefetcher(loader, batch_sharded(trainer.mesh))
    frames = 0
    t0 = time.perf_counter()
    for placed in prefetcher:
        state, loss, _ = trainer.train_step(
            {k: placed[k] for k in ("frames", "buttons", "camera", "firsts", "mask")},
            state)
        frames += placed["mask"].size  # B*T dispatched frames (padding included)
    float(loss)  # force the tail
    coupled_fps = frames / (time.perf_counter() - t0)

    loader_only_fps = None
    if measure_loader_only:
        loader = SequenceDataLoader(data_dir, batch_size=batch, chunk_len=chunk,
                                    n_epochs=1, seed=0)
        n2 = 0
        t0 = time.perf_counter()
        for b in loader:
            n2 += b["mask"].size
        loader_only_fps = n2 / (time.perf_counter() - t0)
    return coupled_fps, loader_only_fps


def bench_ppo_collect(n_streams: int = 64, rollout_len: int = 64, width: int = 2,
                      groups: int = 1, compute_dtype: str = "bfloat16",
                      n_windows: int = 3, measure_update: bool = False):
    """PPO rollout-collection throughput (frames/sec) on mock envs — the
    host/device-overlap half of RL training.  ``groups`` > 1 pipelines the
    stream axis as round-robin groups (hp.n_collect_groups): group g's env
    stepping/resize/decode overlaps group g+1's device step.

    Returns (collect_fps, update_seconds) — update_seconds is the wall time
    of ONE PPO update over the collected window (all epochs/minibatches,
    compile excluded), or None unless ``measure_update``."""
    from vpt_tpu.agent.rollout import MockMinecraftEnv
    from vpt_tpu.config import FOUNDATION_POLICY_KWARGS
    from vpt_tpu.training.rl import PPOHyperparams, PPOTrainer

    kwargs = dict(FOUNDATION_POLICY_KWARGS, hidsize=1024 * width, impala_width=4 * width)
    # minibatch sizing: the PPO minibatch body is a train step that shares
    # the chip with the collection state (frozen anchor params, the stream
    # ring KV caches, the resident window) — a width-scaled overhang the
    # BC-measured fit boundary (minibatch frames x width <= 1024 with all
    # activations saved, docs/ROADMAP.md "BC batch scaling") doesn't carry.
    # Measured at 2x, 64 streams x 64 steps (docs/ROADMAP.md "PPO update
    # geometry"): halving the boundary to <= 512 fits UN-remat'd and is the
    # fastest update — nmb=16 at 12.4 s vs 14.8 s for the remat'd nmb=8
    # (+20%); nmb=8 un-remat'd OOMs, nmb=32 doubles per-step overhead
    # (24.5 s).  1x fits un-remat'd at the full <= 1024 boundary; 3x keeps
    # the remat'd <= 1024 path (un-remat'd fits unmeasured at that width's
    # larger overhang).  Pick the fewest minibatches that fit.
    if width >= 3:
        fit, remat = 1024, True
    else:
        fit, remat = (1024 if width == 1 else 512), False
    nmb = 2
    while n_streams % nmb or (n_streams // nmb) * rollout_len * width > fit:
        nmb += 1
        assert nmb <= n_streams, "no minibatch split fits the chip"
    hp = PPOHyperparams(rollout_len=rollout_len, n_collect_groups=groups,
                        n_minibatches=nmb)
    trainer = PPOTrainer(kwargs, {"temperature": 2.0}, hp=hp,
                         compute_dtype=compute_dtype, remat=remat)
    envs = [MockMinecraftEnv(seed=i) for i in range(n_streams)]
    traj, obs, firsts = trainer.collect(envs)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n_windows):
        traj, obs, firsts = trainer.collect(envs, obs, firsts)
    # the buffer is host numpy — collect is already synchronized
    dt = time.perf_counter() - t0
    fps = n_streams * rollout_len * n_windows / dt
    update_seconds = None
    if measure_update:
        trainer.update(traj)  # compile + warm (fresh Adam state settles)
        t0 = time.perf_counter()
        trainer.update(traj)  # metrics are host floats: synchronized
        update_seconds = time.perf_counter() - t0
    return fps, update_seconds


def bench_idm_e2e(window: int = 128, stride: int = 64, window_batch: int = 8,
                  compute_dtype: str = "bfloat16", n_frames: int = 1024,
                  max_inflight: int = 1, params_dtype: str = "float32") -> float:
    """Whole-system labeling: native H.264 decode → resize → overlap-stitched
    batched IDM windows through StreamingIDMLabeler — the double-buffered
    path where host decode overlaps device compute (one window-batch stays in
    flight while the next stride decodes).  The device-only ceiling is
    ``--metric idm``; the gap between them is the host data plane."""
    from vpt_tpu.agent import IDMAgent
    from vpt_tpu.agent.idm import StreamingIDMLabeler
    from vpt_tpu.data.video import VideoReader, VideoWriter

    path = f"/tmp/vpt_bench_idm_e2e_{n_frames}.mp4"
    if not os.path.exists(path):
        rng = np.random.default_rng(0)
        # moderate-entropy frames: all-noise H.264 decodes unrealistically
        # slowly, flat frames unrealistically fast — tile a noise pool
        pool = [rng.integers(0, 255, (360, 640, 3), dtype=np.uint8) for _ in range(8)]
        with VideoWriter(path, 640, 360, fps=20) as w:
            for i in range(n_frames):
                w.write(pool[i % len(pool)])

    agent = IDMAgent(idm_net_kwargs=IDM_4X_KWARGS, pi_head_kwargs={"temperature": 1.0},
                     compute_dtype=compute_dtype, params_dtype=params_dtype)
    agent._ensure_variables()
    if params_dtype != "float32":
        from vpt_tpu.checkpoint import cast_params

        agent.variables = cast_params(agent.variables, params_dtype)

    resolution = (agent.cfg.img_shape[1], agent.cfg.img_shape[0])

    def run_once() -> float:
        # same hot loop as tools/label_videos.py: native batched decode +
        # resize (one C call per 64 frames) → feed_resized
        labeler = StreamingIDMLabeler(agent, window=window, stride=stride,
                                      window_batch=window_batch,
                                      max_inflight=max_inflight)
        n, labeled = 0, 0
        t0 = time.perf_counter()
        with VideoReader(path) as cap:
            while True:
                got, frames = cap.read_batch(64, resolution)
                for j in range(got):
                    n += 1
                    labeled += len(labeler.feed_resized(frames[j]))
                if got < 64:
                    break
            labeled += len(labeler.finish())
        assert labeled == n, (labeled, n)
        return n / (time.perf_counter() - t0)

    run_once()          # compile + warm
    return run_once()


def bench_torch_baseline(n_streams: int = N_STREAMS, width: int = 2) -> float:
    """Same architecture, the reference's own code (torch), available
    hardware (CPU): MinecraftAgentPolicy.act imported from /root/reference."""
    from bench_torch_reference import install_reference, measure_rollout_fps

    install_reference()
    return measure_rollout_fps(width=width, n_streams=n_streams)


VS_BASELINE_IS = ("torch-CPU (1 core) measurement of the REFERENCE CODE ITSELF "
                  "(imported from /root/reference and driven — bench_torch_reference.py) "
                  "on this image's only torch hardware; mxu_utilization vs the "
                  "measured chip ceiling is the device-limit view")


def read_baseline_key(key: str):
    """A cached torch-reference measurement from BENCH_BASELINE.json (written
    by bench_torch_reference.py); None when unmeasured."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            v = json.load(f).get(key)
        return float(v) if v else None
    return None


def torch_cpu_baseline(width: int, n_streams: int, remeasure: bool = False):
    """Cached torch-CPU fps of the reference code at ``width`` AND
    ``n_streams`` (the baseline must be measured at the same serving
    geometry it is ratioed against).  Prefers the reference-driven
    measurement; falls back to the rounds-1-3 re-implementation cache, then
    measures fresh.  None on failure."""
    cache = {}
    ref_key = f"torch_ref_rollout_fps_{width}x_s{n_streams}"
    legacy_keys = [f"torch_cpu_fps_{width}x_s{n_streams}"]
    if n_streams == 64:
        legacy_keys.append(f"torch_cpu_fps_{width}x")  # rounds 1-2 measured at 64
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
        if not remeasure:
            for key in [ref_key] + legacy_keys:
                if cache.get(key):
                    return float(cache[key])
    try:
        baseline = bench_torch_baseline(n_streams=n_streams, width=width)
        cache[ref_key] = round(baseline, 4)
        with open(BASELINE_CACHE, "w") as f:
            json.dump(cache, f, indent=1)
        return baseline
    except Exception as e:
        print(f"# baseline measurement failed: {e!r}", flush=True)
        return None


def result_rollout(ceiling, width=2, streams=N_STREAMS, compute_dtype="bfloat16",
                   params_dtype="float32", quantize_dense=False, remeasure=False,
                   pool_impl="xla"):
    fps, fpf = bench_tpu(n_streams=streams, compute_dtype=compute_dtype,
                         width=width, params_dtype=params_dtype,
                         quantize_dense=quantize_dense, pool_impl=pool_impl)
    baseline = torch_cpu_baseline(width, streams, remeasure=remeasure)
    variant = ""
    if quantize_dense:
        variant = ", int8 dense"
    elif params_dtype != "float32":
        variant = f", {params_dtype} params"
    return {
        "metric": f"policy rollout throughput, {width}x-width foundation arch, {streams} streams, KV cache{variant}",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline, 2) if baseline else None,
        "vs_baseline_is": VS_BASELINE_IS,
        **roofline_fields(fps, fpf, ceiling),
    }


def result_idm(ceiling, compute_dtype="bfloat16", quantize_dense=False, window_batch=1,
               pool_impl="xla"):
    fps, fpf = bench_idm(compute_dtype=compute_dtype, quantize_dense=quantize_dense,
                         window_batch=window_batch, pool_impl=pool_impl)
    name = "4x IDM labeling throughput, 128-frame windows"
    if window_batch > 1:
        name += f", {window_batch} windows/forward"
    if quantize_dense:
        name += ", int8 dense"
    baseline = read_baseline_key("torch_ref_idm_fps_w128")
    return {
        "metric": name,
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        # torch reference IDMAgent.predict_actions, same arch, one 128-frame
        # window (window batching is a capability the reference lacks)
        "vs_baseline": round(fps / baseline, 2) if baseline else None,
        "vs_baseline_is": VS_BASELINE_IS if baseline else None,
        # IDM_4X_KWARGS mirrors the documented 4x scaling at the paper's
        # 0.5B size; the published 4x_idm.model ships its own kwargs
        # (unavailable offline) — see the IDM_4X_KWARGS comment
        "arch_note": "representative 4x architecture (0.48B params, the paper's "
                     "0.5B IDM class), not the published .model kwargs",
        **roofline_fields(fps, fpf, ceiling),
    }


def result_bc(ceiling, width=1, compute_dtype="bfloat16", chunk=None, batch=None,
              remat=None, pool_impl="xla"):
    if chunk is None:
        # the README-pinned configs: 1x at T=32, flagship T=128 from 2x up
        chunk = 128 if width >= 2 else 32
    batch = batch or 8  # the reference's BATCH_SIZE (behavioural_cloning.py:28)
    fps, fpf, h2d, scan_chunks = bench_bc_train(compute_dtype=compute_dtype, width=width,
                                                chunk=chunk, batch=batch, remat=remat,
                                                pool_impl=pool_impl)
    # the reference trains 1x only (behavioural_cloning.py); compute-only
    # torch baseline (batches preloaded to memory) matches our device-resident
    # number's accounting.  Geometry note: the reference is architecturally
    # single-step (T=1 grad accumulation); ours is sequence-chunked.
    baseline = read_baseline_key("torch_ref_bc_1x_fps_compute") if width == 1 else None
    out = {
        "metric": f"{width}x BC training throughput (B={batch}, T={chunk}), sequence-chunked DP, pipelined input",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline, 2) if baseline else None,
        "vs_baseline_is": (VS_BASELINE_IS + "; reference loop is per-sample "
                           "single-step grad accumulation (its only mode), "
                           "compute-only (loader preloaded)") if baseline else None,
        "h2d_seconds_per_batch": round(h2d, 3),
        **roofline_fields(fps, fpf, ceiling),
    }
    if scan_chunks:
        # XLA cost analysis counts a scanned (While) body once, so the
        # CNN-scan-chunked config underreports FLOPs/frame and utilization
        out["flops_note"] = "underreported: scanned CNN body counted once by cost analysis"
    return out


def result_single_env_device_ceiling():
    """Device-resident single-stream step rate at the single-env geometry
    (1x arch, f32 like run_agent's single-stream default) — feeds the
    single_env_1x row's device_fps field."""
    fps, _ = bench_tpu(n_streams=1, width=1, compute_dtype="float32")
    return {"value": round(fps, 2)}


def result_single_env(n_steps: int = 40, device_fps=None):
    fps = bench_single_env(n_steps=n_steps)
    baseline = read_baseline_key("torch_ref_single_env_1x_fps")
    return {
        "metric": "single-env get_action latency loop, 1x arch (BASELINE config #1)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline, 2) if baseline else None,
        "vs_baseline_is": VS_BASELINE_IS if baseline else None,
        # device-resident single-stream step rate (bench_tpu at streams=1,
        # f32 like run_agent's single-stream default) — the ceiling this
        # loop would serve at without the per-step tunnel RTT
        "device_fps": device_fps,
        "gap_is": "per-step D2H round trip over the dev tunnel",
        "note": "per-step D2H round trip dominates on the tunneled dev chip; "
                "realtime bar is 20 fps (reference README.md:311)",
    }


def result_bc_e2e(compute_dtype="bfloat16", batch=8, chunk=32, n_batches=12,
                  device_fps=None):
    coupled, loader_only = bench_bc_e2e(batch=batch, chunk=chunk,
                                        compute_dtype=compute_dtype,
                                        n_batches=n_batches)
    baseline = read_baseline_key("torch_ref_bc_1x_fps_coupled")
    return {
        # device-resident train-step ceiling (the bc_1x row) — the coupled
        # number is loader-bound on few-core hosts; the gap is the host plane
        "device_fps": device_fps,
        "gap_is": "host video decode (loader-bound)",
        "metric": f"COUPLED 1x BC training (B={batch}, T={chunk}): "
                  "SequenceDataLoader → DevicePrefetcher → train steps",
        "value": round(coupled, 2),
        "unit": "frames/sec/chip",
        # the symmetric torch number: the reference's own trainer with its
        # live multiprocessing loader on this host
        "vs_baseline": round(coupled / baseline, 2) if baseline else None,
        "vs_baseline_is": (VS_BASELINE_IS + "; coupled = its live 8-worker "
                           "loader feeding the loop") if baseline else None,
        "loader_only_fps": round(loader_only, 1) if loader_only else None,
        "note": "host-decode-bound on this 1-core host: coupled ≈ loader "
                "ceiling; device-resident ceiling is the bc_1x row",
    }


def result_ppo_collect(width=2, streams=N_STREAMS, groups=4, compute_dtype="bfloat16"):
    """PPO collection + one update on mock envs — the phase-3 RL capability
    the reference omits (its README defers RL to the paper)."""
    fps, update_seconds = bench_ppo_collect(
        n_streams=streams, width=width, groups=groups,
        compute_dtype=compute_dtype, measure_update=True)
    return {
        "metric": f"PPO rollout collection (mock envs), {width}x arch, "
                  f"{streams} streams, {groups} pipelined groups, + one update "
                  f"(all epochs, chip-fitting minibatches)",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": None,
        "update_seconds": round(update_seconds, 3),
        "note": "collection is env-step/H2D-bound on the tunneled dev chip; "
                "update_seconds is one full PPO update (all epochs/minibatches) "
                "over the collected 64-step window",
    }


def result_idm_e2e(compute_dtype="bfloat16", window_batch=8, max_inflight=1,
                   params_dtype="float32", device_fps=None):
    fps = bench_idm_e2e(window_batch=window_batch, compute_dtype=compute_dtype,
                        max_inflight=max_inflight, params_dtype=params_dtype)
    variant = f", {params_dtype} params" if params_dtype != "float32" else ""
    return {
        "metric": f"end-to-end IDM labeling (decode+resize+label), 4x arch, "
                  f"window 128 stride 64, {window_batch} windows/forward, "
                  f"{max_inflight} in flight{variant}",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": None,
        # the device-resident ceiling (idm_4x row), carried here so the
        # artifact self-explains: the gap between them is the host data plane
        "device_fps": device_fps,
        "note": "host-decode-bound on few-core hosts; device ceiling is the idm_4x row",
    }


def result_rollout_e2e(compute_dtype="bfloat16", streams=128, width=2, steps=20,
                       device_fps=None):
    stats = bench_rollout_e2e(n_streams=streams, width=width,
                              compute_dtype=compute_dtype, steps=steps)
    return {
        "metric": f"end-to-end serving (mock envs), {width}x arch, {streams} streams, 4 groups",
        "value": round(stats["frames_per_sec"], 2),
        "unit": "frames/sec/chip",
        "vs_baseline": None,
        "latency": stats["latency"],
        # device-resident ceiling (the rollout_2x row, measured at 64 streams
        # — the 2x serving optimum) so the artifact distinguishes "framework
        # slow" from "dev-tunnel wire-bound" without prose
        "device_fps": device_fps,
        "gap_is": "host→device frame upload over the dev tunnel",
        "note": "H2D wire-bound on the tunneled dev chip (~38 MB/s resized-frame upload)",
    }


def result_suite(ceiling, args):
    """The BASELINE.json headline set: 3x rollout (top-level value), plus the
    per-config rows under ``suite`` — 2x rollout, 4x IDM, 1x BC
    (device-resident), the flagship 2x/T=128 BC geometry, COUPLED bc-e2e,
    single-env config #1, and the idm/rollout e2e legs.  Sub-benches run in
    separate functions so device buffers free between them; each is guarded
    so one failure cannot blank the whole artifact."""
    import gc

    import jax

    # this dev tunnel's remote-compile service occasionally drops a request
    # mid-flight; those failures are transient and worth ONE retry.  An OOM
    # (RESOURCE_EXHAUSTED) is deterministic — never retried.
    transient = ("remote_compile", "tpu_compile_helper", "response body closed",
                 "read body", "HTTP 500", "UNAVAILABLE", "Socket closed")

    def guarded(fn, *a, **kw):
        for attempt in (0, 1):
            try:
                return fn(*a, **kw)
            except Exception as e:
                full = str(e)
                if (attempt == 0 and "RESOURCE_EXHAUSTED" not in full
                        and any(s in full for s in transient)):
                    continue  # finally clears caches; rerun the leg once
                # ONE short line: an XLA RESOURCE_EXHAUSTED carries a multi-KB
                # buffer-assignment dump that would corrupt the one-line suite
                # JSON (this exact failure blanked BENCH_r04)
                msg = f"{type(e).__name__}: {e}".splitlines()[0][:300]
                return {"error": msg}
            finally:
                # leg isolation: drop this leg's compiled executables and
                # their device buffers so one leg's HBM footprint cannot OOM
                # the next — every leg builds its own jits, so nothing useful
                # is lost
                gc.collect()
                jax.clear_caches()
                gc.collect()

    def row_fps(row):
        """A device-resident leg's measured fps, for the e2e rows' device_fps
        self-attribution field; None when the leg failed."""
        return row.get("value") if isinstance(row, dict) else None

    headline = guarded(result_rollout, ceiling, width=3,
                       streams=args.streams or N_STREAMS_3X,
                       compute_dtype=args.compute_dtype, remeasure=args.remeasure_baseline)
    suite = {
        "rollout_2x": guarded(result_rollout, ceiling, width=2,
                              streams=args.streams or N_STREAMS,
                              compute_dtype=args.compute_dtype),
        # 8 windows/forward is the measured-best labeling geometry (sweep:
        # 1843/1927/2023/2152 fps at wb=1/2/4/8 — 75.6% → 88.3% MXU; weight
        # reads amortize over 1024 frames; the StreamingIDMLabeler serves
        # this shape via window_batch=8)
        "idm_4x": guarded(result_idm, ceiling, compute_dtype=args.compute_dtype,
                          window_batch=8),
        "bc_1x": guarded(result_bc, ceiling, width=1, compute_dtype=args.compute_dtype),
        # the flagship training geometry: 2x width at the architecture's
        # native T=128 context (reference agent.py:33), CNN-scan + remat
        "bc_2x_T128": guarded(result_bc, ceiling, width=2,
                              compute_dtype=args.compute_dtype),
        # phase-3 RL (net-new vs the reference): grouped collection + update
        "ppo_collect_2x": guarded(result_ppo_collect, width=2, groups=4,
                                  compute_dtype=args.compute_dtype),
    }
    # e2e legs carry their device-resident ceilings so each row self-explains
    # the host/tunnel gap
    suite["bc_1x_e2e"] = guarded(result_bc_e2e, compute_dtype=args.compute_dtype,
                                 device_fps=row_fps(suite["bc_1x"]))
    suite["single_env_1x"] = guarded(result_single_env,
                                     device_fps=row_fps(guarded(
                                         result_single_env_device_ceiling)))
    suite["idm_e2e"] = guarded(result_idm_e2e, compute_dtype=args.compute_dtype,
                               device_fps=row_fps(suite["idm_4x"]))
    suite["rollout_e2e_2x"] = guarded(result_rollout_e2e,
                                      compute_dtype=args.compute_dtype,
                                      device_fps=row_fps(suite["rollout_2x"]))
    if "error" in headline:
        headline = {"metric": "3x rollout (failed)", "value": None,
                    "unit": "frames/sec/chip", "vs_baseline": None, **headline}
    headline["suite"] = suite
    return headline


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=None,
                    help="Stream count (default: per-metric optimum — 64, "
                         "except 128 for the suite's 3x headline and rollout-e2e)")
    ap.add_argument("--compute-dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--remeasure-baseline", action="store_true")
    ap.add_argument("--metric", default="suite",
                    choices=["suite", "rollout", "rollout-e2e", "idm", "idm-e2e",
                             "bc", "bc-e2e", "single-env", "ppo-collect"])
    ap.add_argument("--groups", type=int, default=1,
                    help="ppo-collect: round-robin collection groups (pipelined when >1)")
    ap.add_argument("--window-batch", type=int, default=None,
                    help="idm: independent 128-frame windows stacked per forward "
                         "(default 1 for --metric idm, 8 for idm-e2e)")
    ap.add_argument("--max-inflight", type=int, default=1,
                    help="idm-e2e: window-batch forwards enqueued at once (each "
                         "holds its own HBM temp allocation; 2 OOMs a 16G chip "
                         "at wb=8)")
    ap.add_argument("--batch", type=int, default=None,
                    help="bc: training batch size (default 8, the reference's)")
    ap.add_argument("--chunk", type=int, default=None,
                    help="bc: sequence chunk length T (default 128 from 2x up, else 32)")
    ap.add_argument("--remat", default="auto", choices=["auto", "on", "off"],
                    help="bc: activation rematerialization (auto = by the "
                         "measured fit boundary: off at B*T<=256 frames where "
                         "the step fits HBM at every width, on above)")
    ap.add_argument("--width", type=int, default=None,
                    help="Foundation width multiple (1/2/3); default 2 for rollout, 1 for bc")
    ap.add_argument("--quantize-dense", action="store_true",
                    help="idm/rollout metrics: serve trunk dense layers from int8 weights")
    ap.add_argument("--params-dtype", default="float32", choices=["float32", "bfloat16"],
                    help="rollout metric: serving parameter storage dtype")
    ap.add_argument("--pool-impl", default="xla", choices=["xla", "shifted", "subsample"],
                    help="rollout/idm/bc: maxpool lowering (xla = SelectAndScatter "
                         "backward, measured faster; shifted = nine-slice backward, "
                         "measured 2x slower on the HBM-bound BC step)")
    args = ap.parse_args()

    if args.metric == "suite":
        ignored = [flag for flag, on in [
            ("--quantize-dense", args.quantize_dense),
            ("--params-dtype", args.params_dtype != "float32"),
            ("--window-batch", args.window_batch is not None),
            ("--max-inflight", args.max_inflight != 1),
            ("--groups", args.groups != 1),
            ("--width", args.width is not None),
            ("--batch", args.batch is not None),
            ("--remat", args.remat != "auto"),
            ("--pool-impl", args.pool_impl != "xla"),
        ] if on]
        if ignored:
            ap.error(f"{', '.join(ignored)} have no effect with --metric suite; "
                     "pick a specific --metric for variant measurements")

    ceiling = cached_ceiling_tflops(remeasure=args.remeasure_baseline)

    if args.metric == "suite":
        print(json.dumps(result_suite(ceiling, args)))
        return

    if args.metric == "ppo-collect":
        print(json.dumps(result_ppo_collect(
            width=args.width or 2, streams=args.streams or N_STREAMS,
            groups=args.groups, compute_dtype=args.compute_dtype)))
        return

    if args.metric == "rollout-e2e":
        # per-rotation latency: every stream advances one frame per rotation,
        # so realtime_factor_p99 > 1 ⇔ live 20 Hz serving holds
        print(json.dumps(result_rollout_e2e(compute_dtype=args.compute_dtype,
                                            streams=args.streams or 128,
                                            width=args.width or 2, steps=30)))
        return

    if args.metric == "bc-e2e":
        print(json.dumps(result_bc_e2e(compute_dtype=args.compute_dtype,
                                       batch=args.batch or 8,
                                       chunk=args.chunk or 32)))
        return

    if args.metric == "single-env":
        print(json.dumps(result_single_env()))
        return

    if args.metric == "bc":
        width = args.width or 1
        remat = {"auto": None, "on": True, "off": False}[args.remat]
        print(json.dumps(result_bc(ceiling, width=width,
                                   compute_dtype=args.compute_dtype, chunk=args.chunk,
                                   batch=args.batch, remat=remat,
                                   pool_impl=args.pool_impl)))
        return

    if args.metric == "idm":
        print(json.dumps(result_idm(ceiling, compute_dtype=args.compute_dtype,
                                    quantize_dense=args.quantize_dense,
                                    window_batch=args.window_batch or 1,
                                    pool_impl=args.pool_impl)))
        return

    if args.metric == "idm-e2e":
        print(json.dumps(result_idm_e2e(compute_dtype=args.compute_dtype,
                                        window_batch=args.window_batch or 8,
                                        max_inflight=args.max_inflight,
                                        params_dtype=args.params_dtype)))
        return

    args.width = args.width or 2
    print(json.dumps(result_rollout(
        ceiling, width=args.width, streams=args.streams or N_STREAMS,
        compute_dtype=args.compute_dtype, params_dtype=args.params_dtype,
        quantize_dense=args.quantize_dense, remeasure=args.remeasure_baseline,
        pool_impl=args.pool_impl,
    )))


if __name__ == "__main__":
    main()
