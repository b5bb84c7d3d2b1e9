"""Torch-CPU baselines measured by DRIVING THE IMPORTED REFERENCE CODE.

``bench_torch_ref.py`` (rounds 1-3) re-implemented the reference architecture
compactly; this module removes that caveat by importing ``/root/reference``
itself (the same oracle machinery as tests/test_reference_oracle.py) and
timing its own entry points on this host's CPU — the only hardware the
reference framework can run on in this image:

  * config #1 — ``MineRLAgent.get_action`` single-env loop at 1x width
    (reference run_agent.py:21-24 / agent.py:190-206)
  * configs #2/#5 — ``MinecraftAgentPolicy.act`` batched KV-cache rollout at
    2x/3x width (reference policy.py:307-328; the reference's own agent
    wrapper is hardwired to batch 1, so the baseline drives its policy.act —
    still 100% reference code — at the serving stream counts)
  * config #3 — ``IDMAgent.predict_actions`` over a 128-frame window at the
    representative 4x geometry (reference run_inverse_dynamics_model.py:146-190)
  * config #4 — ``behavioural_cloning_train`` itself (reference
    behavioural_cloning.py:49-132) on a synthetic contractor-format corpus,
    in two flavours: COUPLED (its multiprocessing loader feeding the loop,
    the number the reference user experiences) and COMPUTE-ONLY (batches
    preloaded to memory, the denominator for our device-resident bc number)

Results merge into BENCH_BASELINE.json; ``bench.py`` reads them for
``vs_baseline``.  Run directly to (re)measure:

    python bench_torch_reference.py [--configs rollout,single,idm,bc]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import tempfile
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
REFERENCE = "/root/reference"
BASELINE_CACHE = os.path.join(REPO, "BENCH_BASELINE.json")
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def install_reference(path: str = REFERENCE) -> None:
    """Make the reference checkout importable: stub its absent deps (gym3's
    type algebra is exactly vpt_tpu.spaces; gym/minerl are inert metadata)
    and put the checkout on sys.path.  Mirror of the tests' oracle shim."""
    import vpt_tpu.spaces as spaces

    if not os.path.isdir(os.path.join(path, "lib")):
        raise RuntimeError(f"reference checkout unavailable at {path}")
    if "gym3" not in sys.modules:
        g = types.ModuleType("gym3")
        t = types.ModuleType("gym3.types")
        t.DictType = spaces.DictType
        t.TensorType = spaces.TensorType
        t.Discrete = spaces.Discrete
        t.Real = spaces.Real
        t.ValType = object
        g.types = t
        sys.modules["gym3"] = g
        sys.modules["gym3.types"] = t
    if "gym" not in sys.modules:
        gym = types.ModuleType("gym")
        gs = types.ModuleType("gym.spaces")

        class _Space:
            def __init__(self, *a, **k):
                pass

        gs.Discrete = _Space
        gs.Box = _Space
        gs.Dict = _Space
        gym.spaces = gs
        gym.make = None  # patched per-measurement
        sys.modules["gym"] = gym
        sys.modules["gym.spaces"] = gs
    if "minerl" not in sys.modules:
        m = types.ModuleType("minerl")
        hb = types.ModuleType("minerl.herobraine")
        hero = types.ModuleType("minerl.herobraine.hero")
        mc = types.ModuleType("minerl.herobraine.hero.mc")
        mc.MINERL_ITEM_MAP = {}
        sys.modules.update({
            "minerl": m,
            "minerl.herobraine": hb,
            "minerl.herobraine.hero": hero,
            "minerl.herobraine.hero.mc": mc,
        })
    if path not in sys.path:
        sys.path.insert(0, path)


def _width_kwargs(width: int) -> dict:
    """The reference's fallback POLICY_KWARGS (agent.py:16-36, the published
    2x geometry) scaled to a foundation width multiple."""
    import agent as ref_agent

    return dict(ref_agent.POLICY_KWARGS, hidsize=1024 * width, impala_width=4 * width)


def measure_rollout_fps(width: int = 2, n_streams: int = 64, n_steps: int = 2) -> float:
    """Batched KV-cache rollout: reference ``MinecraftAgentPolicy.act`` at the
    serving geometry (configs #2/#5)."""
    import torch as th
    from gym3.types import DictType

    from lib.action_mapping import CameraHierarchicalMapping
    from lib.policy import MinecraftAgentPolicy

    th.manual_seed(0)
    space = DictType(**CameraHierarchicalMapping(n_camera_bins=11).get_action_space_update())
    policy = MinecraftAgentPolicy(
        action_space=space, policy_kwargs=_width_kwargs(width),
        pi_head_kwargs={"temperature": 2.0},
    ).eval()
    state = policy.initial_state(n_streams)
    rng = np.random.default_rng(0)
    obs = {"img": th.from_numpy(
        rng.integers(0, 255, (n_streams, 128, 128, 3), dtype=np.uint8))}
    first = th.zeros(n_streams, dtype=th.bool)

    _, state, _ = policy.act(obs, first, state)  # warm (allocations, caches)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        _, state, _ = policy.act(obs, first, state)
    dt = time.perf_counter() - t0
    return n_streams * n_steps / dt


def measure_single_env_fps(n_steps: int = 12) -> float:
    """Config #1: the reference ``MineRLAgent.get_action`` single-env loop at
    1x width — includes its cv2 resize, H2D (no-op on CPU), sampling, and
    action decode, exactly as run_agent.py drives it."""
    import agent as ref_agent
    import torch as th

    th.manual_seed(0)
    ref_agent.validate_env = lambda env: None  # no Java env in this image
    agent = ref_agent.MineRLAgent(
        None, device="cpu", policy_kwargs=_width_kwargs(1),
        pi_head_kwargs={"temperature": 2.0},
    )
    rng = np.random.default_rng(0)
    obs = {"pov": rng.integers(0, 255, (360, 640, 3), dtype=np.uint8)}
    agent.get_action(obs)  # warm
    t0 = time.perf_counter()
    for _ in range(n_steps):
        agent.get_action(obs)
    return n_steps / (time.perf_counter() - t0)


def measure_idm_fps(window: int = 128, warm_frames: int = 16) -> float:
    """Config #3: reference ``IDMAgent.predict_actions`` over one
    ``window``-frame batch at the representative 4x geometry (bench.py's
    IDM_4X_KWARGS — the published 4x_idm.model kwargs need egress)."""
    import torch as th
    from inverse_dynamics_model import IDMAgent

    from bench import IDM_4X_KWARGS

    th.manual_seed(0)
    agent = IDMAgent(idm_net_kwargs=dict(IDM_4X_KWARGS),
                     pi_head_kwargs={"temperature": 1.0}, device="cpu")
    agent.policy.eval()
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (window, 360, 640, 3), dtype=np.uint8)
    with th.no_grad():
        agent.predict_actions(frames[:warm_frames])  # page in the 0.5B params
        t0 = time.perf_counter()
        agent.predict_actions(frames)
        dt = time.perf_counter() - t0
    return window / dt


def _make_contractor_fixtures(out_dir: str, n_traj: int, steps: int) -> None:
    """Synthetic contractor-format mp4+jsonl pairs, 640x360, every step
    non-null (so frame accounting through the reference loader is exact)."""
    from vpt_tpu.data.video import VideoWriter

    keys = ["key.keyboard.w", "key.keyboard.a", "key.keyboard.s",
            "key.keyboard.d", "key.keyboard.space", "key.keyboard.left.shift"]
    rng = np.random.default_rng(11)
    pool = [rng.integers(0, 255, (360, 640, 3), dtype=np.uint8) for _ in range(6)]
    for j in range(n_traj):
        base = os.path.join(out_dir, f"traj{j}")
        with VideoWriter(base + ".mp4", 640, 360, fps=20) as w:
            for i in range(steps):
                w.write(pool[(i + j) % len(pool)])
        with open(base + ".jsonl", "w") as f:
            for i in range(steps):
                row = {
                    "keyboard": {"keys": [keys[(i + j) % len(keys)]]},
                    "mouse": {"x": 640.0, "y": 360.0,
                              "dx": float((i * 7 + j) % 9 - 4), "dy": float((i * 3) % 5 - 2),
                              "buttons": [], "newButtons": []},
                    "hotbar": 0,
                    "isGuiOpen": False,
                }
                f.write(json.dumps(row) + "\n")


def measure_bc_fps(steps_per_traj: int = 20, warmup_steps: int = 3) -> dict:
    """Config #4: the reference's own ``behavioural_cloning_train`` at 1x on a
    synthetic contractor corpus.  Returns compute-only fps (batches preloaded
    to memory), coupled fps (its 8-worker multiprocessing loader live), and
    the loader-only ceiling — all timed from inside the real loop via
    optimizer-step timestamps."""
    import agent as ref_agent
    import behavioural_cloning as ref_bc
    import torch as th

    batch = ref_bc.BATCH_SIZE  # 8, the reference's published hyperparameter

    tmp = tempfile.mkdtemp(prefix="vpt_ref_bc_")
    # 2x more trajectories than workers: the reference's shared task queue is
    # racy on a loaded 1-core host — a late-starting worker that finds the
    # queue already drained sends its end-of-epoch sentinel immediately and
    # kills the whole epoch (data_loader.py:199-210).  Surplus trajectories
    # make a zero-task worker practically impossible.
    _make_contractor_fixtures(tmp, n_traj=2 * batch, steps=steps_per_traj)
    # same starvation protection for the batch cadence itself: with 8 decode
    # workers + the training loop on one core, 10 s of scheduler unfairness
    # would crash the run (queue.Empty), not just slow it
    import data_loader as ref_dl

    saved_timeout = ref_dl.QUEUE_TIMEOUT
    ref_dl.QUEUE_TIMEOUT = 120

    kwargs_1x = _width_kwargs(1)
    in_model = os.path.join(tmp, "in.model")
    in_weights = os.path.join(tmp, "in.weights")
    out_weights = os.path.join(tmp, "out.weights")
    with open(in_model, "wb") as f:
        pickle.dump({"model": {"args": {"net": {"args": kwargs_1x},
                                        "pi_head_opts": {"temperature": "2.0"}}}}, f)
    ref_agent.validate_env = lambda env: None
    th.manual_seed(0)
    seed_agent = ref_agent.MineRLAgent(None, device="cpu", policy_kwargs=kwargs_1x,
                                       pi_head_kwargs={"temperature": 2.0})
    th.save(seed_agent.policy.state_dict(), in_weights)
    del seed_agent

    import gym

    fake_env = type("FakeEnv", (), {"close": lambda self: None})()
    gym.make = lambda name: fake_env
    saved = {k: getattr(ref_bc, k) for k in ("DEVICE", "EPOCHS", "N_WORKERS")}
    ref_bc.DEVICE = "cpu"
    ref_bc.EPOCHS = 1
    ref_bc.N_WORKERS = batch  # loader requires n_workers >= batch_size

    step_times = []
    RealAdam = th.optim.Adam

    class TimedAdam(RealAdam):
        def step(self, *a, **k):
            r = super().step(*a, **k)
            step_times.append(time.perf_counter())
            return r

    RefLoader = ref_bc.DataLoader
    loader_stats = {}

    class PreloadedLoader:
        """Drains the real reference loader up front (recording its own
        loader-only throughput), then replays batches from memory so the
        training loop's optimizer-step cadence is pure compute."""

        def __init__(self, dataset_dir, n_workers=8, batch_size=8, n_epochs=1,
                     max_queue_size=16):
            inner = RefLoader(dataset_dir=dataset_dir, n_workers=n_workers,
                              batch_size=batch_size, n_epochs=n_epochs,
                              max_queue_size=max_queue_size)
            t0 = time.perf_counter()
            self._batches = list(inner)
            dt = time.perf_counter() - t0
            frames = sum(len(b[0]) for b in self._batches)
            loader_stats.update(batches=len(self._batches), frames=frames,
                                loader_only_fps=frames / dt)
            self._it = iter(self._batches)

        def __iter__(self):
            return self

        def __next__(self):
            return next(self._it)

    def timed_fps() -> float:
        step_times.clear()
        th.manual_seed(0)
        with th.enable_grad():
            ref_bc.behavioural_cloning_train(tmp, in_model, in_weights, out_weights)
        n = len(step_times)
        assert n > warmup_steps + 4, f"corpus too small ({n} optimizer steps)"
        return batch * (n - warmup_steps) / (step_times[-1] - step_times[warmup_steps - 1])

    th.optim.Adam = TimedAdam
    try:
        ref_bc.DataLoader = PreloadedLoader
        compute_fps = timed_fps()
        ref_bc.DataLoader = RefLoader
        coupled_fps = timed_fps()
    finally:
        th.optim.Adam = RealAdam
        ref_bc.DataLoader = RefLoader
        ref_dl.QUEUE_TIMEOUT = saved_timeout
        for k, v in saved.items():
            setattr(ref_bc, k, v)

    return {
        "torch_ref_bc_1x_fps_compute": round(compute_fps, 3),
        "torch_ref_bc_1x_fps_coupled": round(coupled_fps, 3),
        "torch_ref_bc_loader_only_fps": round(loader_stats["loader_only_fps"], 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="single,idm,bc,rollout",
                    help="comma list of: single, idm, bc, rollout")
    args = ap.parse_args()
    want = set(args.configs.split(","))

    install_reference()
    results = {}
    if "single" in want:
        results["torch_ref_single_env_1x_fps"] = round(measure_single_env_fps(), 3)
        print(json.dumps(results), flush=True)
    if "idm" in want:
        results["torch_ref_idm_fps_w128"] = round(measure_idm_fps(), 4)
        print(json.dumps(results), flush=True)
    if "bc" in want:
        results.update(measure_bc_fps())
        print(json.dumps(results), flush=True)
    if "rollout" in want:
        results["torch_ref_rollout_fps_2x_s64"] = round(measure_rollout_fps(2, 64), 4)
        print(json.dumps(results), flush=True)
        results["torch_ref_rollout_fps_3x_s128"] = round(measure_rollout_fps(3, 128), 4)
        print(json.dumps(results), flush=True)

    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    cache.update(results)
    cache["torch_ref_note"] = (
        "measured by importing /root/reference and driving its own code "
        "(MineRLAgent.get_action, MinecraftAgentPolicy.act, "
        "IDMAgent.predict_actions, behavioural_cloning_train) on this host's "
        "CPU — the reference framework's only hardware in this image")
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    print(json.dumps({"written": BASELINE_CACHE, **results}))


if __name__ == "__main__":
    main()
