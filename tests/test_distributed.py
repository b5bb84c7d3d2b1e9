"""Multi-host entry path: maybe_initialize_distributed with a REAL 2-process
jax.distributed cluster over CPU (gloo collectives), plus the no-op branch.

This covers the flagship distributed axis end-to-end on one machine: two
processes each owning 2 virtual CPU devices form a global 4-device mesh, and
a jitted global reduction moves data across the process boundary.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vpt_tpu.parallel.mesh import maybe_initialize_distributed, make_mesh

    assert maybe_initialize_distributed(), "env vars present: must initialize"
    assert maybe_initialize_distributed(), "second call: already-initialized no-op"
    assert jax.process_count() == 2, jax.process_count()
    mesh = make_mesh()
    assert mesh.devices.size == 4, mesh.devices

    pid = jax.process_index()
    local = np.full((2, 3), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("dp")), local, (4, 3))
    total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(garr)
    val = float(np.asarray(jax.device_get(total)))
    assert val == 6.0 * 1 + 6.0 * 2, val
    print(f"DIST_OK {pid} {val}")
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(240)
def test_two_process_cluster(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": repo})
    port = _free_port()
    procs = []
    for pid in range(2):
        env = {
            **os.environ,
            "COORDINATOR_ADDRESS": f"localhost:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(pid),
        }
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=220)
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"proc {pid} failed:\n{err[-2000:]}"
        assert f"DIST_OK {pid} 18.0" in out, out


def test_no_env_vars_is_noop(monkeypatch):
    from vpt_tpu.parallel.mesh import maybe_initialize_distributed

    for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    # single-process suite: not initialized, no env vars → False, no side effects
    assert maybe_initialize_distributed() is False


_BC_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the runner sets XLA_FLAGS: 2 virtual devices per process (2-proc run)
    # or 4 (single-process reference) — same global 4-device mesh either way
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vpt")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np

    from vpt_tpu.parallel.mesh import (
        cross_host_barrier, maybe_initialize_distributed, make_mesh,
    )
    from vpt_tpu.data.loader import SequenceDataLoader
    from vpt_tpu.training.bc import BCHyperparams, BCTrainer

    TINY = dict(
        hidsize=64, impala_width=1, impala_chans=[4, 8], img_shape=[32, 32, 3],
        init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
        impala_kwargs={"post_pool_groups": 1}, n_recurrence_layers=2,
        timesteps=4, attention_heads=4, attention_memory_size=8,
        recurrence_type="transformer", attention_mask_style="clipped_causal",
        use_pre_lstm_ln=False, obs_processing_width=32,
    )

    # __main__ guard REQUIRED: the loader's spawn-context data workers
    # re-import this script (vpt_tpu/data/loader.py module docstring); without
    # the guard they would re-run jax.distributed.initialize and deadlock
    if __name__ == "__main__":
        nproc = int(os.environ.get("NUM_PROCESSES", "1"))
        if nproc > 1:
            assert maybe_initialize_distributed()
        pid = jax.process_index()
        mesh = make_mesh()
        assert mesh.devices.size == 4, mesh.devices

        hp = BCHyperparams(batch_size=4, chunk_len=4)  # GLOBAL batch
        trainer = BCTrainer(TINY, {"temperature": 2.0}, hp=hp, mesh=mesh)
        trainer.init()

        local_bs = hp.batch_size // nproc
        loader = SequenceDataLoader(
            %(data)r, batch_size=local_bs, chunk_len=hp.chunk_len, n_epochs=1,
            seed=5, resolution=(32, 32), shard_id=pid, num_shards=nproc,
        )
        state = trainer.initial_state(hp.batch_size)
        losses = []
        try:
            for i, batch in enumerate(loader):
                if i >= 3:
                    break
                if i == 0:
                    # this worker drives train_step directly (bypassing
                    # BCTrainer.train's first-step barrier): align ranks
                    # after loader startup, before the first gloo dispatch
                    cross_host_barrier("bc_worker_first_step")
                state, loss, grad_norm = trainer.train_step(batch, state)
                losses.append(float(loss))
        finally:
            loader.close()
        print("BC_LOSSES", pid, " ".join(f"{l:.8f}" for l in losses))

        # held-out evaluation on the same mesh: evaluate() shards its loader
        # per process (bc.py) and must produce the same global nll as the
        # single-process run — the multi-host placement path under test
        cross_host_barrier("bc_worker_eval")
        ev = trainer.evaluate(%(data)r, max_batches=2)
        print(f'BC_EVAL {pid} {ev["nll_per_frame"]:.8f} {ev["frames"]}')
    """
)


_IDM_TRAIN_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: without it every worker process recompiles
    # the train step cold, which alone busts the test timeout on a 1-core CI
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vpt")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np

    from vpt_tpu.parallel.mesh import maybe_initialize_distributed, make_mesh

    IDM_TINY = dict(
        hidsize=64, impala_width=1, impala_chans=[4, 8], img_shape=[32, 32, 4],
        init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
        impala_kwargs={"post_pool_groups": 1}, n_recurrence_layers=2,
        timesteps=8, attention_heads=4, attention_memory_size=16,
        recurrence_type="transformer", attention_mask_style="none",
        use_pre_lstm_ln=False, obs_processing_width=32,
        conv3d_params={"inchan": 3, "outchan": 4,
                       "kernel_size": [5, 1, 1], "padding": [2, 0, 0]},
    )

    # __main__ guard REQUIRED: the loader's spawn workers re-import this file
    if __name__ == "__main__":
        from vpt_tpu.checkpoint import load_weights
        from vpt_tpu.training.idm import IDMHyperparams, IDMTrainer

        nproc = int(os.environ.get("NUM_PROCESSES", "1"))
        if nproc > 1:
            assert maybe_initialize_distributed()
        pid = jax.process_index()
        mesh = make_mesh()
        assert mesh.devices.size == 4, mesh.devices

        ckpt_dir = os.path.join(%(out)r, f"ckpt{nproc}")
        hp = IDMHyperparams(batch_size=4, window=4, epochs=1,
                            checkpoint_dir=ckpt_dir, checkpoint_every=2)
        trainer = IDMTrainer(IDM_TINY, {"temperature": 1.0}, hp=hp, mesh=mesh)
        out_weights = os.path.join(%(out)r, f"idm{nproc}.weights")
        steps = trainer.train(%(data)r, out_weights)

        digest = float("nan")
        if pid == 0:
            w = load_weights(out_weights)
            digest = float(sum(np.abs(np.asarray(v, np.float64)).sum()
                               for v in w.values()))
            # rank 0 wrote full checkpoints; other ranks only shard cursors
            assert any(d.startswith("step_") for d in os.listdir(ckpt_dir)), ckpt_dir
            if nproc > 1:
                shard_dir = os.path.join(ckpt_dir, "shard1")
                assert os.path.isdir(shard_dir), os.listdir(ckpt_dir)
        print(f"IDM_TRAIN {pid} {steps} {digest:.6f}")
    """
)


@pytest.mark.timeout(600)
def test_two_process_idm_train_loop(tmp_path):
    """The FULL IDMTrainer.train loop under a real 2-process cluster —
    loader workers with disjoint shards, device prefetcher, mid-run
    checkpoints (host_tree on every rank, write on rank 0, shard cursors on
    rank 1), and the final weights — must reach the same step count and
    weight digest as the single-process run."""
    import json

    import numpy as np

    from vpt_tpu.data.video import VideoWriter, native_available

    if not native_available():
        pytest.skip("native video lib unavailable")

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.default_rng(3)
    for j in range(4):
        with VideoWriter(str(data_dir / f"t{j}.mp4"), 64, 36, fps=20) as w:
            for i in range(12):
                w.write(rng.integers(0, 255, (36, 64, 3), dtype=np.uint8))
        with open(data_dir / f"t{j}.jsonl", "w") as f:
            for i in range(12):
                f.write(json.dumps({
                    "keyboard": {"keys": ["key.keyboard.w"] if (i + j) % 2 else []},
                    "mouse": {"x": 0.0, "y": 0.0, "dx": float((i + j) % 5),
                              "dy": 1.0, "buttons": [], "newButtons": []},
                    "hotbar": 0, "isGuiOpen": False,
                }) + "\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "idm_train_worker.py"
    script.write_text(_IDM_TRAIN_WORKER % {
        "repo": repo, "data": str(data_dir), "out": str(tmp_path),
    })

    def run_cluster(nproc):
        port = _free_port()
        procs = []
        for pid in range(nproc):
            env = {**os.environ, "JAX_PLATFORMS": "cpu",
                   "VPT_QUEUE_TIMEOUT": "120"}
            env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={4 // nproc}"
            if nproc > 1:
                env.update(
                    COORDINATOR_ADDRESS=f"localhost:{port}",
                    NUM_PROCESSES=str(nproc),
                    PROCESS_ID=str(pid),
                )
            else:
                env["NUM_PROCESSES"] = "1"
            procs.append(subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            ))
        results = {}
        for p in procs:
            out, err = p.communicate(timeout=560)
            assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
            for line in out.splitlines():
                if line.startswith("IDM_TRAIN"):
                    _, pid_s, steps_s, digest_s = line.split()
                    results[int(pid_s)] = (int(steps_s), float(digest_s))
        return results

    single = run_cluster(1)[0]
    multi = run_cluster(2)
    # same optimizer-step count on every rank and vs single-process
    assert multi[0][0] == multi[1][0] == single[0] > 0
    # rank 0's final weights match the single-process run
    np.testing.assert_allclose(multi[0][1], single[1], rtol=1e-6)


_FSDP_CKPT_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vpt")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np

    from vpt_tpu.parallel.mesh import (
        cross_host_barrier, host_tree, maybe_initialize_distributed, make_mesh,
    )
    from vpt_tpu.training.bc import BCHyperparams, BCTrainer

    TINY = dict(
        hidsize=64, impala_width=1, impala_chans=[4, 8], img_shape=[32, 32, 3],
        init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
        impala_kwargs={"post_pool_groups": 1}, n_recurrence_layers=2,
        timesteps=4, attention_heads=4, attention_memory_size=8,
        recurrence_type="transformer", attention_mask_style="clipped_causal",
        use_pre_lstm_ln=False, obs_processing_width=32,
    )

    if __name__ == "__main__":
        nproc = int(os.environ.get("NUM_PROCESSES", "1"))
        if nproc > 1:
            assert maybe_initialize_distributed()
        pid = jax.process_index()
        mesh = make_mesh(n_fsdp=4)   # ZeRO-3 axis CROSSES the process boundary
        assert mesh.devices.size == 4, mesh.devices

        hp = BCHyperparams(batch_size=4, chunk_len=4)  # GLOBAL batch
        trainer = BCTrainer(TINY, {"temperature": 2.0}, hp=hp, mesh=mesh)
        trainer.init()
        if nproc > 1:
            # the point of the test: at least one leaf is NOT addressable
            leaves = jax.tree.leaves(trainer.variables["params"])
            assert any(not l.is_fully_addressable for l in leaves)

        rng = np.random.default_rng(9)
        local_b = hp.batch_size // nproc
        rows = slice(pid * local_b, (pid + 1) * local_b)
        gframes = rng.integers(0, 255, (4, 4, 32, 32, 3), dtype=np.uint8)
        gbuttons = rng.integers(0, 8641, (4, 4)).astype(np.int32)
        gcamera = rng.integers(0, 121, (4, 4)).astype(np.int32)
        batch = {
            "frames": gframes[rows], "buttons": gbuttons[rows],
            "camera": gcamera[rows],
            "firsts": np.zeros((local_b, 4), bool),
            "mask": np.ones((local_b, 4), bool),
        }
        state = trainer.initial_state(hp.batch_size)
        # align ranks before the step (BCTrainer.train does the same before
        # its first collective) and BLOCK on the loss: this worker drives
        # train_step directly, and on a 1-core CI host per-rank compiles
        # serialize — an async dispatch would start the step's gloo context
        # init >30 s before the slower rank arrives
        cross_host_barrier("fsdp_ckpt_test_step")
        state, loss, _ = trainer.train_step(batch, state)
        loss = float(loss)

        pulled = host_tree(trainer.variables)
        digest = float(sum(np.abs(np.asarray(l, np.float64)).sum()
                           for l in jax.tree.leaves(pulled)))
        opt_digest = float(sum(np.abs(np.asarray(l, np.float64)).sum()
                               for l in jax.tree.leaves(host_tree(trainer.opt_state))))
        print(f"FSDP_CKPT {pid} {float(loss):.8f} {digest:.6f} {opt_digest:.6f}")
    """
)


@pytest.mark.timeout(420)
def test_two_process_fsdp_checkpoint_pull_matches_single(tmp_path):
    """host_tree under a multi-host ZeRO-3 mesh: with fsdp crossing the
    process boundary, parameter/optimizer leaves are not host-addressable —
    host_tree must allgather them so a checkpoint written by rank 0 carries
    the same values a single-process fsdp run would write."""
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "fsdp_worker.py"
    script.write_text(_FSDP_CKPT_WORKER % {"repo": repo})

    def run_cluster(nproc):
        port = _free_port()
        procs = []
        for pid in range(nproc):
            env = {**os.environ, "JAX_PLATFORMS": "cpu"}
            env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={4 // nproc}"
            if nproc > 1:
                env.update(
                    COORDINATOR_ADDRESS=f"localhost:{port}",
                    NUM_PROCESSES=str(nproc),
                    PROCESS_ID=str(pid),
                )
            else:
                env["NUM_PROCESSES"] = "1"
            procs.append(subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            ))
        out_by_pid = {}
        for p in procs:
            out, err = p.communicate(timeout=400)
            assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
            for line in out.splitlines():
                if line.startswith("FSDP_CKPT"):
                    _, pid_s, *vals = line.split()
                    out_by_pid[int(pid_s)] = [float(v) for v in vals]
        return out_by_pid

    single = run_cluster(1)[0]
    multi = run_cluster(2)
    np.testing.assert_allclose(multi[0], multi[1], rtol=0, atol=0)
    np.testing.assert_allclose(multi[0], single, rtol=1e-6, atol=1e-4)


_PPO_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vpt")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np

    from vpt_tpu.parallel.mesh import maybe_initialize_distributed, make_mesh
    from vpt_tpu.agent.rollout import MockMinecraftEnv
    from vpt_tpu.training.rl import PPOHyperparams, PPOTrainer

    TINY = dict(
        hidsize=64, impala_width=1, impala_chans=[4, 8], img_shape=[32, 32, 3],
        init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
        impala_kwargs={"post_pool_groups": 1}, n_recurrence_layers=2,
        timesteps=4, attention_heads=4, attention_memory_size=8,
        recurrence_type="transformer", attention_mask_style="clipped_causal",
        use_pre_lstm_ln=False, obs_processing_width=32,
    )

    if __name__ == "__main__":
        nproc = int(os.environ.get("NUM_PROCESSES", "1"))
        if nproc > 1:
            assert maybe_initialize_distributed()
        pid = jax.process_index()
        mesh = make_mesh()
        assert mesh.devices.size == 4, mesh.devices

        # ONE collection group: with G>1 the single- and multi-process runs
        # compose groups from different stream subsets, so their sampled
        # actions legitimately diverge — the G>1 state/batch row pairing is
        # covered by test_rl.py::test_groups_to_process_major_pairs_rows
        local_streams = 4 // nproc
        hp = PPOHyperparams(rollout_len=4, n_epochs=2, n_minibatches=2,
                            aux_phase_every=2, aux_epochs=1)
        trainer = PPOTrainer(TINY, {"temperature": 2.0}, hp=hp, mesh=mesh,
                             seed=7)
        trainer.init()
        # the same GLOBAL env set in both configurations: seeds
        # pid*local+i ≡ the single-process 0..3
        envs = [MockMinecraftEnv(seed=pid * local_streams + i, done_prob=0.3)
                for i in range(local_streams)]
        reward = lambda a, o, r, d: float(a["attack"])
        obs = firsts = None
        lines = []
        for u in range(2):
            traj, obs, firsts = trainer.collect(envs, obs, firsts,
                                                reward_fn=reward)
            m = trainer.update(traj)
            lines.append(f'{m["loss"]:.8f} {m["mean_return"]:.8f}')
        print("PPO_METRICS", pid, "|".join(lines))
    """
)


@pytest.mark.timeout(600)
def test_two_process_ppo_matches_single_process(tmp_path):
    """Multi-host RL: two processes each collect their OWN 2 mock-env streams
    and contribute them to the global PPO batch — per-update loss and
    mean_return must equal the single-process 4-stream run (identical global
    env set, identical rng), and both ranks must agree exactly."""
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "ppo_worker.py"
    script.write_text(_PPO_WORKER % {"repo": repo})

    def run_cluster(nproc):
        port = _free_port()
        procs = []
        for pid in range(nproc):
            env = {**os.environ, "JAX_PLATFORMS": "cpu"}
            env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={4 // nproc}"
            if nproc > 1:
                env.update(
                    COORDINATOR_ADDRESS=f"localhost:{port}",
                    NUM_PROCESSES=str(nproc),
                    PROCESS_ID=str(pid),
                )
            else:
                env["NUM_PROCESSES"] = "1"
            procs.append(subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            ))
        results = {}
        for p in procs:
            out, err = p.communicate(timeout=560)
            assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
            for line in out.splitlines():
                if line.startswith("PPO_METRICS"):
                    _, pid_s, payload = line.split(" ", 2)
                    results[int(pid_s)] = [
                        [float(v) for v in part.split()]
                        for part in payload.split("|")
                    ]
        return results

    single = run_cluster(1)[0]
    multi = run_cluster(2)
    assert len(single) == 2
    # both ranks observe the same global metrics
    np.testing.assert_allclose(multi[0], multi[1], rtol=0, atol=1e-7)
    # and they equal the single-process run over the identical global batch
    np.testing.assert_allclose(multi[0], single, rtol=0, atol=5e-5)


@pytest.mark.timeout(300)
def test_two_process_bc_training_matches_single_process(tmp_path):
    """The flagship multi-host path end-to-end: two processes, each loading a
    DISJOINT stream shard (SequenceDataLoader shard_id/num_shards) and
    contributing it to the global batch (place_local_batch), train the same
    tiny policy over a global 4-device mesh — per-step losses must match a
    single-process run with the unsharded global batch on an identical mesh."""
    import json

    import numpy as np

    from vpt_tpu.data.video import VideoWriter, native_available

    if not native_available():
        pytest.skip("native video lib unavailable")

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    for j in range(4):  # 4 trajectories → 4 global streams
        with VideoWriter(str(data_dir / f"t{j}.mp4"), 64, 36, fps=20) as w:
            for i in range(12):
                w.write(rng.integers(0, 255, (36, 64, 3), dtype=np.uint8))
        with open(data_dir / f"t{j}.jsonl", "w") as f:
            for i in range(12):
                f.write(json.dumps({
                    "keyboard": {"keys": ["key.keyboard.w"]},
                    "mouse": {"x": 0.0, "y": 0.0, "dx": float((i + j) % 5),
                              "dy": 0.0, "buttons": [], "newButtons": []},
                    "hotbar": 0, "isGuiOpen": False,
                }) + "\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "bc_worker.py"
    script.write_text(_BC_WORKER % {"repo": repo, "data": str(data_dir)})

    def run_cluster(nproc):
        port = _free_port()
        procs = []
        for pid in range(nproc):
            env = {**os.environ, "JAX_PLATFORMS": "cpu"}
            env["XLA_FLAGS"] = (
                f"--xla_force_host_platform_device_count={4 // nproc}"
            )
            # generous loader timeout: compile + decode under a loaded CI box
            env["VPT_QUEUE_TIMEOUT"] = "120"
            if nproc > 1:
                env.update(
                    COORDINATOR_ADDRESS=f"localhost:{port}",
                    NUM_PROCESSES=str(nproc),
                    PROCESS_ID=str(pid),
                )
            else:
                env["NUM_PROCESSES"] = "1"
            procs.append(subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            ))
        results, evals = {}, {}
        for p in procs:
            out, err = p.communicate(timeout=280)
            assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
            for line in out.splitlines():
                if line.startswith("BC_LOSSES"):
                    _, pid_s, *vals = line.split()
                    results[int(pid_s)] = [float(v) for v in vals]
                elif line.startswith("BC_EVAL"):
                    _, pid_s, nll_s, frames_s = line.split()
                    evals[int(pid_s)] = (float(nll_s), int(frames_s))
        return results, evals

    single, single_eval = run_cluster(1)
    single, single_eval = single[0], single_eval[0]
    multi, multi_eval = run_cluster(2)
    assert len(single) == 3
    # both processes observe the same global loss
    np.testing.assert_allclose(multi[0], multi[1], rtol=0, atol=1e-7)
    # and it equals the single-process run on the identical global batch
    np.testing.assert_allclose(multi[0], single, rtol=0, atol=5e-5)
    # evaluate(): same global frame coverage and nll as single-process
    assert multi_eval[0][1] == multi_eval[1][1] == single_eval[1] > 0
    np.testing.assert_allclose(multi_eval[0][0], multi_eval[1][0], rtol=0, atol=1e-7)
    np.testing.assert_allclose(multi_eval[0][0], single_eval[0], rtol=0, atol=5e-5)
