import numpy as np

from vpt_tpu.agent import MineRLAgent
from vpt_tpu.agent.rollout import BatchedRolloutRunner, MockMinecraftEnv

TINY_KWARGS = dict(
    hidsize=64, impala_width=1, impala_chans=[4, 8], img_shape=[64, 64, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1}, n_recurrence_layers=2, timesteps=4,
    attention_heads=4, attention_memory_size=8, recurrence_type="transformer",
    attention_mask_style="clipped_causal", use_pre_lstm_ln=False,
    obs_processing_width=32,
)


def test_pipelined_rollout_runner():
    from vpt_tpu.agent.rollout import PipelinedRolloutRunner

    a = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs={"temperature": 2.0}, batch_size=2)
    b = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs={"temperature": 2.0},
                    batch_size=2, seed=1)
    a._ensure_variables()
    b.variables = a.variables  # share one weights tree
    runner = PipelinedRolloutRunner(
        a, b,
        [MockMinecraftEnv(seed=i, done_prob=0.2) for i in range(2)],
        [MockMinecraftEnv(seed=10 + i, done_prob=0.2) for i in range(2)],
    )
    stats = runner.run(6)
    assert stats["frames"] == 24
    assert stats["frames_per_sec"] > 0


def test_batched_rollout_runner():
    agent = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs={"temperature": 2.0},
                        batch_size=3)
    envs = [MockMinecraftEnv(seed=i, done_prob=0.3) for i in range(3)]
    runner = BatchedRolloutRunner(agent, envs)
    seen = []
    stats = runner.run(8, on_step=lambda a, o: seen.append((a, o)))
    assert stats["frames"] == 24
    assert stats["frames_per_sec"] > 0
    assert len(seen) == 8 and len(seen[0][0]) == 3
    # on_step receives the PRE-step observations the actions were computed from
    assert len(seen[0][1]) == 3 and seen[0][1][0]["pov"].shape == (360, 640, 3)
    # done episodes triggered resets (first flags used) with done_prob 0.3
    # over 24 transitions it is overwhelmingly likely at least one reset fired
    assert runner.episode_steps.max() <= 8

    # legacy single-argument callbacks (pre-round-3 contract) still work
    legacy_seen = []
    runner.run(2, on_step=lambda actions: legacy_seen.append(actions))
    assert len(legacy_seen) == 2 and len(legacy_seen[0]) == 3


def test_rollout_recording(tmp_path):
    """run_agent.py --record: stream 0's POV frames, annotated with the
    sampled action, round-trip through the native encoder."""
    import pytest

    from vpt_tpu.data.video import VideoReader, native_available

    if not native_available():
        pytest.skip("native video plane unavailable")

    # import by explicit path: after test_reference_oracle's _install_reference
    # runs, a bare `import run_agent` would resolve to /root/reference's script
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "vpt_repo_run_agent",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "run_agent.py"),
    )
    repo_run_agent = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(repo_run_agent)
    _make_recorder = repo_run_agent._make_recorder

    agent = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs={"temperature": 2.0},
                        batch_size=2)
    envs = [MockMinecraftEnv(seed=i) for i in range(2)]
    runner = BatchedRolloutRunner(agent, envs)
    out = str(tmp_path / "rollout.mp4")
    write, writer = _make_recorder(out, 360, 640)
    runner.run(5, on_step=lambda actions, obs: write(actions[0], obs[0]))
    writer.close()
    with VideoReader(out) as cap:
        n = 0
        while True:
            frame = cap.read()
            if frame is None:
                break
            assert frame.shape == (360, 640, 3)
            n += 1
    assert n == 5


def test_grouped_rollout_runner():
    from vpt_tpu.agent.rollout import GroupedRolloutRunner

    agent = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs={"temperature": 2.0},
                        batch_size=2)
    envs = [MockMinecraftEnv(seed=i, done_prob=0.2) for i in range(6)]
    runner = GroupedRolloutRunner(agent, envs, n_groups=3)
    stats = runner.run(5)
    assert stats["frames"] == 30  # 6 envs x 5 steps
    assert stats["frames_per_sec"] > 0


def test_grouped_runner_state_isolation():
    """Each group's recurrent state is independent: resetting one group's
    episodes must not change another group's next action distribution
    (checked structurally: groups carry distinct state pytrees)."""
    from vpt_tpu.agent.rollout import GroupedRolloutRunner

    agent = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs={"temperature": 2.0},
                        batch_size=2)
    envs = [MockMinecraftEnv(seed=i) for i in range(4)]
    runner = GroupedRolloutRunner(agent, envs, n_groups=2)
    runner.run(2)
    s0, s1 = runner.groups[0]["state"], runner.groups[1]["state"]
    assert s0 is not s1
    leaves0 = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(s0)]
    leaves1 = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(s1)]
    # different frames went through the two groups -> states must differ
    assert any(not np.array_equal(a, b) for a, b in zip(leaves0, leaves1))
