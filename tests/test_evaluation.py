"""Episode evaluation harness (agent/evaluation.py) and latency stats."""

import numpy as np
import pytest

from vpt_tpu.agent import MineRLAgent, compare_reports, evaluate_episodes
from vpt_tpu.agent.rollout import MockMinecraftEnv, latency_stats

TINY_KWARGS = dict(
    hidsize=64,
    impala_width=1,
    impala_chans=[4, 8],
    img_shape=[64, 64, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1},
    n_recurrence_layers=2,
    timesteps=4,
    attention_heads=4,
    attention_memory_size=8,
    recurrence_type="transformer",
    attention_mask_style="clipped_causal",
    use_pre_lstm_ln=False,
    obs_processing_width=32,
)
PI_KWARGS = {"temperature": 2.0}


class RewardingMockEnv(MockMinecraftEnv):
    """Mock env paying +1 per step while 'forward' is pressed, ending
    episodes at a fixed horizon — deterministic returns for harness tests."""

    def __init__(self, seed=0, horizon=7):
        super().__init__(seed=seed)
        self._horizon = horizon
        self._n = 0

    def reset(self):
        self._n = 0
        return super().reset()

    def step(self, action):
        obs, _r, _d, info = super().step(action)
        self._n += 1
        reward = float(action.get("forward", 0) == 1)
        return obs, reward, self._n >= self._horizon, info


@pytest.fixture(scope="module")
def agent():
    return MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS,
                       batch_size=2, seed=0)


def test_evaluate_episodes_recording(agent, tmp_path):
    """record_path: the eval rolls out identically and writes stream 0's
    annotated POV video alongside the report."""
    from vpt_tpu.data.video import VideoReader, native_available

    if not native_available():
        pytest.skip("native video plane unavailable")
    out = str(tmp_path / "eval.mp4")
    envs = [RewardingMockEnv(seed=i, horizon=5) for i in range(2)]
    report = evaluate_episodes(agent, envs, n_episodes=2, max_episode_steps=100,
                               record_path=out)
    assert report["recording"] == out
    with VideoReader(out) as cap:
        n = 0
        while cap.read() is not None:
            n += 1
    # one frame per agent step; 2 streams with horizon 5 finish 2 episodes
    # within 5 steps, so the video has exactly as many frames as steps taken
    assert n == report["steps"] // 2


def test_evaluate_episodes_report(agent):
    envs = [RewardingMockEnv(seed=i, horizon=7) for i in range(2)]
    report = evaluate_episodes(agent, envs, n_episodes=5, max_episode_steps=100)
    assert report["episodes"] == 5
    assert len(report["per_episode"]) == 5
    # fixed horizon: every episode is exactly 7 steps, none truncated
    assert all(e["length"] == 7 for e in report["per_episode"])
    assert report["truncated_episodes"] == 0
    assert report["mean_length"] == 7.0
    # returns equal forward-press counts → within [0, 7]
    assert 0.0 <= report["mean_return"] <= 7.0
    stats = report["action_stats"]
    assert 0.0 <= stats["null_action_rate"] <= 1.0
    assert 0.0 <= stats["camera_move_rate"] <= 1.0
    assert all(0.0 <= r <= 1.0 for r in stats["button_press_rate"].values())
    assert report["latency"]["p99_ms"] >= report["latency"]["p50_ms"] > 0
    assert report["mean_vpred"] is not None
    # the report is JSON-serializable as-is
    import json

    json.dumps(report)


def test_evaluate_truncation(agent):
    # done never fires → every episode is cut at max_episode_steps
    envs = [MockMinecraftEnv(seed=i, done_prob=0.0) for i in range(2)]
    report = evaluate_episodes(agent, envs, n_episodes=2, max_episode_steps=5)
    assert report["episodes"] == 2
    assert report["truncated_episodes"] == 2
    assert all(e["length"] == 5 and e["truncated"] for e in report["per_episode"])


def test_evaluate_is_deterministic_given_seeds():
    def run():
        ag = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS,
                         batch_size=2, seed=3)
        envs = [RewardingMockEnv(seed=i, horizon=6) for i in range(2)]
        return evaluate_episodes(ag, envs, n_episodes=4, max_episode_steps=50)

    a, b = run(), run()
    assert a["per_episode"] == b["per_episode"]
    assert a["action_stats"] == b["action_stats"]


def test_compare_reports(agent):
    envs = [RewardingMockEnv(seed=i, horizon=6) for i in range(2)]
    a = evaluate_episodes(agent, envs, n_episodes=4, max_episode_steps=50)
    b = evaluate_episodes(agent, envs, n_episodes=4, max_episode_steps=50)
    cmp = compare_reports(a, b)
    assert cmp["episodes"] == [4, 4]
    assert cmp["delta"] == pytest.approx(cmp["mean_return_b"] - cmp["mean_return_a"])


def test_latency_stats_fields():
    s = latency_stats([0.01, 0.02, 0.03, 0.04])
    assert s["steps"] == 4
    assert s["p50_ms"] <= s["p90_ms"] <= s["p99_ms"] <= s["max_ms"] == 40.0
    # 20 Hz budget is 50 ms; p99 ≈ 39.7 ms → factor > 1
    assert s["realtime_factor_p99"] > 1.0
    assert latency_stats([]) == {}


def test_runner_latency_in_stats(agent):
    from vpt_tpu.agent.rollout import BatchedRolloutRunner

    envs = [MockMinecraftEnv(seed=i) for i in range(2)]
    runner = BatchedRolloutRunner(agent, envs)
    stats = runner.run(4)
    assert stats["latency"]["steps"] == 4
    assert stats["latency"]["p50_ms"] > 0
