"""Bulk directory labeling tool (tools/label_videos.py): every video gets a
complete jsonl, outputs are atomic, and --resume skips finished files."""

import json
import os
import sys

import numpy as np
import pytest

from vpt_tpu.data.video import VideoWriter, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="native video lib unavailable")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

IDM_TINY = dict(
    hidsize=64,
    impala_width=1,
    impala_chans=[4, 8],
    img_shape=[32, 32, 4],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1},
    n_recurrence_layers=2,
    timesteps=16,
    attention_heads=4,
    attention_memory_size=32,
    recurrence_type="transformer",
    attention_mask_style="none",
    use_pre_lstm_ln=False,
    obs_processing_width=32,
    conv3d_params={"inchan": 3, "outchan": 4, "kernel_size": [5, 1, 1], "padding": [2, 0, 0]},
)


def _write_video(path, n_frames, w=64, h=36):
    rng = np.random.default_rng(hash(path) % 2**32)
    with VideoWriter(path, w, h, fps=20) as vw:
        for _ in range(n_frames):
            vw.write(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


def test_directory_labeling_and_resume(tmp_path):
    import jax

    from label_videos import label_one
    from vpt_tpu.agent import IDMAgent
    from vpt_tpu.checkpoint import save_weights

    video_dir = tmp_path / "videos"
    out_dir = tmp_path / "labels"
    video_dir.mkdir()
    out_dir.mkdir()
    lengths = {"a": 21, "b": 9}
    for vid, n in lengths.items():
        _write_video(str(video_dir / f"{vid}.mp4"), n)

    agent = IDMAgent(idm_net_kwargs=IDM_TINY, pi_head_kwargs={"temperature": 1.0})
    agent._ensure_variables()
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, jax.tree.map(np.asarray, agent.variables))
    agent.load_weights(wpath)

    for vid, n in lengths.items():
        out_path = str(out_dir / f"{vid}.jsonl")
        got_n, _ = label_one(agent, str(video_dir / f"{vid}.mp4"), out_path,
                             window=8, stride=4, window_batch=2,
                             strict_resolution=False)
        assert got_n == n
        rows = [json.loads(line) for line in open(out_path)]
        # every frame labeled exactly once, in order, with the full action dict
        assert [r["frame"] for r in rows] == list(range(n))
        assert all("camera" in r["action"] and "attack" in r["action"] for r in rows)
        # atomicity: no .tmp left behind
        assert not os.path.exists(out_path + ".tmp")

    # resume semantics (CLI main): existing outputs are skipped
    import label_videos as tool

    argv = ["label_videos", "--model", "m", "--weights", "w",
            "--video-dir", str(video_dir), "--out-dir", str(out_dir),
            "--n-frames", "8", "--stride", "4", "--no-strict-resolution"]
    calls = {"n": 0}

    def fake_label_one(*a, **k):
        calls["n"] += 1
        return 0, 0.0

    old_argv = sys.argv
    old_load_params, old_idm_agent = tool.load_model_parameters, tool.IDMAgent
    sys.argv = argv
    try:
        tool.load_model_parameters = lambda p: (IDM_TINY, {"temperature": 1.0})
        tool.IDMAgent = lambda **k: agent
        agent_load = agent.load_weights
        agent.load_weights = lambda p: None
        tool.label_one = fake_label_one
        tool.main()
    finally:
        sys.argv = old_argv
        agent.load_weights = agent_load
        tool.label_one = label_one
        tool.load_model_parameters = old_load_params
        tool.IDMAgent = old_idm_agent
    assert calls["n"] == 0  # both outputs exist → nothing re-labeled
