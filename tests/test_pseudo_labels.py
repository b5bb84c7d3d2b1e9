"""BC on IDM pseudo-labels — the web-video stage of the VPT recipe (paper §4;
the reference ships the pieces but no path from IDM output back into BC).

Covers: pseudo-label jsonl parsing semantics (null skip, frame sync, missing
rows), format auto-detection (steps_for), separate-labels-dir discovery, and
the full loop: label a video with an IDM agent, then train BC on the result.
"""

import json
import os
import sys

import numpy as np
import pytest

from vpt_tpu.data.loader import (
    SequenceDataLoader,
    _is_pseudo_label_file,
    pseudo_label_steps,
    steps_for,
)
from vpt_tpu.data.video import VideoWriter, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="native video lib unavailable")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

W, H = 64, 36

POLICY_TINY = dict(
    hidsize=64,
    impala_width=1,
    impala_chans=[4, 8],
    img_shape=[32, 32, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1},
    n_recurrence_layers=2,
    timesteps=8,
    attention_heads=4,
    attention_memory_size=16,
    recurrence_type="transformer",
    attention_mask_style="clipped_causal",
    use_pre_lstm_ln=False,
    obs_processing_width=32,
)

IDM_TINY = dict(POLICY_TINY)
IDM_TINY.update(
    img_shape=[32, 32, 4],
    timesteps=16,
    attention_memory_size=32,
    attention_mask_style="none",
    conv3d_params={"inchan": 3, "outchan": 4, "kernel_size": [5, 1, 1], "padding": [2, 0, 0]},
)


def _null_action():
    return {"attack": 0, "forward": 0, "camera": [0.0, 0.0]}


def _label_row(frame, **overrides):
    action = _null_action()
    action.update(overrides)
    return {"frame": frame, "action": action}


def _write_video(path, n_frames, value_fn=None):
    with VideoWriter(str(path), W, H, fps=20) as vw:
        for i in range(n_frames):
            v = (i * 40) % 255 if value_fn is None else value_fn(i)
            vw.write(np.full((H, W, 3), v, np.uint8))


def _write_rows(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_pseudo_label_steps_semantics(tmp_path):
    """Null actions are skipped, unlabeled frames are skipped but keep the
    video in step, and every emitted frame pairs with ITS OWN label."""
    vp = tmp_path / "v.mp4"
    jp = tmp_path / "v.jsonl"
    _write_video(vp, 6)
    _write_rows(jp, [
        _label_row(0, attack=1),
        _label_row(1),                        # null → skipped
        _label_row(2, camera=[0.0, 1.25]),
        # frame 3: no label row → decoded, not emitted
        _label_row(4, forward=1),
        _label_row(5),                        # null → skipped
    ])

    out = list(pseudo_label_steps(str(vp), str(jp), resolution=(32, 32)))
    assert len(out) == 3
    frames = [f for f, _ in out]
    actions = [a for _, a in out]
    # frame values 0, 80, 160 (fill i*40; lossy codec tolerance)
    for got, want in zip(frames, (0, 80, 160)):
        assert abs(int(got.mean()) - want) <= 6
        assert got.shape == (32, 32, 3)
    assert actions[0]["attack"] == 1
    np.testing.assert_allclose(actions[1]["camera"], [0.0, 1.25])
    assert actions[2]["forward"] == 1

    # skip_steps counts NON-NULL steps, same contract as trajectory_steps
    out2 = list(pseudo_label_steps(str(vp), str(jp), resolution=(32, 32), skip_steps=2))
    assert len(out2) == 1 and out2[0][1]["forward"] == 1


def test_format_autodetection(tmp_path):
    recorder = tmp_path / "rec.jsonl"
    _write_rows(recorder, [{
        "keyboard": {"keys": ["key.keyboard.w"]},
        "mouse": {"x": 0.0, "y": 0.0, "dx": 0.0, "dy": 0.0, "buttons": [], "newButtons": []},
        "hotbar": 0, "isGuiOpen": False,
    }])
    pseudo = tmp_path / "lab.jsonl"
    _write_rows(pseudo, [_label_row(0, attack=1)])

    assert not _is_pseudo_label_file(str(recorder))
    assert _is_pseudo_label_file(str(pseudo))

    vp = tmp_path / "v.mp4"
    _write_video(vp, 1)
    out = list(steps_for(str(vp), str(pseudo), resolution=(32, 32)))
    assert len(out) == 1 and out[0][1]["attack"] == 1
    out = list(steps_for(str(vp), str(recorder), resolution=(32, 32)))
    assert len(out) == 1 and out[0][1]["forward"] == 1


def test_sequence_loader_labels_dir(tmp_path):
    """Videos in one tree, label jsonl in another (the label_videos.py
    layout); unlabeled videos are skipped, emitted chunks carry the labels'
    joint-space actions."""
    videos = tmp_path / "videos"
    labels = tmp_path / "labels"
    videos.mkdir()
    labels.mkdir()
    for j in range(3):
        _write_video(videos / f"t{j}.mp4", 8)
        if j < 2:  # t2 stays unlabeled → skipped
            _write_rows(labels / f"t{j}.jsonl", [
                _label_row(i, attack=1, camera=[0.0, float((i + j) % 3)])
                for i in range(8)
            ])

    loader = SequenceDataLoader(
        str(videos), labels_dir=str(labels), batch_size=2, chunk_len=4,
        n_epochs=1, seed=0, resolution=(32, 32),
    )
    batches = []
    try:
        for b in loader:
            batches.append(b)
    finally:
        loader.close()
    assert len(batches) == 2  # 8 labeled frames per stream / chunk 4
    for b in batches:
        assert b["frames"].shape == (2, 4, 32, 32, 3)
        # attack=1 every step → never the all-"none" joint combo, which is
        # buttons index 0 (CameraHierarchicalMapping.get_zero_action)
        assert (b["buttons"] != 0).all()
        assert b["mask"].all()


def test_full_pipeline_label_then_bc(tmp_path):
    """The closed loop the reference cannot run: an IDM agent labels raw
    video (tools/label_videos.py), and BC trains on those pseudo-labels."""
    import jax

    from label_videos import label_one
    from vpt_tpu.agent import IDMAgent
    from vpt_tpu.training.bc import BCHyperparams, BCTrainer

    videos = tmp_path / "videos"
    labels = tmp_path / "labels"
    videos.mkdir()
    labels.mkdir()
    rng = np.random.default_rng(0)
    for j in range(2):
        with VideoWriter(str(videos / f"t{j}.mp4"), W, H, fps=20) as vw:
            for _ in range(20):
                vw.write(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))

    agent = IDMAgent(idm_net_kwargs=IDM_TINY, pi_head_kwargs={"temperature": 1.0})
    agent._ensure_variables()
    for j in range(2):
        n, _ = label_one(agent, str(videos / f"t{j}.mp4"),
                         str(labels / f"t{j}.jsonl"), window=16, stride=8,
                         window_batch=1, strict_resolution=False)
        assert n == 20

    from vpt_tpu.parallel.mesh import make_mesh

    hp = BCHyperparams(batch_size=2, chunk_len=4, epochs=1)
    mesh = make_mesh(n_dp=2, devices=jax.devices()[:2])
    trainer = BCTrainer(POLICY_TINY, {"temperature": 2.0}, hp=hp, mesh=mesh)
    trainer.init()
    out_weights = str(tmp_path / "bc.weights")
    steps = trainer.train(str(videos), out_weights, labels_dir=str(labels))
    assert steps >= 1
    assert os.path.exists(out_weights)
