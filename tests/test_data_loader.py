"""Data-pipeline tests on synthetic mp4+jsonl fixtures exercising every fixup
branch (stuck-attack / hotbar / cursor / null-skip — SURVEY.md §4d)."""

import json
import os

import numpy as np
import pytest

from vpt_tpu.data.loader import DataLoader, SequenceDataLoader, trajectory_steps
from vpt_tpu.data.video import VideoWriter, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="native video lib unavailable")

W, H = 128, 72  # small 16:9 video


def _step(keys=(), dx=0.0, dy=0.0, buttons=(), new_buttons=(), hotbar=0, gui=False, x=0.0, y=0.0):
    return {
        "keyboard": {"keys": list(keys)},
        "mouse": {
            "x": x, "y": y, "dx": dx, "dy": dy,
            "buttons": list(buttons), "newButtons": list(new_buttons),
        },
        "hotbar": hotbar,
        "isGuiOpen": gui,
    }


def _write_fixture(tmp_path, name, steps, frame_fn=None):
    video_path = str(tmp_path / f"{name}.mp4")
    json_path = str(tmp_path / f"{name}.jsonl")
    with VideoWriter(video_path, W, H, fps=20) as w:
        for i in range(len(steps)):
            if frame_fn is None:
                frame = np.full((H, W, 3), (i * 10) % 255, np.uint8)
            else:
                frame = frame_fn(i)
            w.write(frame)
    with open(json_path, "w") as f:
        for s in steps:
            f.write(json.dumps(s) + "\n")
    return video_path, json_path


def test_null_actions_skipped(tmp_path):
    steps = [
        _step(keys=["key.keyboard.w"]),   # forward
        _step(),                           # null → skipped
        _step(dx=10.0),                    # camera move (1° after int truncation)
        _step(),                           # null → skipped
        _step(buttons=[0]),                # attack
    ]
    vp, jp = _write_fixture(tmp_path, "null", steps)
    out = list(trajectory_steps(vp, jp))
    assert len(out) == 3
    assert out[0][1]["forward"] == 1
    assert out[1][1]["camera"][1] != 0
    assert out[2][1]["attack"] == 1


def test_frames_track_steps_through_null_skips(tmp_path):
    """Null steps consume their frame: surviving steps keep their own frames."""
    steps = [_step(keys=["key.keyboard.w"]), _step(), _step(), _step(keys=["key.keyboard.s"])]
    frame_fn = lambda i: np.full((H, W, 3), 50 * i, np.uint8)
    vp, jp = _write_fixture(tmp_path, "sync", steps, frame_fn)
    out = list(trajectory_steps(vp, jp))
    assert len(out) == 2
    # frame 0 (value 0) and frame 3 (value 150); lossy codec tolerance
    assert abs(int(out[0][0].mean()) - 0) <= 6
    assert abs(int(out[1][0].mean()) - 150) <= 6


def test_stuck_attack_removed(tmp_path):
    steps = [
        _step(buttons=[0], new_buttons=[0]),  # attack down from the beginning → stuck
        _step(buttons=[0], dx=1.0),           # still stuck → attack stripped
        _step(buttons=[0], new_buttons=[0], dx=1.0),  # real press → unstuck
        _step(buttons=[0], dx=1.0),           # attack real now
    ]
    vp, jp = _write_fixture(tmp_path, "stuck", steps)
    out = list(trajectory_steps(vp, jp))
    # step 0 becomes null (attack stripped, no motion) → skipped
    assert len(out) == 3
    assert out[0][1]["attack"] == 0  # stripped while stuck
    assert out[1][1]["attack"] == 1
    assert out[2][1]["attack"] == 1


def test_hotbar_scroll_fixup(tmp_path):
    steps = [
        _step(dx=1.0, hotbar=0),
        _step(dx=1.0, hotbar=3),  # scrolled to slot 4 → hotbar.4 pressed
        _step(dx=1.0, hotbar=3),  # unchanged → no press
    ]
    vp, jp = _write_fixture(tmp_path, "hotbar", steps)
    out = list(trajectory_steps(vp, jp))
    assert out[0][1]["hotbar.4"] == 0
    assert out[1][1]["hotbar.4"] == 1
    assert out[2][1]["hotbar.4"] == 0


def test_cursor_composited_when_gui_open(tmp_path):
    mid_x, mid_y = W // 2, H // 2
    steps = [
        _step(dx=1.0, gui=False, x=mid_x / (H / 720), y=mid_y / (H / 720)),
        _step(dx=1.0, gui=True, x=mid_x / (H / 720), y=mid_y / (H / 720)),
    ]
    frame_fn = lambda i: np.full((H, W, 3), 30, np.uint8)
    vp, jp = _write_fixture(tmp_path, "cursor", steps, frame_fn)
    out = list(trajectory_steps(vp, jp, resolution=(W, H)))  # no resize: keep pixels inspectable
    no_gui, gui = out[0][0], out[1][0]
    # the composited cursor makes the GUI frame differ around the cursor pos
    assert np.abs(gui.astype(int) - no_gui.astype(int)).max() > 50


def test_single_step_loader_batches(tmp_path):
    for name in ("a", "b"):
        steps = [_step(dx=1.0) for _ in range(6)]
        _write_fixture(tmp_path, name, steps)
    loader = DataLoader(str(tmp_path), n_workers=2, batch_size=2, n_epochs=1)
    try:
        frames, actions, ids = next(loader)
        assert len(frames) == 2
        assert frames[0].shape == (128, 128, 3)
        assert set(ids) == {0, 1}
        n_batches = 1
        for _ in loader:
            n_batches += 1
        assert n_batches >= 5  # 6 steps per trajectory, 2 per batch round-robin
    finally:
        loader.close()


def test_sequence_loader_chunks(tmp_path):
    for name in ("a", "b"):
        steps = [_step(dx=float(i + 1)) for i in range(10)]
        _write_fixture(tmp_path, name, steps)
    loader = SequenceDataLoader(str(tmp_path), batch_size=2, chunk_len=4, n_epochs=1)
    try:
        batch = next(loader)
        assert batch["frames"].shape == (2, 4, 128, 128, 3)
        assert batch["buttons"].shape == (2, 4)
        assert batch["camera"].shape == (2, 4)
        assert batch["firsts"].tolist()[0] == [True, False, False, False]
        assert batch["mask"].all()
        b2 = next(loader)
        assert b2["firsts"][:, 0].tolist() == [False, False]  # continuation chunks
        b3 = next(loader)  # trailing partial chunk: 10 = 4+4+2
        assert b3["mask"][:, :2].all() and not b3["mask"][:, 2:].any()
    finally:
        loader.close()


def test_sequence_loader_camera_values(tmp_path):
    # constant strong rightward camera per step → non-null joint camera index
    steps = [_step(dx=40.0) for _ in range(4)]
    _write_fixture(tmp_path, "cam", steps)
    loader = SequenceDataLoader(str(tmp_path), batch_size=1, chunk_len=4, n_epochs=1)
    try:
        batch = next(loader)
        null_joint = 5 * 11 + 5
        assert (batch["camera"] != null_joint).all()
        # buttons joint index must have the camera meta button ON
        from vpt_tpu.actions.mapping import CameraHierarchicalMapping

        m = CameraHierarchicalMapping(n_camera_bins=11)
        assert not m.BUTTON_IDX_TO_CAMERA_META_OFF[batch["buttons"]].any()
    finally:
        loader.close()


def test_video_reader_matches_cv2_videocapture(tmp_path):
    """Native libav decoder vs cv2.VideoCapture frame-by-frame on the same
    file (the reference decodes with cv2.VideoCapture, data_loader.py:63)."""
    cv2 = pytest.importorskip("cv2")
    from vpt_tpu.data.video import VideoReader

    rng = np.random.default_rng(0)
    # smooth gradient frames compress losslessly enough to be stable, plus a
    # couple of random-noise frames to stress chroma subsampling agreement
    frames = []
    for i in range(8):
        yy, xx = np.mgrid[0:H, 0:W]
        frame = np.stack(
            [(xx * 2 + i * 11) % 256, (yy * 3 + i * 7) % 256, ((xx + yy) + i * 5) % 256], -1
        ).astype(np.uint8)
        frames.append(frame)
    frames.append(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
    video_path = str(tmp_path / "parity.mp4")
    with VideoWriter(video_path, W, H, fps=20) as w:
        for f in frames:
            w.write(f)

    cap = cv2.VideoCapture(video_path)
    reader = VideoReader(video_path)
    n = 0
    try:
        while True:
            ok, want_bgr = cap.read()
            got = reader.read()
            assert ok == (got is not None), f"frame-count mismatch at {n}"
            if not ok:
                break
            want = want_bgr[:, :, ::-1]  # BGR → RGB
            np.testing.assert_array_equal(got, want, err_msg=f"frame {n}")
            n += 1
    finally:
        cap.release()
        reader.close()
    assert n == len(frames)


def _distinct_steps(n, salt=0):
    # every step non-null with a distinct camera signature
    return [_step(dx=10.0 * ((i + salt) % 7 + 1)) for i in range(n)]


def _collect(loader):
    out = []
    try:
        for batch in loader:
            out.append(batch)
    finally:
        loader.close()
    return out


def test_sequence_loader_mid_trajectory_resume(tmp_path):
    """Kill-and-resume: the resumed loader consumes exactly the unseen chunks
    (no skip, no repeat), even mid-trajectory."""
    for j in range(4):
        _write_fixture(tmp_path, f"t{j}", _distinct_steps(10 + 3 * j, salt=j))
    kw = dict(batch_size=2, chunk_len=4, n_epochs=1, seed=7)

    full = _collect(SequenceDataLoader(str(tmp_path), **kw))

    interrupted = SequenceDataLoader(str(tmp_path), **kw)
    head, state = [], None
    try:
        it = iter(interrupted)
        for _ in range(2):  # consume 2 batches then "die" mid-trajectory
            head.append(next(it))
        state = interrupted.state()
    finally:
        interrupted.close()
    assert any(c[1] > 0 for c in state["streams"]), state  # mid-trajectory

    tail = _collect(SequenceDataLoader(str(tmp_path), **kw, resume_state=state))

    resumed = head + tail
    assert len(resumed) == len(full), (len(resumed), len(full))
    for b_full, b_res in zip(full, resumed):
        for key in ("frames", "buttons", "camera", "mask", "episode_ids"):
            np.testing.assert_array_equal(b_res[key], b_full[key], err_msg=key)
    # firsts may differ only at the resume boundary chunk (fresh carry)


def test_sequence_loader_resume_at_trajectory_boundary(tmp_path):
    """Resume where a stream had fully consumed its trajectory."""
    for j in range(4):
        _write_fixture(tmp_path, f"t{j}", _distinct_steps(8, salt=j))  # 2 chunks each
    kw = dict(batch_size=2, chunk_len=4, n_epochs=1, seed=3)
    full = _collect(SequenceDataLoader(str(tmp_path), **kw))

    interrupted = SequenceDataLoader(str(tmp_path), **kw)
    head = []
    try:
        it = iter(interrupted)
        for _ in range(2):  # exactly 2 chunks -> first trajectories finished
            head.append(next(it))
        state = interrupted.state()
    finally:
        interrupted.close()
    assert all(c[1] == 2 for c in state["streams"]), state

    tail = _collect(SequenceDataLoader(str(tmp_path), **kw, resume_state=state))
    resumed = head + tail
    assert len(resumed) == len(full)
    for b_full, b_res in zip(full, resumed):
        for key in ("frames", "buttons", "camera", "mask", "episode_ids"):
            np.testing.assert_array_equal(b_res[key], b_full[key], err_msg=key)


def test_read_batch_bit_exact_vs_per_frame(tmp_path):
    """The one-call batched decode+composite+resize (vpt_video_read_batch)
    must be bit-identical to the per-frame primitives, including the emit
    mask (decode-only frames) and the no-cursor sentinel."""
    from vpt_tpu.data.cursor import default_cursor
    from vpt_tpu.data.video import VideoReader, native_composite_alpha, native_resize_u8

    rng = np.random.default_rng(3)
    n = 10
    frames_in = [rng.integers(0, 256, (H, W, 3), dtype=np.uint8) for _ in range(n)]
    video_path = str(tmp_path / "batch.mp4")
    with VideoWriter(video_path, W, H, fps=20) as w:
        for f in frames_in:
            w.write(f)

    crgb, calpha = default_cursor()
    emit = np.ones(n, bool)
    emit[3] = emit[7] = False
    xy = np.full((n, 2), VideoReader.CURSOR_NONE, np.int32)
    xy[1] = (40, 25)
    xy[5] = (-4, 10)      # partially off-frame cursor
    xy[8] = (W - 3, H - 3)

    # reference: per-frame primitive calls
    want = {}
    reader = VideoReader(video_path)
    for i in range(n):
        frame = reader.read()
        assert frame is not None
        if not emit[i]:
            continue
        if xy[i, 0] != VideoReader.CURSOR_NONE:
            native_composite_alpha(frame, crgb, calpha, int(xy[i, 0]), int(xy[i, 1]))
        want[i] = native_resize_u8(frame, (128, 128))
    reader.close()

    reader = VideoReader(video_path)
    got, out = reader.read_batch(n, (128, 128), emit=emit, cursor_xy=xy,
                                 cursor=(crgb, calpha))
    reader.close()
    assert got == n
    for i, expected in want.items():
        np.testing.assert_array_equal(out[i], expected)


def test_read_batch_short_read_at_eof(tmp_path):
    from vpt_tpu.data.video import VideoReader

    video_path = str(tmp_path / "short.mp4")
    with VideoWriter(video_path, W, H, fps=20) as w:
        for i in range(4):
            w.write(np.full((H, W, 3), i * 30, np.uint8))
    reader = VideoReader(video_path)
    got, out = reader.read_batch(9, (64, 64))
    reader.close()
    assert got == 4
    assert out.shape == (9, 64, 64, 3)


def test_sequence_loader_sharding_partitions_the_global_batch(tmp_path):
    """Multi-host sharding: S shards of B local streams read exactly what one
    unsharded S·B-stream loader reads — disjoint, in the same global stream
    order — so a multi-process dp mesh trains on the identical global batch
    sequence (parallel/mesh.py place_local_batch assembles the shards)."""
    for j in range(8):
        _write_fixture(tmp_path, f"t{j}", _distinct_steps(8, salt=j))  # 2 chunks each
    kw = dict(chunk_len=4, n_epochs=1, seed=11)

    full = _collect(SequenceDataLoader(str(tmp_path), batch_size=4, **kw))
    shard0 = _collect(SequenceDataLoader(str(tmp_path), batch_size=2,
                                         shard_id=0, num_shards=2, **kw))
    shard1 = _collect(SequenceDataLoader(str(tmp_path), batch_size=2,
                                         shard_id=1, num_shards=2, **kw))

    assert len(full) == len(shard0) == len(shard1) > 0
    for b_full, b0, b1 in zip(full, shard0, shard1):
        for key in ("frames", "buttons", "camera", "firsts", "mask", "episode_ids"):
            merged = np.concatenate([b0[key], b1[key]], axis=0)
            np.testing.assert_array_equal(merged, b_full[key], err_msg=key)


def test_sequence_loader_shard_resume_cursor(tmp_path):
    """A shard's resume cursor round-trips; a cursor saved under a different
    shard geometry is rejected in favor of the coarse cursor."""
    for j in range(8):
        _write_fixture(tmp_path, f"t{j}", _distinct_steps(8, salt=j))
    kw = dict(batch_size=2, chunk_len=4, n_epochs=1, seed=11,
              shard_id=1, num_shards=2)

    full = _collect(SequenceDataLoader(str(tmp_path), **kw))

    interrupted = SequenceDataLoader(str(tmp_path), **kw)
    head = []
    state = None
    try:
        it = iter(interrupted)
        head.append(next(it))
        state = interrupted.state()
    finally:
        interrupted.close()
    assert state is not None and state["shard"] == [1, 2], state

    tail = _collect(SequenceDataLoader(str(tmp_path), **kw, resume_state=state))
    resumed = head + tail
    assert len(resumed) == len(full)
    for b_full, b_res in zip(full, resumed):
        np.testing.assert_array_equal(b_res["frames"], b_full["frames"])

    # mismatched geometry: falls back to the coarse cursor instead of using
    # stream cursors that mean different global streams
    other = SequenceDataLoader(str(tmp_path), batch_size=2, chunk_len=4,
                               n_epochs=1, seed=11, resume_state=state)
    other.close()
