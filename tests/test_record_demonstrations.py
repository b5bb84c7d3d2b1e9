"""The demonstration recorder (tools/record_demonstrations.py): env actions →
contractor-format jsonl must invert the jsonl→env parser, and whole recorded
pairs must load through the same BC data pipeline as contractor data."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from vpt_tpu.actions.json_actions import (
    NOOP_ACTION,
    RecorderJsonlWriter,
    env_action_to_json_action,
    json_action_to_env_action,
)


def _action(camera=(0.0, 0.0), **pressed):
    a = dict(NOOP_ACTION, camera=np.asarray(camera, np.float64))
    for k, v in pressed.items():
        a[k.replace("hotbar_", "hotbar.")] = v
    return a


def test_round_trip_inverts_parser():
    """writer.step → json_action_to_env_action returns the original action,
    up to the parser's own camera-int-truncation quirk."""
    script = [
        _action(forward=1, jump=1, camera=(0.62, -5.81)),
        _action(use=1, camera=(-3.22, 1.61)),
        _action(),                                   # null step
        _action(attack=1, sprint=1, camera=(10.0, -10.0)),
        _action(attack=1),                           # attack held
        _action(hotbar_3=1),
    ]
    w = RecorderJsonlWriter()
    for orig in script:
        row = w.step(orig)
        back, is_null = json_action_to_env_action(row)
        for k in NOOP_ACTION:
            if k == "camera":
                np.testing.assert_array_equal(
                    back["camera"],
                    np.trunc(np.asarray(orig["camera"], np.float64)).astype(np.int64),
                )
            else:
                assert back[k] == orig[k], k
        assert is_null == (
            not any(orig[k] for k in NOOP_ACTION if k != "camera")
            and not np.any(np.asarray(orig["camera"]))
        )


def test_writer_state_tracking():
    w = RecorderJsonlWriter()
    r1 = w.step(_action(attack=1, use=1))
    assert r1["mouse"]["buttons"] == [0, 1] and r1["mouse"]["newButtons"] == [0, 1]
    r2 = w.step(_action(attack=1))               # use released, attack held
    assert r2["mouse"]["buttons"] == [0] and r2["mouse"]["newButtons"] == []
    r3 = w.step(_action(attack=1, use=1))        # use re-pressed
    assert r3["mouse"]["newButtons"] == [1]

    # hotbar slot persists between presses
    assert w.step(_action(hotbar_4=1))["hotbar"] == 3
    assert w.step(_action())["hotbar"] == 3
    assert w.step(_action(hotbar_1=1))["hotbar"] == 0

    # GUI toggles on FRESH inventory presses only
    assert w.step(_action(inventory=1))["isGuiOpen"] is True
    assert w.step(_action(inventory=1))["isGuiOpen"] is True   # held, no retoggle
    assert w.step(_action())["isGuiOpen"] is True
    assert w.step(_action(inventory=1))["isGuiOpen"] is False

    # ESC closes an open GUI (the common close path besides re-pressing
    # inventory); a fresh ESC with no GUI open stays closed
    assert w.step(_action())["isGuiOpen"] is False            # release inventory
    assert w.step(_action(inventory=1))["isGuiOpen"] is True
    assert w.step(_action(ESC=1))["isGuiOpen"] is False
    assert w.step(_action(ESC=1))["isGuiOpen"] is False        # held, no retoggle
    assert w.step(_action())["isGuiOpen"] is False
    assert w.step(_action(ESC=1))["isGuiOpen"] is False


def test_stateless_form():
    row = env_action_to_json_action(_action(forward=1, camera=(1.61, 0.0)))
    assert row["keyboard"]["keys"] == ["key.keyboard.w"]
    assert row["mouse"]["dy"] == pytest.approx(1.61 / (360.0 / 2400.0))


def test_recorded_pair_loads_through_bc_pipeline(tmp_path):
    """End-to-end: record scripted play with the tool's record(), then load
    the pair with the BC loader — frames and actions must match the play,
    with the loader's null-skip applied."""
    from vpt_tpu.data.loader import trajectory_steps
    from vpt_tpu.data.video import native_available

    if not native_available():
        pytest.skip("native video plane unavailable")

    from record_demonstrations import record

    script = [
        _action(forward=1),
        _action(forward=1, jump=1, camera=(3.0, -4.0)),
        _action(),                                   # null: loader must skip
        _action(use=1),
        _action(hotbar_2=1),
        _action(sneak=1, camera=(0.0, 10.0)),
    ]
    frames = [np.full((360, 640, 3), 40 * i, np.uint8) for i in range(len(script))]

    class _ScriptedAgent:
        batch_size = 1

        def __init__(self):
            self.t = 0

        def get_action(self, obs, first=None, **kw):
            a = script[self.t]
            self.t += 1
            return [a]

    class _ScriptedEnv:
        def __init__(self):
            self.t = 0

        def reset(self):
            return {"pov": frames[0]}

        def step(self, action):
            self.t += 1
            pov = frames[self.t] if self.t < len(frames) else frames[-1]
            return {"pov": pov}, 0.0, False, {}

    taken = record(_ScriptedAgent(), [_ScriptedEnv()], len(script), str(tmp_path),
                   prefix="scripted")
    # record() prepends one genuine warm-up noop step per stream so the first
    # policy action can never read back as a stuck attack key; the loader
    # then skips that row as a null action
    assert len(taken[0]) == len(script) + 1
    assert not any(taken[0][0][k] for k in NOOP_ACTION if k != "camera")

    got = list(trajectory_steps(str(tmp_path / "scripted-0.mp4"),
                                str(tmp_path / "scripted-0.jsonl")))
    # no mid-run resets -> exactly one pair, no -epK rollover files
    assert not list(tmp_path.glob("scripted-0-ep*"))
    expected = [(i, a) for i, a in enumerate(script)
                if any(a[k] for k in NOOP_ACTION if k != "camera")
                or np.any(np.asarray(a["camera"]))]
    assert len(got) == len(expected)
    for (frame, action), (i, orig) in zip(got, expected):
        assert frame.shape == (128, 128, 3)
        for k in NOOP_ACTION:
            if k == "camera":
                np.testing.assert_array_equal(
                    action["camera"], np.trunc(orig["camera"]).astype(np.int64))
            else:
                assert action[k] == orig[k], (i, k)


def test_mid_run_episode_resets_start_new_pairs(tmp_path):
    """When a stream's env ends mid-run, the next episode must land in a new
    mp4+jsonl pair (-epK suffix) instead of being stitched into the old one,
    and every written pair must be loadable with the right frame count."""
    from vpt_tpu.data.loader import trajectory_steps
    from vpt_tpu.data.video import native_available

    if not native_available():
        pytest.skip("native video plane unavailable")

    from record_demonstrations import record

    class _ForwardAgent:
        batch_size = 1

        def get_action(self, obs, first=None, **kw):
            return [_action(forward=1)]

    class _EpisodicEnv:
        """Ends an episode every 3 steps."""

        def __init__(self):
            self.t = 0

        def reset(self):
            return {"pov": np.full((360, 640, 3), 7, np.uint8)}

        def step(self, action):
            self.t += 1
            done = self.t % 3 == 0
            return {"pov": np.full((360, 640, 3), 7, np.uint8)}, 0.0, done, {}

    record(_ForwardAgent(), [_EpisodicEnv()], 7, str(tmp_path), prefix="epi")
    # 8 frames total (1 warm-up noop + 7 policy steps); episodes end at env
    # steps 3/6 (warm-up consumed step 1, so after policy steps 2 and 5)
    pairs = sorted(p.stem for p in tmp_path.glob("epi-0*.jsonl"))
    assert pairs == ["epi-0", "epi-0-ep1", "epi-0-ep2"], pairs
    lengths = []
    for stem in pairs:
        rows = (tmp_path / f"{stem}.jsonl").read_text().splitlines()
        steps = list(trajectory_steps(str(tmp_path / f"{stem}.mp4"),
                                      str(tmp_path / f"{stem}.jsonl")))
        # forward-only actions are never null -> loader keeps every policy row
        lengths.append(len(rows))
        assert len(steps) in (len(rows), len(rows) - 1)  # -1: leading noop skipped
    assert sum(lengths) == 8
    assert lengths == [3, 3, 2], lengths
