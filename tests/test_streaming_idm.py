"""StreamingIDMLabeler: overlap-stitched window labeling of long videos.

Every frame must be labeled exactly once, in order; each label must equal
the deterministic prediction of the window that owns the frame (center-most
window), so streaming output is fully reproducible from the window geometry.
"""

import numpy as np
import pytest

from vpt_tpu.agent import IDMAgent, StreamingIDMLabeler

IDM_TINY_KWARGS = dict(
    hidsize=64,
    impala_width=1,
    impala_chans=[4, 8],
    img_shape=[64, 64, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1},
    n_recurrence_layers=2,
    timesteps=8,
    attention_heads=4,
    attention_memory_size=16,
    recurrence_type="transformer",
    attention_mask_style="none",
    conv3d_params={"inchan": 3, "outchan": 8, "kernel_size": [5, 1, 1], "padding": [2, 0, 0]},
    use_pre_lstm_ln=False,
    obs_processing_width=32,
)


@pytest.fixture(scope="module")
def agent():
    return IDMAgent(idm_net_kwargs=IDM_TINY_KWARGS, pi_head_kwargs={"temperature": 1.0})


def _frames(n, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (n, 90, 160, 3), dtype=np.uint8)


def _run(agent, frames, **kw):
    labeler = StreamingIDMLabeler(agent, **kw)
    labels = []
    for f in frames:
        labels.extend(labeler.feed(f))
    labels.extend(labeler.finish())
    return labels


@pytest.mark.parametrize("n,window,stride,wb", [
    (20, 8, 4, 1),    # overlap, ragged tail
    (16, 8, 8, 1),    # disjoint (reference geometry), exact multiple
    (19, 8, 8, 2),    # disjoint, tail, batched windows
    (21, 8, 4, 3),    # overlap + batched
    (5, 8, 4, 1),     # video shorter than one window
    (8, 8, 3, 1),     # single full window, stride not dividing window
])
def test_every_frame_labeled_once_in_order(agent, n, window, stride, wb):
    labels = _run(agent, _frames(n), window=window, stride=stride, window_batch=wb)
    assert [i for i, _ in labels] == list(range(n))
    for _, action in labels:
        assert set(action) >= {"attack", "camera"}
        assert np.asarray(action["camera"]).shape == (2,)


def test_ownership_matches_direct_window_prediction(agent):
    """Each streamed label equals the deterministic argmax prediction of the
    owning window, run directly through predict_actions_batched."""
    n, window, stride = 20, 8, 4
    frames = _frames(n, seed=1)
    labels = dict(_run(agent, frames, window=window, stride=stride))

    from vpt_tpu.ops.resize import resize_image

    resized = np.stack([resize_image(f, (64, 64)) for f in frames])
    lo = (window - stride) // 2

    # interior check: frame 10 is owned by the window starting at s where
    # s + lo <= 10 < s + lo + stride → s = 8
    for idx, win_start in [(10, 8), (0, 0), (1, 0)]:
        direct = agent.predict_actions_batched(
            resized[win_start:win_start + window][None]
        )
        got = labels[idx]
        for key in got:
            np.testing.assert_array_equal(
                np.asarray(got[key]), np.asarray(direct[key][0, idx - win_start]),
                err_msg=f"frame {idx} key {key}",
            )

    # tail check: frames past the last complete window's region come from the
    # final `window` frames
    tail_direct = agent.predict_actions_batched(resized[n - window:][None])
    for idx in (n - 1, n - 2):
        got = labels[idx]
        for key in got:
            np.testing.assert_array_equal(
                np.asarray(got[key]),
                np.asarray(tail_direct[key][0, idx - (n - window)]),
                err_msg=f"tail frame {idx} key {key}",
            )


def test_disjoint_stride_matches_reference_batching(agent):
    """stride == window on an exact-multiple video reproduces the reference
    CLI's disjoint-window labels (predict_actions per window)."""
    n, window = 16, 8
    frames = _frames(n, seed=2)
    labels = dict(_run(agent, frames, window=window, stride=window))
    for s in range(0, n, window):
        agent.reset()
        ref = agent.predict_actions(frames[s:s + window])
        for i in range(window):
            got = labels[s + i]
            for key in got:
                np.testing.assert_array_equal(
                    np.asarray(got[key]), np.asarray(ref[key][0, i]),
                    err_msg=f"frame {s + i} key {key}",
                )


def test_streaming_is_deterministic(agent):
    frames = _frames(12, seed=3)
    a = _run(agent, frames, window=8, stride=4)
    b = _run(agent, frames, window=8, stride=4, window_batch=2)
    assert [i for i, _ in a] == [i for i, _ in b]
    for (_, x), (_, y) in zip(a, b):
        for key in x:
            np.testing.assert_array_equal(np.asarray(x[key]), np.asarray(y[key]))


def test_max_inflight_does_not_change_labels(agent):
    """max_inflight only bounds how many forwards are enqueued on the device
    at once (the HBM lever that keeps the 4x wb=8 geometry on a 16G chip) —
    labels and ordering are identical at any depth."""
    frames = _frames(23, seed=4)
    runs = [_run(agent, frames, window=8, stride=4, window_batch=2,
                 max_inflight=m) for m in (1, 2, 3)]
    for other in runs[1:]:
        assert [i for i, _ in other] == [i for i, _ in runs[0]]
        for (_, x), (_, y) in zip(runs[0], other):
            for key in x:
                np.testing.assert_array_equal(np.asarray(x[key]), np.asarray(y[key]))


def test_predict_actions_batched_shards_over_mesh(agent):
    """Window labeling is pure data parallelism: an 8-device dp mesh must
    produce bitwise the same labels as the unsharded agent."""
    import jax

    from vpt_tpu.agent import IDMAgent
    from vpt_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    sharded = IDMAgent(idm_net_kwargs=IDM_TINY_KWARGS, pi_head_kwargs={"temperature": 1.0},
                       mesh=make_mesh(n_dp=8))
    agent._ensure_variables()
    import jax.numpy as jnp

    sharded.variables = jax.tree.map(jnp.asarray, agent.variables)

    rng = np.random.default_rng(7)
    windows = rng.integers(0, 255, (8, 8, 64, 64, 3), dtype=np.uint8)
    want = agent.predict_actions_batched(windows)
    got = sharded.predict_actions_batched(windows)
    for key in want:
        np.testing.assert_array_equal(np.asarray(got[key]), np.asarray(want[key]), err_msg=key)
    # params ended up replicated, inputs sharded — the variables survived
    leaf = jax.tree_util.tree_leaves(sharded.variables)[0]
    assert leaf.sharding.is_fully_replicated


def test_agreement_meter_math():
    """AgreementMeter: per-button accuracy, exact match, camera MAE."""
    from vpt_tpu.utils.metrics import AgreementMeter

    m = AgreementMeter()
    # frame 1: all buttons agree, camera off by (1, 3) degrees
    m.add({"attack": 1, "forward": 0, "camera": [1.0, -2.0]},
          {"attack": 1, "forward": 0, "camera": [0.0, 1.0]})
    # frame 2: one of two buttons agrees, camera exact
    m.add({"attack": [0], "forward": np.asarray([1]), "camera": [0.0, 0.0]},
          {"attack": 1, "forward": 1, "camera": [0.0, 0.0]})
    s = m.summary()
    assert s["frames"] == 2
    assert s["button_exact_match"] == 0.5
    assert s["button_accuracy_mean"] == 0.75
    assert s["per_button_accuracy"] == {"attack": 0.5, "forward": 1.0}
    assert s["camera_mae_degrees"] == (1.0 + 3.0 + 0.0 + 0.0) / 4
    # missing recorded keys count as unpressed
    m2 = AgreementMeter()
    m2.add({"attack": 0, "camera": [0.0, 0.0]}, {"camera": [0.0, 0.0]})
    assert m2.summary()["button_exact_match"] == 1.0
    assert AgreementMeter().summary() == {"frames": 0}
