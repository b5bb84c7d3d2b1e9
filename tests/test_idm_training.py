"""IDM training (vpt_tpu/training/idm.py): target construction against the
joint-mapping oracle, optimization progress, dp-mesh equivalence, and the
full pipeline round trip (train → save → load into IDMAgent → label)."""

import json
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from vpt_tpu.actions.buttons import Buttons
from vpt_tpu.actions.mapping import CameraHierarchicalMapping
from vpt_tpu.training.idm import IDMHyperparams, IDMTrainer, factored_targets

# Small-but-real IDM geometry: conv3d front end + bidirectional attention,
# the published 4x architecture's structure at toy width (reference
# policy.py:374-392).  img_shape[2]=4 is the conv3d OUTPUT channel count
# (the reference kwargs convention — see models/policy.py idm_input_shape).
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


def _batch(rng, b=2, t=8, hw=32):
    return {
        "frames": rng.integers(0, 255, (b, t, hw, hw, 3), dtype=np.uint8),
        "buttons": rng.integers(0, 8641, (b, t)).astype(np.int32),
        "camera": rng.integers(0, 121, (b, t)).astype(np.int32),
        "firsts": np.zeros((b, t), bool),
        "mask": np.ones((b, t), bool),
    }


def test_factored_targets_semantics():
    """Factored targets carry the joint space's exact semantics: camera is
    nulled when the joint buttons index has the camera meta-button off, the
    inventory index sets only the inventory bit, and shapes/ranges match the
    IDM's (20×2, 2×11) action space."""
    mapper = CameraHierarchicalMapping(n_camera_bins=11)
    rng = np.random.default_rng(0)
    buttons = rng.integers(0, 8641, (3, 7))
    camera = rng.integers(0, 121, (3, 7))
    targets = factored_targets(buttons, camera, mapper)

    assert targets["buttons"].shape == (3, 7, len(Buttons.ALL))
    assert targets["camera"].shape == (3, 7, 2)
    assert set(np.unique(targets["buttons"])) <= {0, 1}
    assert targets["camera"].min() >= 0 and targets["camera"].max() < 11

    # camera-meta gating: meta-off joint indices null the camera bins
    meta_off = mapper.BUTTON_IDX_TO_CAMERA_META_OFF[buttons]
    assert (targets["camera"][meta_off] == mapper.camera_null_bin).all()
    # meta-on rows keep the joint camera's (x, y) decomposition
    on = ~meta_off
    assert (targets["camera"][on, 0] == camera[on] // 11).all()
    assert (targets["camera"][on, 1] == camera[on] % 11).all()

    # the inventory joint index maps to exactly the inventory bit
    inv = factored_targets(np.asarray([mapper.inventory_idx]), np.asarray([60]), mapper)
    expected = np.zeros(len(Buttons.ALL), np.int32)
    expected[Buttons.ALL.index("inventory")] = 1
    np.testing.assert_array_equal(inv["buttons"][0], expected)


def test_idm_training_reduces_loss():
    """A few optimizer steps on one repeated batch must reduce the NLL —
    the optimization loop (loss → grads → optax chain) is wired correctly
    end to end."""
    import jax

    from vpt_tpu.parallel.mesh import make_mesh

    trainer = IDMTrainer(IDM_TINY, {"temperature": 1.0},
                         hp=IDMHyperparams(batch_size=2, window=8,
                                           learning_rate=2e-3),
                         mesh=make_mesh(devices=jax.devices()[:2]))
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    losses = []
    state = trainer.initial_state(2)
    for _ in range(15):
        loss, grad_norm = trainer.train_step(dict(batch), state)
        losses.append(float(loss))
        assert np.isfinite(losses[-1]) and np.isfinite(float(grad_norm))
    assert losses[-1] < losses[0] * 0.7, losses


def test_idm_train_dp_mesh_equals_single_device():
    """The dp-sharded train step is numerically the single-device step: same
    seed + same batches → same per-step losses on an 8-device mesh and on a
    1-device mesh."""
    import jax

    from vpt_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(2)
    batches = [_batch(rng) for _ in range(3)]
    losses = {}
    for name, mesh in (
        ("dp2", make_mesh(devices=jax.devices()[:2])),
        ("single", make_mesh(devices=jax.devices()[:1])),
    ):
        trainer = IDMTrainer(IDM_TINY, {"temperature": 1.0},
                             hp=IDMHyperparams(batch_size=2, window=8),
                             mesh=mesh, seed=3)
        state = trainer.initial_state(2)
        losses[name] = [float(trainer.train_step(dict(b), state)[0]) for b in batches]
    np.testing.assert_allclose(losses["dp2"], losses["single"], rtol=1e-5)


@pytest.mark.skipif(
    not __import__("vpt_tpu.data.video", fromlist=["native_available"]).native_available(),
    reason="native video lib unavailable",
)
def test_idm_pipeline_round_trip(tmp_path):
    """Full loop: train on synthetic mp4+jsonl → save .weights → load into
    IDMAgent → label a video with tools/label_videos.  The trained artifact
    must be bit-compatible with the serving/labeling stack."""
    from vpt_tpu.data.video import VideoWriter

    # --- synthetic labeled corpus (the BC fixtures' jsonl schema) ---------
    keys = ["key.keyboard.w", "key.keyboard.a", "key.keyboard.s"]
    rng = np.random.default_rng(4)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    # 8 trajectories: the default mesh data-parallelizes over all (8 virtual)
    # devices, so the loader's stream count must divide by it
    for j in range(8):
        with VideoWriter(str(data_dir / f"t{j}.mp4"), 64, 36, fps=20) as w:
            for _ in range(20):
                w.write(rng.integers(0, 256, (36, 64, 3), dtype=np.uint8))
        with open(data_dir / f"t{j}.jsonl", "w") as f:
            for i in range(20):
                f.write(json.dumps({
                    "keyboard": {"keys": [keys[(i + j) % len(keys)]]},
                    "mouse": {"x": 10.0, "y": 10.0, "dx": float(i % 3), "dy": 0.0,
                              "buttons": [], "newButtons": []},
                    "hotbar": 0,
                    "isGuiOpen": False,
                }) + "\n")

    model_path = str(tmp_path / "idm.model")
    with open(model_path, "wb") as f:
        pickle.dump({"model": {"args": {
            "net": {"args": IDM_TINY},
            "pi_head_opts": {"temperature": "1.0"},
        }}}, f)

    # --- train (8 trajectories × 20 frames, window 8, 1 epoch) ------------
    from inverse_dynamics_train import inverse_dynamics_train

    out_weights = str(tmp_path / "idm.weights")
    inverse_dynamics_train(str(data_dir), model_path, out_weights,
                           batch_size=8, window=8, epochs=1)
    import os

    assert os.path.exists(out_weights)

    # --- label with the trained weights through the real labeling tool ----
    from label_videos import label_one
    from vpt_tpu.agent import IDMAgent

    agent = IDMAgent(idm_net_kwargs=IDM_TINY, pi_head_kwargs={"temperature": 1.0})
    agent.load_weights(out_weights)
    out_path = str(tmp_path / "labels.jsonl")
    n, _ = label_one(agent, str(data_dir / "t0.mp4"), out_path,
                     window=8, stride=4, window_batch=2, strict_resolution=False)
    assert n == 20
    rows = [json.loads(line) for line in open(out_path)]
    assert [r["frame"] for r in rows] == list(range(20))
    assert all(set(r["action"]) >= {"camera", "attack", "forward"} for r in rows)
