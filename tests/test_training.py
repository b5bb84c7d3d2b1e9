"""BC training tests on the 8-virtual-device CPU mesh (data parallel)."""

import jax
import numpy as np
import pytest

from vpt_tpu.parallel.mesh import make_mesh
from vpt_tpu.training.bc import BCHyperparams, BCTrainer

TINY_KWARGS = dict(
    hidsize=64,
    impala_width=1,
    impala_chans=[4, 8],
    img_shape=[32, 32, 3],
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


def _batch(b=8, t=4, hw=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "frames": rng.integers(0, 255, (b, t, hw, hw, 3), dtype=np.uint8),
        "buttons": rng.integers(0, 23, (b, t)).astype(np.int32),
        "camera": rng.integers(0, 121, (b, t)).astype(np.int32),
        "firsts": np.zeros((b, t), bool),
        "mask": np.ones((b, t), bool),
    }


def _make_trainer(n_dp):
    mesh = make_mesh(n_dp=n_dp)
    hp = BCHyperparams(batch_size=8, chunk_len=4, learning_rate=1e-3)
    trainer = BCTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp, mesh=mesh, seed=0)
    trainer.init()
    return trainer


def test_loss_decreases_on_fixed_batch():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    trainer = _make_trainer(8)
    batch = _batch()
    state = trainer.initial_state(8)
    losses = []
    for _ in range(12):
        state0 = trainer.initial_state(8)  # same data each step → same state
        _, loss, grad_norm = trainer.train_step(batch, state0)
        losses.append(float(loss))
        assert np.isfinite(losses[-1]) and np.isfinite(float(grad_norm))
    assert losses[-1] < losses[0] - 0.3, losses
    assert all(b < a for a, b in zip(losses, losses[1:])), losses  # monotone


def test_dp_matches_single_device():
    """Gradient psum over the mesh must give the same step as one device."""
    batch = _batch(seed=1)
    t8 = _make_trainer(8)
    t1 = _make_trainer(1)
    s8, loss8, g8 = t8.train_step(batch, t8.initial_state(8))
    s1, loss1, g1 = t1.train_step(batch, t1.initial_state(8))
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(float(g8), float(g1), rtol=1e-4)
    # parameters after one step agree across mesh sizes
    p8 = jax.tree.leaves(jax.tree.map(np.asarray, t8.variables["params"]))
    p1 = jax.tree.leaves(jax.tree.map(np.asarray, t1.variables["params"]))
    for a, b in zip(p8, p1):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-6)


def test_mask_excludes_padded_steps():
    trainer = _make_trainer(8)
    full = _batch(seed=2)
    padded = {k: v.copy() for k, v in full.items()}
    padded["mask"][:, 2:] = False
    # poison the padded steps: loss must not change
    poisoned = {k: v.copy() for k, v in padded.items()}
    poisoned["buttons"][:, 2:] = 7
    _, loss_a, _ = trainer.train_step(padded, trainer.initial_state(8))
    t2 = _make_trainer(8)
    _, loss_b, _ = t2.train_step(poisoned, t2.initial_state(8))
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)


def test_optimizer_matches_torch_adam_l2():
    """Our optax chain must reproduce torch Adam(lr, weight_decay) + clip:
    verified against torch.optim.Adam on a toy parameter."""
    import torch
    import optax
    import jax.numpy as jnp
    from vpt_tpu.training.bc import make_optimizer

    hp = BCHyperparams(learning_rate=0.01, weight_decay=0.1, max_grad_norm=1.0)
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grads = [np.array([0.5, 0.5, -1.0], np.float32), np.array([2.0, -2.0, 2.0], np.float32)]

    # torch side
    wt = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([wt], lr=hp.learning_rate, weight_decay=hp.weight_decay)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        torch.nn.utils.clip_grad_norm_([wt], hp.max_grad_norm)
        opt.step()

    # our side
    ox = make_optimizer(hp)
    params = jnp.asarray(w0)
    opt_state = ox.init(params)
    for g in grads:
        updates, opt_state = ox.update(jnp.asarray(g), opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params), wt.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_evaluate_held_out_nll(tmp_path):
    """BCTrainer.evaluate: mask-weighted NLL per frame over a dataset dir —
    finite, counts every non-null frame exactly once, deterministic."""
    import json

    from vpt_tpu.data.video import VideoWriter
    from vpt_tpu.training.bc import BCHyperparams, BCTrainer

    n = 24
    with VideoWriter(str(tmp_path / "t.mp4"), 64, 64, fps=20) as w:
        for i in range(n):
            w.write(np.full((64, 64, 3), (i * 9) % 255, np.uint8))
    with open(tmp_path / "t.jsonl", "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "mouse": {"x": 0.0, "y": 0.0, "dx": 1.0, "dy": 0.0,
                          "buttons": [], "newButtons": []},
                "keyboard": {"keys": ["key.keyboard.w"]},
                "hotbar": 0, "isGuiOpen": False,
            }) + "\n")

    kwargs = dict(
        hidsize=64, impala_width=1, impala_chans=[4, 8], img_shape=[32, 32, 3],
        init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
        impala_kwargs={"post_pool_groups": 1}, n_recurrence_layers=2, timesteps=8,
        attention_heads=4, attention_memory_size=16, recurrence_type="transformer",
        attention_mask_style="clipped_causal", use_pre_lstm_ln=False,
        obs_processing_width=32,
    )
    hp = BCHyperparams(batch_size=1, chunk_len=8)
    trainer = BCTrainer(kwargs, {"temperature": 2.0}, hp=hp,
                        mesh=make_mesh(n_dp=1, devices=jax.devices()[:1]), seed=0)
    trainer.init()
    report = trainer.evaluate(str(tmp_path))
    assert np.isfinite(report["nll_per_frame"]) and report["nll_per_frame"] > 0
    assert report["frames"] == n       # every step non-null (forward held)
    assert report["batches"] == n // 8
    report2 = trainer.evaluate(str(tmp_path))
    assert report2["nll_per_frame"] == report["nll_per_frame"]
