"""Checkpoint-and-resume regression: the restored optimizer state must keep
its optax pytree structure and the next train step must run (this exact path
was broken when orbax restored namedtuples as dicts)."""

import jax
import numpy as np
import pytest

from vpt_tpu.checkpoint import native as native_ckpt
from vpt_tpu.parallel.mesh import make_mesh
from vpt_tpu.training.bc import BCHyperparams, BCTrainer

TINY_KWARGS = dict(
    hidsize=64, impala_width=1, impala_chans=[4, 8], img_shape=[32, 32, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1}, n_recurrence_layers=2, timesteps=4,
    attention_heads=4, attention_memory_size=8, recurrence_type="transformer",
    attention_mask_style="clipped_causal", use_pre_lstm_ln=False,
    obs_processing_width=32,
)


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "frames": rng.integers(0, 255, (4, 4, 32, 32, 3), dtype=np.uint8),
        "buttons": rng.integers(0, 8641, (4, 4)).astype(np.int32),
        "camera": rng.integers(0, 121, (4, 4)).astype(np.int32),
        "firsts": np.zeros((4, 4), bool),
        "mask": np.ones((4, 4), bool),
    }


def test_save_restore_continue(tmp_path):
    hp = BCHyperparams(batch_size=4, chunk_len=4)
    t1 = BCTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp, mesh=make_mesh(n_dp=1), seed=0)
    t1.init()
    state = t1.initial_state(4)
    state, loss_a, _ = t1.train_step(_batch(0), state)
    native_ckpt.save_checkpoint(
        str(tmp_path), 1,
        jax.tree.map(np.asarray, t1.variables),
        opt_state=jax.tree.map(np.asarray, t1.opt_state),
        data_state={"n_trajectories_dispatched": 3, "step_count": 1},
    )

    # fresh trainer restores with the template and takes another step
    t2 = BCTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp, mesh=make_mesh(n_dp=1), seed=0)
    t2.init()
    template = {
        "variables": jax.tree.map(np.asarray, t2.variables),
        "opt_state": jax.tree.map(np.asarray, t2.opt_state),
    }
    payload, data_state = native_ckpt.restore_checkpoint(str(tmp_path), template=template)
    assert data_state["n_trajectories_dispatched"] == 3
    # restored opt_state keeps the optax structure
    assert jax.tree_util.tree_structure(payload["opt_state"]) == jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, t2.opt_state)
    )
    t2.variables = t2._place_variables(payload["variables"])
    t2.opt_state = jax.jit(lambda x: x)(payload["opt_state"])

    # the continued step must match the uninterrupted trainer's step
    state2 = t2.initial_state(4)
    state, loss_b1, _ = t1.train_step(_batch(1), t1.initial_state(4))
    state2, loss_b2, _ = t2.train_step(_batch(1), state2)
    np.testing.assert_allclose(float(loss_b1), float(loss_b2), rtol=1e-6)


def test_checkpoint_retention(tmp_path):
    v = {"params": {"w": np.zeros(3, np.float32)}}
    for step in (1, 2, 3, 4, 5):
        native_ckpt.save_checkpoint(str(tmp_path), step, v, keep=2)
    assert native_ckpt.latest_step(str(tmp_path)) == 5
    import os

    kept = sorted(os.listdir(tmp_path))
    assert kept == ["step_4", "step_5"], kept
