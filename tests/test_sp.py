"""Sequence parallelism: sharding the TIME axis over the ``sp`` mesh axis
must reproduce the unsharded results — for BC training (clipped-causal
windows) and for IDM window labeling (bidirectional attention)."""

import jax
import numpy as np

from vpt_tpu.agent import IDMAgent
from vpt_tpu.parallel.mesh import make_mesh, seq_sharded
from vpt_tpu.training.bc import BCHyperparams, BCTrainer

TINY_KWARGS = dict(
    hidsize=64, impala_width=1, impala_chans=[4, 8], img_shape=[32, 32, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1}, n_recurrence_layers=2, timesteps=4,
    attention_heads=4, attention_memory_size=8, recurrence_type="transformer",
    attention_mask_style="clipped_causal", use_pre_lstm_ln=False,
    obs_processing_width=32,
)

IDM_TINY_KWARGS = dict(
    hidsize=64, impala_width=1, impala_chans=[4, 8], img_shape=[64, 64, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1}, n_recurrence_layers=2, timesteps=8,
    attention_heads=4, attention_memory_size=16, recurrence_type="transformer",
    attention_mask_style="none",
    conv3d_params={"inchan": 3, "outchan": 8, "kernel_size": [5, 1, 1], "padding": [2, 0, 0]},
    use_pre_lstm_ln=False, obs_processing_width=32,
)


def test_seq_sharded_spec():
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(n_dp=2, n_sp=4)
    assert seq_sharded(mesh).spec == P(("dp", "fsdp"), "sp")
    assert mesh.shape == {"pp": 1, "dp": 2, "fsdp": 1, "sp": 4, "tp": 1}


def test_sp_training_matches_single_device():
    """A BC train step with the chunk time axis sharded sp=4 must equal the
    single-device step (episode resets mid-chunk included)."""
    rng = np.random.default_rng(3)
    firsts = np.zeros((8, 4), bool)
    firsts[2, 2] = True  # reset inside the sharded time axis
    batch = {
        "frames": rng.integers(0, 255, (8, 4, 32, 32, 3), dtype=np.uint8),
        "buttons": rng.integers(0, 8641, (8, 4)).astype(np.int32),
        "camera": rng.integers(0, 121, (8, 4)).astype(np.int32),
        "firsts": firsts,
        "mask": np.ones((8, 4), bool),
    }

    def run(mesh):
        hp = BCHyperparams(batch_size=8, chunk_len=4, learning_rate=1e-3)
        t = BCTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp, mesh=mesh, seed=0)
        t.init()
        _, loss, gn = t.train_step(batch, t.initial_state(8))
        return float(loss), float(gn), t.variables["params"]

    loss_sp, gn_sp, p_sp = run(make_mesh(n_dp=2, n_sp=4))
    loss_1, gn_1, p_1 = run(make_mesh(n_dp=1))
    np.testing.assert_allclose(loss_sp, loss_1, rtol=1e-5)
    np.testing.assert_allclose(gn_sp, gn_1, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p_sp), jax.tree.leaves(p_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)


def test_sp_idm_labeling_matches_unsharded():
    """predict_actions_batched with the window time axis sharded sp=4 must
    give the same argmax labels as the meshless agent."""
    rng = np.random.default_rng(5)
    windows = rng.integers(0, 255, (2, 8, 64, 64, 3), dtype=np.uint8)

    plain = IDMAgent(idm_net_kwargs=IDM_TINY_KWARGS, pi_head_kwargs={"temperature": 1.0})
    plain._ensure_variables()
    ref = plain.predict_actions_batched(windows)

    sharded = IDMAgent(
        idm_net_kwargs=IDM_TINY_KWARGS, pi_head_kwargs={"temperature": 1.0},
        mesh=make_mesh(n_dp=2, n_sp=4),
    )
    sharded.variables = plain.variables
    out = sharded.predict_actions_batched(windows)
    assert set(ref) == set(out)
    for k in ref:
        np.testing.assert_array_equal(out[k], ref[k])
