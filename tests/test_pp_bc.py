"""Pipeline-parallel BC training of the FULL policy (training/pp_bc.py):
one train step with the block stack pipelined over pp must equal the standard
BCTrainer step bit-for-tolerance, and the split/merge param layout must
round-trip to the checkpoint format."""

import jax
import numpy as np

from vpt_tpu.parallel.mesh import make_mesh
from vpt_tpu.training.bc import BCHyperparams, BCTrainer
from vpt_tpu.training.pp_bc import PPBCTrainer, merge_policy_params, split_policy_params

TINY_KWARGS = dict(
    hidsize=64, impala_width=1, impala_chans=[4, 8], img_shape=[32, 32, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1}, n_recurrence_layers=2, timesteps=4,
    attention_heads=4, attention_memory_size=8, recurrence_type="transformer",
    attention_mask_style="clipped_causal", use_pre_lstm_ln=False,
    obs_processing_width=32,
)


def _batch(seed=0, b=8, t=4):
    rng = np.random.default_rng(seed)
    firsts = np.zeros((b, t), bool)
    firsts[3, 1] = True
    return {
        "frames": rng.integers(0, 255, (b, t, 32, 32, 3), dtype=np.uint8),
        "buttons": rng.integers(0, 8641, (b, t)).astype(np.int32),
        "camera": rng.integers(0, 121, (b, t)).astype(np.int32),
        "firsts": firsts,
        "mask": np.ones((b, t), bool),
    }


def test_split_merge_roundtrip():
    hp = BCHyperparams(batch_size=8, chunk_len=4)
    t = BCTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp,
                  mesh=make_mesh(n_dp=1, devices=jax.devices()[:1]), seed=0)
    t.init()
    params = jax.tree.map(np.asarray, t.variables["params"])
    rest, stacked = split_policy_params(params, 2)
    assert "blocks_0" not in rest["net"]["recurrent_layer"]
    back = merge_policy_params(rest, stacked, 2)
    assert jax.tree.structure(back) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_bc_step_matches_standard_trainer():
    """Two chained steps (state carried) on (pp=2, dp=4) == single-device
    BCTrainer — full policy: CNN front, pipelined stack, heads."""
    batches = [_batch(0), _batch(1)]
    hp = BCHyperparams(batch_size=8, chunk_len=4, learning_rate=1e-3)

    ref = BCTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp,
                    mesh=make_mesh(n_dp=1, devices=jax.devices()[:1]), seed=0)
    ref.init()
    state = ref.initial_state(8)
    ref_losses = []
    for b in batches:
        state, loss, gn_ref = ref.train_step(b, state)
        ref_losses.append(float(loss))

    pp = PPBCTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp,
                     mesh=make_mesh(n_dp=4, n_pp=2), n_micro=4, seed=0)
    pp.init()
    st = pp.initial_state(8)
    pp_losses = []
    for b in batches:
        st, loss, gn_pp = pp.train_step(b, st)
        pp_losses.append(float(loss))

    np.testing.assert_allclose(pp_losses, ref_losses, rtol=1e-5)
    np.testing.assert_allclose(float(gn_pp), float(gn_ref), rtol=1e-4)
    merged = pp.checkpoint_params()
    ref_params = jax.tree.map(np.asarray, ref.variables["params"])
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(ref_params)):
        # atol 1e-5: two Adam steps amplify f32 reassociation noise on
        # near-zero moments (observed max |Δ| ≈ 4e-6)
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)


def test_pp_bc_params_actually_pipelined():
    hp = BCHyperparams(batch_size=8, chunk_len=4)
    pp = PPBCTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp,
                     mesh=make_mesh(n_dp=4, n_pp=2), n_micro=4, seed=0)
    pp.init()
    leaf = jax.tree.leaves(pp.stacked_params)[0]
    assert leaf.shape[0] == 2  # stacked layer axis
    assert "pp" in tuple(leaf.sharding.spec)
    # per-device shard holds 1 of the 2 blocks
    assert leaf.addressable_data(0).shape[0] == 1
