"""FSDP (ZeRO-3) sharding: training over a (dp, fsdp) mesh must match the
single-device step numerically, with parameters and Adam moments actually
sharded over fsdp (per-device shards smaller than the full leaf)."""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from vpt_tpu.parallel.fsdp import leaf_spec, variables_shardings
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


def _batch(rng, b=8, t=4):
    return {
        "frames": rng.integers(0, 255, (b, t, 32, 32, 3), dtype=np.uint8),
        "buttons": rng.integers(0, 8641, (b, t)).astype(np.int32),
        "camera": rng.integers(0, 121, (b, t)).astype(np.int32),
        "firsts": np.zeros((b, t), bool),
        "mask": np.ones((b, t), bool),
    }


def test_leaf_spec_rules():
    # large square kernel: fsdp takes a free dim
    assert leaf_spec(("params", "net", "lastlayer", "layer", "kernel"), (64, 64), 4, 1, 1024) == P("fsdp", None)
    # tp rule first, fsdp takes the other dim
    assert leaf_spec(("params", "a", "q_layer", "kernel"), (64, 64), 4, 2, 1024) == P("fsdp", "tp")
    assert leaf_spec(("params", "a", "proj_layer", "kernel"), (64, 64), 4, 2, 1024) == P("tp", "fsdp")
    # small leaves stay replicated
    assert leaf_spec(("params", "a", "final_ln", "scale"), (64,), 4, 1) == P(None)
    # non-divisible dims skipped in favor of the next-largest divisible one
    assert leaf_spec(("params", "a", "layer", "kernel"), (23, 256), 4, 1, 16) == P(None, "fsdp")
    # stats never shard
    assert leaf_spec(("stats", "img_preprocess", "img_mean"), (128, 128, 3), 4, 1, 16) == P(None, None, None)


def test_fsdp_training_matches_single_device():
    """Two BC train steps on a (dp=2, fsdp=4) mesh must equal the 1-device run."""
    rng = np.random.default_rng(11)
    batches = [_batch(rng), _batch(rng)]

    def run(mesh):
        hp = BCHyperparams(batch_size=8, chunk_len=4, learning_rate=1e-3)
        t = BCTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp, mesh=mesh, seed=0)
        t.init()
        state = t.initial_state(8)
        losses = []
        for batch in batches:
            state, loss, gn = t.train_step(batch, state)
            losses.append(float(loss))
        return losses, float(gn), t

    losses_f, gn_f, t_f = run(make_mesh(n_dp=2, n_fsdp=4))
    losses_1, gn_1, t_1 = run(make_mesh(n_dp=1))
    np.testing.assert_allclose(losses_f, losses_1, rtol=1e-5)
    np.testing.assert_allclose(gn_f, gn_1, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(t_f.variables["params"]), jax.tree.leaves(t_1.variables["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)


def test_fsdp_actually_shards_params_and_moments():
    mesh = make_mesh(n_dp=2, n_fsdp=4)
    hp = BCHyperparams(batch_size=8, chunk_len=4)
    t = BCTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp, mesh=mesh, seed=0)
    t.init()
    # the big action-head kernel (64 x 8641) must live sharded...
    head_kernel = t.variables["params"]["pi_head"]["buttons"]["linear_layer"]["kernel"]
    assert "fsdp" in tuple(head_kernel.sharding.spec)
    shard_shape = head_kernel.addressable_data(0).shape
    assert np.prod(shard_shape) == head_kernel.size // 4, (shard_shape, head_kernel.shape)
    # ...and the Adam moments inherit the exact same sharding through jit
    mu = None
    for leaf in jax.tree.leaves(t.opt_state):
        if hasattr(leaf, "shape") and tuple(leaf.shape) == tuple(head_kernel.shape):
            mu = leaf
            break
    assert mu is not None
    assert mu.sharding == head_kernel.sharding
    # one step keeps everything in place (donation preserves shardings)
    state = t.initial_state(8)
    t.train_step(_batch(np.random.default_rng(0)), state)
    head_kernel2 = t.variables["params"]["pi_head"]["buttons"]["linear_layer"]["kernel"]
    # spec may normalize ('fsdp', None) → ('fsdp',); compare semantically
    assert head_kernel2.sharding.is_equivalent_to(head_kernel.sharding, head_kernel2.ndim)


def test_fsdp_composes_with_tp():
    """(dp=2, fsdp=2, tp=2): q kernels shard over both axes; a step runs."""
    mesh = make_mesh(n_dp=2, n_fsdp=2, n_tp=2)
    hp = BCHyperparams(batch_size=8, chunk_len=4)
    t = BCTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp, mesh=mesh, seed=0)
    t.init()
    qk = t.variables["params"]["net"]["recurrent_layer"]["blocks_0"]["r"]["orc_block"]["q_layer"]["kernel"]
    assert qk.sharding.spec == P("fsdp", "tp")
    state = t.initial_state(8)
    _, loss, _ = t.train_step(_batch(np.random.default_rng(1)), state)
    assert np.isfinite(float(loss))


def test_fsdp_sharding_tree_covers_all_leaves():
    mesh = make_mesh(n_dp=2, n_fsdp=4)
    hp = BCHyperparams(batch_size=8, chunk_len=4)
    t = BCTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp, mesh=mesh, seed=0)
    t.init()
    shardings = variables_shardings(jax.tree.map(np.asarray, t.variables), mesh)
    assert jax.tree.structure(shardings) == jax.tree.structure(t.variables)
