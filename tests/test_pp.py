"""Pipeline parallelism: the GPipe-style pipelined transformer stack must be
numerically identical to the sequential stack — forward, carried recurrent
state, AND gradients (autodiff through ppermute gives the backward
pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.models.transformer import ResidualRecurrentBlock, ResidualRecurrentBlocks
from vpt_tpu.parallel.mesh import make_mesh
from vpt_tpu.parallel.pp import (
    blocks_param_stack,
    pipelined_blocks,
    stack_block_params,
    unstack_block_params,
)

HID, T, HEADS, MEM, N_BLOCK = 64, 4, 4, 8, 4


def _setup(batch=8, seed=0):
    blocks = ResidualRecurrentBlocks(
        hidsize=HID, timesteps=T, n_block=N_BLOCK, recurrence_type="transformer",
        attention_heads=HEADS, attention_memory_size=MEM,
        attention_mask_style="clipped_causal",
    )
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(batch, T, HID)), jnp.float32)
    first = np.zeros((batch, T), bool)
    first[1, 2] = True  # episode reset mid-chunk
    first = jnp.asarray(first)
    state = blocks.initial_state(batch)
    variables = jax.jit(blocks.init)(jax.random.PRNGKey(0), x, first, state)
    return blocks, variables, x, first, state


def _block_apply(variables_extra=None):
    block = ResidualRecurrentBlock(
        hidsize=HID, timesteps=T, init_scale=N_BLOCK ** -0.5,
        recurrence_type="transformer", attention_heads=HEADS,
        attention_memory_size=MEM, attention_mask_style="clipped_causal",
    )

    def apply(p, x, first, s):
        return block.apply({"params": p}, x, first, s)

    return apply


def test_stack_unstack_roundtrip():
    _, variables, *_ = _setup()
    per_block = [variables["params"][f"blocks_{i}"] for i in range(N_BLOCK)]
    stacked = stack_block_params(per_block)
    back = unstack_block_params(stacked, N_BLOCK)
    for a, b in zip(jax.tree.leaves(per_block), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_forward_matches_sequential():
    blocks, variables, x, first, state = _setup()
    y_ref, state_ref = blocks.apply(variables, x, first, state)

    mesh = make_mesh(n_dp=2, n_pp=4)
    stacked_params = blocks_param_stack(variables["params"], N_BLOCK)
    stacked_state = jax.tree.map(lambda *xs: jnp.stack(xs), *state)
    y, state_out = jax.jit(
        lambda p, xx, ff, ss: pipelined_blocks(
            _block_apply(), p, xx, ff, ss, mesh=mesh, n_micro=4
        )
    )(stacked_params, x, first, stacked_state)

    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-6)
    ref_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *state_ref)
    for a, b in zip(jax.tree.leaves(state_out), jax.tree.leaves(ref_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_pipelined_grads_match_sequential():
    blocks, variables, x, first, state = _setup()
    mesh = make_mesh(n_dp=2, n_pp=4)
    stacked_state = jax.tree.map(lambda *xs: jnp.stack(xs), *state)

    def loss_seq(params):
        y, _ = blocks.apply({"params": params}, x, first, state)
        return jnp.sum(y ** 2)

    def loss_pp(stacked_params):
        y, _ = pipelined_blocks(
            _block_apply(), stacked_params, x, first, stacked_state,
            mesh=mesh, n_micro=4,
        )
        return jnp.sum(y ** 2)

    g_seq = jax.jit(jax.grad(loss_seq))(variables["params"])
    g_seq_stacked = blocks_param_stack(g_seq, N_BLOCK)
    g_pp = jax.jit(jax.grad(loss_pp))(blocks_param_stack(variables["params"], N_BLOCK))
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)


def test_pipelined_micro_geometries():
    """n_micro == pp (max bubble) and n_micro == B (singleton microbatches)."""
    blocks, variables, x, first, state = _setup()
    y_ref, _ = blocks.apply(variables, x, first, state)
    mesh = make_mesh(n_dp=4, n_pp=2)
    stacked_params = blocks_param_stack(variables["params"], N_BLOCK)
    stacked_state = jax.tree.map(lambda *xs: jnp.stack(xs), *state)
    for n_micro in (2, 8):
        y, _ = pipelined_blocks(
            _block_apply(), stacked_params, x, first, stacked_state,
            mesh=mesh, n_micro=n_micro,
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-6)
