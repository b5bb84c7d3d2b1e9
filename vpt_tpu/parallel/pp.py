"""Pipeline parallelism for the residual recurrent (transformer) stack.

The reference has no distributed layer (SURVEY.md §2); the published VPT
configs (≤0.5B params) never *need* pipelining — dp/fsdp/tp cover them.  This
module supplies the pp axis for the geometry where it becomes the right tool:
many more / much wider blocks than HBM per chip, on meshes where tensor
parallelism has exhausted the fast ICI links.

Design (GPipe fill–drain, the TPU way):

  * the stack's ``n_block`` identical blocks are STACKED along a leading
    layer axis and sharded ``P("pp")`` over the mesh — each pp rank holds
    ``n_block / pp`` consecutive blocks and scans over them locally;
  * the batch is split into ``n_micro`` microbatches; a ``lax.scan`` over
    ``n_micro + pp − 1`` ticks runs one microbatch per stage per tick and
    rotates activations to the next stage with ``lax.ppermute`` — no
    hand-written sends, and autodiff transposes the permute so ``jax.grad``
    of the pipelined forward IS the backward pipeline (reverse schedule);
  * each stage carries its own blocks' recurrent state (KV caches), indexed
    per microbatch, so sequence-chunked training semantics (episode resets,
    truncated BPTT) are identical to the sequential stack;
  * the bubble fraction is the usual (pp−1)/(n_micro+pp−1) — pick
    ``n_micro ≥ 4·pp`` to amortize.

Everything runs under ``shard_map`` on the shared ("dp", "fsdp", "sp", "tp")
mesh extended with a "pp" axis; outputs are returned replicated (psum off the
last stage) so the surrounding data-parallel heads/loss consume them
unchanged.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp

try:  # jax >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

from jax.sharding import Mesh, PartitionSpec as P


def stack_block_params(block_params: Sequence) -> object:
    """Stack per-block parameter pytrees (identical structure — the stack is
    ``n_block`` copies of the same architecture, reference lib/util.py:91-129)
    along a new leading layer axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *block_params)


def unstack_block_params(stacked, n_block: int) -> List:
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n_block)]


def blocks_param_stack(params: dict, n_block: int):
    """Extract + stack the ``blocks_i`` subtrees of a ResidualRecurrentBlocks
    (or full policy ``...recurrent_layer``) params dict."""
    return stack_block_params([params[f"blocks_{i}"] for i in range(n_block)])


def pipelined_blocks(
    block_apply: Callable,
    stacked_params,
    x: jnp.ndarray,
    first: jnp.ndarray,
    stacked_state,
    *,
    mesh: Mesh,
    n_micro: int,
    axis: str = "pp",
):
    """Run the stacked block sequence as a pipeline over mesh axis ``axis``.

    :param block_apply: ``(one_block_params, x_mbte, first_mbt, state) ->
        (y_mbte, state_out)`` — apply ONE block (e.g. a closure over
        ``ResidualRecurrentBlock.apply``).
    :param stacked_params: per-block params stacked on a leading layer axis
        (``stack_block_params``); sharded/shardable P("pp") on that axis.
    :param x: (B, T, E) stack input (CNN latents).
    :param first: (B, T) episode-start flags.
    :param stacked_state: per-block recurrent state stacked on a leading
        layer axis: each leaf (n_block, B, ...).
    :param n_micro: number of microbatches; must divide B.
    :returns: (y, new_stacked_state) with y (B, T, E) replicated over pp and
        the state stacked exactly like the input.
    """
    n_pp = mesh.shape[axis]
    batch = x.shape[0]
    assert batch % n_micro == 0, (batch, n_micro)
    mb = batch // n_micro
    n_block = jax.tree.leaves(stacked_params)[0].shape[0]
    assert n_block % n_pp == 0, (n_block, n_pp)
    # microbatch ROWS shard over the data axes when they divide: each
    # (pp, dp) coordinate then runs an independent pipeline over its slice of
    # the batch.  Non-dividing geometries replicate the rows instead (every
    # dp rank redundantly computes the pipeline — correct, just not scaled).
    data_axes = tuple(
        a for a in ("dp", "fsdp") if a in mesh.axis_names and mesh.shape[a] > 1
    )
    n_data = 1
    for a in data_axes:
        n_data *= mesh.shape[a]
    if mb % n_data != 0:
        data_axes = ()

    x_m = x.reshape(n_micro, mb, *x.shape[1:])
    first_m = first.reshape(n_micro, mb, *first.shape[1:])
    state_m = jax.tree.map(
        lambda s: s.reshape(s.shape[0], n_micro, mb, *s.shape[2:]), stacked_state
    )

    def stage_fn(params_local, x_all, first_all, state_local):
        # params_local: (k, ...) this rank's blocks; state_local (k, M, mb, ...)
        n_stages = n_pp  # static: ppermute's permutation must be concrete
        rank = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def apply_stage(x_mb, first_mb, state_k):
            def body(carry, inp):
                p_one, s_one = inp
                y, s_out = block_apply(p_one, carry, first_mb, s_one)
                return y, s_out

            return jax.lax.scan(body, x_mb, (params_local, state_k))

        def tick(carry, t):
            buf, outputs, states = carry
            mid = t - rank                       # microbatch id at this stage
            valid = (mid >= 0) & (mid < n_micro)
            mid_c = jnp.clip(mid, 0, n_micro - 1)
            inp = jnp.where(
                rank == 0,
                jax.lax.dynamic_index_in_dim(x_all, mid_c, 0, keepdims=False),
                buf,
            )
            first_mb = jax.lax.dynamic_index_in_dim(first_all, mid_c, 0, keepdims=False)
            st = jax.tree.map(
                lambda s: jax.lax.dynamic_index_in_dim(s, mid_c, 1, keepdims=False),
                states,
            )
            y, st_out = apply_stage(inp, first_mb, st)
            states = jax.tree.map(
                lambda s, so: jnp.where(
                    valid, jax.lax.dynamic_update_index_in_dim(s, so, mid_c, 1), s
                ),
                states,
                st_out,
            )
            outputs = jnp.where(
                (rank == n_stages - 1) & valid,
                jax.lax.dynamic_update_index_in_dim(outputs, y, mid_c, 0),
                outputs,
            )
            return (jax.lax.ppermute(y, axis, perm), outputs, states), None

        carry0 = (jnp.zeros_like(x_all[0]), jnp.zeros_like(x_all), state_local)
        (_, outputs, states), _ = jax.lax.scan(
            tick, carry0, jnp.arange(n_micro + n_stages - 1)
        )
        # only the last stage holds real outputs; replicate them so the
        # (data-parallel) heads and loss consume the result unchanged
        outputs = jax.lax.psum(
            jnp.where(rank == n_stages - 1, outputs, jnp.zeros_like(outputs)), axis
        )
        return outputs, states

    row = data_axes if data_axes else None  # empty tuple is not a valid spec entry
    sharded = _shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(axis), P(None, row), P(None, row), P(axis, None, row)),
        out_specs=(P(None, row), P(axis, None, row)),
        check_vma=False,
    )
    y_m, new_state_m = sharded(stacked_params, x_m, first_m, state_m)
    y = y_m.reshape(batch, *x.shape[1:])
    new_state = jax.tree.map(
        lambda s: s.reshape(s.shape[0], batch, *s.shape[3:]), new_state_m
    )
    return y, new_state
