"""Tensor-parallel parameter sharding rules.

The published VPT checkpoints (≤ ~0.5B params) replicate comfortably on one
chip, so DP is the workhorse axis; these rules exist for headroom — wider
variants or longer-context retrofits that outgrow one chip's HBM.  Sharding is
expressed the XLA way: PartitionSpecs on the parameter pytree; jit's SPMD
partitioner propagates them through the matmuls and inserts the ICI
collectives (no hand-written all-reduce).

Layout (Megatron-style pairing so each block needs one reduce):
  * attention q/k/v kernels: output (head) dim over ``tp``; proj: input dim
    over ``tp`` (heads stay whole per shard — hidsize/tp must divide heads);
  * pointwise MLP: mlp0 hidden dim over ``tp``; mlp1 input dim over ``tp``;
  * action-head linears (2048 → 8641): output dim over ``tp`` — the widest
    matmul in the model;
  * everything else (convs, norms, small denses) replicated.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix match, PartitionSpec for the kernel)
_RULES: Tuple[Tuple[Tuple[str, ...], P], ...] = (
    (("q_layer", "kernel"), P(None, "tp")),
    (("k_layer", "kernel"), P(None, "tp")),
    (("v_layer", "kernel"), P(None, "tp")),
    (("proj_layer", "kernel"), P("tp", None)),
    (("mlp0", "layer", "kernel"), P(None, "tp")),
    (("mlp1", "layer", "kernel"), P("tp", None)),
    (("linear_layer", "kernel"), P(None, "tp")),
)


def param_spec(path: Tuple[str, ...]) -> P:
    for suffix, spec in _RULES:
        if tuple(path[-len(suffix):]) == suffix:
            return spec
    return P()


def variables_shardings(variables, mesh: Mesh):
    """NamedSharding pytree for a variables tree under (dp, tp).

    A rule only applies when the sharded dimension divides the tp axis size
    (e.g. a 23-way head can't split over tp=4 — it stays replicated)."""
    tp = mesh.shape.get("tp", 1)

    def one(keypath, leaf):
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        spec = param_spec(path)
        for dim, axis in enumerate(spec):
            if axis == "tp" and leaf.shape[dim] % tp != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, variables)


def shard_variables(variables, mesh: Mesh):
    """Place a variables tree with TP rules applied."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), variables, variables_shardings(variables, mesh)
    )
