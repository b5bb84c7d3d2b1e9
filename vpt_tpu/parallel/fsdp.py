"""Fully-sharded data parallelism (ZeRO-3) parameter sharding rules.

The reference has no distributed layer at all (SURVEY.md §2: ``torch.distributed``
imported and dead, torch_util.py:14).  Plain DP replicates parameters per
chip, which is fine for serving but caps *training*: the 3x policy's 0.5B
params with f32 Adam state cost ~16 bytes/param (params + grads + 2 moments)
≈ 8.5 GB before a single activation — tight next to T=128 sequence chunks.

FSDP removes that wall the TPU way: every large parameter leaf (and therefore
its gradient and its Adam moments, which inherit the sharding through jit) is
sharded over the ``fsdp`` mesh axis.  The batch still shards over dp×fsdp
jointly, so all chips do data-parallel compute; XLA's SPMD partitioner
inserts the per-layer weight all-gathers on the forward/backward pass and
reduce-scatters the gradients — the whole scheme is expressed as
PartitionSpecs on the parameter pytree, with no hand-written collectives.

Composition with tensor parallelism: rules start from ``parallel/tp.py``'s
Megatron-style specs and then assign ``fsdp`` to the largest still-unsharded
dimension that divides, so a (dp, fsdp, tp) mesh shards q/k/v kernels as
P("fsdp", "tp"), pointwise kernels likewise, and leaves biases/norm scales
replicated (below ``min_size`` the all-gather latency outweighs the memory).
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vpt_tpu.parallel.tp import param_spec as tp_param_spec

# Leaves smaller than this stay replicated: sharding a 64-float norm scale
# saves nothing and adds a collective. 4096 f32 = one 16 KB page per moment.
MIN_SHARD_SIZE = 4096


def leaf_spec(path: Tuple[str, ...], shape: Tuple[int, ...], fsdp: int, tp: int,
              min_size: int = MIN_SHARD_SIZE) -> P:
    """PartitionSpec for one variables leaf under a (dp, fsdp, tp) mesh.

    Only ``params`` leaves shard; ``stats`` (EWMA return stats, img mean/std
    images — reference normalize_ewma.py:18-20, lib/policy.py:29-36) replicate
    so their read-everywhere/update-once semantics stay trivial.
    """
    spec = [None] * len(shape)
    if not path or path[0] != "params":
        return P(*spec)
    for dim, axis in enumerate(tp_param_spec(path)):
        if axis == "tp" and tp > 1 and dim < len(shape) and shape[dim] % tp == 0:
            spec[dim] = "tp"
    size = 1
    for s in shape:
        size *= s
    if fsdp > 1 and size >= min_size:
        for dim in sorted(range(len(shape)), key=lambda d: -shape[d]):
            if spec[dim] is None and shape[dim] % fsdp == 0:
                spec[dim] = "fsdp"
                break
    return P(*spec)


def variables_shardings(variables, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """NamedSharding pytree for a variables tree under (dp, fsdp, tp)."""
    fsdp = mesh.shape.get("fsdp", 1)
    tp = mesh.shape.get("tp", 1)

    def one(keypath, leaf):
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        return NamedSharding(mesh, leaf_spec(path, tuple(leaf.shape), fsdp, tp, min_size))

    return jax.tree_util.tree_map_with_path(one, variables)


def shard_variables(variables, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """Place a variables tree with the combined FSDP+TP rules applied.
    Multi-host safe: per-leaf ``place_host_array`` assembles global arrays
    without device_put's cross-process value-verification allgather."""
    from vpt_tpu.parallel.mesh import place_host_array

    return jax.tree_util.tree_map(
        place_host_array,
        variables,
        variables_shardings(variables, mesh, min_size),
    )


def place_variables(variables, mesh: Mesh):
    """Place a variables tree for training on ``mesh``: sharded when the mesh
    has an active fsdp/tp axis, replicated otherwise."""
    if mesh.shape.get("fsdp", 1) > 1 or mesh.shape.get("tp", 1) > 1:
        return shard_variables(variables, mesh)
    from vpt_tpu.parallel.mesh import place_host_array

    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: place_host_array(x, repl), variables)


def init_opt_state(optimizer, params, mesh: Mesh):
    """Optimizer state placed exactly like its parameters.

    Eager ``optimizer.init`` preserves each committed param's sharding
    through ``zeros_like`` (jit would NOT: zero outputs have no data
    dependence on the inputs, so the compiler is free to lay them out
    unsharded); stray single-device leaves (the step-counter scalar) are
    re-placed replicated so the train step sees one consistent mesh."""
    from vpt_tpu.parallel.mesh import place_host_array

    opt_state = optimizer.init(params)
    repl = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: x if isinstance(x.sharding, NamedSharding) else place_host_array(x, repl),
        opt_state,
    )
