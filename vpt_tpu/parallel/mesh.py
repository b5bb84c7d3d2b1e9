"""Device mesh and sharding rules.

The reference is single-device with no distributed layer at all (SURVEY.md §2:
``torch.distributed`` imported and dead).  Here distribution is first-class
and expressed the TPU way: a ``jax.sharding.Mesh`` over the chips, named-axis
shardings on the data pytrees, and XLA inserting the collectives (psum for DP
gradients over ICI) — no hand-written communication.

Axes:
  * ``dp`` — data parallel: batch/stream dimension of every input, gradient
    psum.  The VPT policies (≤0.5B params) replicate comfortably per chip, so
    DP is the primary axis for both BC training and batched rollout/labeling.
  * ``tp`` — tensor parallel: reserved for width-sharding the 3x/4x models'
    matmuls when a config outgrows one chip's HBM; plumbed through
    ``make_mesh`` so multi-axis meshes compile today (dryrun covers a
    (dp, tp) mesh) even though published checkpoints don't need it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed for multi-host meshes when the standard env
    vars are present (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or a
    TPU pod environment jax can auto-detect).  Safe no-op on a single host.
    After this, ``jax.devices()`` spans all hosts and ``make_mesh`` builds a
    global mesh whose dp axis crosses DCN while tp stays within a slice."""
    import os

    # NB: the already-initialized probe must not touch the XLA backend —
    # jax.process_count() would initialize it and make a subsequent
    # jax.distributed.initialize() unconditionally fail
    if jax.distributed.is_initialized():
        return True
    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID")
    if coord and nproc and pid:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )
        return True
    return False


def make_mesh(n_dp: Optional[int] = None, n_tp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over the available devices: (dp, tp), tp innermost so tensor
    shards ride the fastest ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // n_tp
    assert n_dp * n_tp <= len(devices), (n_dp, n_tp, len(devices))
    grid = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(grid, ("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / stream) axis over dp."""
    return NamedSharding(mesh, P("dp"))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with its leading axis split over dp."""
    sh = batch_sharded(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
