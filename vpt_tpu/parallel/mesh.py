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
  * ``fsdp`` — fully-sharded data parallel (ZeRO-3): also a *batch* axis for
    the data (the global batch shards over dp×fsdp jointly), but parameters,
    gradients, and Adam moments shard over it instead of replicating — see
    ``parallel/fsdp.py``.  Weight all-gathers ride this axis every step, so it
    sits inside dp (faster ICI links) in the device grid.
  * ``sp`` — sequence parallel: shards the TIME axis of (B, T, ...) data.
    VPT's per-frame CNN (the FLOPs bulk) partitions over T with zero
    communication; inside attention the SPMD partitioner inserts the K/V
    all-gathers over the window.  Useful when a single long window (IDM
    labeling with big ``timesteps``, long BC chunks) outgrows one chip's
    activation memory — batch axes stay the first choice when batch is
    plentiful.
  * ``tp`` — tensor parallel: width-sharding of individual matmuls
    (``parallel/tp.py``); innermost so tensor-shard collectives ride the
    fastest links.  Reserved headroom for configs beyond the published ≤0.5B
    checkpoints.
  * ``pp`` — pipeline parallel: GPipe-style staging of the transformer
    block stack (``parallel/pp.py``); outermost, since its point-to-point
    activation handoffs tolerate the slowest links.

(No ``ep`` axis: the VPT model family has no mixture-of-experts anywhere —
SURVEY.md §2 — so expert parallelism has nothing to shard.)

All five compose in one ("pp", "dp", "fsdp", "sp", "tp") mesh; unused axes
have size 1 and cost nothing.
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


def make_mesh(
    n_dp: Optional[int] = None,
    n_tp: int = 1,
    n_fsdp: int = 1,
    n_sp: int = 1,
    n_pp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over the available devices: (pp, dp, fsdp, sp, tp) — tp innermost
    so tensor shards ride the fastest ICI links, sp/fsdp next (per-step
    activation/weight collectives), dp next (one gradient reduction per
    step), pp outermost (point-to-point activation handoffs tolerate the
    slowest links)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // (n_tp * n_fsdp * n_sp * n_pp)
    n_used = n_pp * n_dp * n_fsdp * n_sp * n_tp
    assert n_used <= len(devices), (n_pp, n_dp, n_fsdp, n_sp, n_tp, len(devices))
    grid = np.asarray(devices[:n_used]).reshape(n_pp, n_dp, n_fsdp, n_sp, n_tp)
    return Mesh(grid, ("pp", "dp", "fsdp", "sp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / stream) axis over every data axis present
    (dp, and fsdp when the mesh has one — under FSDP the global batch still
    splits over all chips; only the weights' home changes)."""
    axes = tuple(a for a in ("dp", "fsdp") if a in mesh.axis_names)
    return NamedSharding(mesh, P(axes))


def seq_sharded(mesh: Mesh) -> NamedSharding:
    """(B, T, ...) arrays: batch over dp×fsdp, TIME over sp.  Identical to
    :func:`batch_sharded` when the mesh has no sp axis (or sp=1)."""
    axes = tuple(a for a in ("dp", "fsdp") if a in mesh.axis_names)
    sp = "sp" if "sp" in mesh.axis_names else None
    return NamedSharding(mesh, P(axes, sp))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with its leading axis split over dp."""
    sh = batch_sharded(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def place_local_batch(batch, sharding: NamedSharding):
    """Place a host batch pytree under ``sharding``, multi-host aware.

    Single-process: a plain ``device_put``.  Multi-process (after
    :func:`maybe_initialize_distributed`): each process holds only its own
    slice of the global batch — its loader reads a disjoint stream shard
    (``SequenceDataLoader(shard_id=, num_shards=)``) — so the global array is
    assembled from per-process shards with
    ``jax.make_array_from_process_local_data``; the global leading axis is
    ``local_B × process_count``.

    Assumes the standard mesh layout: only BATCH axes (dp / fsdp) cross
    process boundaries, while sp / tp / pp stay within a host — i.e. each
    process contributes full trailing dimensions of its batch rows.
    """
    nproc = jax.process_count()
    if nproc == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    def place(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(place, batch)


def local_batch_rows(x) -> np.ndarray:
    """The inverse of :func:`place_local_batch` for a batch-sharded global
    array: this process's own rows, host-ordered by global batch index.

    Single-process this is just ``np.asarray``.  Multi-process, a global
    array's ``np.asarray`` is illegal (some shards live on other hosts); the
    rows THIS process contributed are exactly its addressable shards —
    concatenate them in global order, deduplicating replicas (a leaf that is
    replicated over a model axis, e.g. tp, yields one addressable shard per
    local device with the same batch slice)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    by_start = {}
    for s in x.addressable_shards:
        start = s.index[0].start or 0
        if start not in by_start:
            by_start[start] = np.asarray(s.data)
    return np.concatenate([by_start[k] for k in sorted(by_start)], axis=0)


# one jitted allgather-identity per mesh: jit caches compiled programs by
# input shape/dtype/sharding only under a FIXED function object — a fresh
# jax.jit(lambda …) per call would recompile per leaf per checkpoint
_REPL_IDENTITY_CACHE: dict = {}


def _repl_identity(mesh: Mesh):
    fn = _REPL_IDENTITY_CACHE.get(mesh)
    if fn is None:
        fn = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))
        _REPL_IDENTITY_CACHE[mesh] = fn
    return fn


def cross_host_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Rendezvous every process at a named barrier through the coordination
    service (pure gRPC — no device collective, so none of gloo's ~30 s
    context-init window applies).  No-op single-process.

    Used right before a trainer's FIRST cross-host collective: rank skew
    there is unbounded (data-loader startup, first-batch decode), and a rank
    that reaches the collective >30 s ahead of its peers kills the job with
    'Gloo context initialization failed'.  The barrier collapses that skew
    to the (symmetric) compile time."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def place_host_array(x, sharding: NamedSharding):
    """Place one host array under ``sharding``, multi-host SAFE and
    verification-free.

    ``jax.device_put`` onto a sharding that spans processes runs a gloo
    ``assert_equal`` allgather over the VALUE — correct but heavy, and its
    context-init window (~30 s) trips when ranks reach the put with compile
    skew (observed on 1-core CI: one rank cache-hits, the other compiles).
    Our callers (weight init/load, EWMA stats refresh) construct identical
    values on every rank by design, so the check buys nothing:
    ``make_array_from_callback`` assembles the global array from local reads
    with no cross-host round at all."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


_host_tree_pulls = 0   # lockstep counter → unique barrier name per call


def host_tree(tree):
    """Pull a device pytree to host numpy, multi-host aware.

    Fully-addressable leaves (single host) and fully-replicated globals are a
    plain ``np.asarray``.  A leaf SHARDED across hosts (multi-host fsdp/tp)
    cannot be read directly — it is first allgathered device-side (a cached
    jitted identity with a replicated out-sharding) so every process sees the
    full value and rank-0 checkpoint writes serialize the whole tree.

    COLLECTIVE under multi-host sharding: every process must call this in
    lockstep (callers gate only the file WRITE on the rank, never this).
    Ranks rendezvous at a coordination-service barrier before the allgather
    dispatch: checkpoint pulls happen at arbitrary rank skew (file writes,
    compile variance), and a rank entering the gather's gloo context init
    >30 s ahead of its peers would hit the hard KV-store deadline."""
    needs_gather = any(
        isinstance(x, jax.Array)
        and not x.is_fully_addressable
        and not x.is_fully_replicated
        for x in jax.tree.leaves(tree)
    )
    if needs_gather:
        global _host_tree_pulls
        cross_host_barrier(f"host_tree_pull_{_host_tree_pulls}")
        _host_tree_pulls += 1

    def pull(x):
        if (
            isinstance(x, jax.Array)
            and not x.is_fully_addressable
            and not x.is_fully_replicated
        ):
            x = _repl_identity(x.sharding.mesh)(x)
        return np.asarray(x)

    return jax.tree.map(pull, tree)


def device_zeros_like_tree(tree_fn, sharding: NamedSharding):
    """Build a device-resident pytree (e.g. an initial recurrent state) as a
    GLOBAL computation: correct under multi-process meshes, where pieces of
    the sharding are not addressable from this host, and free of the
    host→device transfer a ``device_put`` of host zeros would cost."""
    return jax.jit(tree_fn, out_shardings=sharding)()
