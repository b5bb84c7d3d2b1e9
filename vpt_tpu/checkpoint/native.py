"""Native checkpointing: train state + data-iterator position, mid-run safe.

The reference saves only a final state_dict with no optimizer state and no
resume support (behavioural_cloning.py:131-132).  Large-scale TPU training
needs preemption-safe checkpoints, so this module saves:

  * model variables (params + stats),
  * optimizer state,
  * the data-iterator cursor (epoch, step, per-worker trajectory offsets),
  * the RNG key,

via orbax (async-capable, multi-host aware).  Checkpoints are sharding-aware:
restore places arrays according to the live mesh.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover - orbax is in the base image
    _HAS_ORBAX = False


def _require_orbax():
    if not _HAS_ORBAX:
        raise RuntimeError(
            "orbax-checkpoint is required for native checkpoints "
            "(pip install orbax-checkpoint)"
        )


def save_checkpoint(
    directory: str,
    step: int,
    variables: Dict,
    opt_state: Any = None,
    data_state: Optional[Dict] = None,
    rng_key=None,
    keep: int = 3,
) -> str:
    """Write checkpoint ``directory/step_N``; prunes to the newest ``keep``.

    Multi-host: a COLLECTIVE — every process must call it in lockstep with
    the same payload values (orbax's save runs a global sync; a rank-0-only
    call would hang the pod).  Orbax elects the writer; ``data_state`` and
    pruning are applied by process 0 only, and ``directory`` is assumed to
    be shared storage."""
    _require_orbax()
    primary = jax.process_index() == 0
    if primary:
        os.makedirs(directory, exist_ok=True)
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    payload = {"variables": variables}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if rng_key is not None:
        payload["rng_key"] = rng_key

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    if primary:
        if data_state is not None:
            with open(os.path.join(path, "data_state.json"), "w") as f:
                json.dump(data_state, f)
        _prune(directory, keep)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(name.split("_", 1)[1])
        for name in os.listdir(directory)
        if name.startswith("step_") and name.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None, template: Any = None):
    """Restore ``(payload, data_state)`` from ``directory`` (latest by default).

    ``template`` (a matching pytree of arrays/ShapeDtypeStructs, possibly with
    shardings) controls placement on restore.
    """
    _require_orbax()
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None, None
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        payload = ckptr.restore(path, item=template)
    else:
        payload = ckptr.restore(path)
    data_state = None
    ds_path = os.path.join(path, "data_state.json")
    if os.path.exists(ds_path):
        with open(ds_path) as f:
            data_state = json.load(f)
    return payload, data_state


def save_data_state(directory: str, step: int, data_state: Dict, keep: int = 3) -> str:
    """Write ONLY a data-iterator cursor as ``directory/step_N/data_state.json``.

    Multi-host training: the train state is replicated, so process 0 writes
    the full checkpoint while every other process records just its own data
    shard's cursor under ``<dir>/shard<p>`` (see BCTrainer.train).  No orbax,
    no arrays — safe to call concurrently from different processes as long as
    each uses its own directory."""
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "data_state.json"), "w") as f:
        json.dump(data_state, f)
    _prune(directory, keep)
    return path


def restore_data_state(directory: str, step: Optional[int] = None) -> Optional[Dict]:
    """Read the cursor written by :func:`save_data_state` (latest by default)."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None
    ds_path = os.path.join(os.path.abspath(directory), f"step_{step}", "data_state.json")
    if not os.path.exists(ds_path):
        return None
    with open(ds_path) as f:
        return json.load(f)


def _prune(directory: str, keep: int) -> None:
    steps = sorted(
        int(name.split("_", 1)[1])
        for name in os.listdir(directory)
        if name.startswith("step_") and name.split("_", 1)[1].isdigit()
    )
    import shutil

    for s in steps[:-keep] if keep > 0 else []:
        shutil.rmtree(os.path.join(directory, f"step_{s}"), ignore_errors=True)
