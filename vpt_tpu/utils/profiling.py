"""Profiling + activation-statistics taps.

The reference carries vestigial ``log_scope``/``get_log_keys`` hooks that
nothing calls (lib/util.py:84-88, masked_attention.py:180-182).  Here the real
equivalents:

  * ``profile_trace`` — context manager around ``jax.profiler`` producing an
    xprof/TensorBoard trace of device execution;
  * ``activation_stats`` — pure helper computing the reference's
    "activation_mean/<scope>", "activation_std/<scope>" statistics for any
    pytree of activations, for numeric debugging parity.
"""

from __future__ import annotations

import contextlib
from typing import Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def activation_stats(tree, prefix: str = "") -> Dict[str, jnp.ndarray]:
    """{"activation_mean/<path>", "activation_std/<path>"} over a pytree."""
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for keypath, leaf in flat:
        path = prefix + "/".join(
            str(k.key) if hasattr(k, "key") else str(k) for k in keypath
        )
        leaf = leaf.astype(jnp.float32)
        out[f"activation_mean/{path}"] = leaf.mean()
        out[f"activation_std/{path}"] = leaf.std()
    return out


def compiled_flops(jitted, *args):
    """Exact XLA FLOPs for one call of a jitted function (None if the
    platform can't report cost analysis).

    Known quirk shared by every caller: XLA counts a scanned (While) body
    ONCE, so FLOPs are underreported for scan-chunked graphs (e.g.
    cnn_scan_chunks configs) — treat the result as a lower bound there.
    """
    try:
        analysis = jitted.lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
        return flops or None
    except Exception:
        return None
