"""Strided (dilated-window) sparse attention.

The reference ships a dormant ``StridedAttn`` mechanism (lib/xf.py:141-216,
unused by all published configs) that restricts each query to keys at the same
phase modulo a stride, within a windowed number of strided groups — attention
over a dilated causal lattice.  The reference realizes this with
reshape/pad/SENTINEL gymnastics tuned for cuBLAS batching; on TPU the same
sparsity pattern is a masked dense attention over the (t, T) tile — XLA fuses
the iota-derived mask into the softmax, and for real sequence lengths the
windowed tile still fits VMEM.

Semantics: query at absolute time i may attend key at absolute time j iff
  d = i - j satisfies  d ≥ 0,  d % stride == 0,  d // stride < maxlen
(i.e. the query's own timestep plus the ``maxlen - 1`` previous same-phase
timesteps).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from vpt_tpu.ops.attention import windowed_attention


def strided_mask(t: int, T: int, stride: int, maxlen: int) -> jnp.ndarray:
    """(t, T) boolean dilated causal-window mask (queries are the last t of T)."""
    i = jnp.arange(t, dtype=jnp.int32)[:, None]
    j = jnp.arange(T, dtype=jnp.int32)[None, :]
    d = (T - t) + i - j
    return (d >= 0) & (d % stride == 0) & (d // stride < maxlen)


def strided_attention(
    q_bhtd: jnp.ndarray,
    k_bhTd: jnp.ndarray,
    v_bhTd: jnp.ndarray,
    stride: int,
    maxlen: int,
    extra_bhtT: Optional[jnp.ndarray] = None,
    use_muP_factor: bool = False,
) -> jnp.ndarray:
    """Dilated windowed attention (the strided sparse pattern, dense-masked)."""
    t, T = q_bhtd.shape[2], k_bhTd.shape[2]
    mask = jnp.broadcast_to(strided_mask(t, T, stride, maxlen)[None], (q_bhtd.shape[0], t, T))
    return windowed_attention(q_bhtd, k_bhTd, v_bhTd, mask, extra_bhtT, use_muP_factor)
