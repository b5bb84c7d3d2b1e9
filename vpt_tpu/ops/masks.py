"""Attention masks for the clipped-causal fixed-window mechanism.

Semantics match the reference (lib/masked_attention.py:11-94):

  * the base band-diagonal mask is causal and lets any output frame see at
    most ``maxlen`` frames *including itself*;
  * the ``first`` flag (episode boundary at the start of a chunk) zeroes out
    all past-context columns;
  * ``state_mask`` carries which of the past ``T - t`` cached slots are valid
    across chunk boundaries, so a zero-initialized KV cache is never attended.

Everything is expressed over a "time difference" grid
``d(i, j) = (T - t) + i - j`` — the number of steps key column ``j`` lies in
the past of query row ``i`` — which makes the band conditions one-liners and
maps directly onto the Pallas kernel's iota arithmetic.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def _time_difference_grid(t: int, T: int) -> jnp.ndarray:
    i = jnp.arange(t, dtype=jnp.int32)[:, None]
    j = jnp.arange(T, dtype=jnp.int32)[None, :]
    return (T - t) + i - j


def band_diagonal_mask(t: int, T: int, maxlen: Optional[int]) -> jnp.ndarray:
    """(t, T) boolean mask: True where query i may attend key column j.

    Causal (d >= 0) and windowed (d < maxlen).  Matches the docstring examples
    at lib/masked_attention.py:17-27.
    """
    d = _time_difference_grid(t, T)
    m = d >= 0
    if maxlen is not None and maxlen < T:
        m = m & (d < maxlen)
    return m


def clipped_causal_mask(
    first_b: jnp.ndarray,
    state_mask: jnp.ndarray,
    t: int,
    T: int,
    maxlen: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full per-batch mask plus the updated state mask.

    :param first_b: (B,) bool — episode starts at the first step of this chunk
    :param state_mask: (B, T - t) bool — validity of the cached past slots
    :param t: query length (chunk timesteps)
    :param T: key length (t + cached past)
    :param maxlen: attention window
    :returns: (mask (B, t, T) bool, new_state_mask (B, T - t) bool)
    """
    b = first_b.shape[0]
    n_past = T - t
    assert state_mask.shape == (b, n_past), (state_mask.shape, (b, n_past))

    band = band_diagonal_mask(t, T, maxlen)  # (t, T)
    m = jnp.broadcast_to(band[None], (b, t, T))
    not_first = ~first_b[:, None]  # (B, 1)
    if n_past > 0:
        past_ok = state_mask & not_first  # (B, n_past)
        m = jnp.concatenate([m[:, :, :n_past] & past_ok[:, None, :], m[:, :, n_past:]], axis=2)

    # Slide the state mask left by t and append t valid slots
    # (reference: masked_attention.py:86-93).
    keep = min(t, n_past)
    new_state_mask = jnp.concatenate(
        [state_mask[:, t:] & not_first, jnp.ones((b, keep), dtype=bool)], axis=1
    )
    return m, new_state_mask


def initial_state_mask(batch: int, maxlen: int) -> jnp.ndarray:
    """All-invalid past: nothing in the zero-initialized cache may be attended."""
    return jnp.zeros((batch, maxlen), dtype=bool)
