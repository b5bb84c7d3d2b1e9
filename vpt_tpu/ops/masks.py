"""Attention masks for the clipped-causal fixed-window mechanism.

Semantics match the reference (lib/masked_attention.py:11-94):

  * the base band-diagonal mask is causal and lets any output frame see at
    most ``maxlen`` frames *including itself*;
  * ``first`` flags (episode boundaries) zero out attention across the
    boundary — at the chunk start they hide all past-context columns exactly
    like the reference, and (beyond the reference, which only reads the
    chunk's first flag) at ANY in-chunk position they split the chunk so
    stepwise and chunkwise forwards agree for arbitrary reset patterns;
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
    first: jnp.ndarray,
    state_mask: jnp.ndarray,
    t: int,
    T: int,
    maxlen: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full per-batch mask plus the updated state mask.

    Accepts EITHER the reference's chunk-start flag (B,) — episode starts at
    the first step of this chunk (reference get_mask only consults
    ``first_b11``, masked_attention.py:74-84) — or full per-timestep flags
    (B, t), a strict superset the reference architecture never needed (it
    trains at t=1): with (B, t) firsts, a reset anywhere inside the chunk
    blocks attention across that boundary exactly as stepwise t=1 inference
    would, so stepwise and chunkwise forwards agree for ANY reset pattern
    (the PPO update re-forwards collection windows in one chunk and envs
    finish episodes mid-window).

    The per-timestep math rides reset counts ``c = cumsum(first)``: query i
    may attend in-chunk key j iff no reset in (j, i] ⟺ c[i] == c[j]; cached
    pre-chunk keys require no reset at all ⟺ c[i] == 0; a chunk step enters
    the carried state mask valid iff no later in-chunk reset ⟺ c[j] == c[t-1].

    :param first: (B,) or (B, t) bool episode-start flags
    :param state_mask: (B, T - t) bool — validity of the cached past slots
    :param t: query length (chunk timesteps)
    :param T: key length (t + cached past)
    :param maxlen: attention window
    :returns: (mask (B, t, T) bool, new_state_mask (B, T - t) bool)
    """
    if first.ndim == 1:
        first_bt = jnp.concatenate(
            [first[:, None], jnp.zeros((first.shape[0], t - 1), bool)], axis=1
        )
    else:
        assert first.shape[1] == t, (first.shape, t)
        first_bt = first.astype(bool)
    b = first_bt.shape[0]
    n_past = T - t
    assert state_mask.shape == (b, n_past), (state_mask.shape, (b, n_past))

    c = jnp.cumsum(first_bt.astype(jnp.int32), axis=1)  # (B, t) resets so far

    band = band_diagonal_mask(t, T, maxlen)  # (t, T)
    m_chunk = band[None, :, n_past:] & (c[:, :, None] == c[:, None, :])
    if n_past > 0:
        m_past = (
            band[None, :, :n_past]
            & state_mask[:, None, :]
            & (c[:, :, None] == 0)
        )
        m = jnp.concatenate([m_past, m_chunk], axis=2)
    else:
        m = m_chunk

    # Slide the state mask left by t and append the chunk's slots, each valid
    # only when no reset follows it inside the chunk
    # (reference: masked_attention.py:86-93, generalized to (B, t) firsts).
    keep = min(t, n_past)
    c_last = c[:, -1:]
    chunk_valid = c == c_last  # (B, t)
    new_state_mask = jnp.concatenate(
        [state_mask[:, t:] & (c_last == 0), chunk_valid[:, t - keep:]], axis=1
    )
    return m, new_state_mask


def initial_state_mask(batch: int, maxlen: int) -> jnp.ndarray:
    """All-invalid past: nothing in the zero-initialized cache may be attended."""
    return jnp.zeros((batch, maxlen), dtype=bool)
