"""Learned banded relative-position bias.

The reference parameterizes attention-logit bias as a basis expansion over the
time difference between query and key: a learned table ``b_nd`` of
``nbasis × maxlen`` entries is "bandified" into a (nbasis, t, T) tensor D with
``D[n, i, j] = b_nd[n, d(i, j)]`` for time differences ``0 <= d < maxlen`` and
0 elsewhere, then contracted against per-query basis coefficients R
(reference: lib/xf.py:259-271 relattn, lib/util.py:232-267 bandify).

The reference builds D with cat/unfold/flip gymnastics; on TPU a masked gather
over the d-grid is a single fused XLA op and the Pallas kernel computes the
same thing from iotas without materializing D at all.
"""

from __future__ import annotations

import jax.numpy as jnp


def banded_bias_matrix(b_nd: jnp.ndarray, t: int, T: int) -> jnp.ndarray:
    """(nbasis, t, T) banded expansion of b_nd over the time-difference grid.

    Equivalent to the reference's ``bandify(b_nd, t, T)`` (lib/util.py:250-267):
    entry (n, i, j) is ``b_nd[n, d]`` where ``d = (T - t) + i - j`` when
    ``0 <= d < bandsize``, else 0.
    """
    bandsize = b_nd.shape[-1]
    i = jnp.arange(t, dtype=jnp.int32)[:, None]
    j = jnp.arange(T, dtype=jnp.int32)[None, :]
    d = (T - t) + i - j  # (t, T)
    valid = (d >= 0) & (d < bandsize)
    idx = jnp.clip(d, 0, max(bandsize - 1, 0))
    D = jnp.where(valid[None], b_nd[:, idx], 0.0)
    return D


def relattn_bias(R_bhtn: jnp.ndarray, b_nd: jnp.ndarray, T: int) -> jnp.ndarray:
    """Per-head relative-attention logits.

    :param R_bhtn: (B, H, t, nbasis) float32 basis coefficients (r_layer output,
        split per head the same way Q/K/V are)
    :param b_nd: (nbasis, maxlen) learned band table
    :param T: key length
    :returns: (B, H, t, T) float32 extra attention logits
    """
    t = R_bhtn.shape[2]
    D_ntT = banded_bias_matrix(b_nd.astype(jnp.float32), t, T)
    return jnp.einsum("bhtn,ntT->bhtT", R_bhtn.astype(jnp.float32), D_ntT)
