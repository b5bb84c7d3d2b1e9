"""3x3/stride-2 max pooling with an alternative (nine-slice) backward.

MEASURED DEAD END — kept for the record, not used by default.  The
hypothesis: ``nn.max_pool``'s VJP lowers to XLA ``SelectAndScatter`` (a
windowed scatter), and isolated chain-timing (``tools/bench_bc_breakdown.py
--cnn-detail``) made it look like the largest line in the BC step's
CNN-bound backward.  The per-HLO device profile of the REAL step
(``tools/profile_hlo.py --step bc``) disagreed: the three SelectAndScatter
ops are only 7.4% of device time and already run at ~520 GB/s HBM — the
whole CNN backward is uniformly HBM-bound (every top op 500-690 GB/s).
This nine-slice backward moves ~2x the bytes (nine select+pad+add passes
over full-resolution tensors), so switching the 1x BC step to it HALVED
throughput: 2613 vs 5105 frames/sec measured on the chip.  Default stays
``pool_impl="xla"``; this op remains behind the ``--pool-impl shifted``
knob for re-measurement on future hardware where scatter is relatively
slower.

The Impala trunk pools at full spatial resolution right after each stack's
first conv (reference: lib/impala_cnn.py:110 ``F.max_pool2d(x, 3, 2, 1)``).
``max_pool_3x3s2`` computes the same pool, and defines a custom VJP that
routes each output cell's gradient to the FIRST maximum of its window in
row-major order — bit-identical routing to both XLA's SelectAndScatter
(GE select visits window cells row-major) and torch's ``F.max_pool2d``
(argmax is the first maximum), which matters because the pooled inputs are
post-ReLU and full of exact-zero ties.

Forward values are exactly ``nn.max_pool(x, (3, 3), (2, 2), ((1, 1), (1, 1)))``
(max is max); only the backward lowering differs.  Parity is pinned in
tests/test_pooling.py against both XLA's VJP and torch on tie-heavy inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_OFFSETS = [(di, dj) for di in range(3) for dj in range(3)]  # row-major


def _out_hw(h: int, w: int) -> tuple:
    return (h + 1) // 2, (w + 1) // 2


def _pad_neg_inf(x: jnp.ndarray) -> jnp.ndarray:
    neg = jnp.asarray(-jnp.inf, x.dtype)
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)


def _shifted(xp: jnp.ndarray, di: int, dj: int, h0: int, w0: int) -> jnp.ndarray:
    """Window cell (di, dj) of every output position, as one strided slice."""
    b, _, _, c = xp.shape
    return lax.slice(
        xp,
        (0, di, dj, 0),
        (b, di + 2 * (h0 - 1) + 1, dj + 2 * (w0 - 1) + 1, c),
        (1, 2, 2, 1),
    )


@jax.custom_vjp
def max_pool_3x3s2(x: jnp.ndarray) -> jnp.ndarray:
    """Max pool, kernel 3x3, stride 2, padding 1, NHWC.

    Forward = plain ``lax.reduce_window`` (XLA fuses it well — measured
    1.06 ms inside the 1x BC step at stack-0 shapes; an earlier fully
    shifted-slice forward materialized nine strided copies and halved the
    train step's throughput).  Only the backward is custom."""
    neg = jnp.asarray(-jnp.inf, x.dtype)
    return lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _fwd(x):
    return max_pool_3x3s2(x), x


def _bwd(x, g):
    h, w = x.shape[1], x.shape[2]
    h0, w0 = _out_hw(h, w)
    xp = _pad_neg_inf(x)
    shifts = [_shifted(xp, di, dj, h0, w0) for di, dj in _OFFSETS]
    m = shifts[0]
    for s in shifts[1:]:
        m = jnp.maximum(m, s)
    # Route g to the first (row-major) window cell equal to the max.
    taken = jnp.zeros(m.shape, bool)
    dx = jnp.zeros(xp.shape, g.dtype)
    zero = jnp.asarray(0, g.dtype)
    for s, (di, dj) in zip(shifts, _OFFSETS):
        hit = (s == m) & ~taken
        taken = taken | hit
        gd = jnp.where(hit, g, zero)
        # Inverse of the strided slice: interior-pad gd back to xp's grid.
        pad_cfg = (
            (0, 0, 0),
            (di, xp.shape[1] - (di + 2 * (h0 - 1) + 1), 1),
            (dj, xp.shape[2] - (dj + 2 * (w0 - 1) + 1), 1),
            (0, 0, 0),
        )
        dx = dx + lax.pad(gd, zero, pad_cfg)
    return (dx[:, 1:-1, 1:-1, :],)


max_pool_3x3s2.defvjp(_fwd, _bwd)
