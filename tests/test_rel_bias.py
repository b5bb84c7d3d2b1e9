import numpy as np

from vpt_tpu.ops.rel_bias import banded_bias_matrix, relattn_bias


def reference_bandify(b_nd: np.ndarray, t: int, T: int) -> np.ndarray:
    """Direct loop transcription of the documented banding semantics
    (reference lib/util.py:250-258: B[n, i, j] = b_nd[n, d] for time
    difference d = (T - t) + i - j inside the band, else 0)."""
    n, bandsize = b_nd.shape
    out = np.zeros((n, t, T), dtype=b_nd.dtype)
    for i in range(t):
        for j in range(T):
            d = (T - t) + i - j
            if 0 <= d < bandsize:
                out[:, i, j] = b_nd[:, d]
    return out


def test_banded_matrix_matches_loop_reference():
    rng = np.random.default_rng(0)
    for t, T, band in [(4, 8, 4), (3, 3, 3), (1, 5, 4), (5, 5, 2), (4, 6, 8)]:
        b_nd = rng.normal(size=(3, band)).astype(np.float32)
        got = np.asarray(banded_bias_matrix(b_nd, t, T))
        np.testing.assert_allclose(got, reference_bandify(b_nd, t, T), rtol=1e-6)


def test_self_attention_uses_d0_column():
    b_nd = np.zeros((2, 4), dtype=np.float32)
    b_nd[:, 0] = 7.0  # bias for attending to self (time difference 0)
    D = np.asarray(banded_bias_matrix(b_nd, 4, 8))
    for i in range(4):
        assert D[0, i, i + 4] == 7.0  # column of query i's own timestep


def test_relattn_bias_contraction():
    rng = np.random.default_rng(1)
    B, H, t, n, band = 2, 3, 4, 5, 4
    T = t + band
    R = rng.normal(size=(B, H, t, n)).astype(np.float32)
    b_nd = rng.normal(size=(n, band)).astype(np.float32)
    got = np.asarray(relattn_bias(R, b_nd, T))
    D = reference_bandify(b_nd, t, T)
    expect = np.einsum("bhtn,ntT->bhtT", R, D)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)
