import numpy as np
import jax.numpy as jnp

from vpt_tpu.ops.attention import merge_heads, split_heads, windowed_attention


def numpy_attention(q, k, v, mask, extra, muP):
    """Straight-line float64 oracle of the attention contract
    (logits = bias + alpha·QKᵀ with unscaled bias; softmax over keys)."""
    d = q.shape[-1]
    alpha = 1.0 / d if muP else 1.0 / np.sqrt(d)
    logits = alpha * np.einsum("bhtd,bhTd->bhtT", q.astype(np.float64), k.astype(np.float64))
    if extra is not None:
        logits = logits + extra
    if mask is not None:
        logits = logits + np.where(mask[:, None], 0.0, -1e9)
    logits -= logits.max(axis=-1, keepdims=True)
    w = np.exp(logits)
    w /= w.sum(axis=-1, keepdims=True)
    return np.einsum("bhtT,bhTd->bhtd", w, v.astype(np.float64))


def _rand(shape, rng):
    return rng.normal(size=shape).astype(np.float32)


def test_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    B, H, t, T, d = 2, 4, 3, 7, 8
    q, k, v = _rand((B, H, t, d), rng), _rand((B, H, T, d), rng), _rand((B, H, T, d), rng)
    mask = rng.random((B, t, T)) > 0.3
    mask[..., -1] = True  # at least one visible key per row
    extra = _rand((B, H, t, T), rng)
    for muP in (True, False):
        got = np.asarray(windowed_attention(jnp.array(q), jnp.array(k), jnp.array(v),
                                            jnp.array(mask), jnp.array(extra), muP))
        expect = numpy_attention(q, k, v, mask, extra, muP)
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_mask_blocks_attention():
    rng = np.random.default_rng(1)
    B, H, t, T, d = 1, 1, 2, 4, 4
    q, k = _rand((B, H, t, d), rng), _rand((B, H, T, d), rng)
    v = np.zeros((B, H, T, d), np.float32)
    v[0, 0, 0] = 100.0  # poison key 0
    mask = np.ones((B, t, T), bool)
    mask[0, :, 0] = False
    out = np.asarray(windowed_attention(jnp.array(q), jnp.array(k), jnp.array(v),
                                        jnp.array(mask), None, True))
    assert np.abs(out).max() < 1e-3


def test_no_mask_is_uniform_for_equal_keys():
    B, H, t, T, d = 1, 1, 1, 5, 4
    q = np.zeros((B, H, t, d), np.float32)
    k = np.zeros((B, H, T, d), np.float32)
    v = np.eye(5, 4, dtype=np.float32)[None, None]
    out = np.asarray(windowed_attention(jnp.array(q), jnp.array(k), jnp.array(v), None, None, True))
    np.testing.assert_allclose(out[0, 0, 0], v[0, 0].mean(axis=0), rtol=1e-5)


def test_split_merge_heads_roundtrip():
    rng = np.random.default_rng(2)
    x = _rand((2, 3, 8), rng)
    h = split_heads(jnp.array(x), 4)
    assert h.shape == (2, 4, 3, 2)
    back = np.asarray(merge_heads(h))
    np.testing.assert_array_equal(back, x)


def test_head_major_channel_order():
    # channel c of head h must come from input channel h*(e//H)+c,
    # matching the reference reshape (lib/xf.py:96-103)
    x = np.arange(8, dtype=np.float32)[None, None]  # (1, 1, 8)
    h = np.asarray(split_heads(jnp.array(x), 4))
    np.testing.assert_array_equal(h[0, :, 0, :], [[0, 1], [2, 3], [4, 5], [6, 7]])
