"""Pallas fused attention vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.ops import pallas_attention_impl as impl
from vpt_tpu.ops.attention import windowed_attention
from vpt_tpu.ops.rel_bias import banded_bias_matrix, relattn_bias


@pytest.fixture(autouse=True)
def interpret_mode():
    old = impl.INTERPRET
    impl.INTERPRET = True
    yield
    impl.INTERPRET = old


def _inputs(B=2, H=2, t=16, maxlen=16, d=128, nbasis=5, seed=0):
    rng = np.random.default_rng(seed)
    T = t + maxlen
    q = rng.normal(size=(B, H, t, d)).astype(np.float32)
    k = rng.normal(size=(B, H, T, d)).astype(np.float32)
    v = rng.normal(size=(B, H, T, d)).astype(np.float32)
    R = rng.normal(size=(B, H, t, nbasis)).astype(np.float32)
    b_nd = rng.normal(size=(nbasis, maxlen)).astype(np.float32)
    mask = rng.random((B, t, T)) > 0.3
    mask[..., -1] = True
    return map(jnp.asarray, (q, k, v, R, b_nd, mask))


def _xla(q, k, v, mask, R, b_nd, muP=True):
    extra = relattn_bias(R, b_nd, k.shape[2]) if R is not None else None
    return windowed_attention(q, k, v, mask, extra, muP)


def test_fused_matches_xla_full():
    q, k, v, R, b_nd, mask = _inputs()
    got = impl.dispatch(q, k, v, mask, R, b_nd, True)
    assert got is not None
    expect = _xla(q, k, v, mask, R, b_nd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=2e-4, atol=2e-5)


def test_fused_no_mask_no_rel():
    q, k, v, R, b_nd, mask = _inputs(seed=1)
    got = impl.dispatch(q, k, v, None, None, None, True)
    expect = _xla(q, k, v, None, None, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=2e-4, atol=2e-5)


def test_fused_no_muP():
    q, k, v, R, b_nd, mask = _inputs(seed=2)
    got = impl.dispatch(q, k, v, mask, R, b_nd, False)
    expect = _xla(q, k, v, mask, R, b_nd, muP=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=2e-4, atol=2e-5)


def test_gradients_match_xla():
    q, k, v, R, b_nd, mask = _inputs(B=1, H=2, t=8, maxlen=8, seed=3)

    def loss_fused(q, k, v, R, b_nd):
        return impl.dispatch(q, k, v, mask, R, b_nd, True).sum()

    def loss_xla(q, k, v, R, b_nd):
        return _xla(q, k, v, mask, R, b_nd).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, R, b_nd)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k, v, R, b_nd)
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)


def test_dispatch_rejects_unaligned():
    q, k, v, R, b_nd, mask = _inputs(t=16, d=128)
    # t=1 (decode step) and d not multiple of 128 must fall back
    assert impl.dispatch(q[:, :, :1], k, v, None, None, None, True) is None
    small_d = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 16, 64)).astype(np.float32))
    assert impl.dispatch(small_d, small_d, small_d, None, None, None, True) is None


def test_model_forward_with_forced_pallas_matches_xla():
    """Whole transformer stack: attention_impl='pallas' == 'xla' outputs."""
    from vpt_tpu.models.transformer import (
        ResidualRecurrentBlocks,
        masked_attention_initial_state,
    )

    x = np.random.default_rng(4).normal(size=(2, 8, 256)).astype(np.float32)
    state = [masked_attention_initial_state(2, 8, 256, jnp.float32) for _ in range(2)]
    first = np.zeros((2, 8), bool)

    def build(impl_name):
        return ResidualRecurrentBlocks(
            hidsize=256, timesteps=8, n_block=2, recurrence_type="transformer",
            attention_heads=2, attention_memory_size=16,
            attention_mask_style="clipped_causal", attention_impl=impl_name,
        )

    xla_blocks = build("xla")
    params = jax.jit(xla_blocks.init)(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(first), state)
    out_xla, _ = xla_blocks.apply(params, jnp.asarray(x), jnp.asarray(first), state)
    pallas_blocks = build("pallas")
    out_pallas, _ = pallas_blocks.apply(params, jnp.asarray(x), jnp.asarray(first), state)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), rtol=5e-4, atol=5e-5
    )
