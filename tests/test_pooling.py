"""Parity for the TPU-friendly maxpool backward (ops/pooling.py).

The shifted-slice pool must match nn.max_pool exactly in the forward and —
including tie routing on the exact-zero-heavy post-ReLU inputs the Impala
trunk actually pools (reference: lib/impala_cnn.py:110) — match both XLA's
SelectAndScatter VJP and torch's F.max_pool2d backward.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.ops.pooling import max_pool_3x3s2


def _xla_pool(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def _tie_heavy(rng, shape, dtype=np.float32):
    """Post-ReLU-like input: many exact zeros, plus repeated values so
    windows contain genuine ties between non-zero entries."""
    x = rng.standard_normal(shape).astype(dtype)
    x = np.maximum(x, 0.0)
    # Quantize survivors coarsely so equal maxima collide inside windows.
    x = np.round(x * 4.0) / 4.0
    return x


@pytest.mark.parametrize("hw", [(128, 128), (64, 64), (31, 33)])
def test_forward_matches_xla(hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, *hw, 8)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(max_pool_3x3s2(x)),
                                  np.asarray(_xla_pool(x)))


@pytest.mark.parametrize("hw", [(32, 32), (17, 19)])
def test_backward_matches_xla_on_ties(hw):
    rng = np.random.default_rng(1)
    x = jnp.asarray(_tie_heavy(rng, (3, *hw, 16)))

    def loss(pool):
        def f(x):
            y = pool(x)
            w = jnp.asarray(rng.standard_normal(y.shape), jnp.float32)
            return jnp.sum(y * w)
        return f

    rng = np.random.default_rng(2)
    g_ours = np.asarray(jax.grad(loss(max_pool_3x3s2))(x))
    rng = np.random.default_rng(2)
    g_xla = np.asarray(jax.grad(loss(_xla_pool))(x))
    # identical routing (same cells selected) ...
    np.testing.assert_array_equal(g_ours != 0, g_xla != 0)
    # ... and identical values up to summation order (several windows can
    # route into one input cell; the adds associate differently)
    np.testing.assert_allclose(g_ours, g_xla, rtol=1e-6, atol=1e-6)


def test_backward_matches_torch_on_ties():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    xn = _tie_heavy(rng, (2, 32, 32, 8))
    w = rng.standard_normal((2, 16, 16, 8)).astype(np.float32)

    g_ours = jax.grad(lambda x: jnp.sum(max_pool_3x3s2(x) * w))(jnp.asarray(xn))

    # test_torch_parity.py disables torch grad globally at import (pytest
    # collection imports every module) — scope grad mode locally here.
    with torch.enable_grad():
        xt = torch.tensor(np.transpose(xn, (0, 3, 1, 2)), requires_grad=True)
        yt = torch.nn.functional.max_pool2d(xt, 3, 2, 1)
        yt.backward(torch.tensor(np.transpose(w, (0, 3, 1, 2))))
    g_torch = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))
    g_ours = np.asarray(g_ours)
    np.testing.assert_array_equal(g_ours != 0, g_torch != 0)
    np.testing.assert_allclose(g_ours, g_torch, rtol=1e-6, atol=1e-6)


def test_bf16_forward_and_backward_run():
    rng = np.random.default_rng(4)
    x = jnp.asarray(_tie_heavy(rng, (2, 64, 64, 8)), jnp.bfloat16)
    y, vjp = jax.vjp(max_pool_3x3s2, x)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(y, np.float32), np.asarray(_xla_pool(x), np.float32))
    (dx,) = vjp(jnp.ones_like(y))
    assert dx.dtype == jnp.bfloat16
    assert dx.shape == x.shape
