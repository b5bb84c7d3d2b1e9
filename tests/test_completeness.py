"""Tests for the inventory tail: gaussian head, strided attention,
normalized entropy, store_args."""

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.models.heads import (
    DictActionHead,
    HeadSpec,
    dict_kl,
    dict_logprob,
    dict_sample,
    gaussian_entropy,
    gaussian_kl,
    gaussian_logprob,
    gaussian_sample,
    head_specs_from_space,
)
from vpt_tpu.ops.strided_attention import strided_attention, strided_mask
from vpt_tpu.spaces import DictType, Discrete, Real, TensorType
from vpt_tpu.utils.minecraft import norm_cat_entropy, store_args

GAUSS = HeadSpec("cont", (3,), kind="gaussian")


def test_gaussian_spec_from_space():
    space = DictType(cont=TensorType(shape=(3,), eltype=Real()),
                     disc=TensorType(shape=(1,), eltype=Discrete(5)))
    specs = head_specs_from_space(space)
    kinds = {s.key: s.kind for s in specs}
    assert kinds == {"cont": "gaussian", "disc": "categorical"}


def test_gaussian_logprob_matches_scipy():
    from scipy.stats import norm

    pd = jnp.asarray(np.stack([[0.5, -1.0, 2.0], [0.1, 0.2, -0.3]], axis=-1))[None]  # (1,3,2)
    x = jnp.asarray(np.array([[0.7, -0.5, 1.0]]))
    lp = gaussian_logprob(pd, x)
    expect = norm.logpdf([0.7, -0.5, 1.0], loc=[0.5, -1.0, 2.0],
                         scale=np.exp([0.1, 0.2, -0.3])).sum()
    np.testing.assert_allclose(np.asarray(lp)[0], expect, rtol=1e-6)


def test_gaussian_sample_stats():
    pd = jnp.asarray(np.stack([np.full(2, 3.0), np.full(2, np.log(0.5))], axis=-1))[None]
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    samples = jax.vmap(lambda k: gaussian_sample(k, pd))(keys)
    s = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), 3.0, atol=0.05)
    np.testing.assert_allclose(s.std(0), 0.5, atol=0.05)
    det = gaussian_sample(jax.random.PRNGKey(0), pd, deterministic=True)
    np.testing.assert_allclose(np.asarray(det)[0], 3.0)


def test_gaussian_kl_identity_and_entropy():
    pd = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 2)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(gaussian_kl(pd, pd)), 0.0, atol=1e-6)
    # entropy of unit gaussian = 0.5 log(2πe) per dim
    unit = jnp.zeros((1, 3, 2))
    np.testing.assert_allclose(np.asarray(gaussian_entropy(unit))[0], 3 * 1.4189385, rtol=1e-5)


def test_dict_head_with_gaussian():
    specs = (GAUSS, HeadSpec("disc", (1,), 7))
    head = DictActionHead(specs=specs)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 8)).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out["cont"].shape == (2, 4, 3, 2)
    actions = dict_sample(jax.random.PRNGKey(1), out, specs)
    assert actions["cont"].shape == (2, 4, 3)
    lp = dict_logprob(out, actions, specs)
    assert lp.shape == (2, 4)
    assert np.isfinite(np.asarray(lp)).all()
    kl = dict_kl(out, out, specs)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-5)


def test_strided_mask_semantics():
    m = np.asarray(strided_mask(t=6, T=6, stride=2, maxlen=2))
    for i in range(6):
        for j in range(6):
            d = i - j
            assert m[i, j] == (d >= 0 and d % 2 == 0 and d // 2 < 2), (i, j)


def test_strided_attention_only_same_phase():
    rng = np.random.default_rng(0)
    B, H, T, d = 1, 1, 8, 4
    q = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    v = np.zeros((B, H, T, d), np.float32)
    v[0, 0, 1] = 100.0  # odd-phase key poisoned
    out = strided_attention(q, k, jnp.asarray(v), stride=2, maxlen=4)
    # even-phase queries never see key 1
    assert np.abs(np.asarray(out)[0, 0, 0]).max() < 1e-3
    assert np.abs(np.asarray(out)[0, 0, 2]).max() < 1e-3
    # odd-phase query at t=3 does
    assert np.abs(np.asarray(out)[0, 0, 3]).max() > 1.0


def test_norm_cat_entropy():
    specs = (HeadSpec("a", (1,), 4),)
    uniform = {"a": jax.nn.log_softmax(jnp.zeros((2, 1, 4)))}
    ent, count = norm_cat_entropy(uniform, specs)
    np.testing.assert_allclose(np.asarray(ent), 1.0, rtol=1e-5)  # max entropy → 1
    np.testing.assert_array_equal(np.asarray(count), 1)
    # masked head with a single allowed option is excluded
    mask = np.zeros((2, 1, 4), bool)
    mask[..., 0] = True
    masked_logits = {"a": jnp.where(jnp.asarray(mask), 0.0, -100.0)}
    ent2, count2 = norm_cat_entropy(masked_logits, specs, {"a": jnp.asarray(mask)})
    np.testing.assert_array_equal(np.asarray(count2), 0)
    np.testing.assert_allclose(np.asarray(ent2), 0.0, atol=1e-6)


def test_store_args():
    class Thing:
        @store_args
        def __init__(self, a, b=5, *, c="x"):
            pass

    t = Thing(1, c="y")
    assert (t.a, t.b, t.c) == (1, 5, "y")
