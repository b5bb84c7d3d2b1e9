import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.models.heads import (
    CategoricalActionHead,
    DictActionHead,
    HeadSpec,
    ScaledMSEHead,
    categorical_entropy,
    categorical_kl,
    categorical_logprob,
    categorical_sample,
    dict_logprob,
    dict_sample,
    head_specs_from_space,
)
from vpt_tpu.spaces import DictType, Discrete, TensorType

BUTTONS = HeadSpec("buttons", (1,), 17)
CAMERA = HeadSpec("camera", (2,), 5)


def test_head_specs_from_space():
    space = DictType(
        buttons=TensorType(shape=(1,), eltype=Discrete(8641)),
        camera=TensorType(shape=(1,), eltype=Discrete(121)),
    )
    specs = head_specs_from_space(space)
    assert [s.key for s in specs] == ["buttons", "camera"]
    assert specs[0].num_actions == 8641


def test_categorical_head_normalized_and_temperature():
    head = CategoricalActionHead(spec=BUTTONS, temperature=2.0)
    x = np.random.default_rng(0).normal(size=(2, 3, 8)).astype(np.float32)
    params = head.init(jax.random.PRNGKey(0), jnp.array(x))
    logits = head.apply(params, jnp.array(x))
    assert logits.shape == (2, 3, 1, 17)
    np.testing.assert_allclose(np.asarray(jax.nn.logsumexp(logits, -1)), 0.0, atol=1e-5)

    hot = CategoricalActionHead(spec=BUTTONS, temperature=1.0)
    logits_hot = hot.apply(params, jnp.array(x))
    # temperature 2 halves the raw logits before softmax → flatter distribution
    assert float(jnp.exp(logits).max()) < float(jnp.exp(logits_hot).max())


def test_mask_forces_log0():
    head = CategoricalActionHead(spec=BUTTONS, temperature=1.0)
    x = np.zeros((1, 1, 8), np.float32)
    params = head.init(jax.random.PRNGKey(0), jnp.array(x))
    mask = np.ones((1, 1, 1, 17), bool)
    mask[..., 5] = False
    logits = head.apply(params, jnp.array(x), mask=jnp.array(mask))
    assert float(jnp.exp(logits[..., 5]).max()) < 1e-8


def test_logprob_gather_and_sum():
    rng = np.random.default_rng(1)
    logits = jax.nn.log_softmax(jnp.array(rng.normal(size=(2, 2, 5)).astype(np.float32)))
    actions = jnp.array([[1, 4], [0, 2]], dtype=jnp.int32)
    lp = categorical_logprob(logits, actions, CAMERA)
    expect = np.asarray(logits)[np.arange(2)[:, None], np.arange(2)[None], np.asarray(actions)].sum(-1)
    np.testing.assert_allclose(np.asarray(lp), expect, rtol=1e-6)


def test_deterministic_sample_is_argmax():
    logits = jnp.array([[[0.1, 0.9, 0.0], [0.5, 0.2, 0.8]]])
    s = categorical_sample(jax.random.PRNGKey(0), logits, deterministic=True)
    np.testing.assert_array_equal(np.asarray(s), [[1, 2]])


def test_sampling_distribution():
    probs = np.array([0.7, 0.2, 0.1], np.float32)
    logits = jnp.log(jnp.array(probs))[None]
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    samples = jax.vmap(lambda k: categorical_sample(k, logits))(keys)
    freq = np.bincount(np.asarray(samples).ravel(), minlength=3) / 4000
    np.testing.assert_allclose(freq, probs, atol=0.03)


def test_entropy_uniform_max():
    uniform = jax.nn.log_softmax(jnp.zeros((1, 2, 5)))
    ent = categorical_entropy(uniform, CAMERA)
    np.testing.assert_allclose(np.asarray(ent), 2 * np.log(5), rtol=1e-5)


def test_kl_zero_for_identical():
    rng = np.random.default_rng(2)
    logits = jax.nn.log_softmax(jnp.array(rng.normal(size=(2, 2, 5)).astype(np.float32)))
    kl = categorical_kl(logits, logits, CAMERA)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)
    other = jax.nn.log_softmax(logits + jnp.array(rng.normal(size=(2, 2, 5)).astype(np.float32)))
    assert float(categorical_kl(logits, other, CAMERA).min()) > 0


def test_dict_head_and_logprob_sum():
    specs = (BUTTONS, CAMERA)
    head = DictActionHead(specs=specs, temperature=2.0)
    x = np.random.default_rng(3).normal(size=(2, 3, 8)).astype(np.float32)
    params = head.init(jax.random.PRNGKey(0), jnp.array(x))
    logits = head.apply(params, jnp.array(x))
    assert set(logits) == {"buttons", "camera"}
    actions = {
        "buttons": jnp.zeros((2, 3, 1), jnp.int32),
        "camera": jnp.zeros((2, 3, 2), jnp.int32),
    }
    lp = dict_logprob(logits, actions, specs)
    expect = categorical_logprob(logits["buttons"], actions["buttons"], BUTTONS) + categorical_logprob(
        logits["camera"], actions["camera"], CAMERA
    )
    np.testing.assert_allclose(np.asarray(lp), np.asarray(expect), rtol=1e-6)
    sample = dict_sample(jax.random.PRNGKey(1), logits, specs)
    assert sample["buttons"].shape == (2, 3, 1)
    assert sample["camera"].shape == (2, 3, 2)


def test_scaled_mse_head_round_trip():
    head = ScaledMSEHead(output_size=1)
    x = np.random.default_rng(4).normal(size=(2, 3, 8)).astype(np.float32)
    variables = head.init(jax.random.PRNGKey(0), jnp.array(x))
    v = head.apply(variables, jnp.array(x))
    assert v.shape == (2, 3, 1)
    # fresh stats: mean 0, var clipped to 1e-2 → denormalize(v) = v * 0.1
    denorm = head.apply(variables, v, method="denormalize")
    np.testing.assert_allclose(np.asarray(denorm), np.asarray(v) * 0.1, rtol=1e-5)


def test_scaled_mse_stats_update_converges():
    head = ScaledMSEHead(output_size=1, beta=0.5)
    x = np.zeros((1, 1, 8), np.float32)
    variables = head.init(jax.random.PRNGKey(0), jnp.array(x))
    stats = variables["stats"]
    targets = jnp.full((4, 4, 1), 3.0)
    for _ in range(30):
        mean, mean_sq, debias = head.apply(
            {"params": variables["params"], "stats": stats}, targets, method="updated_stats"
        )
        stats = {"running_mean": mean, "running_mean_sq": mean_sq, "debiasing_term": debias}
    # normalized target of 3.0 should now be ~0 mean
    normed = head.apply({"params": variables["params"], "stats": stats}, targets, method="normalize")
    np.testing.assert_allclose(np.asarray(normed), 0.0, atol=1e-3)
    denorm = head.apply({"params": variables["params"], "stats": stats}, jnp.zeros((1, 1, 1)), method="denormalize")
    np.testing.assert_allclose(np.asarray(denorm), 3.0, atol=1e-3)
