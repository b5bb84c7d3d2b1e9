"""Reference-API methods on the policy modules: act / v /
get_output_for_observation / predict / logprob / KL."""

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.config import PolicyConfig
from vpt_tpu.models.heads import HeadSpec
from vpt_tpu.models.policy import (
    InverseActionPolicy,
    MinecraftAgentPolicy,
    get_kl_of_action_dists,
    get_logprob_of_action,
    policy_initial_state,
)

TINY = PolicyConfig(
    impala_width=1, impala_chans=(4, 8), obs_processing_width=32,
    img_shape=(32, 32, 3), group_norm_groups=1, impala_post_pool_groups=1,
    hidsize=64, recurrence_type="transformer", n_recurrence_layers=2,
    timesteps=4, attention_heads=4, attention_memory_size=8, use_pre_lstm_ln=False,
)
SPECS = (HeadSpec("buttons", (1,), 23), HeadSpec("camera", (1,), 9))
IDM_SPECS = (HeadSpec("buttons", (20,), 2), HeadSpec("camera", (2,), 5))


def _model_and_vars():
    model = MinecraftAgentPolicy(cfg=TINY, head_specs=SPECS, temperature=2.0)
    img = np.zeros((2, 1, 32, 32, 3), np.uint8)
    state = policy_initial_state(TINY, 2)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.zeros((2, 1), bool), state
    )
    return model, variables, state


def test_act_method():
    model, variables, state = _model_and_vars()
    img = jnp.asarray(np.random.default_rng(0).integers(0, 255, (2, 32, 32, 3), dtype=np.uint8))
    action, state_out, result = model.apply(
        variables, img, jnp.zeros(2, bool), state, jax.random.PRNGKey(1),
        method="act",
    )
    assert action["buttons"].shape == (2, 1)
    assert result["log_prob"].shape == (2,)
    assert result["vpred"].shape == (2,)
    assert np.isfinite(np.asarray(result["log_prob"])).all()
    # deterministic act is argmax (repeatable)
    a1, _, _ = model.apply(variables, img, jnp.zeros(2, bool), state,
                           jax.random.PRNGKey(2), False, method="act")
    a2, _, _ = model.apply(variables, img, jnp.zeros(2, bool), state,
                           jax.random.PRNGKey(3), False, method="act")
    np.testing.assert_array_equal(np.asarray(a1["buttons"]), np.asarray(a2["buttons"]))


def test_get_output_for_observation_and_v():
    model, variables, state = _model_and_vars()
    img = jnp.asarray(np.random.default_rng(1).integers(0, 255, (2, 32, 32, 3), dtype=np.uint8))
    pd, vpred, state_out = model.apply(
        variables, img, state, jnp.zeros(2, bool), method="get_output_for_observation"
    )
    assert pd["buttons"].shape == (2, 1, 23)
    assert vpred.shape == (2,)
    v = model.apply(variables, img, jnp.zeros(2, bool), state, method="v")
    np.testing.assert_allclose(np.asarray(v), np.asarray(vpred), rtol=1e-6)


def test_logprob_and_kl_functions():
    model, variables, state = _model_and_vars()
    img = jnp.asarray(np.random.default_rng(2).integers(0, 255, (2, 32, 32, 3), dtype=np.uint8))
    pd, _, _ = model.apply(variables, img, state, jnp.zeros(2, bool),
                           method="get_output_for_observation")
    action = {"buttons": jnp.zeros((2, 1), jnp.int32), "camera": jnp.zeros((2, 1), jnp.int32)}
    lp = get_logprob_of_action(SPECS, pd, action)
    assert lp.shape == (2,) and np.isfinite(np.asarray(lp)).all()
    kl = get_kl_of_action_dists(SPECS, pd, pd)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


def test_idm_predict_method():
    cfg = TINY.replace(attention_mask_style="none")
    model = InverseActionPolicy(cfg=cfg, head_specs=IDM_SPECS, temperature=1.0)
    img = np.random.default_rng(3).integers(0, 255, (1, 4, 32, 32, 3), dtype=np.uint8)
    state = policy_initial_state(cfg, 1)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.zeros((1, 4), bool), state
    )
    action, state_out, result = model.apply(
        variables, jnp.asarray(img), jnp.zeros((1, 4), bool), state, method="predict"
    )
    assert action["buttons"].shape == (1, 4, 20)
    assert result["log_prob"].shape == (1, 4)
    assert set(result["pd"]) == {"buttons", "camera"}
