"""Frozen-output regression tests: fixed init seed + fixed input must keep
producing the recorded logits (generated on the 8-device CPU backend at
highest matmul precision).  Guards refactors of the model graphs, init
functions, masks, bias, and attention against silent numerics drift."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.config import PolicyConfig
from vpt_tpu.models.heads import HeadSpec
from vpt_tpu.models.policy import (
    InverseActionPolicy,
    MinecraftAgentPolicy,
    policy_initial_state,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "tiny_forward_golden.npz")

TINY = PolicyConfig(
    impala_width=1, impala_chans=(4, 8), obs_processing_width=32,
    img_shape=(32, 32, 3), group_norm_groups=1, impala_post_pool_groups=1,
    hidsize=64, recurrence_type="transformer", n_recurrence_layers=2,
    timesteps=4, attention_heads=4, attention_memory_size=8, use_pre_lstm_ln=False,
)
SPECS = (HeadSpec("buttons", (1,), 23), HeadSpec("camera", (1,), 9))
IDM_SPECS = (HeadSpec("buttons", (20,), 2), HeadSpec("camera", (2,), 5))


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_policy_forward_matches_golden(golden):
    img = jnp.asarray(golden["img"])
    first = jnp.asarray(golden["first"])
    model = MinecraftAgentPolicy(cfg=TINY, head_specs=SPECS, temperature=2.0)
    state = policy_initial_state(TINY, 2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(777), img, first, state)
    out, state2 = model.apply(variables, img, first, state)
    np.testing.assert_allclose(
        np.asarray(out["pi_logits"]["buttons"]), golden["buttons_logits"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["pi_logits"]["camera"]), golden["camera_logits"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["vpred"]), golden["vpred"], rtol=1e-5, atol=1e-6)
    # second chunk exercises cache continuity
    out2, _ = model.apply(variables, img, jnp.zeros((2, 4), bool), state2)
    np.testing.assert_allclose(
        np.asarray(out2["pi_logits"]["buttons"]), golden["chunk2_buttons"], rtol=1e-5, atol=1e-6)


def test_idm_forward_matches_golden(golden):
    img = jnp.asarray(golden["img"])
    first = jnp.asarray(golden["first"])
    cfg = TINY.replace(
        attention_mask_style="none",
        conv3d_params={"inchan": 3, "outchan": 8, "kernel_size": [5, 1, 1], "padding": [2, 0, 0]},
    )
    idm = InverseActionPolicy(cfg=cfg, head_specs=IDM_SPECS, temperature=1.0)
    state = policy_initial_state(cfg, 2)
    variables = jax.jit(idm.init)(jax.random.PRNGKey(888), img, first, state)
    out, _ = idm.apply(variables, img, first, state)
    np.testing.assert_allclose(
        np.asarray(out["pi_logits"]["buttons"]), golden["idm_buttons"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["pi_logits"]["camera"]), golden["idm_camera"], rtol=1e-5, atol=1e-6)
