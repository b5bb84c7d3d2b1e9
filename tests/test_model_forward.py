"""Whole-graph forward tests on tiny configs (fast on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.config import PolicyConfig, foundation_policy_config
from vpt_tpu.models.heads import HeadSpec
from vpt_tpu.models.policy import (
    InverseActionPolicy,
    MinecraftAgentPolicy,
    policy_initial_state,
)

TINY = PolicyConfig(
    impala_width=1,
    impala_chans=(4, 8),
    obs_processing_width=32,
    img_shape=(32, 32, 3),
    group_norm_groups=1,
    impala_post_pool_groups=1,
    hidsize=64,
    recurrence_type="transformer",
    n_recurrence_layers=2,
    timesteps=4,
    attention_heads=4,
    attention_memory_size=8,
    use_pre_lstm_ln=False,
)

SPECS = (HeadSpec("buttons", (1,), 23), HeadSpec("camera", (1,), 9))
IDM_SPECS = (HeadSpec("buttons", (20,), 2), HeadSpec("camera", (2,), 5))


def _img(b, t, hw=32):
    return np.random.default_rng(0).integers(0, 255, (b, t, hw, hw, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def policy_and_params():
    model = MinecraftAgentPolicy(cfg=TINY, head_specs=SPECS, temperature=2.0)
    img = _img(2, 4)
    state = policy_initial_state(TINY, 2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.array(img), jnp.zeros((2, 4), bool), state)
    return model, variables, state


def test_policy_forward_shapes(policy_and_params):
    model, variables, state = policy_and_params
    img = _img(2, 4)
    out, state_out = model.apply(variables, jnp.array(img), jnp.zeros((2, 4), bool), state)
    assert out["pi_logits"]["buttons"].shape == (2, 4, 1, 23)
    assert out["pi_logits"]["camera"].shape == (2, 4, 1, 9)
    assert out["vpred"].shape == (2, 4, 1)
    assert len(state_out) == 2
    assert state_out[0]["k"].shape == (2, 4, 64)


def test_policy_deterministic(policy_and_params):
    model, variables, state = policy_and_params
    img = jnp.array(_img(2, 4))
    out1, _ = model.apply(variables, img, jnp.zeros((2, 4), bool), state)
    out2, _ = model.apply(variables, img, jnp.zeros((2, 4), bool), state)
    np.testing.assert_array_equal(
        np.asarray(out1["pi_logits"]["buttons"]), np.asarray(out2["pi_logits"]["buttons"])
    )


def test_param_tree_matches_torch_naming(policy_and_params):
    """Spot-check that param paths mirror the reference state_dict structure."""
    _, variables, _ = policy_and_params
    p = variables["params"]
    assert "q_layer" in p["net"]["recurrent_layer"]["blocks_0"]["r"]["orc_block"]
    assert "b_nd" in p["net"]["recurrent_layer"]["blocks_0"]["r"]["orc_block"]
    assert "kernel" in p["net"]["recurrent_layer"]["blocks_0"]["mlp0"]["layer"]
    assert "firstconv" in p["net"]["img_process"]["cnn"]["stacks_0"]
    assert "conv0" in p["net"]["img_process"]["cnn"]["stacks_0"]["blocks_0"]
    assert "linear_layer" in p["pi_head"]["buttons"]
    assert "linear" in p["value_head"]
    assert "running_mean" in variables["stats"]["value_head"]
    # no-norm firstconv of stack 0 keeps a bias; later stacks norm instead
    assert "bias" in p["net"]["img_process"]["cnn"]["stacks_0"]["firstconv"]["layer"]
    assert "norm" in p["net"]["img_process"]["cnn"]["stacks_1"]["firstconv"]


def test_logit_mask(policy_and_params):
    model, variables, state = policy_and_params
    img = jnp.array(_img(1, 1))
    mask = {"buttons": np.ones((1, 1, 1, 23), bool)}
    mask["buttons"][..., 3] = False
    out, _ = model.apply(
        variables, img, jnp.zeros((1, 1), bool), policy_initial_state(TINY, 1),
        action_mask={"buttons": jnp.array(mask["buttons"])},
    )
    assert float(jnp.exp(out["pi_logits"]["buttons"][..., 3]).max()) < 1e-8


def test_idm_forward():
    cfg = TINY.replace(
        attention_mask_style="none",
        conv3d_params={"inchan": 3, "outchan": 8, "kernel_size": [5, 1, 1], "padding": [2, 0, 0]},
    )
    model = InverseActionPolicy(cfg=cfg, head_specs=IDM_SPECS, temperature=1.0)
    img = _img(1, 4)
    state = policy_initial_state(cfg, 1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.array(img), jnp.zeros((1, 4), bool), state)
    out, _ = model.apply(variables, jnp.array(img), jnp.zeros((1, 4), bool), state)
    assert out["pi_logits"]["buttons"].shape == (1, 4, 20, 2)
    assert out["pi_logits"]["camera"].shape == (1, 4, 2, 5)
    p = variables["params"]
    assert "conv3d_layer" in p["net"]
    # lastlayer exists (quirk: computed then discarded) — weights must still load
    assert "lastlayer" in p["net"]


def test_idm_bidirectional_attention():
    """With mask_style none the last frame influences the first frame's logits."""
    cfg = TINY.replace(attention_mask_style="none")
    model = InverseActionPolicy(cfg=cfg, head_specs=IDM_SPECS, temperature=1.0)
    img = _img(1, 4)
    state = policy_initial_state(cfg, 1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.array(img), jnp.zeros((1, 4), bool), state)
    out1, _ = model.apply(variables, jnp.array(img), jnp.zeros((1, 4), bool), state)
    img2 = img.copy()
    img2[:, -1] = 255 - img2[:, -1]  # change only the last frame
    out2, _ = model.apply(variables, jnp.array(img2), jnp.zeros((1, 4), bool), state)
    diff = np.abs(
        np.asarray(out1["pi_logits"]["buttons"][:, 0]) - np.asarray(out2["pi_logits"]["buttons"][:, 0])
    ).max()
    assert diff > 1e-6


def test_causal_policy_ignores_future():
    model = MinecraftAgentPolicy(cfg=TINY, head_specs=SPECS, temperature=2.0)
    img = _img(1, 4)
    state = policy_initial_state(TINY, 1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.array(img), jnp.zeros((1, 4), bool), state)
    out1, _ = model.apply(variables, jnp.array(img), jnp.zeros((1, 4), bool), state)
    img2 = img.copy()
    img2[:, -1] = 255 - img2[:, -1]
    out2, _ = model.apply(variables, jnp.array(img2), jnp.zeros((1, 4), bool), state)
    np.testing.assert_allclose(
        np.asarray(out1["pi_logits"]["buttons"][:, :3]),
        np.asarray(out2["pi_logits"]["buttons"][:, :3]),
        atol=1e-6,
    )


def test_lstm_recurrence():
    cfg = TINY.replace(recurrence_type="multi_layer_lstm")
    model = MinecraftAgentPolicy(cfg=cfg, head_specs=SPECS, temperature=2.0)
    img = _img(2, 4)
    state = policy_initial_state(cfg, 2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.array(img), jnp.zeros((2, 4), bool), state)
    out, state_out = model.apply(variables, jnp.array(img), jnp.zeros((2, 4), bool), state)
    assert out["pi_logits"]["buttons"].shape == (2, 4, 1, 23)
    assert state_out[0]["h"].shape == (2, 64)
    # first=True must zero the carried state: fresh state == reset state
    out_fresh, _ = model.apply(
        variables, jnp.array(img), jnp.concatenate([jnp.ones((2, 1), bool), jnp.zeros((2, 3), bool)], 1),
        state_out,
    )
    out_fresh2, _ = model.apply(
        variables, jnp.array(img), jnp.concatenate([jnp.ones((2, 1), bool), jnp.zeros((2, 3), bool)], 1),
        state,
    )
    np.testing.assert_allclose(
        np.asarray(out_fresh["pi_logits"]["buttons"]),
        np.asarray(out_fresh2["pi_logits"]["buttons"]),
        atol=1e-6,
    )


def test_bilstm_recurrence():
    """multi_layer_bilstm: even-numbered blocks run their LSTM reversed
    (reference: lib/util.py:198-201, 221-225)."""
    cfg = TINY.replace(recurrence_type="multi_layer_bilstm")
    model = MinecraftAgentPolicy(cfg=cfg, head_specs=SPECS, temperature=2.0)
    img = _img(1, 4)
    state = policy_initial_state(cfg, 1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.array(img), jnp.zeros((1, 4), bool), state)
    out, _ = model.apply(variables, jnp.array(img), jnp.zeros((1, 4), bool), state)
    assert out["pi_logits"]["buttons"].shape == (1, 4, 1, 23)
    # bidirectional: the last frame influences the first frame's logits
    img2 = img.copy()
    img2[:, -1] = 255 - img2[:, -1]
    out2, _ = model.apply(variables, jnp.array(img2), jnp.zeros((1, 4), bool), state)
    diff = np.abs(
        np.asarray(out["pi_logits"]["buttons"][:, 0]) - np.asarray(out2["pi_logits"]["buttons"][:, 0])
    ).max()
    assert diff > 1e-7
