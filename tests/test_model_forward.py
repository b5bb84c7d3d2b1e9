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


def test_masked_lstm_matches_plain_lstm_on_chunk_start_reset():
    """multi_masked_lstm shares the multi_layer_lstm parameterization and is
    equal to it whenever `first` is only ever set at the chunk start (the only
    case the plain variant handles; reference: lib/util.py:214-219).  The
    reference names this recurrence type (lib/policy.py:90) but never
    constructs a module for it — this path is net-new."""
    cfg_plain = TINY.replace(recurrence_type="multi_layer_lstm")
    cfg_masked = TINY.replace(recurrence_type="multi_masked_lstm")
    plain = MinecraftAgentPolicy(cfg=cfg_plain, head_specs=SPECS, temperature=2.0)
    masked = MinecraftAgentPolicy(cfg=cfg_masked, head_specs=SPECS, temperature=2.0)
    img = _img(2, 4)
    state = policy_initial_state(cfg_plain, 2)
    variables = jax.jit(plain.init)(
        jax.random.PRNGKey(0), jnp.array(img), jnp.zeros((2, 4), bool), state
    )
    first = jnp.concatenate([jnp.ones((2, 1), bool), jnp.zeros((2, 3), bool)], 1)
    # Run both from a non-trivial carried state so the reset itself is tested.
    _, state_mid = plain.apply(variables, jnp.array(img), jnp.zeros((2, 4), bool), state)
    out_p, st_p = plain.apply(variables, jnp.array(img), first, state_mid)
    out_m, st_m = masked.apply(variables, jnp.array(img), first, state_mid)
    np.testing.assert_allclose(
        np.asarray(out_p["pi_logits"]["buttons"]),
        np.asarray(out_m["pi_logits"]["buttons"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(st_p[0]["h"]), np.asarray(st_m[0]["h"]), atol=1e-6)


def test_masked_lstm_mid_window_reset_is_ragged_exact():
    """A `first` flag anywhere inside the window must reproduce chunked
    streaming exactly: forwarding [0..3] with first at t=2 for one batch
    element equals forwarding [0..1] then [2..3] with that element's chunk-2
    first set."""
    cfg = TINY.replace(recurrence_type="multi_masked_lstm")
    model = MinecraftAgentPolicy(cfg=cfg, head_specs=SPECS, temperature=2.0)
    img = _img(2, 4)
    state0 = policy_initial_state(cfg, 2)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.array(img), jnp.zeros((2, 4), bool), state0
    )
    # One ragged call: element 0 starts a new episode at t=2, element 1 never resets.
    first = np.zeros((2, 4), bool)
    first[0, 2] = True
    out_ragged, st_ragged = model.apply(variables, jnp.array(img), jnp.array(first), state0)
    # Streamed in two chunks with the same flags.
    out_a, st_mid = model.apply(
        variables, jnp.array(img[:, :2]), jnp.array(first[:, :2]), state0
    )
    out_b, st_fin = model.apply(
        variables, jnp.array(img[:, 2:]), jnp.array(first[:, 2:]), st_mid
    )
    got = np.concatenate(
        [np.asarray(out_a["pi_logits"]["buttons"]), np.asarray(out_b["pi_logits"]["buttons"])], axis=1
    )
    np.testing.assert_allclose(np.asarray(out_ragged["pi_logits"]["buttons"]), got, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_ragged[0]["c"]), np.asarray(st_fin[0]["c"]), atol=1e-6)
    # And the reset is real: element 0's logits at t>=2 differ from the
    # unreset forward, element 1's do not.
    out_nores, _ = model.apply(variables, jnp.array(img), jnp.zeros((2, 4), bool), state0)
    d0 = np.abs(
        np.asarray(out_ragged["pi_logits"]["buttons"][0, 2:])
        - np.asarray(out_nores["pi_logits"]["buttons"][0, 2:])
    ).max()
    d1 = np.abs(
        np.asarray(out_ragged["pi_logits"]["buttons"][1])
        - np.asarray(out_nores["pi_logits"]["buttons"][1])
    ).max()
    assert d0 > 1e-7
    np.testing.assert_allclose(d1, 0.0, atol=1e-7)


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
