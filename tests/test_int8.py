"""Int8 serving path (ops/int8.py): matmul accuracy, variable-tree
quantization, and end-to-end IDM agent equivalence with the float graph."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.ops.int8 import (
    QuantDense,
    dynamic_quantize_rows,
    int8_matmul,
    quantize_kernel,
    quantize_variables,
)


def test_quantize_kernel_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    w_q, scale = quantize_kernel(jnp.asarray(w))
    assert w_q.dtype == jnp.int8 and scale.shape == (32,)
    deq = np.asarray(w_q, np.float32) * np.asarray(scale)
    # symmetric 8-bit: max error ≤ scale/2 per element
    assert np.max(np.abs(deq - w)) <= np.max(np.asarray(scale)) / 2 + 1e-6


def test_dynamic_rows_respects_range():
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(5, 16)) * rng.uniform(0.01, 100, size=(5, 1))).astype(np.float32)
    x_q, s = dynamic_quantize_rows(jnp.asarray(x))
    assert x_q.dtype == jnp.int8
    assert np.all(np.abs(np.asarray(x_q)) <= 127)
    np.testing.assert_allclose(np.asarray(x_q) * np.asarray(s), x,
                               atol=float(np.max(np.asarray(s))) / 2 + 1e-6)


def test_int8_matmul_close_to_float():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(8, 128)).astype(np.float32)
    w = rng.normal(size=(128, 64)).astype(np.float32)
    w_q, scale = quantize_kernel(jnp.asarray(w))
    got = np.asarray(int8_matmul(jnp.asarray(x), w_q, scale))
    want = x @ w
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel


def test_quant_dense_module_matches_reference_math():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 32)).astype(np.float32)
    w = rng.normal(size=(32, 16)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    w_q, scale = quantize_kernel(jnp.asarray(w))
    layer = QuantDense(16)
    variables = {"params": {"kernel_q8": w_q, "kernel_scale": scale, "bias": jnp.asarray(b)}}
    got = np.asarray(layer.apply(variables, jnp.asarray(x)))
    want = np.asarray(int8_matmul(jnp.asarray(x), w_q, scale)) + b
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


IDM_TINY_KWARGS = dict(
    hidsize=64,
    impala_width=1,
    impala_chans=[4, 8],
    img_shape=[64, 64, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1},
    n_recurrence_layers=2,
    timesteps=8,
    attention_heads=4,
    attention_memory_size=16,
    recurrence_type="transformer",
    attention_mask_style="none",
    conv3d_params={"inchan": 3, "outchan": 8, "kernel_size": [5, 1, 1], "padding": [2, 0, 0]},
    use_pre_lstm_ln=False,
    obs_processing_width=32,
)


def test_idm_agent_quantized_close_to_float():
    """The quantized serving graph produces logits close to the float graph,
    sharing one weight set (derived via quantize_variables)."""
    from vpt_tpu.agent import IDMAgent

    float_agent = IDMAgent(idm_net_kwargs=IDM_TINY_KWARGS, pi_head_kwargs={"temperature": 1.0})
    q_agent = IDMAgent(idm_net_kwargs=IDM_TINY_KWARGS, pi_head_kwargs={"temperature": 1.0},
                       quantize_dense=True)
    float_agent._ensure_variables()
    q_agent.variables = jax.tree.map(jnp.asarray, float_agent.variables)  # share weights
    frames = np.random.default_rng(0).integers(0, 255, (6, 90, 160, 3), dtype=np.uint8)

    img = float_agent._video_obs_to_agent(frames)
    first = np.zeros((1, img.shape[1]), bool)

    _, logits_f, _ = float_agent._forward(
        float_agent.variables, jnp.asarray(img), jnp.asarray(first), float_agent.hidden_state
    )
    q_agent._maybe_quantize()
    assert q_agent._quantized
    # int8 kernels actually present in the serving tree
    leaves = jax.tree_util.tree_leaves_with_path(q_agent.variables)
    q8 = [p for p, leaf in leaves if leaf.dtype == jnp.int8]
    assert len(q8) >= 8, len(q8)  # q/k/v/proj/r + mlps across 2 blocks + ...
    _, logits_q, _ = q_agent._forward(
        q_agent.variables, jnp.asarray(img), jnp.asarray(first), q_agent.hidden_state
    )
    for key in logits_f:
        f = np.asarray(logits_f[key], np.float64)
        q = np.asarray(logits_q[key], np.float64)
        rel = np.linalg.norm(q - f) / max(np.linalg.norm(f), 1e-9)
        assert rel < 0.25, (key, rel)  # log-prob space, loose but meaningful

    # the public API works end to end on the quantized graph
    actions = q_agent.predict_actions(frames)
    assert actions["camera"].shape == (1, 6, 2)


def test_quantize_variables_rejects_shape_mismatch():
    w = jnp.ones((4, 8))
    template = jax.eval_shape(lambda: {"a": {"kernel_q8": jnp.zeros((4, 9), jnp.int8),
                                             "kernel_scale": jnp.ones((9,))}})
    with pytest.raises(AssertionError):
        quantize_variables({"a": {"kernel": w}}, template)


POLICY_TINY_KWARGS = dict(
    hidsize=64,
    impala_width=1,
    impala_chans=[4, 8],
    img_shape=[64, 64, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1},
    n_recurrence_layers=2,
    timesteps=4,
    attention_heads=4,
    attention_memory_size=8,
    recurrence_type="transformer",
    attention_mask_style="clipped_causal",
    use_pre_lstm_ln=False,
    obs_processing_width=32,
)


def test_minerl_agent_quantized_serving():
    """MineRLAgent(quantize_dense=True): the int8 graph serves through the
    public get_action API and its value predictions track the float graph."""
    from vpt_tpu.agent import MineRLAgent

    f_agent = MineRLAgent(policy_kwargs=POLICY_TINY_KWARGS, pi_head_kwargs={"temperature": 2.0},
                          batch_size=2, decode_on_device=False)
    q_agent = MineRLAgent(policy_kwargs=POLICY_TINY_KWARGS, pi_head_kwargs={"temperature": 2.0},
                          batch_size=2, decode_on_device=False, quantize_dense=True)
    f_agent._ensure_variables()
    q_agent.variables = jax.tree.map(jnp.asarray, f_agent.variables)  # share weights

    rng = np.random.default_rng(0)
    obs = [{"pov": rng.integers(0, 255, (360, 640, 3), dtype=np.uint8)} for _ in range(2)]
    actions = q_agent.get_action(obs)
    assert q_agent._quantized
    assert isinstance(actions, list) and len(actions) == 2
    assert "camera" in actions[0] and "attack" in actions[0]

    v_f = f_agent.predict_value(obs)
    v_q = q_agent.predict_value(obs)
    np.testing.assert_allclose(v_q, v_f, atol=0.15)


# ------------------------------------------------------------------- QAT


def test_fake_quant_kernel_matches_serving_dequant():
    """QAT forward values == exactly what int8 serving dequantizes to."""
    from vpt_tpu.ops.int8 import fake_quant_kernel

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(48, 24)).astype(np.float32))
    w_q, scale = quantize_kernel(w)
    np.testing.assert_array_equal(
        np.asarray(fake_quant_kernel(w)),
        np.asarray(w_q, np.float32) * np.asarray(scale),
    )


def test_fake_quant_kernel_straight_through_gradient():
    from vpt_tpu.ops.int8 import fake_quant_kernel

    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    g = jax.grad(lambda w: jnp.sum(fake_quant_kernel(w) * 3.0))(w)
    np.testing.assert_array_equal(np.asarray(g), np.full((16, 8), 3.0, np.float32))


def test_fake_quant_dense_params_targets_only_dense_kernels():
    from vpt_tpu.ops.int8 import fake_quant_dense_params, fake_quant_kernel

    rng = np.random.default_rng(9)
    params = {
        "mlp0": {"layer": {"kernel": jnp.asarray(rng.normal(size=(8, 16)), jnp.float32),
                           "bias": jnp.zeros(16)}},
        "conv": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 8)), jnp.float32)},
        "ln": {"scale": jnp.ones(8)},
        # serving keeps the head denses float (models/heads.py) — so must QAT
        "pi_head": {"buttons": {"linear_layer": {"kernel": jnp.asarray(rng.normal(size=(8, 23)), jnp.float32)}}},
        "value_head": {"linear": {"kernel": jnp.asarray(rng.normal(size=(8, 1)), jnp.float32)}},
    }
    out = fake_quant_dense_params(params)
    np.testing.assert_array_equal(
        np.asarray(out["mlp0"]["layer"]["kernel"]),
        np.asarray(fake_quant_kernel(params["mlp0"]["layer"]["kernel"])),
    )
    # conv kernels, biases, norms, and HEAD kernels untouched
    np.testing.assert_array_equal(np.asarray(out["conv"]["kernel"]),
                                  np.asarray(params["conv"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(out["ln"]["scale"]), np.ones(8))
    np.testing.assert_array_equal(
        np.asarray(out["pi_head"]["buttons"]["linear_layer"]["kernel"]),
        np.asarray(params["pi_head"]["buttons"]["linear_layer"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(out["value_head"]["linear"]["kernel"]),
        np.asarray(params["value_head"]["linear"]["kernel"]),
    )


def test_qat_bc_train_step_runs_and_matches_serving_weights():
    """A QAT train step runs; the loss it computes equals the loss of the
    plain trainer evaluated at the fake-quantized parameters (training sees
    serving numerics on the weight side)."""
    from vpt_tpu.ops.int8 import fake_quant_dense_params
    from vpt_tpu.parallel.mesh import make_mesh
    from vpt_tpu.training.bc import BCHyperparams, BCTrainer

    kwargs = dict(
        hidsize=64, impala_width=1, impala_chans=[4, 8], img_shape=[32, 32, 3],
        init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
        impala_kwargs={"post_pool_groups": 1}, n_recurrence_layers=2, timesteps=4,
        attention_heads=4, attention_memory_size=8, recurrence_type="transformer",
        attention_mask_style="clipped_causal", use_pre_lstm_ln=False,
        obs_processing_width=32,
    )
    rng = np.random.default_rng(11)
    batch = {
        "frames": rng.integers(0, 255, (4, 4, 32, 32, 3), dtype=np.uint8),
        "buttons": rng.integers(0, 8641, (4, 4)).astype(np.int32),
        "camera": rng.integers(0, 121, (4, 4)).astype(np.int32),
        "firsts": np.zeros((4, 4), bool),
        "mask": np.ones((4, 4), bool),
    }
    hp = BCHyperparams(batch_size=4, chunk_len=4)
    mesh = make_mesh(n_dp=1, devices=jax.devices()[:1])

    t_qat = BCTrainer(kwargs, {"temperature": 2.0}, hp=hp, mesh=mesh, seed=0, qat_dense=True)
    t_qat.init()
    mask = t_qat._qat_mask()
    # the mask is exactly the serving set: trunk q_layer quantizes, the
    # action/value head denses do NOT (serving keeps them float)
    assert mask["net"]["recurrent_layer"]["blocks_0"]["r"]["orc_block"]["q_layer"]["kernel"]
    assert not mask["pi_head"]["buttons"]["linear_layer"]["kernel"]
    assert not mask["value_head"]["linear"]["kernel"]
    _, loss_qat, _ = t_qat.train_step(batch, t_qat.initial_state(4))
    assert np.isfinite(float(loss_qat))

    # same seed → identical initial params; pre-quantize them with the SAME
    # serving mask and run the PLAIN trainer: its loss must equal what the
    # QAT step reported
    t_ref = BCTrainer(kwargs, {"temperature": 2.0}, hp=hp, mesh=mesh, seed=0)
    t_ref.init()
    t_ref.variables = {
        "params": fake_quant_dense_params(t_ref.variables["params"], mask=mask),
        "stats": t_ref.variables["stats"],
    }
    _, loss_ref, _ = t_ref.train_step(batch, t_ref.initial_state(4))
    np.testing.assert_allclose(float(loss_qat), float(loss_ref), rtol=1e-6)
