"""Checkpoint conversion tests: torch state_dict ⇄ flax variables round trips,
strict=False merge semantics, .model kwargs extraction."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.checkpoint.torch_import import (
    load_model_parameters,
    state_dict_to_variables,
    variables_to_state_dict,
)
from vpt_tpu.config import PolicyConfig
from vpt_tpu.models.heads import HeadSpec
from vpt_tpu.models.policy import MinecraftAgentPolicy, policy_initial_state

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


@pytest.fixture(scope="module")
def variables():
    model = MinecraftAgentPolicy(cfg=TINY, head_specs=SPECS, temperature=2.0)
    img = np.zeros((1, 4, 32, 32, 3), np.uint8)
    state = policy_initial_state(TINY, 1)
    return jax.jit(model.init)(jax.random.PRNGKey(0), jnp.array(img), jnp.zeros((1, 4), bool), state)


def test_export_key_naming(variables):
    sd = variables_to_state_dict(variables)
    # reference-style keys must exist
    for key in [
        "net.img_process.cnn.stacks.0.firstconv.layer.weight",
        "net.img_process.cnn.stacks.0.firstconv.layer.bias",
        "net.img_process.cnn.stacks.1.firstconv.norm.weight",
        "net.img_process.cnn.stacks.0.blocks.0.conv0.layer.weight",
        "net.img_process.cnn.stacks.0.n.weight",
        "net.img_process.cnn.dense.layer.weight",
        "net.img_process.linear.layer.weight",
        "net.recurrent_layer.blocks.0.r.orc_block.q_layer.weight",
        "net.recurrent_layer.blocks.0.r.orc_block.q_layer.bias",
        "net.recurrent_layer.blocks.0.r.orc_block.k_layer.weight",
        "net.recurrent_layer.blocks.0.r.orc_block.b_nd",
        "net.recurrent_layer.blocks.0.r.orc_block.r_layer.weight",
        "net.recurrent_layer.blocks.1.mlp0.layer.weight",
        "net.recurrent_layer.blocks.1.mlp0.norm.weight",
        "net.recurrent_layer.blocks.0.pre_r_ln.weight",
        "net.lastlayer.layer.weight",
        "net.final_ln.weight",
        "net.final_ln.bias",
        "pi_head.buttons.linear_layer.weight",
        "pi_head.camera.linear_layer.bias",
        "value_head.linear.weight",
        "value_head.normalizer.running_mean",
        "value_head.normalizer.debiasing_term",
    ]:
        assert key in sd, f"missing {key}"
    # k_layer has no bias (reference: lib/xf.py:252 bias=False)
    assert "net.recurrent_layer.blocks.0.r.orc_block.k_layer.bias" not in sd
    # torch layouts: Linear (out, in); conv (O, I, kh, kw)
    assert sd["net.img_process.linear.layer.weight"].shape == (64, 32)
    assert sd["net.img_process.cnn.stacks.0.firstconv.layer.weight"].shape == (4, 3, 3, 3)


def test_round_trip_identity(variables):
    sd = variables_to_state_dict(variables)
    restored, report = state_dict_to_variables(sd, variables=variables)
    assert not report["unexpected"] and not report["missing"] and not report["shape_mismatch"]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables,
        restored,
    )


def test_round_trip_preserves_forward(variables):
    """Export → import → identical logits."""
    model = MinecraftAgentPolicy(cfg=TINY, head_specs=SPECS, temperature=2.0)
    img = jnp.array(np.random.default_rng(0).integers(0, 255, (1, 4, 32, 32, 3), dtype=np.uint8))
    state = policy_initial_state(TINY, 1)
    sd = variables_to_state_dict(variables)
    restored, _ = state_dict_to_variables(sd, variables=variables)
    out1, _ = model.apply(variables, img, jnp.zeros((1, 4), bool), state)
    out2, _ = model.apply(restored, img, jnp.zeros((1, 4), bool), state)
    np.testing.assert_array_equal(
        np.asarray(out1["pi_logits"]["buttons"]), np.asarray(out2["pi_logits"]["buttons"])
    )


def test_strict_false_semantics(variables):
    """Unknown ckpt keys ignored; missing model keys keep initialized values
    (reference: agent.py:132-135 load_state_dict(strict=False))."""
    sd = variables_to_state_dict(variables)
    marker = np.full_like(sd["net.final_ln.weight"], 7.0)
    sd["net.final_ln.weight"] = marker
    sd["totally.unknown.weight"] = np.zeros((3, 3), np.float32)
    removed = sd.pop("value_head.linear.weight")
    restored, report = state_dict_to_variables(sd, variables=variables)
    assert report["unexpected"] == ["totally.unknown.weight"]
    assert any("value_head" in m for m in report["missing"])
    np.testing.assert_array_equal(np.asarray(restored["params"]["net"]["final_ln"]["scale"]), marker)
    np.testing.assert_array_equal(  # untouched leaf keeps init value
        np.asarray(restored["params"]["value_head"]["linear"]["kernel"]),
        np.asarray(variables["params"]["value_head"]["linear"]["kernel"]),
    )


def test_shape_mismatch_skipped_not_fatal(variables):
    sd = variables_to_state_dict(variables)
    sd["net.final_ln.weight"] = np.zeros((999,), np.float32)
    restored, report = state_dict_to_variables(sd, variables=variables)
    assert report["shape_mismatch"]
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["net"]["final_ln"]["scale"]),
        np.asarray(variables["params"]["net"]["final_ln"]["scale"]),
    )


def test_conv_weight_layout_round_trip():
    w_torch = np.random.default_rng(0).normal(size=(8, 3, 3, 3)).astype(np.float32)
    sd = {"net.img_process.cnn.stacks.0.firstconv.layer.weight": w_torch}
    tree, _ = state_dict_to_variables(sd)
    w_flax = tree["params"]["net"]["img_process"]["cnn"]["stacks_0"]["firstconv"]["layer"]["kernel"]
    assert w_flax.shape == (3, 3, 3, 8)
    # same filter contents: flax[kh, kw, i, o] == torch[o, i, kh, kw]
    np.testing.assert_array_equal(w_flax[1, 2, 0, 5], w_torch[5, 0, 1, 2])


def test_load_model_parameters(tmp_path):
    blob = {
        "model": {
            "args": {
                "net": {"args": {"hidsize": 64, "attention_heads": 4}},
                "pi_head_opts": {"temperature": "2.0"},
            }
        }
    }
    path = tmp_path / "tiny.model"
    with open(path, "wb") as f:
        pickle.dump(blob, f)
    policy_kwargs, pi_head_kwargs = load_model_parameters(str(path))
    assert policy_kwargs["hidsize"] == 64
    assert pi_head_kwargs["temperature"] == 2.0  # float-coerced


def test_torch_weights_file_round_trip(variables, tmp_path):
    from vpt_tpu.checkpoint.torch_import import load_weights, save_weights

    path = str(tmp_path / "test.weights")
    save_weights(path, variables)
    sd = load_weights(path)
    restored, report = state_dict_to_variables(sd, variables=variables)
    assert not report["missing"] and not report["unexpected"]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables,
        restored,
    )


def test_weight_averaging_roundtrip(tmp_path):
    """average N torch-format .weights files == elementwise mean, preserving
    dtypes (tools/average_weights.py's core; the files are written the way
    the reference writes them — th.save of a state_dict)."""
    from vpt_tpu.checkpoint.averaging import average_state_dicts, load_average

    rng = np.random.default_rng(0)
    sds = []
    for i in range(3):
        sds.append({
            "net.w": rng.normal(size=(4, 5)).astype(np.float32),
            "net.b": rng.normal(size=(5,)).astype(np.float32),
        })
    mean = average_state_dicts(sds)
    np.testing.assert_allclose(
        mean["net.w"], np.mean([sd["net.w"] for sd in sds], axis=0), rtol=1e-6
    )
    assert mean["net.w"].dtype == np.float32

    # file round trip through the torch-compatible format
    import torch as th

    paths = []
    for i, sd in enumerate(sds):
        p = str(tmp_path / f"w{i}.weights")
        th.save({k: th.from_numpy(v) for k, v in sd.items()}, p)
        paths.append(p)
    loaded = load_average(paths)
    np.testing.assert_allclose(loaded["net.w"], mean["net.w"], rtol=1e-6)
    np.testing.assert_allclose(loaded["net.b"], mean["net.b"], rtol=1e-6)

    # keys must agree across inputs
    with pytest.raises(AssertionError):
        average_state_dicts([sds[0], {"other": np.zeros(3, np.float32)}])
