"""Rematerialization must not change results — only memory/compute trade."""

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.config import PolicyConfig
from vpt_tpu.models.heads import HeadSpec, dict_logprob
from vpt_tpu.models.policy import MinecraftAgentPolicy, policy_initial_state

TINY = PolicyConfig(
    impala_width=1, impala_chans=(4, 8), obs_processing_width=32,
    img_shape=(32, 32, 3), group_norm_groups=1, impala_post_pool_groups=1,
    hidsize=64, recurrence_type="transformer", n_recurrence_layers=2,
    timesteps=4, attention_heads=4, attention_memory_size=8, use_pre_lstm_ln=False,
)
SPECS = (HeadSpec("buttons", (1,), 23), HeadSpec("camera", (1,), 9))


def test_remat_forward_and_grad_match():
    img = jnp.asarray(np.random.default_rng(0).integers(0, 255, (2, 4, 32, 32, 3), dtype=np.uint8))
    first = jnp.zeros((2, 4), bool)
    state = policy_initial_state(TINY, 2)
    base = MinecraftAgentPolicy(cfg=TINY, head_specs=SPECS, temperature=2.0)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), img, first, state)
    rematted = MinecraftAgentPolicy(cfg=TINY.replace(remat=True), head_specs=SPECS, temperature=2.0)

    out_a, _ = base.apply(variables, img, first, state)
    out_b, _ = rematted.apply(variables, img, first, state)
    np.testing.assert_allclose(
        np.asarray(out_a["pi_logits"]["buttons"]), np.asarray(out_b["pi_logits"]["buttons"]),
        rtol=1e-6, atol=1e-7,
    )

    actions = {
        "buttons": jnp.zeros((2, 4, 1), jnp.int32),
        "camera": jnp.zeros((2, 4, 1), jnp.int32),
    }

    def loss(params, model):
        out, _ = model.apply({"params": params, "stats": variables["stats"]}, img, first, state)
        return -dict_logprob(out["pi_logits"], actions, SPECS).mean()

    g_a = jax.jit(jax.grad(lambda p: loss(p, base)))(variables["params"])
    g_b = jax.jit(jax.grad(lambda p: loss(p, rematted)))(variables["params"])
    diffs = max(jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_a, g_b)))
    assert diffs < 1e-5, diffs


def test_scan_chunked_remat_forward_and_grad_match():
    """cnn_scan_chunks + remat (the 2x/3x T=128 memory configuration, with
    the scan body rematerialized as a whole) must be numerically identical
    to the plain forward/backward."""
    img = jnp.asarray(np.random.default_rng(1).integers(0, 255, (2, 4, 32, 32, 3), dtype=np.uint8))
    first = jnp.zeros((2, 4), bool)
    state = policy_initial_state(TINY, 2)
    base = MinecraftAgentPolicy(cfg=TINY, head_specs=SPECS, temperature=2.0)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), img, first, state)
    scanned = MinecraftAgentPolicy(
        cfg=TINY.replace(remat=True, cnn_scan_chunks=2), head_specs=SPECS, temperature=2.0
    )

    out_a, _ = base.apply(variables, img, first, state)
    out_b, _ = scanned.apply(variables, img, first, state)
    np.testing.assert_allclose(
        np.asarray(out_a["pi_logits"]["buttons"]), np.asarray(out_b["pi_logits"]["buttons"]),
        rtol=1e-5, atol=1e-6,
    )

    actions = {
        "buttons": jnp.zeros((2, 4, 1), jnp.int32),
        "camera": jnp.zeros((2, 4, 1), jnp.int32),
    }

    def loss(params, model):
        out, _ = model.apply({"params": params, "stats": variables["stats"]}, img, first, state)
        return -dict_logprob(out["pi_logits"], actions, SPECS).mean()

    g_a = jax.jit(jax.grad(lambda p: loss(p, base)))(variables["params"])
    g_b = jax.jit(jax.grad(lambda p: loss(p, scanned)))(variables["params"])
    diffs = max(jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_a, g_b)))
    assert diffs < 1e-5, diffs
