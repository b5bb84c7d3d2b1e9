"""Step-wise inference must equal chunk-wise forward under clipped_causal —
the core invariant of the rolling KV cache + state-mask machinery
(SURVEY.md §7 hard part 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.models.transformer import (
    ResidualRecurrentBlocks,
    masked_attention_initial_state,
)

HID, HEADS, NBLOCK, MAXLEN = 32, 4, 2, 8


def make_blocks(timesteps, memory_size):
    return ResidualRecurrentBlocks(
        hidsize=HID,
        timesteps=timesteps,
        n_block=NBLOCK,
        recurrence_type="transformer",
        attention_heads=HEADS,
        attention_memory_size=memory_size,
        attention_mask_style="clipped_causal",
    )


@pytest.fixture(scope="module")
def setup():
    T = 8
    chunk = make_blocks(T, T + MAXLEN)
    step = make_blocks(1, 1 + MAXLEN)
    x = np.random.default_rng(0).normal(size=(2, T, HID)).astype(np.float32)
    state0 = [
        masked_attention_initial_state(2, MAXLEN, HID, jnp.float32)
        for _ in range(NBLOCK)
    ]
    params = jax.jit(chunk.init)(jax.random.PRNGKey(0), jnp.array(x), jnp.zeros((2, T), bool), state0)
    return chunk, step, params, x, state0


def run_steps(step, params, x, state, firsts):
    outs = []
    for i in range(x.shape[1]):
        o, state = step.apply(params, jnp.array(x[:, i : i + 1]), jnp.array(firsts[:, i : i + 1]), state)
        outs.append(np.asarray(o))
    return np.concatenate(outs, axis=1), state


def test_stepwise_equals_chunkwise(setup):
    chunk, step, params, x, state0 = setup
    first = np.zeros((2, 8), bool)
    first[:, 0] = True
    out_chunk, state_chunk = chunk.apply(params, jnp.array(x), jnp.array(first), state0)
    out_steps, state_steps = run_steps(step, params, x, state0, first)
    np.testing.assert_allclose(np.asarray(out_chunk), out_steps, rtol=2e-4, atol=2e-5)
    # final caches agree too (same trailing maxlen keys/values)
    for sc, ss in zip(state_chunk, state_steps):
        np.testing.assert_allclose(np.asarray(sc["k"]), np.asarray(ss["k"]), rtol=2e-4, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(sc["state_mask"]), np.asarray(ss["state_mask"]))


def test_two_chunks_equal_one_long_history(setup):
    """Feeding 8 steps then 8 more must equal a fresh 8-step chunk whose state
    came from the first chunk — continuity across chunk boundaries."""
    chunk, step, params, x, state0 = setup
    rng = np.random.default_rng(1)
    x2 = rng.normal(size=(2, 8, HID)).astype(np.float32)
    first = np.zeros((2, 8), bool)

    _, state_mid = chunk.apply(params, jnp.array(x), jnp.array(first), state0)
    out_chunk2, _ = chunk.apply(params, jnp.array(x2), jnp.array(first), state_mid)

    _, state_mid_steps = run_steps(step, params, x, state0, first)
    out_steps2, _ = run_steps(step, params, x2, state_mid_steps, first)
    np.testing.assert_allclose(np.asarray(out_chunk2), out_steps2, rtol=2e-4, atol=2e-5)


def test_first_flag_resets_episode(setup):
    """A chunk beginning with first=True must behave as if the cache were fresh."""
    chunk, _, params, x, state0 = setup
    first_true = np.zeros((2, 8), bool)
    first_true[:, 0] = True
    # run garbage through to pollute the cache
    garbage = np.random.default_rng(2).normal(size=(2, 8, HID)).astype(np.float32)
    _, polluted = chunk.apply(params, jnp.array(garbage), jnp.zeros((2, 8), bool), state0)
    out_fresh, _ = chunk.apply(params, jnp.array(x), jnp.array(first_true), state0)
    out_reset, _ = chunk.apply(params, jnp.array(x), jnp.array(first_true), polluted)
    np.testing.assert_allclose(np.asarray(out_fresh), np.asarray(out_reset), rtol=1e-5, atol=1e-6)


def test_per_batch_first(setup):
    """first=True for one batch element must not disturb the other."""
    chunk, _, params, x, state0 = setup
    no_first = np.zeros((2, 8), bool)
    _, state_mid = chunk.apply(params, jnp.array(x), jnp.array(no_first), state0)

    x2 = np.random.default_rng(3).normal(size=(2, 8, HID)).astype(np.float32)
    mixed_first = np.zeros((2, 8), bool)
    mixed_first[0, 0] = True
    out_mixed, _ = chunk.apply(params, jnp.array(x2), jnp.array(mixed_first), state_mid)
    out_cont, _ = chunk.apply(params, jnp.array(x2), jnp.array(no_first), state_mid)
    first_all = np.zeros((2, 8), bool)
    first_all[:, 0] = True
    out_fresh, _ = chunk.apply(params, jnp.array(x2), jnp.array(first_all), state0)

    np.testing.assert_allclose(np.asarray(out_mixed)[0], np.asarray(out_fresh)[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_mixed)[1], np.asarray(out_cont)[1], rtol=1e-5, atol=1e-6)


def test_window_limits_context():
    """Identical inputs whose histories differ only beyond maxlen steps back
    must produce identical outputs.  NOTE: this per-layer window guarantee
    only holds for a single block — with stacked blocks the receptive field
    grows by maxlen per layer (true of the reference as well), so we test with
    n_block=1."""
    chunk = ResidualRecurrentBlocks(
        hidsize=HID, timesteps=8, n_block=1, recurrence_type="transformer",
        attention_heads=HEADS, attention_memory_size=8 + MAXLEN,
        attention_mask_style="clipped_causal",
    )
    state0 = [masked_attention_initial_state(2, MAXLEN, HID, jnp.float32)]
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 8, HID)).astype(np.float32)
    params = jax.jit(chunk.init)(jax.random.PRNGKey(0), jnp.array(x), jnp.zeros((2, 8), bool), state0)
    hist_a = rng.normal(size=(2, MAXLEN, HID)).astype(np.float32)
    hist_b = rng.normal(size=(2, MAXLEN, HID)).astype(np.float32)
    probe = rng.normal(size=(2, 8, HID)).astype(np.float32)
    shared = rng.normal(size=(2, MAXLEN, HID)).astype(np.float32)
    no_first = np.zeros((2, MAXLEN), bool)

    # A and B diverge in the distant past, share the last MAXLEN steps
    _, sa = chunk.apply(params, jnp.array(hist_a), jnp.array(no_first), state0)
    _, sa = chunk.apply(params, jnp.array(shared), jnp.array(no_first), sa)
    _, sb = chunk.apply(params, jnp.array(hist_b), jnp.array(no_first), state0)
    _, sb = chunk.apply(params, jnp.array(shared), jnp.array(no_first), sb)

    out_a, _ = chunk.apply(params, jnp.array(probe), jnp.zeros((2, 8), bool), sa)
    out_b, _ = chunk.apply(params, jnp.array(probe), jnp.zeros((2, 8), bool), sb)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-6)


def test_mid_chunk_resets_stepwise_equals_chunkwise(setup):
    """Resets ANYWHERE inside the chunk must reproduce stepwise semantics —
    the invariant the PPO update relies on when envs finish episodes
    mid-rollout-window (collection applies firsts at t=1; the update
    re-forwards the whole window in one chunk)."""
    chunk, step, params, x, state0 = setup
    rng = np.random.default_rng(5)
    first = rng.random((2, 8)) < 0.3
    first[0, 3] = True   # guaranteed mid-chunk reset
    first[1, 0] = True
    out_chunk, state_chunk = chunk.apply(params, jnp.array(x), jnp.array(first), state0)
    out_steps, state_steps = run_steps(step, params, x, state0, first)
    np.testing.assert_allclose(np.asarray(out_chunk), out_steps, rtol=2e-4, atol=2e-5)
    for sc, ss in zip(state_chunk, state_steps):
        np.testing.assert_array_equal(np.asarray(sc["state_mask"]), np.asarray(ss["state_mask"]))


def test_mid_chunk_resets_with_warm_cache(setup):
    """Same equivalence starting from a WARM cache (a prior chunk ran), so
    past-column masking interacts with the in-chunk resets."""
    chunk, step, params, x, state0 = setup
    warm_first = np.zeros((2, 8), bool)
    warm_first[:, 0] = True
    _, warm_state = chunk.apply(params, jnp.array(x), jnp.array(warm_first), state0)
    x2 = np.random.default_rng(9).normal(size=(2, 8, HID)).astype(np.float32)
    first = np.zeros((2, 8), bool)
    first[0, 5] = True   # reset deep inside the second window
    out_chunk, _ = chunk.apply(params, jnp.array(x2), jnp.array(first), warm_state)
    out_steps, _ = run_steps(step, params, x2, warm_state, first)
    np.testing.assert_allclose(np.asarray(out_chunk), out_steps, rtol=2e-4, atol=2e-5)
