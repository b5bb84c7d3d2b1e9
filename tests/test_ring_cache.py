"""Ring-buffer decode cache must be numerically equivalent to the linear
concat+slice path, step for step, including episode resets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.models.transformer import (
    ResidualRecurrentBlocks,
    masked_attention_initial_state,
    ring_initial_state,
)

HID, HEADS, NBLOCK, MAXLEN = 32, 4, 2, 8


@pytest.fixture(scope="module")
def setup():
    step = ResidualRecurrentBlocks(
        hidsize=HID, timesteps=1, n_block=NBLOCK, recurrence_type="transformer",
        attention_heads=HEADS, attention_memory_size=1 + MAXLEN,
        attention_mask_style="clipped_causal",
    )
    x0 = jnp.zeros((2, 1, HID))
    lin0 = [masked_attention_initial_state(2, MAXLEN, HID, jnp.float32) for _ in range(NBLOCK)]
    params = jax.jit(step.init)(jax.random.PRNGKey(0), x0, jnp.zeros((2, 1), bool), lin0)
    return step, params


def _run(step, params, xs, firsts, state):
    outs = []
    for i in range(xs.shape[1]):
        o, state = step.apply(params, xs[:, i : i + 1], firsts[:, i : i + 1], state)
        outs.append(np.asarray(o))
    return np.concatenate(outs, axis=1), state


def test_ring_equals_linear_over_long_run(setup):
    """3×maxlen steps (multiple ring wraps) with mid-stream resets."""
    step, params = setup
    T = 3 * MAXLEN
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(2, T, HID)).astype(np.float32))
    firsts = np.zeros((2, T), bool)
    firsts[:, 0] = True
    firsts[0, 11] = True   # stream 0 resets mid-run
    firsts[1, 19] = True
    firsts = jnp.asarray(firsts)

    lin0 = [masked_attention_initial_state(2, MAXLEN, HID, jnp.float32) for _ in range(NBLOCK)]
    ring0 = [ring_initial_state(2, MAXLEN, HID, jnp.float32, HEADS) for _ in range(NBLOCK)]
    out_lin, _ = _run(step, params, xs, firsts, lin0)
    out_ring, ring_state = _run(step, params, xs, firsts, ring0)
    np.testing.assert_allclose(out_ring, out_lin, rtol=2e-4, atol=2e-5)
    assert int(ring_state[0]["idx"]) == T % MAXLEN


def test_ring_state_mask_resets(setup):
    step, params = setup
    ring0 = [ring_initial_state(2, MAXLEN, HID, jnp.float32, HEADS) for _ in range(NBLOCK)]
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 1, HID)).astype(np.float32))
    # warm the cache for 4 steps
    state = ring0
    for _ in range(4):
        _, state = step.apply(params, x, jnp.zeros((2, 1), bool), state)
    assert np.asarray(state[0]["state_mask"]).sum() == 2 * 4
    # reset stream 0 only
    _, state = step.apply(params, x, jnp.asarray([[True], [False]]), state)
    sm = np.asarray(state[0]["state_mask"])
    assert sm[0].sum() == 1  # only the fresh slot
    assert sm[1].sum() == 5


def test_ring_rejects_chunks(setup):
    step, params = setup
    chunk = ResidualRecurrentBlocks(
        hidsize=HID, timesteps=4, n_block=NBLOCK, recurrence_type="transformer",
        attention_heads=HEADS, attention_memory_size=4 + MAXLEN,
        attention_mask_style="clipped_causal",
    )
    ring0 = [ring_initial_state(2, MAXLEN, HID, jnp.float32, HEADS) for _ in range(NBLOCK)]
    x = jnp.zeros((2, 4, HID))
    with pytest.raises(AssertionError):
        chunk.apply(params, x, jnp.zeros((2, 4), bool), ring0)


def test_ring_to_linear_conversion_continues_chunkwise(setup):
    """Step k times on the RING cache, convert the snapshot to the linear
    layout, continue with a chunkwise forward — must equal the pure-linear
    stepwise+chunkwise run.  (The PPO collect→update handoff: collection
    rolls out stepwise on the ring; the update re-forwards the window in one
    chunk from the converted snapshot.)"""
    from vpt_tpu.models.transformer import ring_state_to_linear

    step, params = setup
    chunk_len = 5
    chunk = ResidualRecurrentBlocks(
        hidsize=HID, timesteps=chunk_len, n_block=NBLOCK,
        recurrence_type="transformer", attention_heads=HEADS,
        attention_memory_size=chunk_len + MAXLEN,
        attention_mask_style="clipped_causal",
    )
    rng = np.random.default_rng(4)
    for warm_steps in (3, MAXLEN, MAXLEN + 5):  # before/at/after ring wrap
        xs = jnp.asarray(rng.normal(size=(2, warm_steps, HID)).astype(np.float32))
        firsts = np.zeros((2, warm_steps), bool)
        firsts[:, 0] = True
        if warm_steps > 4:
            firsts[0, 4] = True  # mid-run reset interacts with slot validity
        firsts = jnp.asarray(firsts)

        lin0 = [masked_attention_initial_state(2, MAXLEN, HID, jnp.float32) for _ in range(NBLOCK)]
        ring0 = [ring_initial_state(2, MAXLEN, HID, jnp.float32, HEADS) for _ in range(NBLOCK)]
        _, lin_state = _run(step, params, xs, firsts, lin0)
        _, ring_state = _run(step, params, xs, firsts, ring0)
        converted = [ring_state_to_linear(s) for s in ring_state]

        for conv, lin in zip(converted, lin_state):
            np.testing.assert_array_equal(
                np.asarray(conv["state_mask"]), np.asarray(lin["state_mask"]),
                err_msg=f"warm_steps={warm_steps}",
            )
        x2 = jnp.asarray(rng.normal(size=(2, chunk_len, HID)).astype(np.float32))
        f2 = jnp.zeros((2, chunk_len), bool)
        out_from_ring, _ = chunk.apply(params, x2, f2, converted)
        out_from_lin, _ = chunk.apply(params, x2, f2, lin_state)
        np.testing.assert_allclose(
            np.asarray(out_from_ring), np.asarray(out_from_lin),
            rtol=2e-4, atol=2e-5, err_msg=f"warm_steps={warm_steps}",
        )
