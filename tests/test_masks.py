import numpy as np

from vpt_tpu.ops.masks import band_diagonal_mask, clipped_causal_mask, initial_state_mask


def test_band_mask_square_golden():
    # docstring example (reference masked_attention.py:18-22): t=3, T=3, maxlen=3
    m = np.asarray(band_diagonal_mask(3, 3, 3))
    assert np.array_equal(m, np.tril(np.ones((3, 3), bool)))


def test_band_mask_rect_golden():
    # docstring example (reference masked_attention.py:23-26): t=3, T=6, maxlen=3
    m = np.asarray(band_diagonal_mask(3, 6, 3))
    expect = np.array(
        [
            [0, 1, 1, 1, 0, 0],
            [0, 0, 1, 1, 1, 0],
            [0, 0, 0, 1, 1, 1],
        ],
        dtype=bool,
    )
    assert np.array_equal(m, expect)


def test_band_mask_no_window():
    m = np.asarray(band_diagonal_mask(4, 4, None))
    assert np.array_equal(m, np.tril(np.ones((4, 4), bool)))


def test_initial_state_mask_blocks_zero_cache():
    sm = initial_state_mask(2, 4)
    first = np.zeros(2, dtype=bool)
    m, _ = clipped_causal_mask(first, sm, t=2, T=6, maxlen=4)
    m = np.asarray(m)
    # no attention into the (zero-initialized) past
    assert not m[:, :, :4].any()
    # current chunk still causal
    assert m[0, 0, 4] and not m[0, 0, 5] and m[0, 1, 5]


def test_first_resets_past():
    sm = np.ones((2, 4), dtype=bool)
    first = np.array([True, False])
    m, new_sm = clipped_causal_mask(first, sm, t=2, T=6, maxlen=4)
    m = np.asarray(m)
    assert not m[0, :, :4].any()  # batch 0 reset: no past
    assert m[1, :, :4].any()  # batch 1 keeps past
    new_sm = np.asarray(new_sm)
    # slots shifted by t=2 and 2 fresh valid slots appended
    assert np.array_equal(new_sm[0], [False, False, True, True])
    assert np.array_equal(new_sm[1], [True, True, True, True])


def test_state_mask_saturates_after_enough_steps():
    sm = initial_state_mask(1, 4)
    first = np.zeros(1, dtype=bool)
    for _ in range(4):
        _, sm = clipped_causal_mask(first, sm, t=1, T=5, maxlen=4)
    assert np.asarray(sm).all()


def test_chunk_as_long_as_window_fills_state_mask():
    sm = initial_state_mask(1, 4)
    first = np.array([True])
    _, sm = clipped_causal_mask(first, sm, t=4, T=8, maxlen=4)
    assert np.asarray(sm).all()


def test_window_clipping_within_chunk():
    # t = T = 6, maxlen = 3: row i attends columns (i-2..i)
    m = np.asarray(band_diagonal_mask(6, 6, 3))
    for i in range(6):
        for j in range(6):
            assert m[i, j] == (0 <= i - j < 3)


# ---------------------------------------------------------- mid-chunk resets


def _stepwise_oracle(first_bt, sm0, maxlen):
    """Apply the t=1 mask update stepwise; return per-step past-masks and the
    final state mask — the ground truth any chunked call must reproduce."""
    sm = sm0
    past_masks = []
    for k in range(first_bt.shape[1]):
        m, sm = clipped_causal_mask(first_bt[:, k], sm, t=1, T=1 + maxlen, maxlen=maxlen)
        past_masks.append(np.asarray(m)[:, 0, :])
    return past_masks, np.asarray(sm)


def test_mid_chunk_first_blocks_attention_across_reset():
    """A reset at chunk step k must stop queries >= k from seeing anything
    before k (both cached past and earlier chunk steps)."""
    b, t, maxlen = 2, 4, 4
    sm = np.ones((b, maxlen), bool)
    first = np.zeros((b, t), bool)
    first[0, 2] = True  # batch 0 resets mid-chunk
    m, new_sm = clipped_causal_mask(np.asarray(first), np.asarray(sm), t=t, T=t + maxlen, maxlen=maxlen)
    m = np.asarray(m)
    # batch 0: queries 0,1 see the past; queries 2,3 do not
    assert m[0, 0, :maxlen].any() and m[0, 1, :maxlen].any()
    assert not m[0, 2, :maxlen].any() and not m[0, 3, :maxlen].any()
    # query 3 sees chunk steps 2,3 but not 0,1; query 1 sees 0,1
    assert m[0, 3, maxlen + 2] and m[0, 3, maxlen + 3]
    assert not m[0, 3, maxlen + 0] and not m[0, 3, maxlen + 1]
    assert m[0, 1, maxlen + 0]
    # batch 1 (no reset) unaffected: full causal band
    assert m[1, 3, maxlen + 0]
    # carried state mask: steps before the reset are dead for future chunks
    new_sm = np.asarray(new_sm)
    assert np.array_equal(new_sm[0], [False, False, True, True])
    assert new_sm[1].all()


def test_chunked_state_mask_equals_stepwise_oracle():
    """Final state mask of ONE chunked call == t=1 stepwise updates, for
    random reset patterns (the equivalence the PPO update relies on)."""
    rng = np.random.default_rng(0)
    b, t, maxlen = 3, 6, 6
    for trial in range(5):
        sm0 = rng.random((b, maxlen)) < 0.7
        first = rng.random((b, t)) < 0.3
        _, sm_step = _stepwise_oracle(first, np.asarray(sm0), maxlen)
        _, sm_chunk = clipped_causal_mask(
            np.asarray(first), np.asarray(sm0), t=t, T=t + maxlen, maxlen=maxlen
        )
        np.testing.assert_array_equal(np.asarray(sm_chunk), sm_step, err_msg=f"trial {trial}")


def test_chunk_start_only_first_back_compat():
    """(B,) firsts must behave exactly like (B, t) with the flag at step 0."""
    rng = np.random.default_rng(1)
    b, t, maxlen = 2, 3, 4
    sm = rng.random((b, maxlen)) < 0.5
    first_b = np.array([True, False])
    first_bt = np.zeros((b, t), bool)
    first_bt[:, 0] = first_b
    m1, sm1 = clipped_causal_mask(first_b, np.asarray(sm), t=t, T=t + maxlen, maxlen=maxlen)
    m2, sm2 = clipped_causal_mask(np.asarray(first_bt), np.asarray(sm), t=t, T=t + maxlen, maxlen=maxlen)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(sm1), np.asarray(sm2))
