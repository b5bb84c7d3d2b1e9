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
