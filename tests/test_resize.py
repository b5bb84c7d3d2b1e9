"""Resize correctness.

The strongest oracle here is cv2 itself (installed in this image): the
reference's loudest footgun is "do not resize with any function other than
INTER_LINEAR" (reference agent.py:100-103), so ``resize_uint8_exact`` and the
native C++ kernel are asserted bit-for-bit equal to
``cv2.resize(..., INTER_LINEAR)`` — including the 640x360 -> 128x128 hot path
and randomized up/down/mixed-scale fuzz.  Float-math oracles (torch, scalar
bilinear) remain as implementation-independent cross-checks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vpt_tpu.ops.resize import resize_bilinear_jnp, resize_image, resize_uint8_exact


def _float_bilinear_oracle(img, dst_w, dst_h):
    """Plain float64 half-pixel bilinear (the mathematical target the
    fixed-point path approximates to ≤1 LSB)."""
    src_h, src_w = img.shape[:2]
    out = np.zeros((dst_h, dst_w) + img.shape[2:])
    for y in range(dst_h):
        fy = (y + 0.5) * src_h / dst_h - 0.5
        sy = int(np.floor(fy))
        fy -= sy
        y0 = min(max(sy, 0), src_h - 1)
        y1 = min(max(sy + 1, 0), src_h - 1)
        for x in range(dst_w):
            fx = (x + 0.5) * src_w / dst_w - 0.5
            sx = int(np.floor(fx))
            fx -= sx
            x0 = min(max(sx, 0), src_w - 1)
            x1 = min(max(sx + 1, 0), src_w - 1)
            out[y, x] = (
                img[y0, x0] * (1 - fx) * (1 - fy)
                + img[y0, x1] * fx * (1 - fy)
                + img[y1, x0] * (1 - fx) * fy
                + img[y1, x1] * fx * fy
            )
    return out


def test_identity_resize():
    img = np.random.default_rng(0).integers(0, 255, (16, 16, 3), dtype=np.uint8)
    out = resize_uint8_exact(img, (16, 16))
    np.testing.assert_array_equal(out, img)


def test_constant_image():
    img = np.full((360, 640, 3), 77, np.uint8)
    out = resize_uint8_exact(img, (128, 128))
    assert out.shape == (128, 128, 3)
    np.testing.assert_array_equal(out, 77)


def test_close_to_float_oracle():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (45, 80, 3), dtype=np.uint8)
    got = resize_uint8_exact(img, (16, 16)).astype(np.float64)
    want = _float_bilinear_oracle(img, 16, 16)
    # fixed-point quantization: within 1 intensity step of exact math
    assert np.abs(got - want).max() <= 1.0


def test_upscale_close_to_float_oracle():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (8, 8), dtype=np.uint8)
    got = resize_uint8_exact(img, (32, 20)).astype(np.float64)
    want = _float_bilinear_oracle(img, 32, 20)
    assert np.abs(got - want).max() <= 1.0


def test_jnp_matches_exact_within_one_step():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (360, 640, 3), dtype=np.uint8)
    exact = resize_uint8_exact(img, (128, 128)).astype(np.float64)
    dev = np.asarray(resize_bilinear_jnp(jnp.asarray(img), (128, 128)))
    assert np.abs(exact - dev).max() <= 1.0


def test_jnp_batched():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (2, 3, 24, 32, 3), dtype=np.uint8)
    out = resize_bilinear_jnp(jnp.asarray(img), (16, 16))
    assert out.shape == (2, 3, 16, 16, 3)


def test_torch_bilinear_independent_oracle():
    """torch F.interpolate(bilinear, align_corners=False) shares cv2's
    half-pixel sampling convention in float math — an implementation-
    independent oracle the fixed-point path must track within 1 step."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (360, 640, 3), dtype=np.uint8)
    got = resize_uint8_exact(img, (128, 128)).astype(np.float64)
    t = torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None]
    want = (
        F.interpolate(t, size=(128, 128), mode="bilinear", align_corners=False, antialias=False)[0]
        .permute(1, 2, 0)
        .numpy()
        .astype(np.float64)
    )
    assert np.abs(got - want).max() <= 1.0


# ---------------------------------------------------------------------------
# cv2 oracle: bit-exact equality with the library the reference actually uses
# ---------------------------------------------------------------------------

cv2 = pytest.importorskip("cv2")


def _assert_matches_cv2(img, wh):
    want = cv2.resize(img, wh, interpolation=cv2.INTER_LINEAR)
    got = resize_uint8_exact(img, wh).reshape(want.shape)
    np.testing.assert_array_equal(got, want)


def test_cv2_reference_hot_path():
    """640x360 -> 128x128 is the exact resize in reference agent.py:100-103."""
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (360, 640, 3), dtype=np.uint8)
    _assert_matches_cv2(img, (128, 128))


def test_cv2_idm_hot_path():
    """1280x720 -> 128x128 (reference run_inverse_dynamics_model.py scale)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (720, 1280, 3), dtype=np.uint8)
    _assert_matches_cv2(img, (128, 128))


@pytest.mark.parametrize(
    "shape,wh",
    [
        ((45, 80, 3), (16, 16)),    # downscale
        ((8, 8), (32, 20)),         # upscale (border rows exercise raw coeffs)
        ((2, 2, 3), (3, 3)),        # tiny upscale, all-border
        ((50, 50, 3), (150, 150)),  # 3x upscale
        ((123, 140, 3), (154, 268)),  # mixed, fractional scale
        ((1, 1, 3), (5, 5)),        # degenerate source
        ((1, 77), (13, 90)),        # single-row source
        ((77, 1), (90, 13)),        # single-col source
        ((128, 128, 3), (360, 640)),  # inverse of the hot path
    ],
)
def test_cv2_exact_cases(shape, wh):
    rng = np.random.default_rng(sum(shape) + sum(wh))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    _assert_matches_cv2(img, wh)


def test_cv2_fuzz():
    rng = np.random.default_rng(12)
    for _ in range(60):
        sh = (int(rng.integers(1, 200)), int(rng.integers(1, 200)), int(rng.choice([1, 3])))
        if sh[2] == 1:
            sh = sh[:2]
        wh = (int(rng.integers(1, 200)), int(rng.integers(1, 200)))
        img = rng.integers(0, 256, sh, dtype=np.uint8)
        _assert_matches_cv2(img, wh)


def test_native_resize_matches_cv2():
    from vpt_tpu.data.video import native_available, native_resize_u8

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (360, 640, 3), dtype=np.uint8)
    want = cv2.resize(img, (128, 128), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(native_resize_u8(img, (128, 128)), want)
    for _ in range(20):
        sh = (int(rng.integers(1, 200)), int(rng.integers(1, 200)), 3)
        wh = (int(rng.integers(1, 200)), int(rng.integers(1, 200)))
        img = rng.integers(0, 256, sh, dtype=np.uint8)
        want = cv2.resize(img, wh, interpolation=cv2.INTER_LINEAR)
        np.testing.assert_array_equal(native_resize_u8(img, wh), want)


def test_resize_image_alias():
    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (360, 640, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        resize_image(img, (128, 128)),
        cv2.resize(img, (128, 128), interpolation=cv2.INTER_LINEAR),
    )
