import numpy as np
import jax.numpy as jnp

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
        if sy < 0:
            sy, fy = 0, 0.0
        if sy >= src_h - 1:
            sy, fy = src_h - 2, 1.0
        for x in range(dst_w):
            fx = (x + 0.5) * src_w / dst_w - 0.5
            sx = int(np.floor(fx))
            fx -= sx
            if sx < 0:
                sx, fx = 0, 0.0
            if sx >= src_w - 1:
                sx, fx = src_w - 2, 1.0
            out[y, x] = (
                img[sy, sx] * (1 - fx) * (1 - fy)
                + img[sy, sx + 1] * fx * (1 - fy)
                + img[sy + 1, sx] * (1 - fx) * fy
                + img[sy + 1, sx + 1] * fx * fy
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


def _scalar_fixed_point_reference(img, dst_w, dst_h):
    """Straight scalar transcription of the documented cv2 8U fixed-point
    pipeline (11-bit coefficients; vertical ((b0·(r0>>4))>>16)+((b1·(r1>>4))
    >>16)+2)>>2) — catches vectorization bugs in resize_uint8_exact."""
    src_h, src_w = img.shape[:2]
    chans = img.shape[2] if img.ndim == 3 else 1
    flat = img.reshape(src_h, src_w, chans).astype(np.int64)

    def coeffs(src, dst):
        out = []
        for x in range(dst):
            fx = (x + 0.5) * src / dst - 0.5
            sx = int(np.floor(fx))
            fx -= sx
            if sx < 0:
                sx, fx = 0, 0.0
            if sx >= src - 1:
                sx, fx = src - 2 if src > 1 else 0, 1.0
            a0 = int(np.clip(round((1.0 - fx) * 2048), -32768, 32767))
            out.append((sx, a0, 2048 - a0))
        return out

    cx = coeffs(src_w, dst_w)
    cy = coeffs(src_h, dst_h)
    out = np.zeros((dst_h, dst_w, chans), np.uint8)
    for y in range(dst_h):
        sy, b0, b1 = cy[y]
        for x in range(dst_w):
            sx, a0, a1 = cx[x]
            for c in range(chans):
                r0 = flat[sy, sx, c] * a0 + flat[sy, min(sx + 1, src_w - 1), c] * a1
                r1 = flat[min(sy + 1, src_h - 1), sx, c] * a0 + flat[min(sy + 1, src_h - 1), min(sx + 1, src_w - 1), c] * a1
                v = ((b0 * (r0 >> 4)) >> 16) + (((b1 * (r1 >> 4)) >> 16) + 2)
                out[y, x, c] = np.uint8((v >> 2) & 0xFF) if (v >> 2) <= 255 else 255
    return out.reshape((dst_h, dst_w) + img.shape[2:])


def test_vectorized_matches_scalar_spec():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (23, 37, 3), dtype=np.uint8)
    got = resize_uint8_exact(img, (12, 9))
    want = _scalar_fixed_point_reference(img, 12, 9)
    np.testing.assert_array_equal(got, want)
