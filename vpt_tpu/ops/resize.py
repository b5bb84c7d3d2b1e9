"""Bilinear resize matching OpenCV's INTER_LINEAR.

The VPT models are sensitive to the exact resizer ("For your sanity, do not
resize with any function than INTER_LINEAR", reference: agent.py:100-103), so
this reimplements cv2's uint8 bilinear *bit-exactly*:

  * half-pixel sample mapping  src = (dst + 0.5) * scale - 0.5 with edge clamp;
  * coefficients quantized to 11 fractional bits (INTER_RESIZE_COEF_SCALE
    = 2048);
  * the 8-bit two-pass fixed-point pipeline: integer horizontal pass
    ``row = S[sx]·a0 + S[sx+1]·a1`` followed by cv2's vertical reduction
    ``((b0·(row0>>4))>>16) + ((b1·(row1>>4))>>16 + 2) >> 2``.

Three implementations:
  * ``resize_uint8_exact``  — numpy fixed-point (host path; bit-equal to cv2);
  * ``resize_bilinear_jnp`` — float half-pixel bilinear under jit (device-side
    preprocessing graph; ≤1 LSB from the fixed-point result);
  * the C++ data plane (vpt_tpu/native) implements the same fixed-point loop
    for the decoder hot path.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

COEF_BITS = 11
COEF_SCALE = 1 << COEF_BITS  # 2048


@lru_cache(maxsize=64)
def _linear_coeffs(src: int, dst: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-output-pixel (index, alpha0, alpha1) with cv2's mapping + clamping."""
    scale = src / dst
    x = np.arange(dst, dtype=np.float64)
    fx = (x + 0.5) * scale - 0.5
    sx = np.floor(fx).astype(np.int64)
    fx = fx - sx
    fx[sx < 0] = 0.0
    sx[sx < 0] = 0
    too_big = sx >= src - 1
    fx[too_big] = 1.0
    sx[too_big] = src - 2 if src > 1 else 0
    a0 = np.clip(np.round((1.0 - fx) * COEF_SCALE), -32768, 32767).astype(np.int32)
    a1 = COEF_SCALE - a0
    return sx, a0, a1


def resize_uint8_exact(img: np.ndarray, target_resolution: Tuple[int, int]) -> np.ndarray:
    """cv2.resize(img, (w, h), interpolation=INTER_LINEAR) for uint8 images.

    :param img: (H, W) or (H, W, C) uint8
    :param target_resolution: (width, height) — cv2 argument order
    """
    assert img.dtype == np.uint8
    dst_w, dst_h = target_resolution
    src_h, src_w = img.shape[:2]
    sx, ax0, ax1 = _linear_coeffs(src_w, dst_w)
    sy, by0, by1 = _linear_coeffs(src_h, dst_h)

    flat = img.reshape(src_h, src_w, -1).astype(np.int32)
    # horizontal pass → int32 rows at 11 fractional bits
    rows = flat[:, sx] * ax0[None, :, None] + flat[:, np.minimum(sx + 1, src_w - 1)] * ax1[None, :, None]
    # vertical pass: cv2's 8U fixed-point reduction
    r0 = rows[sy] >> 4
    r1 = rows[np.minimum(sy + 1, src_h - 1)] >> 4
    out = ((by0[:, None, None] * r0) >> 16) + (((by1[:, None, None] * r1) >> 16) + 2)
    out = (out >> 2).astype(np.uint8)
    return out.reshape((dst_h, dst_w) + img.shape[2:])


def resize_bilinear_jnp(img, target_resolution: Tuple[int, int]):
    """Float bilinear with cv2's half-pixel mapping, jit-compatible.

    Input (..., H, W, C) any float/uint dtype → float32 output.  Used by the
    device-side preprocessing graph; differs from the fixed-point host path by
    at most 1 intensity step.
    """
    import jax.numpy as jnp

    dst_w, dst_h = target_resolution
    src_h, src_w = img.shape[-3], img.shape[-2]
    sx, ax0, ax1 = _linear_coeffs(src_w, dst_w)
    sy, by0, by1 = _linear_coeffs(src_h, dst_h)
    fax0 = jnp.asarray(ax0 / COEF_SCALE, jnp.float32)
    fby0 = jnp.asarray(by0 / COEF_SCALE, jnp.float32)
    sx = jnp.asarray(sx)
    sy = jnp.asarray(sy)

    x = img.astype(jnp.float32)
    left = jnp.take(x, sx, axis=-2)
    right = jnp.take(x, jnp.minimum(sx + 1, src_w - 1), axis=-2)
    rows = left * fax0[:, None] + right * (1.0 - fax0)[:, None]
    top = jnp.take(rows, sy, axis=-3)
    bot = jnp.take(rows, jnp.minimum(sy + 1, src_h - 1), axis=-3)
    return top * fby0[:, None, None] + bot * (1.0 - fby0)[:, None, None]


def resize_image(img: np.ndarray, target_resolution: Tuple[int, int]) -> np.ndarray:
    """Drop-in for the reference's resize_image (agent.py:100-103)."""
    return resize_uint8_exact(img, target_resolution)
