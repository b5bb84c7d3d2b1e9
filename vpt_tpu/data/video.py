"""Video IO via the native data plane (vpt_tpu/native/libvpt_host.so).

The reference leans on cv2.VideoCapture (C++ under a Python wrapper,
data_loader.py:63, run_inverse_dynamics_model.py:138); here the decoder is our
own libavformat/libavcodec reader exposed over a C ABI.  The library is built
lazily with ``make -C vpt_tpu/native`` on first use if missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libvpt_host.so"))

_lib = None
_lib_error: Optional[str] = None


def _load_library():
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:  # pragma: no cover
            _lib_error = f"could not build native library: {e}"
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:  # pragma: no cover
        _lib_error = str(e)
        return None

    lib.vpt_video_open.restype = ctypes.c_void_p
    lib.vpt_video_open.argtypes = [ctypes.c_char_p]
    lib.vpt_video_info.restype = ctypes.c_int
    lib.vpt_video_info.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.vpt_video_read.restype = ctypes.c_int
    lib.vpt_video_read.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.vpt_video_close.restype = None
    lib.vpt_video_close.argtypes = [ctypes.c_void_p]
    lib.vpt_video_read_batch.restype = ctypes.c_int
    lib.vpt_video_read_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),   # emit mask (or NULL)
        ctypes.POINTER(ctypes.c_int32),   # cursor xy pairs (or NULL)
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int,       # cursor h, w
        ctypes.c_int, ctypes.c_int,       # dst h, w
        ctypes.POINTER(ctypes.c_uint8),
    ]

    lib.vpt_video_writer_open.restype = ctypes.c_void_p
    lib.vpt_video_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.vpt_video_writer_write.restype = ctypes.c_int
    lib.vpt_video_writer_write.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.vpt_video_writer_close.restype = ctypes.c_int
    lib.vpt_video_writer_close.argtypes = [ctypes.c_void_p]

    lib.vpt_resize_u8.restype = None
    lib.vpt_resize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
    ]
    lib.vpt_composite_alpha.restype = None
    lib.vpt_composite_alpha.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class VideoReader:
    """Sequential RGB frame reader for mp4/mkv files."""

    def __init__(self, path: str):
        lib = _load_library()
        if lib is None:
            raise RuntimeError(f"native video library unavailable: {_lib_error}")
        self._lib = lib
        self._h = lib.vpt_video_open(path.encode())
        if not self._h:
            raise IOError(f"could not open video {path}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        n = ctypes.c_int64()
        lib.vpt_video_info(self._h, ctypes.byref(w), ctypes.byref(h), ctypes.byref(fps), ctypes.byref(n))
        self.width, self.height, self.fps, self.nframes = w.value, h.value, fps.value, n.value

    def read(self) -> Optional[np.ndarray]:
        """Next frame as (H, W, 3) RGB uint8, or None at EOF."""
        out = np.empty((self.height, self.width, 3), np.uint8)
        ret = self._lib.vpt_video_read(self._h, _u8ptr(out))
        if ret == 1:
            return out
        if ret == 0:
            return None
        raise IOError("video decode error")

    def __iter__(self):
        while True:
            frame = self.read()
            if frame is None:
                return
            yield frame

    CURSOR_NONE = np.int32(np.iinfo(np.int32).min)  # "no cursor" sentinel

    def read_batch(
        self,
        n: int,
        resolution: Tuple[int, int],
        emit: Optional[np.ndarray] = None,
        cursor_xy: Optional[np.ndarray] = None,
        cursor: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    ) -> Tuple[int, np.ndarray]:
        """Decode up to ``n`` frames with cursor compositing + bit-exact
        resize done natively in ONE C call (the data-loader fast path —
        amortizes the resize plan and kills per-frame ctypes/numpy overhead).

        :param resolution: (width, height) agent resolution.
        :param emit: optional (n,) bool — False frames are decoded (keeping
            video/jsonl in step) but not composited/resized; their output
            slots are undefined.
        :param cursor_xy: optional (n, 2) int32 recorded mouse positions;
            ``CURSOR_NONE`` x marks frames without a cursor (GUI closed).
        :param cursor: (rgb (h,w,3), alpha (h,w)) sprite; required when any
            cursor_xy row is active.
        :returns: (frames_decoded, (n, H, W, 3) uint8 array) —
            frames_decoded < n means EOF.
        """
        dst_w, dst_h = resolution
        out = np.empty((n, dst_h, dst_w, 3), np.uint8)
        emit_p = None
        if emit is not None:
            emit = np.ascontiguousarray(np.asarray(emit, np.uint8))
            assert emit.shape == (n,)
            emit_p = _u8ptr(emit)
        xy_p = None
        crgb_p = calpha_p = None
        ch = cw = 0
        if cursor_xy is not None:
            cursor_xy = np.ascontiguousarray(np.asarray(cursor_xy, np.int32))
            assert cursor_xy.shape == (n, 2)
            xy_p = cursor_xy.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            assert cursor is not None, "cursor sprite required with cursor_xy"
            crgb = np.ascontiguousarray(cursor[0])
            calpha = np.ascontiguousarray(cursor[1])
            ch, cw = calpha.shape
            crgb_p, calpha_p = _u8ptr(crgb), _u8ptr(calpha)
        got = self._lib.vpt_video_read_batch(
            self._h, n, emit_p, xy_p, crgb_p, calpha_p, ch, cw, dst_h, dst_w, _u8ptr(out)
        )
        if got < 0:
            raise IOError("video decode error")
        return got, out

    def close(self):
        if getattr(self, "_h", None):
            self._lib.vpt_video_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class VideoWriter:
    """RGB frame writer (h264 when available, else mpeg4) for fixtures/viz."""

    def __init__(self, path: str, width: int, height: int, fps: int = 20):
        lib = _load_library()
        if lib is None:
            raise RuntimeError(f"native video library unavailable: {_lib_error}")
        self._lib = lib
        self._h = lib.vpt_video_writer_open(path.encode(), width, height, fps)
        if not self._h:
            raise IOError(f"could not open video writer {path}")
        self.width, self.height = width, height

    def write(self, frame_rgb: np.ndarray):
        assert frame_rgb.shape == (self.height, self.width, 3) and frame_rgb.dtype == np.uint8
        frame_rgb = np.ascontiguousarray(frame_rgb)
        if self._lib.vpt_video_writer_write(self._h, _u8ptr(frame_rgb)) != 0:
            raise IOError("video encode error")

    def close(self):
        if getattr(self, "_h", None):
            self._lib.vpt_video_writer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_resize_u8(img: np.ndarray, target_resolution: Tuple[int, int]) -> np.ndarray:
    """cv2-bit-exact uint8 resize via the C++ kernel (same math as
    vpt_tpu.ops.resize.resize_uint8_exact)."""
    lib = _load_library()
    if lib is None:
        from vpt_tpu.ops.resize import resize_uint8_exact

        return resize_uint8_exact(img, target_resolution)
    dst_w, dst_h = target_resolution
    img = np.ascontiguousarray(img)
    ch = img.shape[2] if img.ndim == 3 else 1
    out = np.empty((dst_h, dst_w) + img.shape[2:], np.uint8)
    lib.vpt_resize_u8(_u8ptr(img), img.shape[0], img.shape[1], ch, _u8ptr(out), dst_h, dst_w)
    return out


def native_composite_alpha(img: np.ndarray, overlay_rgb: np.ndarray, overlay_alpha: np.ndarray, x: int, y: int) -> None:
    """In-place alpha composite of the cursor sprite at (x, y)."""
    lib = _load_library()
    if lib is None:
        from vpt_tpu.data.cursor import composite_images_with_alpha

        composite_images_with_alpha(img, overlay_rgb, overlay_alpha[..., None] / 255.0, x, y)
        return
    img_c = np.ascontiguousarray(img)
    lib.vpt_composite_alpha(
        _u8ptr(img_c), img.shape[0], img.shape[1],
        _u8ptr(np.ascontiguousarray(overlay_rgb)), _u8ptr(np.ascontiguousarray(overlay_alpha)),
        overlay_rgb.shape[0], overlay_rgb.shape[1], x, y,
    )
    img[...] = img_c
