"""Mouse-cursor sprite compositing for GUI frames.

The reference ships a 16×16 RGBA cursor PNG composited onto frames whenever
the GUI is open (reference: data_loader.py:19, 52-56, 113-117) — the recorder
does not bake the cursor into the video, but the model was trained seeing it.

We generate the classic white-arrow-with-black-border cursor procedurally (the
published asset is not redistributed here); ``CURSOR_FILE`` env var or the
``cursor_path`` argument lets users point at the original PNG for pixel parity
with the reference pipeline.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

# Classic left-pointing arrow cursor, 16×16.  '#' = black border, 'W' = white
# fill, '.' = transparent.  Shape follows the standard Minecraft/GUI arrow.
_ARROW = [
    "#...............",
    "##..............",
    "#W#.............",
    "#WW#............",
    "#WWW#...........",
    "#WWWW#..........",
    "#WWWWW#.........",
    "#WWWWWW#........",
    "#WWWWWWW#.......",
    "#WWWWWWWW#......",
    "#WWWWW#####.....",
    "#WW#WW#.........",
    "#W#.#WW#........",
    "##..#WW#........",
    "#....#WW#.......",
    ".....####.......",
]


def _procedural_cursor() -> Tuple[np.ndarray, np.ndarray]:
    rgb = np.zeros((16, 16, 3), np.uint8)
    alpha = np.zeros((16, 16), np.uint8)
    for y, row in enumerate(_ARROW):
        for x, c in enumerate(row[:16]):
            if c == "#":
                rgb[y, x] = 0
                alpha[y, x] = 255
            elif c == "W":
                rgb[y, x] = 255
                alpha[y, x] = 255
    return rgb, alpha


def load_cursor_png(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load a 16×16 RGBA cursor PNG (e.g. the reference's asset) via PIL."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGBA"))[:16, :16]
    return img[:, :, :3].copy(), img[:, :, 3].copy()


def _search_paths():
    """Cursor PNG locations, most-specific first.  Mirrors the reference's
    module-relative default (data_loader.py:19: ``cursors/mouse_cursor_white_
    16x16.png`` next to the code) so dropping the published asset into a
    ``cursors/`` directory at the repo root — or next to the dataset — just
    works; ``CURSOR_FILE`` overrides everything."""
    env = os.environ.get("CURSOR_FILE")
    rel = os.path.join("cursors", "mouse_cursor_white_16x16.png")
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    candidates = [env] if env else []
    candidates += [os.path.join(repo_root, rel), os.path.join(os.getcwd(), rel)]
    # a reference checkout, if present (VPT_REFERENCE_DIR or the conventional
    # sibling/dev location) — its published asset gives pixel parity for free
    ref_dirs = [os.environ.get("VPT_REFERENCE_DIR"), "/root/reference",
                os.path.join(repo_root, "..", "reference")]
    candidates += [os.path.join(d, rel) for d in ref_dirs if d]
    return candidates


def default_cursor(cursor_path: Optional[str] = None) -> Tuple[np.ndarray, np.ndarray]:
    """(rgb (16,16,3), alpha (16,16)) — from ``cursor_path``, ``CURSOR_FILE``,
    a ``cursors/`` directory at the repo root or CWD, a reference checkout
    (``VPT_REFERENCE_DIR``), or the procedural fallback (visually equivalent
    arrow; the published PNG, when found, gives pixel parity with the
    reference pipeline)."""
    for path in ([cursor_path] if cursor_path else []) + _search_paths():
        if path and os.path.exists(path):
            return load_cursor_png(path)
    return _procedural_cursor()


def composite_images_with_alpha(image1: np.ndarray, image2: np.ndarray, alpha: np.ndarray, x: int, y: int) -> None:
    """Draw image2 over image1 at (x, y) with opacity ``alpha`` — in place
    (reference: data_loader.py:34-45).  ``alpha`` is float in [0, 1] with a
    trailing channel dim."""
    ch = max(0, min(image1.shape[0] - y, image2.shape[0]))
    cw = max(0, min(image1.shape[1] - x, image2.shape[1]))
    if ch == 0 or cw == 0:
        return
    a = alpha[:ch, :cw]
    image1[y : y + ch, x : x + cw, :] = (
        image1[y : y + ch, x : x + cw, :] * (1 - a) + image2[:ch, :cw, :] * a
    ).astype(np.uint8)
