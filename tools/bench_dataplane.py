"""Host data-plane throughput: decode + fixups + cursor + bit-exact resize.

Builds a synthetic 640x360 contractor-style fixture (mp4 + jsonl with GUI
segments so the cursor path runs), then times ``trajectory_steps`` end-to-end
at several ``batch_frames`` settings — 1 approximates the old per-frame
ctypes path; 64 is the production batched native call.

Usage: python tools/bench_dataplane.py [--frames 600] [--batches 1 16 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_fixture(tmp, n_frames: int):
    from vpt_tpu.data.video import VideoWriter

    video_path = os.path.join(tmp, "traj.mp4")
    json_path = os.path.join(tmp, "traj.jsonl")
    rng = np.random.default_rng(0)
    with VideoWriter(video_path, 640, 360, fps=20) as w:
        base = rng.integers(0, 255, (360, 640, 3), dtype=np.uint8)
        for i in range(n_frames):
            frame = np.roll(base, i * 3, axis=1)  # cheap motion, encodes fast
            w.write(frame)
    steps = []
    for i in range(n_frames):
        gui = (i // 40) % 2 == 1  # alternate GUI segments → cursor composite
        steps.append({
            "mouse": {"x": 320.0 + (i % 50), "y": 180.0 + (i % 30),
                      "dx": 1.0, "dy": 0.5, "buttons": [0] if i % 7 == 0 else [],
                      "newButtons": [0] if i % 7 == 0 else []},
            "keyboard": {"keys": ["key.keyboard.w"] if i % 3 else []},
            "hotbar": i % 9,
            "isGuiOpen": gui,
        })
    with open(json_path, "w") as f:
        for s in steps:
            f.write(json.dumps(s) + "\n")
    return video_path, json_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 16, 64])
    args = ap.parse_args()

    from vpt_tpu.data.loader import trajectory_steps

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        video_path, json_path = build_fixture(tmp, args.frames)
        for bf in args.batches:
            # warm one pass (page cache, lazy lib init)
            n = sum(1 for _ in trajectory_steps(video_path, json_path, batch_frames=bf))
            t0 = time.perf_counter()
            n = sum(1 for _ in trajectory_steps(video_path, json_path, batch_frames=bf))
            dt = time.perf_counter() - t0
            results[f"batch_{bf}_fps"] = round(n / dt, 1)
            results[f"batch_{bf}_frames"] = n
    if len(args.batches) > 1:
        lo, hi = args.batches[0], args.batches[-1]
        results["speedup"] = round(
            results[f"batch_{hi}_fps"] / results[f"batch_{lo}_fps"], 3
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
