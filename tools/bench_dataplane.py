"""Host data-plane throughput: decode + fixups + cursor + bit-exact resize.

Three modes:

* default — single-stream ``trajectory_steps`` at several ``batch_frames``
  settings (1 approximates the old per-frame ctypes path; 64 is the
  production batched native call);
* ``--bakeoff`` — apples-to-apples LOADER bakeoff vs the reference's own
  ``DataLoader`` (imported from the checkout and driven): same fixture
  corpus, same worker count, loader-only, same emitted-frame accounting.
  Each loader runs in a fresh subprocess (the reference's workers fork, ours
  spawn; isolation keeps either from inheriting the other's runtime), with a
  warm pass before the timed pass;
* ``--stages`` — per-stage native-path profile on one stream: decode only →
  +resize → +cursor composite, by differencing timed ``read_batch`` calls.

Usage:
  python tools/bench_dataplane.py [--frames 600] [--batches 1 16 64]
  python tools/bench_dataplane.py --bakeoff [--workers 8] [--traj 16] [--frames 400]
  python tools/bench_dataplane.py --stages [--frames 600]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import textwrap
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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


def build_corpus(root: str, n_traj: int, n_frames: int) -> None:
    """Bakeoff corpus: n_traj contractor-style recordings, EVERY step
    non-null (the reference skips null actions; identical-by-construction
    emitted counts make the two loaders' fps directly comparable), with GUI
    segments so both cursor-composite paths run."""
    from vpt_tpu.data.video import VideoWriter

    keys = ["key.keyboard.w", "key.keyboard.a", "key.keyboard.s", "key.keyboard.d"]
    rng = np.random.default_rng(7)
    pool = [rng.integers(0, 255, (360, 640, 3), dtype=np.uint8) for _ in range(8)]
    for j in range(n_traj):
        base = os.path.join(root, f"traj{j}")
        with VideoWriter(base + ".mp4", 640, 360, fps=20) as w:
            for i in range(n_frames):
                w.write(pool[(i + j) % len(pool)])
        with open(base + ".jsonl", "w") as f:
            for i in range(n_frames):
                row = {"keyboard": {"keys": [keys[(i + j) % len(keys)]]},
                       "mouse": {"x": 320.0, "y": 180.0, "dx": float(i % 5 - 2),
                                 "dy": 1.0, "buttons": [], "newButtons": []},
                       "hotbar": 0, "isGuiOpen": (i // 40) % 4 == 3}
                f.write(json.dumps(row) + "\n")


_REF_LOADER_SCRIPT = textwrap.dedent("""
    import json, sys, time
    sys.path.insert(0, %(repo)r)
    from bench_torch_reference import install_reference
    install_reference()
    import data_loader as ref_dl
    ref_dl.QUEUE_TIMEOUT = 120

    def drain():
        loader = ref_dl.DataLoader(dataset_dir=%(corpus)r, n_workers=%(workers)d,
                                   batch_size=%(workers)d, n_epochs=1)
        n = 0
        t0 = time.perf_counter()
        for frames, actions, ids in loader:
            n += len(frames)
        return n, time.perf_counter() - t0

    drain()                      # warm: page cache, worker startup patterns
    n, dt = drain()
    print(json.dumps({"frames": n, "seconds": dt, "fps": n / dt}))
""")

_OUR_STEP_LOADER_SCRIPT = textwrap.dedent("""
    import json, sys, time
    sys.path.insert(0, %(repo)r)

    if __name__ == "__main__":   # spawn workers re-import this script
        from vpt_tpu.data import loader as vl
        vl.QUEUE_TIMEOUT = 120

        def drain():
            loader = vl.DataLoader(%(corpus)r, n_workers=%(workers)d,
                                   batch_size=%(workers)d, n_epochs=1)
            n = 0
            t0 = time.perf_counter()
            for frames, actions, ids in loader:
                n += len(frames)
            dt = time.perf_counter() - t0
            loader.close()
            return n, dt

        drain()
        n, dt = drain()
        print(json.dumps({"frames": n, "seconds": dt, "fps": n / dt}))
""")

_OUR_SEQ_LOADER_SCRIPT = textwrap.dedent("""
    import json, sys, time
    sys.path.insert(0, %(repo)r)

    if __name__ == "__main__":
        from vpt_tpu.data import loader as vl
        vl.QUEUE_TIMEOUT = 120

        def drain():
            loader = vl.SequenceDataLoader(%(corpus)r, batch_size=%(workers)d,
                                           chunk_len=%(chunk)d, n_epochs=1, seed=0)
            n = 0
            t0 = time.perf_counter()
            for b in loader:
                n += int(b["mask"].sum())      # real (non-padding) frames
            dt = time.perf_counter() - t0
            loader.close()
            return n, dt

        drain()
        n, dt = drain()
        print(json.dumps({"frames": n, "seconds": dt, "fps": n / dt}))
""")


def _run_leg(script_body: str, tmp: str, name: str) -> dict:
    path = os.path.join(tmp, f"leg_{name}.py")
    with open(path, "w") as f:
        f.write(script_body)
    out = subprocess.run([sys.executable, path], capture_output=True, text=True,
                         timeout=1800)
    if out.returncode != 0:
        return {"error": out.stderr.strip().splitlines()[-1][:300] if out.stderr else "failed"}
    return json.loads(out.stdout.strip().splitlines()[-1])


def bakeoff(n_traj: int, n_frames: int, workers: int, chunk: int) -> dict:
    tmp = tempfile.mkdtemp(prefix="vpt_dataplane_bakeoff_")
    corpus = os.path.join(tmp, "corpus")
    os.makedirs(corpus, exist_ok=True)
    build_corpus(corpus, n_traj, n_frames)
    sub = {"repo": REPO, "corpus": corpus, "workers": workers, "chunk": chunk}
    results = {
        "geometry": {"trajectories": n_traj, "frames_per_traj": n_frames,
                     "workers": workers, "chunk_len": chunk},
        # the reference's own DataLoader (cv2 decode, 1 worker per stream,
        # single-step batches) — reference data_loader.py:130-222
        "reference_loader": _run_leg(_REF_LOADER_SCRIPT % sub, tmp, "ref"),
        # ours at the IDENTICAL geometry: single-step batches, same worker
        # count, native batched decode
        "ours_step_loader": _run_leg(_OUR_STEP_LOADER_SCRIPT % sub, tmp, "step"),
        # ours at the production geometry: T-chunk windows per stream
        "ours_sequence_loader": _run_leg(_OUR_SEQ_LOADER_SCRIPT % sub, tmp, "seq"),
    }
    ref_fps = results["reference_loader"].get("fps")
    for k in ("ours_step_loader", "ours_sequence_loader"):
        fps = results[k].get("fps")
        if fps and ref_fps:
            results[k]["vs_reference"] = round(fps / ref_fps, 3)
    return results


def stages(n_frames: int) -> dict:
    """Per-stage native pixel-path profile by differencing: decode-only
    (emit=0) → +bit-exact resize (emit=1) → +cursor composite (every frame
    composited).  One stream, no workers — the per-core story."""
    from vpt_tpu.data.cursor import default_cursor
    from vpt_tpu.data.video import VideoReader

    tmp = tempfile.mkdtemp(prefix="vpt_dataplane_stages_")
    video_path, _ = build_fixture(tmp, n_frames)
    cursor = default_cursor()
    bf = 64

    def timed(emit_val: int, with_cursor: bool) -> float:
        def one_pass() -> float:
            t0 = time.perf_counter()
            with VideoReader(video_path) as v:
                done = 0
                while done < n_frames:
                    k = min(bf, n_frames - done)
                    emit = np.full(k, emit_val, np.uint8)
                    xy = np.full((k, 2), VideoReader.CURSOR_NONE, np.int32)
                    if with_cursor:
                        xy[:] = (300, 170)
                    got, _ = v.read_batch(k, (128, 128), emit=emit,
                                          cursor_xy=xy, cursor=cursor)
                    if got == 0:
                        break
                    done += got
            return time.perf_counter() - t0

        one_pass()  # warm
        return one_pass()

    t_decode = timed(0, False)
    t_resize = timed(1, False)
    t_full = timed(1, True)
    return {
        "frames": n_frames,
        "decode_only_fps": round(n_frames / t_decode, 1),
        "decode_resize_fps": round(n_frames / t_resize, 1),
        "decode_resize_composite_fps": round(n_frames / t_full, 1),
        "stage_ms_per_frame": {
            "decode": round(1e3 * t_decode / n_frames, 4),
            "resize": round(1e3 * (t_resize - t_decode) / n_frames, 4),
            "composite": round(1e3 * (t_full - t_resize) / n_frames, 4),
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 16, 64])
    ap.add_argument("--bakeoff", action="store_true",
                    help="reference DataLoader vs ours, same corpus/workers")
    ap.add_argument("--stages", action="store_true",
                    help="native pixel path per-stage profile")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--traj", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args()

    if args.bakeoff:
        frames = args.frames if args.frames != 600 else 400
        print(json.dumps(bakeoff(args.traj, frames, args.workers, args.chunk)))
        return
    if args.stages:
        print(json.dumps(stages(args.frames)))
        return

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
