"""Bulk IDM labeling: turn a DIRECTORY of gameplay videos into action jsonl.

This is the VPT pipeline's actual IDM use-case (reference README.md:81-99
labels recordings so BC can train on unlabeled video) scaled to a corpus:
one loaded agent labels every ``*.mp4`` under ``--video-dir`` through the
overlap-stitched :class:`StreamingIDMLabeler` (every frame gets bidirectional
context; ``--window-batch 8`` is the measured-best serving geometry, 88% MXU
— docs/ROADMAP.md "IDM window batching").

Restartable by construction: each video writes ``<out-dir>/<id>.jsonl.tmp``
and renames on completion, so a rerun (``--resume``, default) skips finished
videos and redoes at most one partial file.  Rows are
``{"frame": i, "action": {...}}`` — the same schema as
``run_inverse_dynamics_model.py --out``.

Example::

    python tools/label_videos.py --model 4x_idm.model --weights 4x_idm.weights \
        --video-dir contractor_videos/ --out-dir labels/ --stride 64
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from vpt_tpu.agent import (IDMAgent, StreamingIDMLabeler,  # noqa: E402
                           IDM_REQUIRED_RESOLUTION as REQUIRED_RESOLUTION,
                           action_jsonl_row)
from vpt_tpu.checkpoint import load_model_parameters  # noqa: E402
from vpt_tpu.data.video import VideoReader  # noqa: E402


def label_one(agent, video_path, out_path, window, stride, window_batch,
              strict_resolution=True, decode_batch=64):
    """Label one video into ``out_path`` (atomic via .tmp rename); returns
    (n_frames, seconds).

    Decode + resize run natively in ``decode_batch``-frame chunks (ONE C call
    each, the loader's batched pixel path) and the labeler takes the frames
    through ``feed_resized`` — per-frame Python/ctypes stays off the hot
    loop."""
    labeler = StreamingIDMLabeler(agent, window=window, stride=stride,
                                  window_batch=window_batch)
    resolution = (agent.cfg.img_shape[1], agent.cfg.img_shape[0])
    tmp_path = out_path + ".tmp"
    t0 = time.time()
    n = 0
    with VideoReader(video_path) as cap, open(tmp_path, "w") as out:
        if strict_resolution:
            assert (cap.width, cap.height) == REQUIRED_RESOLUTION, (
                f"{video_path}: resolution {(cap.width, cap.height)} != "
                f"{REQUIRED_RESOLUTION} (pass --no-strict-resolution to accept)"
            )

        def emit(labels):
            for idx, action in labels:
                row = action_jsonl_row(action)
                out.write(json.dumps({"frame": idx, "action": row}) + "\n")

        while True:
            got, frames = cap.read_batch(decode_batch, resolution)
            for j in range(got):
                n += 1
                emit(labeler.feed_resized(frames[j]))
            if got < decode_batch:
                break
        emit(labeler.finish())
    os.replace(tmp_path, out_path)  # completion marker: the final name
    return n, time.time() - t0


def main():
    ap = argparse.ArgumentParser("Label every video in a directory with IDM actions.")
    ap.add_argument("--model", required=True, help="Path to the IDM '.model' file.")
    ap.add_argument("--weights", required=True, help="Path to the IDM '.weights' file.")
    ap.add_argument("--video-dir", required=True, help="Directory of .mp4 recordings.")
    ap.add_argument("--out-dir", required=True, help="Write <id>.jsonl files here.")
    ap.add_argument("--n-frames", type=int, default=128, help="Window length.")
    ap.add_argument("--stride", type=int, default=64,
                    help="Window slide (< --n-frames overlap-stitches so every "
                         "label has bidirectional context).")
    ap.add_argument("--window-batch", type=int, default=8,
                    help="Windows labeled per forward (8 = measured-best MXU).")
    ap.add_argument("--no-strict-resolution", action="store_true",
                    help="Accept videos that are not 640x360.")
    ap.add_argument("--no-resume", action="store_true",
                    help="Re-label videos even when their output exists.")
    args = ap.parse_args()

    videos = sorted(glob.glob(os.path.join(args.video_dir, "*.mp4")))
    if not videos:
        raise SystemExit(f"no .mp4 files under {args.video_dir}")
    os.makedirs(args.out_dir, exist_ok=True)

    net_kwargs, pi_head_kwargs = load_model_parameters(args.model)
    agent = IDMAgent(idm_net_kwargs=net_kwargs, pi_head_kwargs=pi_head_kwargs)
    agent.load_weights(args.weights)

    # Fail fast on labeler CONFIG errors (window > model timesteps, stride
    # out of range): the constructor's validation would otherwise fire
    # identically inside label_one for every video, turning one mistake
    # into N per-video FAILED lines.  The per-video try below then only
    # absorbs genuinely per-video failures (decode errors, bad resolution).
    StreamingIDMLabeler(agent, window=args.n_frames, stride=args.stride,
                        window_batch=args.window_batch)

    total_frames, t_start, skipped, failed = 0, time.time(), 0, []
    for i, vp in enumerate(videos):
        vid = os.path.splitext(os.path.basename(vp))[0]
        out_path = os.path.join(args.out_dir, vid + ".jsonl")
        if not args.no_resume and os.path.exists(out_path):
            skipped += 1
            continue
        try:
            n, dt = label_one(agent, vp, out_path, args.n_frames, args.stride,
                              args.window_batch,
                              strict_resolution=not args.no_strict_resolution)
        except (IOError, AssertionError) as e:
            # one bad recording must not kill a corpus job (same stance as
            # the reference loader, data_loader.py:122-123); its .tmp stays
            # behind so the failure is inspectable and the video retried
            print(f"[{i + 1}/{len(videos)}] {vid}: FAILED — {e}", flush=True)
            failed.append(vid)
            continue
        total_frames += n
        print(f"[{i + 1}/{len(videos)}] {vid}: {n} frames in {dt:.1f}s "
              f"({n / max(dt, 1e-9):.1f} fps)", flush=True)
    dt_all = time.time() - t_start
    done = len(videos) - skipped - len(failed)
    print(f"Labeled {done} video(s) ({skipped} already done, {len(failed)} failed), "
          f"{total_frames} frames in {dt_all:.1f}s → "
          f"{total_frames / max(dt_all, 1e-9):.1f} frames/sec")
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
