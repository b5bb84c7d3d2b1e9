"""Label video frames with the IDM's predicted actions
(reference: run_inverse_dynamics_model.py).

CLI-compatible with the reference.  Instead of an interactive cv2 window
(headless TPU hosts), predictions are printed side-by-side with the recorded
actions and optionally written to a JSONL file (``--out``) and/or an
annotation video (``--out-video``).
"""

import json
from argparse import ArgumentParser

import numpy as np

from vpt_tpu.actions import json_action_to_env_action
from vpt_tpu.agent import IDMAgent, IDM_REQUIRED_RESOLUTION as REQUIRED_RESOLUTION, action_jsonl_row
from vpt_tpu.checkpoint import load_model_parameters
from vpt_tpu.data.loader import _load_jsonl
from vpt_tpu.data.video import VideoReader


def streaming_main(agent, video_path, json_data, n_frames, stride, window_batch,
                   out=None, max_frames=None, strict_resolution=True, metrics=False):
    """Overlap-stitched labeling over an arbitrarily long video: windows slide
    by ``stride`` < ``n_frames`` and each frame's label comes from the window
    where it is most central (StreamingIDMLabeler)."""
    import time

    from vpt_tpu.agent import StreamingIDMLabeler
    from vpt_tpu.data.video import VideoReader
    from vpt_tpu.utils.metrics import AgreementMeter

    labeler = StreamingIDMLabeler(agent, window=n_frames, stride=stride,
                                  window_batch=window_batch)
    out_f = open(out, "w") if out else None
    meter = AgreementMeter() if (metrics and json_data is not None) else None
    total, t0 = 0, time.time()

    def emit(labels):
        nonlocal total
        for idx, action in labels:
            total += 1
            row = action_jsonl_row(action)
            if out_f:
                out_f.write(json.dumps({"frame": idx, "action": row}) + "\n")
            if meter is not None and idx < len(json_data):
                rec, _ = json_action_to_env_action(json_data[idx])
                meter.add(row, rec)
            if idx < 3:
                rec = {}
                if json_data is not None and idx < len(json_data):
                    rec, _ = json_action_to_env_action(json_data[idx])
                pressed = [k for k, v in row.items() if k != "camera" and v == 1]
                rec_pressed = [k for k, v in rec.items() if k != "camera" and v == 1]
                print(f"frame {idx}: predicted={pressed} "
                      f"camera={np.round(row['camera'], 2)} | recorded={rec_pressed}")

    with VideoReader(video_path) as cap:
        if strict_resolution:
            assert (cap.width, cap.height) == REQUIRED_RESOLUTION, (
                f"Video must be of resolution {REQUIRED_RESOLUTION}"
            )
        n_read = 0
        while max_frames is None or n_read < max_frames:
            frame = cap.read()
            if frame is None:
                break
            n_read += 1
            emit(labeler.feed(frame))
        # container metadata answers "are there more frames?" without
        # decoding one (nframes can be 0/unknown for some containers —
        # fall back to a probe decode only then)
        more = (cap.nframes > max_frames if (max_frames is not None and cap.nframes > 0)
                else (cap.read() is not None if max_frames is not None else False))
        if max_frames is not None and n_read == max_frames and more:
            print(f"WARNING: stopped at --n-batches cap ({max_frames} frames) "
                  f"before end of video; omit --n-batches to label the whole recording.")
        emit(labeler.finish())
    dt = time.time() - t0
    if total:
        print(f"Labeled {total} frames in {dt:.2f}s → {total / dt:.1f} frames/sec "
              f"(window {n_frames}, stride {stride}, {window_batch}-window batches)")
    if meter is not None:
        print("metrics:", json.dumps(meter.summary()))
    if out_f:
        out_f.close()


def main(model, weights, video_path, json_path, n_batches, n_frames, out=None,
         out_video=None, strict_resolution=True, stride=None, window_batch=1,
         metrics=False):
    agent_parameters_pair = load_model_parameters(model)
    net_kwargs, pi_head_kwargs = agent_parameters_pair
    agent = IDMAgent(idm_net_kwargs=net_kwargs, pi_head_kwargs=pi_head_kwargs)
    agent.load_weights(weights)

    if stride is not None and stride < n_frames:
        # Streaming mode labels the whole video unless --n-batches was passed
        # explicitly — the visualization default of 10 would silently truncate
        # long recordings at n_batches * n_frames frames.
        json_data = _load_jsonl(json_path) if json_path else None
        max_frames = n_batches * n_frames if n_batches is not None else None
        streaming_main(agent, video_path, json_data, n_frames, stride,
                       window_batch, out=out, max_frames=max_frames,
                       strict_resolution=strict_resolution, metrics=metrics)
        return

    if n_batches is None:
        n_batches = 10  # reference default (run_inverse_dynamics_model.py:200)

    json_data = _load_jsonl(json_path) if json_path else None
    json_index = 0
    out_f = open(out, "w") if out else None
    writer = None
    from vpt_tpu.utils.metrics import AgreementMeter

    meter = AgreementMeter() if (metrics and json_data is not None) else None

    import time

    with VideoReader(video_path) as cap:
        if strict_resolution:
            assert (cap.width, cap.height) == REQUIRED_RESOLUTION, (
                f"Video must be of resolution {REQUIRED_RESOLUTION}"
            )
        total_frames = 0
        t0 = time.time()
        for _ in range(n_batches):
            frames = []
            recorded_actions = []
            for _ in range(n_frames):
                frame = cap.read()
                if frame is None:
                    break
                frames.append(frame)
                if json_data is not None and json_index < len(json_data):
                    env_action, _ = json_action_to_env_action(json_data[json_index])
                    recorded_actions.append(env_action)
                    json_index += 1
            if not frames:
                break
            frames = np.stack(frames)
            print("=== Predicting actions ===")
            predicted_actions = agent.predict_actions(frames)
            total_frames += len(frames)

            for i in range(len(frames)):
                row = action_jsonl_row(
                    {name: arr[0, i] for name, arr in predicted_actions.items()})
                if out_f:
                    out_f.write(json.dumps({"frame": total_frames - len(frames) + i, "action": row}) + "\n")
                if meter is not None and i < len(recorded_actions):
                    meter.add(row, recorded_actions[i])
                if out_video:
                    from vpt_tpu.data.annotate import action_rows, annotate_frame
                    from vpt_tpu.data.video import VideoWriter

                    if writer is None:
                        writer = VideoWriter(out_video, frames.shape[2], frames.shape[1], fps=20)
                    rec = recorded_actions[i] if i < len(recorded_actions) else None
                    pred_i = {k: np.asarray(v[0, i]) for k, v in predicted_actions.items()}
                    writer.write(annotate_frame(frames[i], action_rows(pred_i, rec)))
                if i < 3:  # terminal preview
                    rec = recorded_actions[i] if i < len(recorded_actions) else {}
                    pressed = [k for k, v in row.items() if k != "camera" and v == 1]
                    rec_pressed = [k for k, v in rec.items() if k != "camera" and v == 1]
                    print(
                        f"frame {total_frames - len(frames) + i}: predicted={pressed} "
                        f"camera={np.round(row['camera'], 2)} | recorded={rec_pressed}"
                    )
        dt = time.time() - t0
        if total_frames:
            print(f"Labeled {total_frames} frames in {dt:.2f}s → {total_frames / dt:.1f} frames/sec")
    if meter is not None:
        print("metrics:", json.dumps(meter.summary()))
    if out_f:
        out_f.close()
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    parser = ArgumentParser("Run IDM on MineRL recordings.")

    parser.add_argument("--weights", type=str, required=True, help="Path to the '.weights' file to be loaded.")
    parser.add_argument("--model", type=str, required=True, help="Path to the '.model' file to be loaded.")
    parser.add_argument("--video-path", type=str, required=True, help="Path to a .mp4 file (Minecraft recording).")
    parser.add_argument("--jsonl-path", type=str, required=False, default=None, help="Path to a .jsonl file (Minecraft recording).")
    parser.add_argument("--n-frames", type=int, default=128, help="Number of frames to process at a time.")
    parser.add_argument("--n-batches", type=int, default=None, help="Number of batches (n-frames) to process. Default: 10 for visualization mode, unlimited (whole video) for streaming --stride mode.")
    parser.add_argument("--out", type=str, default=None, help="Write predicted actions to this JSONL file.")
    parser.add_argument("--out-video", type=str, default=None, help="Write an annotated prediction video here.")
    parser.add_argument("--no-strict-resolution", action="store_true", help="Accept videos that are not 640x360.")
    parser.add_argument("--stride", type=int, default=None, help="Slide windows by this many frames (< --n-frames enables overlap-stitched streaming labeling; boundary frames get bidirectional context).")
    parser.add_argument("--window-batch", type=int, default=1, help="Streaming mode: windows labeled per forward (batch axis).")
    parser.add_argument("--metrics", action="store_true",
                        help="With --jsonl-path: print predicted-vs-recorded agreement "
                             "(per-button accuracy, exact-match rate, camera MAE in degrees).")

    args = parser.parse_args()

    main(
        args.model, args.weights, args.video_path, args.jsonl_path,
        args.n_batches, args.n_frames, out=args.out, out_video=args.out_video,
        strict_resolution=not args.no_strict_resolution,
        stride=args.stride, window_batch=args.window_batch, metrics=args.metrics,
    )
