"""Contractor-data pipeline: mp4 + jsonl → training batches.

Reproduces every fixup branch of the reference loader (data_loader.py:48-128):

  * stuck-attack detection (recordings that start with attack held down);
  * scroll-wheel hotbar tracking (hotbar changes not captured as key presses);
  * jsonl step → env action (vpt_tpu.actions.json_actions);
  * null-action skipping (as in the VPT paper);
  * cursor compositing onto GUI frames at the recorded mouse position;
  * resize to the agent resolution (cv2-bit-exact fixed point, native C++).

Two batch geometries:

  * ``DataLoader`` — the reference's single-step round-robin batches
    ``(frames, env_actions, episode_ids)`` (data_loader.py:130-222), for the
    loss-parity compatibility mode;
  * ``SequenceDataLoader`` — the TPU-native geometry: B parallel streams each
    yielding contiguous T-step windows ``(frames (B,T,H,W,3), buttons (B,T),
    camera (B,T), firsts (B,T), mask (B,T))`` with actions already factored
    into the joint categorical space.  This matches the training geometry the
    architecture was built for (timesteps=128) and feeds pjit'd training
    directly — the capability upgrade the reference's docstring gestures at
    (data_loader.py:130-144).

Host parallelism: N worker processes, each owning whole trajectories (decode +
fixups + resize in the worker), bounded queues, quit event — the same process
architecture as the reference, with the native decoder instead of cv2.

NOTE: workers use the multiprocessing *forkserver* context (JAX parents are
multi-threaded; a direct fork would risk deadlocks — workers fork from a
clean server process instead, falling back to *spawn* where forkserver is
unavailable).  Under the spawn fallback the program that constructs a loader
must be importable — a script with the usual ``if __name__ == "__main__"``
guard, not a bare REPL/stdin session.  The forkserver (and its workers')
environment snapshots at the FIRST loader construction in a process; set
``VPT_QUEUE_TIMEOUT`` etc. before that.
"""

from __future__ import annotations

import glob
import json
import os
import queue as queue_mod
import random
import multiprocessing

# NOT fork: parents import JAX, which is multi-threaded, and forking a
# threaded process risks deadlocks in workers.  forkserver gives the same
# safety (workers fork from a clean, thread-free server process, started
# lazily at the first Process.start() under _start_host_workers' stripped
# env) without spawn's per-worker interpreter+import cost (~0.3 s/worker
# bare, ~2.0 s under a sitecustomize that bootstraps jax — serialized on
# few-core hosts).  The preload puts this module (and numpy) in the server
# once so each worker forks ready-to-run.
try:
    _mp = multiprocessing.get_context("forkserver")
    _mp.set_forkserver_preload(["vpt_tpu.data.loader"])
except ValueError:  # platform without forkserver
    _mp = multiprocessing.get_context("spawn")
Event, Process, Queue = _mp.Event, _mp.Process, _mp.Queue
from typing import Dict, List, Optional, Tuple

import numpy as np

from vpt_tpu.actions.buttons import Buttons
from vpt_tpu.actions.json_actions import json_action_to_env_action
from vpt_tpu.actions.mapping import CameraHierarchicalMapping
from vpt_tpu.actions.transformer import ActionTransformer
from vpt_tpu.config import ACTION_TRANSFORMER_KWARGS, AGENT_RESOLUTION
from vpt_tpu.data.cursor import default_cursor

# seconds a queue get/put may wait; override for slow/contended hosts
QUEUE_TIMEOUT = float(os.environ.get("VPT_QUEUE_TIMEOUT", 10))

# Env vars that make a child interpreter bootstrap an accelerator runtime via
# site hooks (this image's sitecustomize imports jax into EVERY python process
# when PALLAS_AXON_POOL_IPS is set — measured 2.0 s/worker vs 0.3 s without,
# serialized on few-core hosts).  Data workers are pure host code (numpy +
# ffmpeg); strip the triggers so spawn gives them a plain interpreter.
# VPT_WORKER_KEEP_ENV=1 disables the stripping.
_WORKER_STRIP_ENV = ("PALLAS_AXON_POOL_IPS",)


def _start_host_workers(processes) -> None:
    """Start pure-host worker processes with accelerator bootstrap hooks
    stripped from the environment they inherit (the forkserver — or each
    spawn child — snapshots os.environ at ``start()``; restored immediately
    after).  Keeping the hooks out of the forkserver also keeps it
    thread-free, which is what makes forking workers from it safe."""
    saved = {}
    if not os.environ.get("VPT_WORKER_KEEP_ENV"):
        for k in _WORKER_STRIP_ENV:
            if k in os.environ:
                saved[k] = os.environ.pop(k)
    try:
        for p in processes:
            p.start()
    finally:
        os.environ.update(saved)

MINEREC_ORIGINAL_HEIGHT_PX = 720  # reference: data_loader.py:21

# GUI-open mouse-delta scalers per recorder version (reference:
# data_loader.py:25-31).  NOTE: the reference *defines* these but never applies
# them in its shipped worker; we keep the same default (off) and expose
# ``apply_version_scalers`` for pipelines that want the documented behavior.
MINEREC_VERSION_SPECIFIC_SCALERS = {
    "5.7": 0.5,
    "5.8": 0.5,
    "6.7": 2.0,
    "6.8": 2.0,
    "6.9": 2.0,
}



def _load_jsonl(json_path: str):
    with open(json_path) as f:
        lines = f.readlines()
    return json.loads("[" + ",".join(lines) + "]")


def trajectory_steps(
    video_path: str,
    json_path: str,
    resolution: Tuple[int, int] = AGENT_RESOLUTION,
    cursor=None,
    apply_version_scalers: bool = False,
    quit_event=None,
    skip_steps: int = 0,
    batch_frames: int = 64,
):
    """Generator of (frame_128 uint8 RGB, env_action) for one recording,
    with all reference fixups applied and null actions skipped.

    Two phases per trajectory: the sequential action fixups run first (pure
    host math over the jsonl), then the pixel path — decode, cursor
    composite, bit-exact resize — runs in the native library in
    ``batch_frames``-frame batches (one C call each; see
    vpt_host.cpp:vpt_video_read_batch), eliminating per-frame Python/ctypes
    overhead on the loader's hot path.

    ``skip_steps`` fast-forwards past the first N *non-null* steps without
    yielding them (mid-trajectory resume): the sequential fixup state
    (stuck-attack, hotbar) still advances and every frame is still decoded to
    keep video/jsonl in step, but cursor compositing and resize are skipped.
    """
    from vpt_tpu.data.video import VideoReader

    cursor_rgb, cursor_alpha = cursor if cursor is not None else default_cursor()
    json_data = _load_jsonl(json_path)

    video = VideoReader(video_path)
    try:
        # ---- phase 1: sequential action fixups (no pixels) ----------------
        attack_is_stuck = False
        last_hotbar = 0
        emitted = 0
        scale = video.height / MINEREC_ORIGINAL_HEIGHT_PX
        steps = []  # (env_action, emit, cursor_xy or None)
        for i, step_data in enumerate(json_data):
            if i == 0:
                # the recording may start with attack already held down, stuck
                # until the player actually presses it (reference:
                # data_loader.py:64-69)
                if step_data["mouse"]["newButtons"] == [0]:
                    attack_is_stuck = True
            elif attack_is_stuck:
                if 0 in step_data["mouse"]["newButtons"]:
                    attack_is_stuck = False
            if attack_is_stuck:
                step_data["mouse"]["buttons"] = [b for b in step_data["mouse"]["buttons"] if b != 0]

            if apply_version_scalers and step_data.get("isGuiOpen", False):
                scaler = MINEREC_VERSION_SPECIFIC_SCALERS.get(
                    str(step_data.get("dataVersion", "1")), 1.0
                )
                if scaler != 1.0:
                    step_data["mouse"]["dx"] *= scaler
                    step_data["mouse"]["dy"] *= scaler

            action, is_null_action = json_action_to_env_action(step_data)

            # scroll-wheel hotbar switches aren't recorded as key presses
            # (reference: data_loader.py:99-103)
            current_hotbar = step_data["hotbar"]
            if current_hotbar != last_hotbar:
                action[f"hotbar.{current_hotbar + 1}"] = 1
            last_hotbar = current_hotbar

            emit = False
            if not is_null_action:
                emit = emitted >= skip_steps
                emitted += 1
            xy = None
            if emit and step_data.get("isGuiOpen", False):
                xy = (int(step_data["mouse"]["x"] * scale),
                      int(step_data["mouse"]["y"] * scale))
            steps.append((action, emit, xy))

        # ---- phase 2: batched native decode + composite + resize ----------
        yield from _emit_resized_frames(
            video, steps, resolution, (cursor_rgb, cursor_alpha),
            quit_event, batch_frames, video_path,
        )
    finally:
        video.close()


def _emit_resized_frames(video, steps, resolution, cursor, quit_event,
                         batch_frames, video_path):
    """Shared pixel phase: run ``(action, emit, cursor_xy)`` step plans
    through the native batched decode → cursor composite → bit-exact resize
    path, yielding ``(frame, action)`` for the emitting steps."""
    from vpt_tpu.data.video import VideoReader

    pos = 0
    while pos < len(steps):
        if quit_event is not None and quit_event.is_set():
            break
        chunk = steps[pos:pos + batch_frames]
        k = len(chunk)
        emit_mask = np.fromiter((s[1] for s in chunk), np.uint8, k)
        xy = np.full((k, 2), VideoReader.CURSOR_NONE, np.int32)
        for j, (_, _, cxy) in enumerate(chunk):
            if cxy is not None:
                xy[j] = cxy
        got, frames = video.read_batch(
            k, resolution, emit=emit_mask, cursor_xy=xy, cursor=cursor,
        )
        for j in range(got):
            if chunk[j][1]:
                yield frames[j], chunk[j][0]
        if got < k:
            # video shorter than the jsonl (same condition the per-frame
            # path reported per step, reference data_loader.py:122-123)
            print(f"Could not read frame from video {video_path}")
            break
        pos += got


def _is_pseudo_label_file(json_path: str) -> bool:
    """True for IDM pseudo-label jsonl (rows ``{"frame": i, "action": {...}}``
    from ``tools/label_videos.py`` / ``run_inverse_dynamics_model.py --out``),
    False for recorder-format contractor jsonl."""
    with open(json_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            return "action" in row and "frame" in row
    return False


def pseudo_label_steps(
    video_path: str,
    json_path: str,
    resolution: Tuple[int, int] = AGENT_RESOLUTION,
    cursor=None,
    quit_event=None,
    skip_steps: int = 0,
    batch_frames: int = 64,
):
    """Generator of (frame, env_action) for an IDM-PSEUDO-LABELED recording —
    the web-video half of the VPT recipe (paper §4: train BC on IDM labels).

    Rows are ``{"frame": i, "action": {<env action>}}`` — already env
    actions, so none of the recorder fixups apply (no stuck-attack, no hotbar
    tracking, no GUI cursor compositing; the IDM never predicts GUI state).
    Null actions are skipped exactly as the contractor path skips them
    (reference data_loader.py:109-111): all buttons 0 and zero camera — the
    IDM's center camera bin decodes to exactly 0.0, so the test is exact.
    Frames without a label row are decoded (to stay in step) but not emitted.

    Same contract as :func:`trajectory_steps` (``skip_steps`` counts non-null
    steps; pixel path is the shared batched native call), so the sequence
    loader's chunking/resume machinery applies unchanged.
    """
    from vpt_tpu.data.video import VideoReader

    by_frame = {}
    max_frame = -1
    for row in _load_jsonl(json_path):
        i = int(row["frame"])
        by_frame[i] = row["action"]
        max_frame = max(max_frame, i)

    video = VideoReader(video_path)
    try:
        steps = []  # (env_action, emit, None) — no cursor compositing
        emitted = 0
        for i in range(max_frame + 1):
            raw = by_frame.get(i)
            if raw is None:
                steps.append((None, False, None))
                continue
            action = {}
            is_null = True
            for k, v in raw.items():
                if k == "camera":
                    cam = np.asarray(v, np.float32).reshape(2)
                    action[k] = cam
                    is_null = is_null and bool(np.all(cam == 0.0))
                else:
                    b = int(np.asarray(v).reshape(-1)[0])
                    action[k] = b
                    is_null = is_null and b == 0
            emit = False
            if not is_null:
                emit = emitted >= skip_steps
                emitted += 1
            steps.append((action, emit, None))
        yield from _emit_resized_frames(
            video, steps, resolution, cursor if cursor is not None else default_cursor(),
            quit_event, batch_frames, video_path,
        )
    finally:
        video.close()


def steps_for(video_path: str, json_path: str, **kw):
    """Dispatch a recording to the right step generator by jsonl format:
    recorder-format contractor data through :func:`trajectory_steps` (all
    fixups), IDM pseudo-labels through :func:`pseudo_label_steps`.  Lets one
    corpus mix contractor and pseudo-labeled trajectories."""
    if _is_pseudo_label_file(json_path):
        return pseudo_label_steps(video_path, json_path, **kw)
    return trajectory_steps(video_path, json_path, **kw)


def _discover(dataset_dir: str, labels_dir: Optional[str] = None) -> List[Tuple[str, str]]:
    """Pair each ``*.mp4`` with its jsonl — from ``labels_dir`` when given
    (the pseudo-label layout ``tools/label_videos.py --out-dir`` writes:
    videos in one tree, ``<id>.jsonl`` labels in another), else side-by-side
    (the contractor layout).  With ``labels_dir``, videos not yet labeled are
    skipped with a notice, so training can run on a partially-labeled corpus."""
    unique_ids = sorted(
        {os.path.basename(x).split(".")[0] for x in glob.glob(os.path.join(dataset_dir, "*.mp4"))}
    )
    if labels_dir is None:
        return [
            (
                os.path.abspath(os.path.join(dataset_dir, uid + ".mp4")),
                os.path.abspath(os.path.join(dataset_dir, uid + ".jsonl")),
            )
            for uid in unique_ids
        ]
    pairs, missing = [], 0
    for uid in unique_ids:
        jp = os.path.abspath(os.path.join(labels_dir, uid + ".jsonl"))
        if os.path.exists(jp):
            pairs.append((os.path.abspath(os.path.join(dataset_dir, uid + ".mp4")), jp))
        else:
            missing += 1
    if missing:
        print(
            f"[vpt_tpu] {missing}/{len(unique_ids)} videos in {dataset_dir} have "
            f"no label file in {labels_dir}; skipped"
        )
    return pairs


# ---------------------------------------------------------------------------
# Reference-compatible single-step loader
# ---------------------------------------------------------------------------


def _step_worker(tasks_queue, output_queue, quit_event):
    cursor = default_cursor()
    while True:
        task = tasks_queue.get()
        if task is None:
            break
        trajectory_id, video_path, json_path = task
        try:
            for frame, action in trajectory_steps(
                video_path, json_path, cursor=cursor, quit_event=quit_event
            ):
                if not _robust_put(output_queue, (trajectory_id, frame, action), quit_event):
                    return
        except Exception as e:  # unreadable recording: report and move on
            print(f"Error in trajectory {video_path}: {e!r}")
        if quit_event.is_set():
            break
    output_queue.put(None)


class DataLoader:
    """Single-step batches, one sample per worker round-robin (reference:
    data_loader.py:130-222).  Yields (frames, env_actions, episode_ids)."""

    def __init__(self, dataset_dir, n_workers=8, batch_size=8, n_epochs=1, max_queue_size=16,
                 seed: Optional[int] = None):
        assert n_workers >= batch_size, "Number of workers must be equal or greater than batch size"
        self.n_workers = n_workers
        self.batch_size = batch_size
        demonstration_tuples = _discover(dataset_dir)
        assert n_workers <= len(demonstration_tuples), (
            f"n_workers should be lower or equal than number of demonstrations {len(demonstration_tuples)}"
        )
        rng = random.Random(seed)
        self.demonstration_tuples = []
        for _ in range(n_epochs):
            shuffled = list(demonstration_tuples)
            rng.shuffle(shuffled)
            self.demonstration_tuples += shuffled

        # Per-worker task queues with round-robin assignment: a shared queue
        # (as in the reference) lets a fast-starting worker drain every task
        # before its siblings spawn, making an idle sibling end the epoch
        # immediately.  Deterministic assignment keeps per-worker
        # whole-trajectory ownership without that race.
        self.task_queues = [Queue() for _ in range(n_workers)]
        self.n_steps_processed = 0
        for trajectory_id, task in enumerate(self.demonstration_tuples):
            self.task_queues[trajectory_id % n_workers].put((trajectory_id, *task))
        for q in self.task_queues:
            q.put(None)

        self.output_queues = [Queue(maxsize=max_queue_size) for _ in range(n_workers)]
        self.quit_workers_event = Event()
        self.processes = [
            Process(
                target=_step_worker,
                args=(tq, q, self.quit_workers_event),
                daemon=True,
            )
            for tq, q in zip(self.task_queues, self.output_queues)
        ]
        _start_host_workers(self.processes)

    def __iter__(self):
        return self

    def __next__(self):
        batch_frames, batch_actions, batch_episode_id = [], [], []
        for _ in range(self.batch_size):
            qi = self.n_steps_processed % self.n_workers
            try:
                workitem = self.output_queues[qi].get(timeout=QUEUE_TIMEOUT)
            except queue_mod.Empty:
                if not self.processes[qi].is_alive():
                    raise RuntimeError(
                        f"data worker {qi} died (exitcode {self.processes[qi].exitcode}); "
                        "check worker stderr above"
                    ) from None
                raise RuntimeError(
                    f"data worker {qi} produced nothing within {QUEUE_TIMEOUT}s "
                    "(slow decode or starved host); raise VPT_QUEUE_TIMEOUT if expected"
                ) from None
            if workitem is None:
                # first exhausted worker ends the stream, keeping batches
                # diverse (reference: data_loader.py:204-211)
                raise StopIteration()
            trajectory_id, frame, action = workitem
            batch_frames.append(frame)
            batch_actions.append(action)
            batch_episode_id.append(trajectory_id)
            self.n_steps_processed += 1
        return batch_frames, batch_actions, batch_episode_id

    def close(self):
        self.quit_workers_event.set()
        for p in self.processes:
            p.terminate()
            p.join()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# TPU-native sequence-chunked loader
# ---------------------------------------------------------------------------


def _robust_put(q, item, quit_event) -> bool:
    """Put that survives consumer pauses (e.g. a long orbax checkpoint save
    blocking the training loop): retry until the quit event fires.  Returns
    False when the consumer is shutting down."""
    while True:
        try:
            q.put(item, timeout=1.0)
            return True
        except queue_mod.Full:
            if quit_event.is_set():
                return False


def _factor_actions(transformer, mapper, acts) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized env→joint factoring over a whole chunk: ONE
    env2policy + from_factored call for T steps (both are (B,)-batched
    numpy) instead of T single-step calls with per-frame dict churn —
    measured ~15% of sequence-worker time at chunk_len=32."""
    T = len(acts)
    env_batch = {"camera": np.stack([np.asarray(a["camera"]) for a in acts])}
    for k in Buttons.ALL:
        env_batch[k] = np.fromiter((a.get(k, 0) for a in acts), np.int64, T)
    joint = mapper.from_factored(transformer.env2policy(env_batch))
    return (joint["buttons"][:, 0].astype(np.int32),
            joint["camera"][:, 0].astype(np.int32))


def _sequence_worker(tasks_queue, output_queue, quit_event, chunk_len, resolution):
    """Emits fixed-length windows of consecutive (non-null) steps with actions
    already factored into the joint categorical space.

    Tasks are ``(trajectory_id, video_path, json_path, skip_chunks)``; a
    non-zero skip fast-forwards a resumed trajectory to its first unconsumed
    chunk.  Emitted items carry the global chunk index within the trajectory
    so the consumer's resume cursor is exact.
    """
    cursor = default_cursor()
    mapper = CameraHierarchicalMapping(n_camera_bins=11)
    transformer = ActionTransformer(**ACTION_TRANSFORMER_KWARGS)
    while True:
        task = tasks_queue.get()
        if task is None:
            break
        trajectory_id, video_path, json_path, skip_chunks = task
        frames, acts = [], []
        chunk_index = skip_chunks
        try:
            for frame, action in steps_for(
                video_path,
                json_path,
                resolution=resolution,
                cursor=cursor,
                quit_event=quit_event,
                skip_steps=skip_chunks * chunk_len,
            ):
                frames.append(frame)
                acts.append(action)
                if len(frames) == chunk_len:
                    buttons, cameras = _factor_actions(transformer, mapper, acts)
                    item = (
                        trajectory_id,
                        np.stack(frames),
                        buttons,
                        cameras,
                        # first_of_chunk: episode start, OR the first chunk a
                        # RESUMED stream emits — the consumer restarts from a
                        # fresh recurrent state either way, so the loader's
                        # firsts contract must request the attention reset
                        chunk_index == skip_chunks,
                        chunk_len,
                        chunk_index,
                    )
                    if not _robust_put(output_queue, item, quit_event):
                        return
                    frames, acts = [], []
                    chunk_index += 1
        except Exception as e:
            print(f"Error in trajectory {video_path}: {e!r}")
        # trailing partial chunk, zero-padded with a validity count
        if frames and not quit_event.is_set():
            n = len(frames)
            pad = chunk_len - n
            real_buttons, real_cameras = _factor_actions(transformer, mapper, acts)
            buttons = np.pad(real_buttons, (0, pad))
            cameras = np.pad(real_cameras, (0, pad))
            frames += [np.zeros_like(frames[0])] * pad
            _robust_put(
                output_queue,
                (
                    trajectory_id,
                    np.stack(frames),
                    np.asarray(buttons, np.int32),
                    np.asarray(cameras, np.int32),
                    chunk_index == skip_chunks,
                    n,
                    chunk_index,
                ),
                quit_event,
            )
        if quit_event.is_set():
            break
    output_queue.put(None)


class SequenceDataLoader:
    """B parallel streams of T-step windows for sequence-chunked BC.

    Yields dict batches:
      frames  (B, T, H, W, 3) uint8
      buttons (B, T) int32   — joint 8641-way indices
      camera  (B, T) int32   — joint 121-way indices
      firsts  (B, T) bool    — True at step 0 of a stream's new episode
      mask    (B, T) bool    — False on zero-padded tail steps
      episode_ids (B,) int64

    Stream i draws from worker i; when a worker finishes a trajectory it picks
    up the next task, so streams stay independent episodes like the
    reference's per-worker trajectories.
    """

    def __init__(
        self,
        dataset_dir,
        batch_size=8,
        chunk_len=128,
        n_epochs=1,
        max_queue_size=8,
        resolution: Tuple[int, int] = AGENT_RESOLUTION,
        seed: Optional[int] = None,
        start_trajectory: int = 0,
        resume_state: Optional[Dict] = None,
        shard_id: int = 0,
        num_shards: int = 1,
        labels_dir: Optional[str] = None,
    ):
        """``resume_state`` is a dict previously returned by :meth:`state`;
        when given, each stream fast-forwards to exactly its first unconsumed
        chunk — no frames skipped, none repeated.  ``start_trajectory`` is the
        coarser legacy cursor (whole-trajectory granularity).

        ``shard_id``/``num_shards`` split the GLOBAL stream grid across hosts
        for multi-process training: the global batch has ``batch_size ×
        num_shards`` streams, this loader serves the ``batch_size`` local
        streams of shard ``shard_id``, and trajectory ownership is computed
        on global stream indices — so the shards are disjoint, cover exactly
        what one unsharded loader with the global batch would, and stream g's
        data is identical either way (same ``seed`` required on every host).

        ``labels_dir`` points at IDM pseudo-label jsonl living apart from the
        videos (tools/label_videos.py layout); per-trajectory jsonl format is
        auto-detected either way (:func:`steps_for`), so contractor and
        pseudo-labeled recordings can mix in one corpus."""
        assert 0 <= shard_id < num_shards, (shard_id, num_shards)
        demonstration_tuples = _discover(dataset_dir, labels_dir)
        global_streams = batch_size * num_shards
        assert global_streams <= len(demonstration_tuples), (
            f"global stream count {global_streams} (batch_size {batch_size} × "
            f"num_shards {num_shards}) should be <= number of demonstrations "
            f"{len(demonstration_tuples)}"
        )
        rng = random.Random(seed)
        self.demonstration_tuples = []
        for _ in range(n_epochs):
            shuffled = list(demonstration_tuples)
            rng.shuffle(shuffled)
            self.demonstration_tuples += shuffled
        self.chunk_len = chunk_len
        self.batch_size = batch_size
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.n_trajectories_dispatched = start_trajectory

        # Global stream g owns trajectory list positions ≡ g (mod G) — the
        # fixed round-robin makes per-stream resume cursors well-defined and
        # makes S shards of B streams read exactly what one S·B-stream loader
        # would.  Local stream i here is global stream shard_id·B + i.
        streams = None
        if resume_state and resume_state.get("streams"):
            streams = resume_state["streams"]
            saved_shard = resume_state.get("shard", [0, 1])
            if len(streams) != batch_size or list(saved_shard) != [shard_id, num_shards]:
                # checkpoint written under a different stream geometry: the
                # per-stream cursor is meaningless, fall back to the coarse
                # whole-trajectory cursor instead of refusing to resume
                print(
                    f"[vpt_tpu] resume: stream cursor ({len(streams)} streams, "
                    f"shard {saved_shard}) does not match batch_size={batch_size} "
                    f"shard=[{shard_id}, {num_shards}]; using the coarse trajectory cursor"
                )
                streams = None
        self.task_queues = [Queue() for _ in range(batch_size)]
        n_total = len(self.demonstration_tuples)
        for i in range(batch_size):
            g = shard_id * batch_size + i
            first_pos, skip_chunks = g, 0
            if streams is not None:
                traj, chunks = int(streams[i][0]), int(streams[i][1])
                if traj >= 0:
                    first_pos, skip_chunks = traj, chunks
            elif start_trajectory:
                # legacy coarse cursor: first owned position ≥ start_trajectory
                first_pos = g + ((max(start_trajectory - g, 0) + global_streams - 1) // global_streams) * global_streams
            for pos in range(first_pos, n_total, global_streams):
                self.task_queues[i].put(
                    (pos, *self.demonstration_tuples[pos], skip_chunks if pos == first_pos else 0)
                )
        for q in self.task_queues:
            q.put(None)

        self.output_queues = [Queue(maxsize=max_queue_size) for _ in range(batch_size)]
        self.quit_workers_event = Event()
        self.processes = [
            Process(
                target=_sequence_worker,
                args=(tq, q, self.quit_workers_event, chunk_len, resolution),
                daemon=True,
            )
            for tq, q in zip(self.task_queues, self.output_queues)
        ]
        _start_host_workers(self.processes)
        self._last_episode = [None] * batch_size
        self._done = [False] * batch_size
        # per-stream consumed cursor: (trajectory position, chunks consumed)
        self._stream_cursor = [
            (int(s[0]), int(s[1])) if streams is not None and int(s[0]) >= 0 else (-1, 0)
            for s in (streams or [(-1, 0)] * batch_size)
        ]

    def state(self) -> Dict:
        """Exact resume cursor: per-stream (trajectory position, chunks
        consumed), plus the coarse dispatched count for observability.
        Feed back via ``resume_state=`` to continue with no skip/repeat."""
        return {
            "n_trajectories_dispatched": self.n_trajectories_dispatched,
            "streams": [list(c) for c in self._stream_cursor],
            "shard": [self.shard_id, self.num_shards],
        }

    def __iter__(self):
        return self

    def __next__(self):
        out_frames, out_buttons, out_camera = [], [], []
        out_firsts, out_mask, out_ids = [], [], []
        for i in range(self.batch_size):
            if self._done[i]:
                raise StopIteration()
            try:
                item = self.output_queues[i].get(timeout=QUEUE_TIMEOUT)
            except queue_mod.Empty:
                if not self.processes[i].is_alive():
                    raise RuntimeError(
                        f"data worker {i} died (exitcode {self.processes[i].exitcode}); "
                        "check worker stderr above"
                    ) from None
                raise RuntimeError(
                    f"data worker {i} is alive but produced no chunk within "
                    f"{QUEUE_TIMEOUT}s — on a starved host (first jit compiles "
                    "competing for cores) raise VPT_QUEUE_TIMEOUT"
                ) from None
            if item is None:
                self._done[i] = True
                raise StopIteration()
            trajectory_id, frames, buttons, cameras, first_of_chunk, n_valid, chunk_index = item
            if trajectory_id != self._last_episode[i]:
                self._last_episode[i] = trajectory_id
                self.n_trajectories_dispatched = max(
                    self.n_trajectories_dispatched, trajectory_id + 1
                )
            self._stream_cursor[i] = (trajectory_id, chunk_index + 1)
            T = self.chunk_len
            firsts = np.zeros(T, bool)
            firsts[0] = first_of_chunk
            mask = np.arange(T) < n_valid
            out_frames.append(frames)
            out_buttons.append(buttons)
            out_camera.append(cameras)
            out_firsts.append(firsts)
            out_mask.append(mask)
            out_ids.append(trajectory_id)
        return {
            "frames": np.stack(out_frames),
            "buttons": np.stack(out_buttons),
            "camera": np.stack(out_camera),
            "firsts": np.stack(out_firsts),
            "mask": np.stack(out_mask),
            "episode_ids": np.asarray(out_ids, np.int64),
        }

    def close(self):
        self.quit_workers_event.set()
        for p in self.processes:
            p.terminate()
            p.join()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
