"""Per-HLO device-time profile of a train/serve step on the real chip.

Captures a ``jax.profiler`` device trace of the requested step and converts
it with xprof's ``hlo_stats`` into a ranked table of HLO ops by device self
time, aggregated by category — the measured (not asserted) answer to "where
does the step's time go".  This is the ground-truth companion to the
chain-timed component splits in ``tools/bench_bc_breakdown.py``: those
measure components in isolation (layout/fusion can differ from the real
graph); this measures the real graph.

Usage:
  python tools/profile_hlo.py --step bc [--width 1 --batch 8 --chunk 32]
  python tools/profile_hlo.py --step rollout [--width 2 --streams 64]
  python tools/profile_hlo.py --step idm [--window-batch 8]
  python tools/profile_hlo.py --step bc --top 40        # more rows
  python tools/profile_hlo.py --step bc --json out.json # full dump

Output: one JSON line with {"categories": {...share-of-device-time...},
"top_ops": [...]} — and optionally the full table to --json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(step_fn, warmup: int, iters: int) -> str:
    """Run step_fn under a profiler trace; return the trace directory."""
    import jax

    for _ in range(warmup):
        step_fn()
    tracedir = tempfile.mkdtemp(prefix="vpt_hlo_trace_")
    jax.profiler.start_trace(tracedir)
    for _ in range(iters):
        step_fn()
    jax.profiler.stop_trace()
    return tracedir


def hlo_stats_rows(tracedir: str):
    """Parse the trace's xplane with xprof's hlo_stats converter."""
    from xprof.convert import raw_to_tool_data as r2t

    xs = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"), recursive=True)
    if not xs:
        raise RuntimeError(f"no .xplane.pb under {tracedir}")
    data, _ = r2t.xspace_to_tool_data(xs, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "ignore")
    table = json.loads(data)
    cols = [c["id"] for c in table["cols"]]
    rows = []
    for r in table["rows"]:
        vals = [c.get("v") for c in r["c"]]
        rows.append(dict(zip(cols, vals)))
    return rows


def summarize(rows, top: int):
    """Aggregate device self-time by HLO category; list the top ops."""
    def t(r):
        return float(r.get("total_self_time") or 0.0)

    dev = [r for r in rows if str(r.get("host_or_device", "Device")).lower() != "host"]
    if not dev:
        dev = rows
    total = sum(t(r) for r in dev) or 1.0
    cats = {}
    for r in dev:
        cat = r.get("category") or "?"
        cats[cat] = cats.get(cat, 0.0) + t(r)
    cats = {k: round(v / total, 4) for k, v in
            sorted(cats.items(), key=lambda kv: -kv[1])}
    ops = sorted(dev, key=t, reverse=True)[:top]
    top_ops = [{
        "op": (r.get("hlo_op_name") or r.get("operation") or "?"),
        "category": r.get("category"),
        "self_time_share": round(t(r) / total, 4),
        "self_time_us": round(t(r), 1),
        "bound_by": r.get("bound_by"),
        "hbm_gbps": round(float(r.get("measured_memory_bw") or 0.0), 1),
        "expression": str(r.get("hlo_op_expression") or "")[:160],
    } for r in ops]
    return {"device_total_us": round(total, 1), "categories": cats, "top_ops": top_ops}


def make_bc_step(width: int, batch: int, chunk: int, compute_dtype: str,
                 pool_impl: str):
    import jax
    import numpy as np

    from vpt_tpu.config import FOUNDATION_POLICY_KWARGS
    from vpt_tpu.parallel.mesh import make_mesh
    from vpt_tpu.training.bc import BCHyperparams, BCTrainer

    kwargs = dict(FOUNDATION_POLICY_KWARGS, hidsize=1024 * width,
                  impala_width=4 * width, pool_impl=pool_impl)
    hp = BCHyperparams(batch_size=batch, chunk_len=chunk)
    small = batch * chunk * width <= 1024
    trainer = BCTrainer(kwargs, {"temperature": 2.0}, hp=hp, mesh=make_mesh(),
                        compute_dtype=compute_dtype, remat=not small,
                        cnn_scan_chunks=0 if small else 8)
    trainer.init()
    rng = np.random.default_rng(0)
    b = {
        "frames": rng.integers(0, 255, (batch, chunk, 128, 128, 3), dtype=np.uint8),
        "buttons": rng.integers(0, 8641, (batch, chunk)).astype(np.int32),
        "camera": rng.integers(0, 121, (batch, chunk)).astype(np.int32),
        "firsts": np.zeros((batch, chunk), bool),
        "mask": np.ones((batch, chunk), bool),
    }
    placed = jax.device_put(b)
    state = {"s": trainer.initial_state(batch)}

    def step():
        state["s"], loss, _ = trainer.train_step(placed, state["s"])
        np.asarray(loss)  # the tunneled platform needs a real D2H to wait

    return step


def make_rollout_step(width: int, streams: int, compute_dtype: str,
                      pool_impl: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vpt_tpu.actions.mapping import CameraHierarchicalMapping
    from vpt_tpu.config import FOUNDATION_POLICY_KWARGS, PolicyConfig
    from vpt_tpu.models.heads import dict_sample, head_specs_from_space
    from vpt_tpu.models.policy import MinecraftAgentPolicy, policy_initial_state
    from vpt_tpu.spaces import DictType

    cfg = PolicyConfig.from_kwargs(FOUNDATION_POLICY_KWARGS).replace(
        compute_dtype=compute_dtype, hidsize=1024 * width,
        impala_width=4 * width, pool_impl=pool_impl)
    mapper = CameraHierarchicalMapping(n_camera_bins=11)
    specs = head_specs_from_space(DictType(**mapper.get_action_space_update()))
    model = MinecraftAgentPolicy(cfg=cfg, head_specs=specs, temperature=2.0)
    img = jnp.zeros((streams, 1, 128, 128, 3), jnp.uint8)
    first = jnp.zeros((streams, 1), bool)
    state0 = policy_initial_state(cfg, streams, ring=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, first, state0)

    from functools import partial

    # donate the state like the serving/bench paths do (agent/agent.py:231)
    @partial(jax.jit, donate_argnums=(3,))
    def fn(variables, img, first, state, key):
        out, state = model.apply(variables, img, first, state)
        logits = jax.tree.map(lambda x: x[:, -1], out["pi_logits"])
        key, sub = jax.random.split(key)
        return dict_sample(sub, logits, specs), state, key

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (streams, 1, 128, 128, 3), dtype=np.uint8))
    ctx = {"state": state0, "key": jax.random.PRNGKey(1)}

    def step():
        action, ctx["state"], ctx["key"] = fn(variables, frame, first,
                                              ctx["state"], ctx["key"])
        np.asarray(action["buttons"])

    return step


def make_idm_step(window_batch: int, compute_dtype: str, pool_impl: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import IDM_4X_KWARGS
    from vpt_tpu.actions.mapping import IDMActionMapping
    from vpt_tpu.config import PolicyConfig
    from vpt_tpu.models.heads import head_specs_from_space
    from vpt_tpu.models.policy import InverseActionPolicy, policy_initial_state
    from vpt_tpu.spaces import DictType

    cfg = PolicyConfig.from_kwargs(IDM_4X_KWARGS).replace(
        compute_dtype=compute_dtype, pool_impl=pool_impl)
    mapper = IDMActionMapping(n_camera_bins=11)
    specs = head_specs_from_space(DictType(**mapper.get_action_space_update()))
    model = InverseActionPolicy(cfg=cfg, head_specs=specs, temperature=1.0)
    wb, window = window_batch, 128
    img = jnp.zeros((wb, window, 128, 128, 3), jnp.uint8)
    first = jnp.zeros((wb, window), bool)
    state = policy_initial_state(cfg, wb)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, first, state)

    @jax.jit
    def fn(variables, img, first, state):
        out, _ = model.apply(variables, img, first, state)
        return jax.tree.map(lambda x: jnp.argmax(x, -1), out["pi_logits"])

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (wb, window, 128, 128, 3), dtype=np.uint8))

    def step():
        acts = fn(variables, frame, first, state)
        np.asarray(acts["buttons"])

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", default="bc", choices=["bc", "rollout", "idm"])
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--window-batch", type=int, default=8)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--pool-impl", default="xla")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json", default=None, help="dump the full row table here")
    args = ap.parse_args()

    if args.step == "bc":
        step = make_bc_step(args.width or 1, args.batch, args.chunk,
                            args.compute_dtype, args.pool_impl)
    elif args.step == "rollout":
        step = make_rollout_step(args.width or 2, args.streams,
                                 args.compute_dtype, args.pool_impl)
    else:
        step = make_idm_step(args.window_batch, args.compute_dtype,
                             args.pool_impl)

    tracedir = capture(step, args.warmup, args.iters)
    rows = hlo_stats_rows(tracedir)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    out = summarize(rows, args.top)
    out["step"] = args.step
    out["geometry"] = {k: getattr(args, k) for k in
                       ("width", "batch", "chunk", "streams", "window_batch",
                        "compute_dtype", "pool_impl")}
    out["trace_dir"] = tracedir
    print(json.dumps(out))


if __name__ == "__main__":
    main()
