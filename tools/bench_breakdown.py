"""Component-level timing breakdown of the rollout step on the real chip.

Times the three pieces of the t=1 policy step (CNN trunk, transformer stack,
output tail) independently via scan-chained device loops, so the axon tunnel's
async-dispatch timing trap can't lie (see BENCH notes: block_until_ready does
not wait on this platform; only a dependent D2H transfer does).

Usage:  python tools/bench_breakdown.py [--width 2] [--streams 64] [--iters 50]

Prints a JSON dict of per-component milliseconds per step plus hand-counted
GFLOPs and implied MXU utilization against the measured chip ceiling.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(make_body, carry0, consts, iters: int, warmup: int = 2):
    """Time `iters` sequential applications of a body on-device.

    `make_body(carry, consts) -> carry` must thread a real data dependence
    through the carry so XLA cannot CSE or hoist iterations out of the scan.
    `consts` (e.g. model variables) are passed as jit arguments — closing over
    them would embed them as HLO literals and blow the tunnel's compile-request
    size limit.  Returns seconds per iteration.
    """
    import jax

    @jax.jit
    def chained(carry, consts):
        def body(c, _):
            return make_body(c, consts), None

        c, _ = jax.lax.scan(body, carry, None, length=iters)
        return c

    out = chained(carry0, consts)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # compile + force
    for _ in range(warmup - 1):
        out = chained(carry0, consts)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = chained(carry0, consts)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def conv_gflops(width: int, streams: int) -> dict:
    """Hand-counted FLOPs per step (64 streams, t=1) for the Impala trunk.

    Channel layout: ImpalaCNN stack c = impala_width * impala_chans[i]
    (config.py / models/impala.py) and main() builds impala_width=4*width
    with the foundation impala_chans (16, 32, 32) — so (64w, 128w, 128w).
    """
    chans = [4 * width * c for c in (16, 32, 32)]
    hw = [128, 64, 32]  # input spatial dim of each stack
    total = 0.0
    cin = 3
    for c, s in zip(chans, hw):
        total += 2 * 9 * cin * c * s * s          # firstconv (stride 1, pre-pool)
        half = (s + 1) // 2
        total += 4 * 2 * 9 * c * c * half * half  # 2 residual blocks × 2 convs
        cin = c
    total += 2 * (chans[-1] * 16 * 16) * 256      # dense to outsize 256
    total += 2 * 256 * 1024 * width               # linear to hidsize
    return {"gflops_per_frame": total / 1e9, "gflops_per_step": total * streams / 1e9}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=2)
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vpt_tpu.actions.mapping import CameraHierarchicalMapping
    from vpt_tpu.config import FOUNDATION_POLICY_KWARGS, PolicyConfig
    from vpt_tpu.models.heads import DictActionHead, ScaledMSEHead, dict_sample, head_specs_from_space
    from vpt_tpu.models.layers import FanInInitLayer, LayerNorm
    from vpt_tpu.models.policy import ImgObsProcess, ImgPreprocessing, policy_initial_state
    from vpt_tpu.models.transformer import ResidualRecurrentBlocks
    from vpt_tpu.spaces import DictType
    import flax.linen as nn

    cfg = PolicyConfig.from_kwargs(FOUNDATION_POLICY_KWARGS).replace(
        compute_dtype="bfloat16", hidsize=1024 * args.width, impala_width=4 * args.width
    )
    mapper = CameraHierarchicalMapping(n_camera_bins=11)
    specs = head_specs_from_space(DictType(**mapper.get_action_space_update()))
    B = args.streams
    key = jax.random.PRNGKey(0)
    results = {}

    # ---- CNN trunk: preprocess + Impala + linear-to-hidsize ----------------
    class CnnPart(nn.Module):
        cfg: PolicyConfig

        @nn.compact
        def __call__(self, x):
            x = ImgPreprocessing(scale_img=self.cfg.scale_input_img)(x)
            return ImgObsProcess(self.cfg)(x)

    cnn = CnnPart(cfg)
    img_f = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (B, 1, 128, 128, 3)), jnp.float32
    )
    cnn_vars = jax.jit(cnn.init)(key, img_f)

    def cnn_body(c, vars_):
        # acc rides carry[0] — chain_time forces leaves[0], and the NEXT
        # iteration's input depends on acc, so every CNN application is on
        # the forced dependence chain (neither CSE'd nor dispatch-only timed)
        acc, x = c
        y = cnn.apply(vars_, x + acc * 1e-30)
        return jnp.sum(y).astype(jnp.float32), x

    dt = chain_time(cnn_body, (jnp.float32(0), img_f), cnn_vars, args.iters)
    results["cnn_ms"] = round(dt * 1e3, 3)

    # ---- Transformer stack at t=1 with the ring cache ----------------------
    blocks = ResidualRecurrentBlocks(
        hidsize=cfg.hidsize,
        timesteps=cfg.timesteps,
        n_block=cfg.n_recurrence_layers,
        recurrence_type="transformer",
        attention_heads=cfg.attention_heads,
        attention_memory_size=cfg.attention_memory_size,
        attention_mask_style=cfg.attention_mask_style,
        dtype=jnp.bfloat16,
    )
    lat = jnp.zeros((B, 1, cfg.hidsize), jnp.bfloat16)
    first = jnp.zeros((B, 1), bool)
    state = policy_initial_state(cfg, B, ring=True)
    tf_vars = jax.jit(blocks.init)(key, lat, first, state)

    def tf_body(c, vars_):
        x, st = c
        y, st = blocks.apply(vars_, x, first, st)
        return x + y * 1e-30, st

    dt = chain_time(tf_body, (lat, state), tf_vars, args.iters)
    results["transformer_ms"] = round(dt * 1e3, 3)

    # ---- Output tail: relu -> lastlayer -> final_ln -> heads -> sample -----
    class TailPart(nn.Module):
        cfg: PolicyConfig
        specs: tuple

        @nn.compact
        def __call__(self, x, rng):
            x = nn.relu(x)
            x = FanInInitLayer(outchan=self.cfg.hidsize, layer_type="linear",
                               layer_norm=True, dtype=jnp.bfloat16)(x)
            x = LayerNorm()(x)
            logits = DictActionHead(specs=self.specs, temperature=2.0,
                                    dtype=jnp.bfloat16)(x)
            v = ScaledMSEHead(output_size=1, norm_axes=2)(x)
            logits = jax.tree.map(lambda l: l[:, -1], logits)
            return dict_sample(rng, logits, self.specs), v

    tail = TailPart(cfg, specs)
    tail_vars = jax.jit(tail.init)(key, lat.astype(jnp.float32), key)

    def tail_body(c, vars_):
        x, k = c
        k, sub = jax.random.split(k)
        act, v = tail.apply(vars_, x, sub)
        # fold BOTH outputs into the forced carry: dropping `act` would let
        # XLA dead-code-eliminate the DictActionHead — the tail's largest
        # matmul (hidsize x 8641) — and time only the value head
        act_dep = sum(a.astype(jnp.float32).sum() for a in jax.tree.leaves(act))
        return x + (v.astype(jnp.float32).sum() + act_dep).astype(x.dtype) * 1e-30, k

    dt = chain_time(tail_body, (lat.astype(jnp.float32), key), tail_vars, args.iters)
    results["tail_ms"] = round(dt * 1e3, 3)

    # ---- Roofline math ------------------------------------------------------
    cache = {}
    bpath = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "BENCH_BASELINE.json")
    if os.path.exists(bpath):
        with open(bpath) as f:
            cache = json.load(f)
    ceiling = float(cache.get("ceiling_tflops_bf16") or 164.0)
    g = conv_gflops(args.width, args.streams)
    results.update(
        cnn_gflops_per_step=round(g["gflops_per_step"], 1),
        cnn_achieved_tflops=round(g["gflops_per_step"] / results["cnn_ms"] / 1e9 * 1e12 / 1e3, 1),
    )
    results["cnn_mxu_utilization"] = round(
        results["cnn_achieved_tflops"] / ceiling, 3)
    total_ms = results["cnn_ms"] + results["transformer_ms"] + results["tail_ms"]
    results["sum_ms"] = round(total_ms, 3)
    results["implied_fps"] = round(args.streams / (total_ms / 1e3), 1)
    results["share"] = {
        k: round(results[f"{k}_ms"] / total_ms, 3) for k in ("cnn", "transformer", "tail")
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
