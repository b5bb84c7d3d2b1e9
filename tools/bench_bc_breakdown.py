"""Component-level timing breakdown of the BC TRAIN STEP on the real chip.

The bc_1x suite row runs at ~35% MXU — the weakest roofline in the suite
(rollout 52-57%, IDM 87%).  This tool itemizes where the step's time goes so
the idle fraction is measured, not asserted: forward, backward (grad − fwd),
optimizer update (clip + weight decay + Adam moments + apply), and per-
component forward+backward chains (CNN trunk, transformer stack, output
tail + loss math), plus a GroupNorm/LayerNorm grad microbench at the trunk's
actual shapes (the norms are the canonical memory-bound backward suspects).

Timing uses the same scan-chained device loops as tools/bench_breakdown.py
(the axon tunnel's async dispatch makes any non-dependence-forced timing a
lie).  The loss function mirrors training/bc.py::loss_fn exactly.

Usage:  python tools/bench_bc_breakdown.py [--width 1] [--batch 8] [--chunk 32]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_breakdown import chain_time  # noqa: E402  (scan-chained timer)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--cnn-detail", action="store_true",
                    help="also itemize the CNN: per-stack fwd / fwd+bwd, plus "
                         "op-level chains (maxpool backward = SelectAndScatter, "
                         "GN round trips, bare convs) at the trunk's shapes")
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from vpt_tpu.config import FOUNDATION_POLICY_KWARGS
    from vpt_tpu.models.heads import dict_logprob
    from vpt_tpu.models.layers import LN_EPS, LayerNorm
    from vpt_tpu.models.policy import ImgObsProcess, ImgPreprocessing, policy_initial_state
    from vpt_tpu.models.transformer import ResidualRecurrentBlocks
    from vpt_tpu.parallel.mesh import make_mesh
    from vpt_tpu.training.bc import BCHyperparams, BCTrainer

    B, T = args.batch, args.chunk
    kwargs = dict(FOUNDATION_POLICY_KWARGS,
                  hidsize=1024 * args.width, impala_width=4 * args.width)
    hp = BCHyperparams(batch_size=B, chunk_len=T)
    trainer = BCTrainer(kwargs, {"temperature": 2.0}, hp=hp, mesh=make_mesh(),
                        compute_dtype=args.compute_dtype, remat=False)
    trainer.init()
    cfg, policy, specs = trainer.cfg, trainer.policy, trainer.head_specs
    optimizer = trainer.optimizer

    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(rng.integers(0, 255, (B, T, 128, 128, 3), dtype=np.uint8)),
        "buttons": jnp.asarray(rng.integers(0, 8641, (B, T)), jnp.int32),
        "camera": jnp.asarray(rng.integers(0, 121, (B, T)), jnp.int32),
        "firsts": jnp.zeros((B, T), bool),
        "mask": jnp.ones((B, T), bool),
    }
    state0 = trainer.initial_state(B)
    variables = trainer.variables
    opt_state = trainer.opt_state
    results = {"geometry": f"{args.width}x B={B} T={T} {args.compute_dtype}"}

    # ---- loss fn: exact mirror of training/bc.py::loss_fn ------------------
    def loss_fn(params, stats, batch, state):
        out, state_out = policy.apply({"params": params, "stats": stats},
                                      batch["frames"], batch["firsts"], state)
        actions = {"buttons": batch["buttons"][..., None],
                   "camera": batch["camera"][..., None]}
        logp = dict_logprob(out["pi_logits"], actions, specs)
        mask = batch["mask"].astype(jnp.float32)
        return -(logp * mask).sum() / (logp.shape[0] * logp.shape[1]), state_out

    # forward only
    def fwd_body(c, consts):
        acc, state = c
        variables, batch = consts
        loss, state_out = loss_fn(variables["params"], variables["stats"],
                                  dict(batch, frames=batch["frames"] + (acc * 0).astype(jnp.uint8)),
                                  state)
        return loss, jax.tree.map(jax.lax.stop_gradient, state_out)

    dt = chain_time(fwd_body, (jnp.float32(0), state0), (variables, batch), args.iters)
    results["fwd_ms"] = round(dt * 1e3, 3)

    # forward + backward
    def grad_body(c, consts):
        acc, state = c
        variables, batch = consts
        (loss, state_out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"], variables["stats"],
            dict(batch, frames=batch["frames"] + (acc * 0).astype(jnp.uint8)), state)
        gdep = optax.global_norm(grads)
        return loss + gdep * 1e-30, jax.tree.map(jax.lax.stop_gradient, state_out)

    dt = chain_time(grad_body, (jnp.float32(0), state0), (variables, batch), args.iters)
    results["grad_ms"] = round(dt * 1e3, 3)

    # full train step (grad + clip + wd + adam + apply, value head zeroed)
    def step_body(c, consts):
        params, opt_state, state = c
        stats, batch = consts
        (loss, state_out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats, batch, state)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = {k: (jax.tree.map(jnp.zeros_like, v) if k == "value_head" else v)
                   for k, v in updates.items()}
        params = optax.apply_updates(params, updates)
        return params, opt_state, jax.tree.map(jax.lax.stop_gradient, state_out)

    dt = chain_time(step_body, (variables["params"], opt_state, state0),
                    (variables["stats"], batch), args.iters)
    results["step_ms"] = round(dt * 1e3, 3)

    # optimizer update alone on frozen grads (pure f32 moment math over the
    # whole parameter tree — HBM-bound)
    frozen_grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-6), variables["params"])

    def opt_body(c, consts):
        params, opt_state = c
        grads = consts
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    dt = chain_time(opt_body, (variables["params"], opt_state), frozen_grads, args.iters)
    results["optimizer_ms"] = round(dt * 1e3, 3)

    # ---- per-component forward+backward chains ------------------------------
    key = jax.random.PRNGKey(0)

    class CnnPart(nn.Module):
        cfg: type(cfg)

        @nn.compact
        def __call__(self, x):
            x = ImgPreprocessing(scale_img=self.cfg.scale_input_img)(x)
            return ImgObsProcess(self.cfg)(x)

    cnn = CnnPart(cfg)
    img_f = jnp.asarray(rng.integers(0, 255, (B, T, 128, 128, 3)), jnp.float32)
    cnn_vars = jax.jit(cnn.init)(key, img_f)

    def cnn_grad_body(c, consts):
        vars_, img = consts

        def f(v):
            return jnp.sum(cnn.apply(v, img + c * 1e-30).astype(jnp.float32))

        val, g = jax.value_and_grad(f)(vars_)
        return val + optax.global_norm(g) * 1e-30

    dt = chain_time(cnn_grad_body, jnp.float32(0), (cnn_vars, img_f), args.iters)
    results["cnn_grad_ms"] = round(dt * 1e3, 3)

    blocks = ResidualRecurrentBlocks(
        hidsize=cfg.hidsize, timesteps=cfg.timesteps,
        n_block=cfg.n_recurrence_layers, recurrence_type="transformer",
        attention_heads=cfg.attention_heads,
        attention_memory_size=cfg.attention_memory_size,
        attention_mask_style=cfg.attention_mask_style,
        dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32,
    )
    lat = jnp.asarray(rng.standard_normal((B, T, cfg.hidsize)), jnp.float32)
    firsts = jnp.zeros((B, T), bool)
    tf_state = policy_initial_state(cfg, B)
    tf_vars = jax.jit(blocks.init)(key, lat, firsts, tf_state)

    def tf_grad_body(c, consts):
        vars_, x = consts

        def f(v):
            y, _ = blocks.apply(v, x + c * 1e-30, firsts, tf_state)
            return jnp.sum(y.astype(jnp.float32))

        val, g = jax.value_and_grad(f)(vars_)
        return val + optax.global_norm(g) * 1e-30

    dt = chain_time(tf_grad_body, jnp.float32(0), (tf_vars, lat), args.iters)
    results["transformer_grad_ms"] = round(dt * 1e3, 3)

    # output tail + the actual loss math (lastlayer, final LN, 8641+121-way
    # f32 log-softmax, logprob gathers)
    from vpt_tpu.models.heads import DictActionHead
    from vpt_tpu.models.layers import FanInInitLayer

    class TailLoss(nn.Module):
        cfg: type(cfg)
        specs: tuple

        @nn.compact
        def __call__(self, x, buttons, camera, mask):
            x = nn.relu(x)
            x = FanInInitLayer(outchan=self.cfg.hidsize, layer_type="linear",
                               layer_norm=True,
                               dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32)(x)
            x = LayerNorm()(x)
            logits = DictActionHead(specs=self.specs, temperature=2.0,
                                    dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32)(x)
            logp = dict_logprob(logits, {"buttons": buttons[..., None],
                                         "camera": camera[..., None]}, self.specs)
            m = mask.astype(jnp.float32)
            return -(logp * m).sum() / (logp.shape[0] * logp.shape[1])

    tail = TailLoss(cfg, specs)
    tail_vars = jax.jit(tail.init)(key, lat, batch["buttons"], batch["camera"], batch["mask"])

    def tail_grad_body(c, consts):
        vars_, x = consts

        def f(v):
            return tail.apply(v, x + c * 1e-30, batch["buttons"], batch["camera"], batch["mask"])

        val, g = jax.value_and_grad(f)(vars_)
        return val + optax.global_norm(g) * 1e-30

    dt = chain_time(tail_grad_body, jnp.float32(0), (tail_vars, lat), args.iters)
    results["tail_loss_grad_ms"] = round(dt * 1e3, 3)

    # ---- GroupNorm/LayerNorm grad microbench at the trunk's shapes ---------
    # 1x trunk: stacks see (B*T, 64, 64, 64), (B*T, 32, 32, 128),
    # (B*T, 16, 16, 128) post-pool (GN group=1 each + per-block GNs);
    # transformer sees 2 LNs per block + final LN at (B, T, hidsize).
    chans = [4 * args.width * c for c in (16, 32, 32)]
    gn_shapes = [(B * T, 64, 64, chans[0]), (B * T, 32, 32, chans[1]),
                 (B * T, 16, 16, chans[2])]
    ln_shape = (B, T, cfg.hidsize)

    def norm_grad_body(c, consts):
        arrays = consts

        def f(xs):
            total = jnp.float32(0)
            for x in xs[:-1]:  # GN(1 group) ≡ per-sample LN over (H,W,C)
                mu = x.mean(axis=(1, 2, 3), keepdims=True)
                var = ((x - mu) ** 2).mean(axis=(1, 2, 3), keepdims=True)
                total += jnp.sum((x - mu) * jax.lax.rsqrt(var + 1e-5))
            x = xs[-1]
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            # ~9 LN applications per step (2/block x 4 + final); scale by 9
            total += 9.0 * jnp.sum((x - mu) * jax.lax.rsqrt(var + 1e-5))
            return total

        val, g = jax.value_and_grad(f)([a + c * 1e-30 for a in arrays])
        return val + sum(jnp.sum(x) for x in g) * 1e-30

    norm_arrays = [jnp.asarray(rng.standard_normal(s), jnp.float32) for s in gn_shapes]
    norm_arrays.append(jnp.asarray(rng.standard_normal(ln_shape), jnp.float32))
    dt = chain_time(norm_grad_body, jnp.float32(0), norm_arrays, args.iters)
    results["gn_ln_grad_microbench_ms"] = round(dt * 1e3, 3)

    # ---- derived shares ------------------------------------------------------
    step = results["step_ms"]
    results["derived"] = {
        "backward_ms": round(results["grad_ms"] - results["fwd_ms"], 3),
        "optimizer_share_of_step": round(results["optimizer_ms"] / step, 3),
        "fwd_share_of_step": round(results["fwd_ms"] / step, 3),
        "backward_share_of_step": round((results["grad_ms"] - results["fwd_ms"]) / step, 3),
        "unattributed_ms": round(step - results["grad_ms"] - results["optimizer_ms"], 3),
        "component_sum_vs_grad": round(
            (results["cnn_grad_ms"] + results["transformer_grad_ms"]
             + results["tail_loss_grad_ms"]) / results["grad_ms"], 3),
        "fps_implied": round(B * T / (step / 1e3), 1),
    }

    # ---- op-level CNN itemization (--cnn-detail) ----------------------------
    # The coarse breakdown above shows the step is CNN-bound (cnn_grad_ms ≈
    # 90% of grad_ms at 1x).  This section finds WHICH ops inside the trunk
    # eat the backward: per-stack fwd / fwd+bwd chains, the maxpool backward
    # (XLA lowers it to SelectAndScatter — the canonical slow op on TPU), the
    # f32 GroupNorm round trips between bf16 convs, and the bare convs.
    if args.cnn_detail:
        from vpt_tpu.models.impala import CnnDownStack

        cdt = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
        chans = [4 * args.width * c for c in (16, 32, 32)]
        # (input_hw, in_chan, out_chan, first_conv_norm) per stack, 1x BC geometry
        stack_geoms = [(128, 3, chans[0], False),
                       (64, chans[0], chans[1], True),
                       (32, chans[1], chans[2], True)]
        detail = {}

        def grad_chain(mod, x, label, iters=args.iters):
            vars_ = jax.jit(mod.init)(key, x)

            def body(c, consts):
                vars_, x = consts

                def f(v):
                    return jnp.sum(mod.apply(v, x + c * jnp.asarray(1e-30, x.dtype)).astype(jnp.float32))

                val, g = jax.value_and_grad(f)(vars_)
                return val + optax.global_norm(g) * 1e-30

            dt = chain_time(body, jnp.float32(0), (vars_, x), iters)
            detail[label + "_grad_ms"] = round(dt * 1e3, 3)

        def fwd_chain(mod, x, label, iters=args.iters):
            vars_ = jax.jit(mod.init)(key, x)

            def body(c, consts):
                vars_, x = consts
                return jnp.sum(mod.apply(vars_, x + c * jnp.asarray(1e-30, x.dtype)).astype(jnp.float32))

            dt = chain_time(body, jnp.float32(0), (vars_, x), iters)
            detail[label + "_fwd_ms"] = round(dt * 1e3, 3)

        for i, (hw, cin, cout, fcn) in enumerate(stack_geoms):
            stack = CnnDownStack(outchan=cout, nblock=2, init_scale=math.sqrt(3),
                                 post_pool_groups=1, group_norm_groups=1,
                                 first_conv_norm=fcn, dtype=cdt)
            x = jnp.asarray(rng.standard_normal((B * T, hw, hw, cin)), cdt)
            fwd_chain(stack, x, f"stack{i}")
            grad_chain(stack, x, f"stack{i}")

        # maxpool alone — fwd and fwd+bwd at each stack's pre-pool shape
        class Pool(nn.Module):
            @nn.compact
            def __call__(self, x):
                p = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
                return p * self.param("s", nn.initializers.ones, (1,), jnp.float32).astype(p.dtype)

        for i, (hw, _, cout, _) in enumerate(stack_geoms):
            x = jnp.asarray(rng.standard_normal((B * T, hw, hw, cout)), cdt)
            grad_chain(Pool(), x, f"pool{i}")
            fwd_chain(Pool(), x, f"pool{i}")

        # one f32 GroupNorm(1) round trip from/to bf16, fwd+bwd, per shape
        class GN(nn.Module):
            @nn.compact
            def __call__(self, x):
                y = nn.GroupNorm(num_groups=1, epsilon=LN_EPS, dtype=jnp.float32,
                                 param_dtype=jnp.float32)(x)
                return y.astype(x.dtype)

        for i, (hw, _, cout, _) in enumerate(stack_geoms):
            hw2 = (hw + 1) // 2
            x = jnp.asarray(rng.standard_normal((B * T, hw2, hw2, cout)), cdt)
            grad_chain(GN(), x, f"gn{i}")

        # bare 3x3 conv (no norm), fwd+bwd, at each distinct conv shape
        class BareConv(nn.Module):
            cout: int

            @nn.compact
            def __call__(self, x):
                return nn.Conv(self.cout, (3, 3), padding=((1, 1), (1, 1)),
                               use_bias=False, dtype=cdt, param_dtype=jnp.float32)(x)

        conv_geoms = {
            "conv_stem_128_3to64": (128, 3, chans[0]),        # stack0 firstconv
            "conv_block_64_64": (64, chans[0], chans[0]),     # stack0 blocks
            "conv_first_64_64to128": (64, chans[0], chans[1]),  # stack1 firstconv
            "conv_block_32_128": (32, chans[1], chans[1]),    # stack1 blocks
            "conv_first_32_128to128": (32, chans[1], chans[2]),  # stack2 firstconv
            "conv_block_16_128": (16, chans[2], chans[2]),    # stack2 blocks
        }
        for label, (hw, cin, cout) in conv_geoms.items():
            x = jnp.asarray(rng.standard_normal((B * T, hw, hw, cin)), cdt)
            grad_chain(BareConv(cout), x, label)
            fwd_chain(BareConv(cout), x, label)

        results["cnn_detail"] = detail

    print(json.dumps(results))


if __name__ == "__main__":
    main()
