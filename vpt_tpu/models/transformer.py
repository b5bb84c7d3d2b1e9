"""Recurrent core: fixed-window causal transformer blocks (and LSTM variants).

Re-designs the reference's attention engine (lib/xf.py, lib/masked_attention.py,
lib/util.py:91-229) TPU-first:

  * the KV cache is a fixed-shape (B, maxlen, E) carry — concat + static slice
    under jit compiles to an in-place ring update, no dynamic shapes;
  * the clipped-causal mask and the banded relative-position bias are computed
    from time-difference iotas (vpt_tpu/ops/masks.py, ops/rel_bias.py) instead
    of cached host tensors;
  * episode resets ride a boolean ``state_mask`` carry, never touching the
    cache payload (same trick as the reference, masked_attention.py:47-94);
  * attention math matches lib/xf.py:18-71 exactly (float32 logits with
    unscaled bias, muP 1/d factor, float32 softmax).

State layout per block (a pytree, so it shards/vmaps/scans cleanly):
    {"state_mask": (B, maxlen) bool, "k": (B, maxlen, E), "v": (B, maxlen, E)}
The single-step ring decode state stores the cache head-split instead —
    {"state_mask", "k": (B, H, maxlen, d), "v": (B, H, maxlen, d), "idx"}
(see ring_step for the measured layout rationale).  LSTM blocks carry
{"h": (B, E), "c": (B, E)} instead.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vpt_tpu.models.layers import FanInInitLayer, LayerNorm, normed_dense
from vpt_tpu.ops.attention import merge_heads, split_heads, windowed_attention
from vpt_tpu.ops.masks import clipped_causal_mask, initial_state_mask
from vpt_tpu.ops.rel_bias import relattn_bias

# Init scale constants (reference: lib/xf.py:219-226)
Q_SCALE = 0.1
K_SCALE = 0.2
V_SCALE = 1.0
PROJ_SCALE = 1.0
R_SCALE = 0.1
B_SCALE = 0.2
N_BASIS = 10  # relattn basis functions (reference: lib/xf.py:260)


class SelfAttentionLayer(nn.Module):
    """Residual windowed self-attention with KV cache and relative bias.

    output = x + proj(attend(q(x), cache ⊕ k(x), cache ⊕ v(x)))
    (reference: lib/xf.py:289-397)
    """

    x_size: int
    heads: int
    maxlen: int
    init_scale: float = 1.0
    relattn: bool = True
    use_muP_factor: bool = True
    norm: str = "none"
    dtype: Any = jnp.float32
    # "xla" | "pallas" | "auto".  Default is XLA: at VPT shapes (t=128,
    # short windows) the measured fused-Pallas kernels run ~10% slower than
    # XLA's own fusion on v5e (fwd and bwd, with and without rel-bias) —
    # attention is ~2% of a train step here, and hand-scheduling what the
    # compiler already fuses is a loss.  "pallas"/"auto" keep the kernel
    # path available for shapes where forming the (B,H,t,T) bias in HBM
    # hurts (long contexts).
    attention_impl: str = "xla"
    quantize_dense: bool = False  # int8 serving path for q/k/v/proj/r

    def setup(self):
        s = math.sqrt(self.init_scale)
        q = self.quantize_dense
        self.q_layer = normed_dense(self.x_size, scale=Q_SCALE, use_bias=True, dtype=self.dtype, quantize=q)
        self.k_layer = normed_dense(self.x_size, scale=K_SCALE, use_bias=False, dtype=self.dtype, quantize=q)
        self.v_layer = normed_dense(self.x_size, scale=V_SCALE * s, use_bias=False, dtype=self.dtype, quantize=q)
        self.proj_layer = normed_dense(self.x_size, scale=PROJ_SCALE * s, use_bias=True, dtype=self.dtype, quantize=q)
        if self.norm == "layer":
            self.ln_x = LayerNorm()
        elif self.norm != "none":
            raise NotImplementedError(self.norm)
        if self.relattn:
            self.r_layer = normed_dense(N_BASIS * self.heads, scale=R_SCALE, use_bias=True, dtype=self.dtype, quantize=q)
            self.b_nd = self.param(
                "b_nd",
                lambda key, shape: B_SCALE * jax.random.normal(key, shape, jnp.float32),
                (N_BASIS, self.maxlen),
            )

    def __call__(
        self,
        x_bte: jnp.ndarray,
        kv_cache: Tuple[jnp.ndarray, jnp.ndarray],
        mask_btT: Optional[jnp.ndarray],
    ):
        # the skip connection carries the PRE-ln_x input (reference:
        # xf.py:358-360 — ln_x is applied inside residual())
        X = self.ln_x(x_bte) if self.norm == "layer" else x_bte
        Q = self.q_layer(X)
        K = self.k_layer(X)
        V = self.v_layer(X)

        k_cache, v_cache = kv_cache
        if self.maxlen > 0:
            K_full = jnp.concatenate([k_cache.astype(K.dtype), K], axis=1)
            V_full = jnp.concatenate([v_cache.astype(V.dtype), V], axis=1)
            new_cache = (K_full[:, -self.maxlen:], V_full[:, -self.maxlen:])
        else:
            K_full, V_full = K, V
            new_cache = (k_cache, v_cache)
        T = K_full.shape[1]

        R = None
        if self.relattn:
            R = split_heads(self.r_layer(X).astype(jnp.float32), self.heads)  # (B,H,t,n)

        A = self._attend(
            split_heads(Q, self.heads),
            split_heads(K_full, self.heads),
            split_heads(V_full, self.heads),
            mask_btT,
            R,
        )
        out = self.proj_layer(merge_heads(A))
        return x_bte + out, new_cache

    def _attend(self, q, k, v, mask, R):
        impl = self.attention_impl
        if impl in ("auto", "pallas"):
            from vpt_tpu.ops import pallas_attention

            fused = pallas_attention.maybe_fused_windowed_attention(
                q, k, v, mask, R, self.b_nd if self.relattn else None,
                self.use_muP_factor, require=(impl == "pallas"),
            )
            if fused is not None:
                return fused
        extra = relattn_bias(R, self.b_nd, k.shape[2]) if R is not None else None
        return windowed_attention(q, k, v, mask, extra, self.use_muP_factor)

    def ring_step(self, x_b1e, k_ring, v_ring, idx, valid_bM):
        """Single-step decode against a rotating cache.

        The new K/V are written into slot ``idx`` (one dynamic-slice write per
        step instead of shift-rewriting the whole cache); attention then runs
        over all ``maxlen`` slots, with slot ages ``(idx - s) mod maxlen``
        driving the relative-position bias and ``valid_bM`` masking unwritten /
        pre-reset slots.  Numerically identical to the linear concat+slice
        path (the linear path's oldest column is band-masked anyway, so both
        attend to: current step + the maxlen-1 most recent valid steps).

        The cache is stored HEAD-SPLIT, (B, H, maxlen, d): measured on the
        chip, the (B, M, E) layout made XLA place the ring axis minor-most so
        the one-slot write ran at ~1.4 GB/s effective (a 2-byte-granule
        scatter across the whole buffer), and the per-step whole-cache
        ``split_heads`` transpose + f32 upcast re-touched ~3×cache bytes per
        block.  Head-split storage keeps ``d`` minor (contiguous slot rows),
        needs no per-step transpose, and feeds the QK matmul in bf16 directly
        (bf16 products are exact in the f32 accumulator, so numerics match
        the upcast-first path).

        :returns: (out_b1e, k_ring, v_ring, valid) with slot idx now valid.
        """
        X = self.ln_x(x_b1e) if self.norm == "layer" else x_b1e
        Q = self.q_layer(X)
        K = self.k_layer(X)
        V = self.v_layer(X)
        maxlen = self.maxlen
        kh1 = split_heads(K, self.heads)           # (B, H, 1, d)
        vh1 = split_heads(V, self.heads)
        # slot write as a one-hot select, not dynamic-update-slice: XLA lays
        # the ring axis minor-most (the attention matmul wants M in lanes), so
        # a DUS there is a 2-byte-granule scatter measured at 1.3 GB/s
        # (~560 µs/block at 3x); the select streams the whole cache
        # coalesced at HBM speed instead (~4x faster end to end)
        slot = jnp.arange(maxlen, dtype=jnp.int32)[None, None, :, None] == idx
        k_ring = jnp.where(slot, kh1.astype(k_ring.dtype), k_ring)
        v_ring = jnp.where(slot, vh1.astype(v_ring.dtype), v_ring)
        valid = valid_bM.at[:, idx].set(True)

        ages = (idx - jnp.arange(maxlen, dtype=jnp.int32)) % maxlen  # (M,)
        qh = split_heads(Q, self.heads)            # (B, H, 1, d)
        d = qh.shape[-1]
        alpha = (1.0 / d) if self.use_muP_factor else (1.0 / jnp.sqrt(jnp.float32(d)))
        logits = jnp.einsum(
            "bhtd,bhMd->bhtM", qh, k_ring,
            preferred_element_type=jnp.float32,
        ) * jnp.float32(alpha)
        if self.relattn:
            R = split_heads(self.r_layer(X).astype(jnp.float32), self.heads)  # (B,H,1,n)
            D = self.b_nd.astype(jnp.float32)[:, ages]  # (n, M) bias by slot age
            logits = logits + jnp.einsum("bhtn,nM->bhtM", R, D)
        logits = logits + jnp.where(valid[:, None, None, :], 0.0, -1e9).astype(jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(v_ring.dtype)
        A = jnp.einsum("bhtM,bhMd->bhtd", w, v_ring)
        out = self.proj_layer(merge_heads(A))
        return x_b1e + out, k_ring, v_ring, valid


class MaskedAttention(nn.Module):
    """Windowed attention + episode-boundary masking (reference:
    lib/masked_attention.py:97-178).  ``mask_style`` "clipped_causal" builds the
    band mask with state carry; "none" attends everywhere (IDM bidirectional)."""

    input_size: int
    memory_size: int
    heads: int
    timesteps: int
    mask_style: str = "clipped_causal"
    init_scale: float = 1.0
    use_muP_factor: bool = True
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    quantize_dense: bool = False

    @property
    def maxlen(self) -> int:
        return self.memory_size - self.timesteps

    def setup(self):
        assert self.mask_style in ("none", "clipped_causal")
        assert self.memory_size >= 0
        # reference guard (xf.py AttentionLayerBase): a zero window under a
        # causal mask would silently softmax over all -1e9 logits
        assert self.maxlen > 0 or self.mask_style == "none", (
            f"attention_memory_size ({self.memory_size}) must exceed timesteps "
            f"({self.timesteps}) for clipped_causal attention"
        )
        self.orc_block = SelfAttentionLayer(
            x_size=self.input_size,
            heads=self.heads,
            maxlen=self.maxlen,
            init_scale=self.init_scale,
            relattn=True,
            use_muP_factor=self.use_muP_factor,
            norm="none",
            dtype=self.dtype,
            attention_impl=self.attention_impl,
            quantize_dense=self.quantize_dense,
        )

    def __call__(self, x_bte: jnp.ndarray, first_bt: jnp.ndarray, state: Dict[str, jnp.ndarray]):
        t = x_bte.shape[1]
        if "idx" in state:
            assert t == 1 and self.mask_style == "clipped_causal", (
                "ring cache supports single-step clipped_causal decode only"
            )
            valid = state["state_mask"] & ~first_bt[:, 0:1].astype(bool)
            out, new_k, new_v, new_valid = self.orc_block.ring_step(
                x_bte, state["k"], state["v"], state["idx"], valid
            )
            return out, {
                "state_mask": new_valid,
                "k": new_k,
                "v": new_v,
                "idx": (state["idx"] + 1) % self.maxlen,
            }
        mask = None
        new_state_mask = state["state_mask"]
        if self.mask_style == "clipped_causal":
            # full (B, t) firsts: resets anywhere inside the chunk reproduce
            # stepwise t=1 semantics (the reference only consults the chunk's
            # first step, masked_attention.py:74-84 — it trains at t=1 and
            # never needs more; our chunkwise PPO update does)
            mask, new_state_mask = clipped_causal_mask(
                first_bt.astype(bool), state["state_mask"], t, t + self.maxlen, self.maxlen
            )
        out, (new_k, new_v) = self.orc_block(x_bte, (state["k"], state["v"]), mask)
        return out, {"state_mask": new_state_mask, "k": new_k, "v": new_v}

    def initial_state(self, batchsize: int) -> Dict[str, jnp.ndarray]:
        return masked_attention_initial_state(batchsize, self.maxlen, self.input_size, self.dtype)


def masked_attention_initial_state(batchsize: int, maxlen: int, input_size: int, dtype) -> Dict[str, jnp.ndarray]:
    """Zero KV cache + all-invalid state mask (reference: xf.py:393-397 +
    masked_attention.py:153-159; the zeros are never attended because the
    state mask starts all-False)."""
    return {
        "state_mask": initial_state_mask(batchsize, maxlen),
        "k": jnp.zeros((batchsize, maxlen, input_size), dtype),
        "v": jnp.zeros((batchsize, maxlen, input_size), dtype),
    }


def ring_initial_state(batchsize: int, maxlen: int, input_size: int, dtype,
                       heads: int) -> Dict[str, jnp.ndarray]:
    """Ring-buffer variant of the decode state: the cache is written one slot
    per step (``idx`` rotates) instead of shift-rewriting the whole buffer —
    the linear cache's concat+slice moves 2·B·maxlen·E bytes per block per
    step, the ring moves 2·B·E.  Stored head-split (B, H, maxlen, d) so the
    slot write is contiguous along ``d`` and attention needs no per-step
    transpose (see SelfAttentionLayer.ring_step)."""
    if input_size % heads != 0:
        raise ValueError(
            f"ring cache needs hidsize divisible by heads: {input_size} % {heads} != 0"
        )
    d = input_size // heads
    return {
        "state_mask": initial_state_mask(batchsize, maxlen),
        "k": jnp.zeros((batchsize, heads, maxlen, d), dtype),
        "v": jnp.zeros((batchsize, heads, maxlen, d), dtype),
        "idx": jnp.zeros((), jnp.int32),
    }


def ring_state_to_linear(block_state: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Convert one block's ring decode state to the linear chunk layout.

    Linear slot p holds the entry of age maxlen-1-p (oldest first, newest
    last); ring slot s holds age (idx-1-s) mod maxlen — so linear[p] =
    ring[(idx+p) mod maxlen], i.e. a roll by -idx along the slot axis (axis 2
    of the head-split ring cache), then heads merge back to the linear
    (B, maxlen, E) layout.  Lets a stepwise ring rollout hand its
    window-start snapshot to a chunkwise (B, T) re-forward (the PPO update)
    with identical attention semantics — proven in tests/test_ring_cache.py.
    """
    idx = block_state["idx"]
    return {
        "state_mask": jnp.roll(block_state["state_mask"], -idx, axis=1),
        "k": merge_heads(jnp.roll(block_state["k"], -idx, axis=2)),
        "v": merge_heads(jnp.roll(block_state["v"], -idx, axis=2)),
    }


class ResidualRecurrentBlock(nn.Module):
    """pre-LN → (attention | LSTM) → residual → pointwise-MLP residual
    (reference: lib/util.py:132-211)."""

    hidsize: int
    timesteps: int
    init_scale: float = 1.0
    recurrence_type: str = "transformer"
    is_residual: bool = True
    use_pointwise_layer: bool = True
    pointwise_ratio: int = 4
    pointwise_use_activation: bool = False
    attention_heads: int = 8
    attention_memory_size: int = 2048
    attention_mask_style: str = "clipped_causal"
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    quantize_dense: bool = False

    def setup(self):
        s = self.init_scale
        if self.use_pointwise_layer and self.is_residual:
            s *= 2 ** -0.5  # two residual branches per block
        self._inner_scale = s

        if self.use_pointwise_layer:
            self.mlp0 = FanInInitLayer(
                outchan=self.hidsize * self.pointwise_ratio,
                layer_type="linear",
                init_scale=1.0,
                layer_norm=True,
                dtype=self.dtype,
                quantize=self.quantize_dense,
            )
            self.mlp1 = FanInInitLayer(
                outchan=self.hidsize,
                layer_type="linear",
                init_scale=s,
                use_activation=self.pointwise_use_activation,
                dtype=self.dtype,
                quantize=self.quantize_dense,
            )
        self.pre_r_ln = LayerNorm()
        if self.recurrence_type == "transformer":
            self.r = MaskedAttention(
                input_size=self.hidsize,
                memory_size=self.attention_memory_size,
                heads=self.attention_heads,
                timesteps=self.timesteps,
                mask_style=self.attention_mask_style,
                init_scale=s,
                use_muP_factor=True,
                dtype=self.dtype,
                attention_impl=self.attention_impl,
                quantize_dense=self.quantize_dense,
            )
        elif self.recurrence_type in (
            "multi_layer_lstm", "multi_layer_bilstm", "multi_masked_lstm"
        ):
            self.r = nn.OptimizedLSTMCell(
                self.hidsize, dtype=self.dtype, param_dtype=jnp.float32
            )
        else:
            raise NotImplementedError(self.recurrence_type)

    def __call__(self, x, first, state, reverse_lstm: bool = False):
        residual = x
        x = self.pre_r_ln(x.astype(jnp.float32)).astype(self.dtype)
        if self.recurrence_type == "transformer":
            # NOTE (quirk preserved): the transformer's residual branch adds the
            # *post-pre_r_ln* activations, not the block input — SelfAttentionLayer
            # is "already residual" around its own input (reference:
            # lib/util.py:196-204 with xf.py:358-360).
            x, state_out = self.r(x, first, state)
        else:
            x, state_out = self._lstm_forward(x, first, state, reverse_lstm)
            if self.is_residual:
                x = x + residual
        if self.use_pointwise_layer:
            residual = x
            x = self.mlp1(self.mlp0(x))
            if self.is_residual:
                x = x + residual
        return x, state_out

    def _lstm_forward(self, x_bte, first_bt, state, reverse_lstm):
        if self.recurrence_type == "multi_masked_lstm":
            # Ragged batching: the carry resets at EVERY timestep whose
            # `first` flag is set, not just at chunk starts — episodes may
            # begin anywhere inside the window.  The reference names this
            # type (reference: lib/policy.py:90 "multi_masked_lstm ...
            # supports ragged batching via the first vector") but its
            # ResidualRecurrentBlock never constructs a module for it
            # (lib/util.py:174-191), so this path is net-new capability,
            # mirroring the per-timestep resets our chunked attention
            # already has (ops/masks.py).
            def body(cell, carry, inp):
                xt, first_t = inp
                keep = (1.0 - first_t.astype(jnp.float32))[:, None]
                c, h = carry
                return cell((c * keep, h * keep), xt)

            scan = nn.scan(
                body, variable_broadcast="params", split_rngs={"params": False},
                in_axes=1, out_axes=1,
            )
            carry, ys = scan(self.r, (state["c"], state["h"]), (x_bte, first_bt))
            c_fin, h_fin = carry
            return ys, {"h": h_fin, "c": c_fin}

        # Zero the carried state at chunk starts flagged `first`
        # (reference: lib/util.py:214-219).
        keep = (1.0 - first_bt[:, 0].astype(jnp.float32))[:, None]
        carry = (state["c"] * keep, state["h"] * keep)
        xs = jnp.flip(x_bte, axis=1) if reverse_lstm else x_bte

        def body(cell, c, xt):
            return cell(c, xt)

        scan = nn.scan(
            body, variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        carry, ys = scan(self.r, carry, xs)
        if reverse_lstm:
            ys = jnp.flip(ys, axis=1)
        c_fin, h_fin = carry
        return ys, {"h": h_fin, "c": c_fin}

    def initial_state(self, batchsize: int):
        if self.recurrence_type == "transformer":
            return masked_attention_initial_state(
                batchsize, self.attention_memory_size - self.timesteps, self.hidsize, self.dtype
            )
        return {
            "h": jnp.zeros((batchsize, self.hidsize), self.dtype),
            "c": jnp.zeros((batchsize, self.hidsize), self.dtype),
        }


class ResidualRecurrentBlocks(nn.Module):
    """Stack of n residual recurrent blocks (reference: lib/util.py:91-129)."""

    hidsize: int
    timesteps: int
    n_block: int = 2
    recurrence_type: str = "transformer"
    is_residual: bool = True
    use_pointwise_layer: bool = True
    pointwise_ratio: int = 4
    pointwise_use_activation: bool = False
    attention_heads: int = 8
    attention_memory_size: int = 2048
    attention_mask_style: str = "clipped_causal"
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    remat: bool = False
    quantize_dense: bool = False

    def setup(self):
        init_scale = self.n_block ** -0.5 if self.is_residual else 1.0
        block_cls = nn.remat(ResidualRecurrentBlock, static_argnums=(4,)) if self.remat else ResidualRecurrentBlock
        self.blocks = [
            block_cls(
                hidsize=self.hidsize,
                timesteps=self.timesteps,
                init_scale=init_scale,
                recurrence_type=self.recurrence_type,
                is_residual=self.is_residual,
                use_pointwise_layer=self.use_pointwise_layer,
                pointwise_ratio=self.pointwise_ratio,
                pointwise_use_activation=self.pointwise_use_activation,
                attention_heads=self.attention_heads,
                attention_memory_size=self.attention_memory_size,
                attention_mask_style=self.attention_mask_style,
                dtype=self.dtype,
                attention_impl=self.attention_impl,
                quantize_dense=self.quantize_dense,
            )
            for _ in range(self.n_block)
        ]

    def __call__(self, x, first, state):
        assert len(state) == len(self.blocks), (
            f"Length of state {len(state)} did not match length of blocks {len(self.blocks)}"
        )
        state_out = []
        for i, block in enumerate(self.blocks):
            reverse = (
                self.recurrence_type == "multi_layer_bilstm" and (i + 1) % 2 == 0
            )
            x, s = block(x, first, state[i], reverse)
            state_out.append(s)
        return x, state_out

    def initial_state(self, batchsize: int):
        if self.recurrence_type == "transformer":
            maxlen = self.attention_memory_size - self.timesteps
            return [
                masked_attention_initial_state(batchsize, maxlen, self.hidsize, self.dtype)
                for _ in range(self.n_block)
            ]
        return [
            {
                "h": jnp.zeros((batchsize, self.hidsize), self.dtype),
                "c": jnp.zeros((batchsize, self.hidsize), self.dtype),
            }
            for _ in range(self.n_block)
        ]
