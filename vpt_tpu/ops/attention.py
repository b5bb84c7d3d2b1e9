"""Windowed multi-head attention — the hottest kernel of the stack.

Numerical contract (matches reference lib/xf.py:18-71):
  * logits computed in float32: ``bias + alpha * (Q @ K^T)`` with
    ``alpha = 1/d_head`` under muP or ``1/sqrt(d_head)`` otherwise — the bias
    (mask −1e9 terms + relative-position logits) is NOT scaled by alpha;
  * softmax in float32 over the key axis, then cast to the compute dtype;
  * weighted sum against V in the compute dtype.

Two implementations:
  * ``windowed_attention`` — pure XLA (einsum); always available, used as the
    correctness oracle and for shapes the Pallas kernel doesn't cover.
  * ``vpt_tpu.ops.pallas_attention.fused_windowed_attention`` — fused Pallas
    TPU kernel for the training/IDM chunk shapes; dispatched via
    ``attend`` when profitable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_BIAS = -1e9


def windowed_attention(
    q_bhtd: jnp.ndarray,
    k_bhTd: jnp.ndarray,
    v_bhTd: jnp.ndarray,
    mask_btT: Optional[jnp.ndarray],
    extra_bhtT: Optional[jnp.ndarray],
    use_muP_factor: bool,
) -> jnp.ndarray:
    """softmax(alpha·QKᵀ + bias)·V with float32 logits/softmax.

    :param q_bhtd: (B, H, t, d)
    :param k_bhTd: (B, H, T, d)
    :param v_bhTd: (B, H, T, d)
    :param mask_btT: (B, t, T) bool or None (no masking)
    :param extra_bhtT: (B, H, t, T) float32 extra logits (relattn) or None
    :param use_muP_factor: alpha = 1/d instead of 1/sqrt(d)
    """
    d = q_bhtd.shape[-1]
    alpha = (1.0 / d) if use_muP_factor else (1.0 / jnp.sqrt(jnp.float32(d)))
    logits = jnp.einsum(
        "bhtd,bhTd->bhtT",
        q_bhtd.astype(jnp.float32),
        k_bhTd.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    logits = logits * jnp.float32(alpha)
    if extra_bhtT is not None:
        logits = logits + extra_bhtT.astype(jnp.float32)
    if mask_btT is not None:
        logits = logits + jnp.where(mask_btT[:, None], 0.0, NEG_BIAS).astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v_bhTd.dtype)
    return jnp.einsum("bhtT,bhTd->bhtd", w, v_bhTd)


def split_heads(x_bte: jnp.ndarray, h: int) -> jnp.ndarray:
    """(B, t, e) → (B, h, t, e/h).  Head-major channel split, matching the
    reference's reshape order (lib/xf.py:96-103)."""
    b, t, e = x_bte.shape
    assert e % h == 0, "Embsize must be divisible by number of heads"
    return x_bte.reshape(b, t, h, e // h).transpose(0, 2, 1, 3)


def merge_heads(x_bhtd: jnp.ndarray) -> jnp.ndarray:
    """(B, h, t, d) → (B, t, h·d)."""
    b, h, t, d = x_bhtd.shape
    return x_bhtd.transpose(0, 2, 1, 3).reshape(b, t, h * d)
