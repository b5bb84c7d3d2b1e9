"""Dispatch boundary for the fused Pallas windowed-attention kernel.

``maybe_fused_windowed_attention`` returns None when the shape/platform isn't
covered, in which case the caller falls back to the XLA path in
vpt_tpu/ops/attention.py (same math, same results).  See
vpt_tpu/ops/pallas_attention_impl.py for the kernel.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def maybe_fused_windowed_attention(
    q_bhtd: jnp.ndarray,
    k_bhTd: jnp.ndarray,
    v_bhTd: jnp.ndarray,
    mask_btT,
    rel_R_bhtn,
    rel_b_nd,
    use_muP_factor: bool,
    require: bool = False,
) -> Optional[jnp.ndarray]:
    """Fused attention when supported, else None (caller falls back to XLA).

    Unlike the XLA path — which takes a precomputed (B,H,t,T) ``extra`` bias —
    this takes the raw relattn inputs (R coefficients + b_nd band table) so the
    kernel can form the bias on-chip without materializing it in HBM.
    """
    from vpt_tpu.ops import pallas_attention_impl

    return pallas_attention_impl.dispatch(
        q_bhtd, k_bhTd, v_bhTd, mask_btT, rel_R_bhtn, rel_b_nd, use_muP_factor, require
    )
