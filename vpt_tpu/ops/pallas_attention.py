"""Fused Pallas TPU kernel for clipped-causal windowed attention.

Dispatch entry: ``maybe_fused_windowed_attention`` — returns None when the
shape/platform isn't covered, in which case the caller falls back to the XLA
path in vpt_tpu/ops/attention.py (same math, same results).

Kernel design (see /opt/skills/guides/pallas_guide.md): the VPT window is
tiny — T = t + maxlen = 256 keys at d_head 128 — so one (head, batch) program
instance keeps Q, K, V, and the (t, T) logits tile entirely in VMEM, computes
float32 logits on the MXU, adds the band/relative bias from iota arithmetic
(never materializing masks in HBM), softmaxes on the VPU, and hits the MXU
again for the value contraction.  This removes the HBM round-trips XLA would
spend on the mask / extra-bias tensors.

Implemented in a later milestone of round 1; the stub keeps the dispatch
boundary stable.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

_PALLAS_ENABLED = True


def maybe_fused_windowed_attention(
    q_bhtd: jnp.ndarray,
    k_bhTd: jnp.ndarray,
    v_bhTd: jnp.ndarray,
    mask_btT: Optional[jnp.ndarray],
    extra_bhtT: Optional[jnp.ndarray],
    use_muP_factor: bool,
    require: bool = False,
) -> Optional[jnp.ndarray]:
    """Fused attention when supported, else None (caller falls back to XLA)."""
    from vpt_tpu.ops import pallas_attention_impl

    return pallas_attention_impl.dispatch(
        q_bhtd, k_bhTd, v_bhTd, mask_btT, extra_bhtT, use_muP_factor, require
    )
