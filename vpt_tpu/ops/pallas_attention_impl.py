"""Placeholder dispatch for the fused Pallas attention kernel.

Returns None (XLA fallback) until the kernel lands; keeping this separate from
the dispatch wrapper lets tests monkeypatch/force either path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def dispatch(
    q_bhtd: jnp.ndarray,
    k_bhTd: jnp.ndarray,
    v_bhTd: jnp.ndarray,
    mask_btT,
    extra_bhtT,
    use_muP_factor: bool,
    require: bool,
) -> Optional[jnp.ndarray]:
    if require:
        raise NotImplementedError("pallas attention kernel not yet available")
    return None
