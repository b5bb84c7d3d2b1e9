from vpt_tpu.ops.masks import band_diagonal_mask, clipped_causal_mask
from vpt_tpu.ops.rel_bias import banded_bias_matrix, relattn_bias
from vpt_tpu.ops.attention import windowed_attention

__all__ = [
    "band_diagonal_mask",
    "clipped_causal_mask",
    "banded_bias_matrix",
    "relattn_bias",
    "windowed_attention",
]
