"""Building-block layers shared by the policy and IDM graphs.

Naming contract: submodules are named so that the flax param tree path matches
the reference torch state_dict key path segment-for-segment (``layer`` /
``norm`` inside FanInInitLayer, ``q_layer`` etc. in the attention layer), with
torch's ``weight`` → flax ``kernel``/``scale`` handled by the checkpoint
converter (vpt_tpu/checkpoint/torch_import.py).

Init contract: the reference's "fan-in" init renormalizes each output unit's
weight vector to L2 norm ``init_scale`` (reference: lib/util.py:67-73,
lib/torch_util.py:68-82).  We draw gaussian directions and renormalize —
identical row norms, near-identical direction distribution.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # torch LayerNorm/GroupNorm default epsilon


def fan_in_normed_init(scale: float) -> Callable:
    """Init whose every output-unit weight vector has L2 norm == scale."""

    def init(key, shape, dtype=jnp.float32):
        # flax layouts put the output axis last (Dense: (in, out);
        # Conv: (kh, kw, in, out)) — normalize over all axes but the last.
        w = jax.random.normal(key, shape, jnp.float32)
        axes = tuple(range(len(shape) - 1))
        norm = jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True))
        return (scale * w / jnp.maximum(norm, 1e-12)).astype(dtype)

    return init


def normed_dense(
    features: int,
    *,
    scale: float,
    use_bias: bool = True,
    name: Optional[str] = None,
    dtype=None,
    quantize: bool = False,
) -> nn.Module:
    """nn.Dense with fan-in-normalized init and zero bias
    (reference NormedLinear, lib/torch_util.py:68-82).  ``quantize`` swaps in
    the int8 serving layer (ops/int8.py) at the same module path."""
    if quantize:
        from vpt_tpu.ops.int8 import QuantDense

        return QuantDense(features, use_bias=use_bias, name=name, dtype=dtype)
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=fan_in_normed_init(scale),
        bias_init=nn.initializers.zeros_init(),
        name=name,
        dtype=dtype,
        param_dtype=jnp.float32,
    )


class LayerNorm(nn.LayerNorm):
    """torch-compatible LayerNorm (eps 1e-5, float32 statistics)."""

    epsilon: float = LN_EPS
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


class FanInInitLayer(nn.Module):
    """norm → layer → ReLU, with fan-in-renormalized weight init.

    Mirrors FanInInitReLULayer (reference: lib/util.py:23-82): the norm is
    applied to the *input*, the layer has a bias only when there is no norm,
    and the activation is optional.  ``layer_type`` ∈ {linear, conv, conv3d}.
    """

    outchan: int
    layer_type: str = "conv"
    init_scale: float = 1.0
    batch_norm: bool = False
    group_norm_groups: Optional[int] = None
    layer_norm: bool = False
    use_activation: bool = True
    kernel_size: Tuple[int, ...] = (3, 3)
    strides: Optional[Tuple[int, ...]] = None
    padding: Any = "SAME"
    dtype: Any = jnp.float32
    quantize: bool = False  # int8 serving path (linear layer_type only)

    @nn.compact
    def __call__(self, x):
        has_norm = self.batch_norm or self.group_norm_groups is not None or self.layer_norm
        if self.batch_norm:
            # Reference BC paths never train batch-norm stats (no published
            # config uses it); we implement it as its inference-mode affine.
            x = nn.BatchNorm(use_running_average=True, epsilon=LN_EPS, name="norm",
                             dtype=jnp.float32, param_dtype=jnp.float32)(x)
        elif self.group_norm_groups is not None:
            x = nn.GroupNorm(num_groups=self.group_norm_groups, epsilon=LN_EPS,
                             name="norm", dtype=jnp.float32, param_dtype=jnp.float32)(x)
        elif self.layer_norm:
            x = LayerNorm(name="norm")(x)

        kinit = fan_in_normed_init(self.init_scale)
        zinit = nn.initializers.zeros_init()
        if self.layer_type == "linear":
            if self.quantize:
                from vpt_tpu.ops.int8 import QuantDense

                x = QuantDense(self.outchan, use_bias=not has_norm,
                               name="layer", dtype=self.dtype)(x)
            else:
                x = nn.Dense(self.outchan, use_bias=not has_norm, kernel_init=kinit,
                             bias_init=zinit, name="layer", dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
        elif self.layer_type == "conv":
            x = nn.Conv(self.outchan, self.kernel_size, strides=self.strides,
                        padding=self.padding, use_bias=not has_norm,
                        kernel_init=kinit, bias_init=zinit, name="layer",
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
        elif self.layer_type == "conv3d":
            x = nn.Conv(self.outchan, self.kernel_size, strides=self.strides,
                        padding=self.padding, use_bias=not has_norm,
                        kernel_init=kinit, bias_init=zinit, name="layer",
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
        else:
            raise NotImplementedError(self.layer_type)

        if self.use_activation:
            x = nn.relu(x)
        return x
