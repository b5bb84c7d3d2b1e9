"""Impala CNN vision trunk (reference: lib/impala_cnn.py).

TPU-first differences from the reference:
  * NHWC layout end-to-end — the native TPU convolution layout (the reference
    transposes to NCHW for cuDNN, impala_cnn.py:190);
  * the (B, T) leading axes are folded into one batch axis for the conv stack
    so XLA sees one large conv per layer;
  * the final flatten is performed in the reference's (C, H, W) channel-major
    order so dense/LayerNorm weights line up with torch checkpoints
    (reference flattens an NCHW tensor, impala_cnn.py:192-194).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vpt_tpu.models.layers import FanInInitLayer, LN_EPS


class CnnBasicBlock(nn.Module):
    """Residual pair of 3×3 convs (reference: impala_cnn.py:13-52)."""

    inchan: int
    init_scale: float = 1.0
    batch_norm: bool = False
    group_norm_groups: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = math.sqrt(self.init_scale)
        kw = dict(
            layer_type="conv",
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            init_scale=s,
            batch_norm=self.batch_norm,
            group_norm_groups=self.group_norm_groups,
            dtype=self.dtype,
        )
        h = FanInInitLayer(outchan=self.inchan, name="conv0", **kw)(x)
        h = FanInInitLayer(outchan=self.inchan, name="conv1", **kw)(h)
        return x + h


class CnnDownStack(nn.Module):
    """conv → maxpool(3, s2) → optional GroupNorm → residual blocks
    (reference: impala_cnn.py:55-129)."""

    outchan: int
    nblock: int
    init_scale: float = 1.0
    pool: bool = True
    post_pool_groups: Optional[int] = None
    batch_norm: bool = False
    group_norm_groups: Optional[int] = None
    first_conv_norm: bool = True
    dtype: Any = jnp.float32
    pool_impl: str = "xla"  # "xla" (default, measured faster) | "shifted"

    @nn.compact
    def __call__(self, x):
        x = FanInInitLayer(
            outchan=self.outchan,
            layer_type="conv",
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            batch_norm=self.batch_norm if self.first_conv_norm else False,
            group_norm_groups=self.group_norm_groups if self.first_conv_norm else None,
            dtype=self.dtype,
            name="firstconv",
        )(x)
        if self.pool:
            if self.pool_impl not in ("xla", "shifted", "subsample"):
                raise ValueError(
                    f"pool_impl={self.pool_impl!r}: expected 'xla', 'shifted', "
                    "or 'subsample' (debug-only, wrong values)"
                )
            if self.pool_impl == "shifted":
                # Same values as nn.max_pool with a nine-slice backward in
                # place of SelectAndScatter (ops/pooling.py).  Measured 2x
                # SLOWER in the 1x BC step — the backward is HBM-bound and
                # this variant moves more bytes.  Kept for measurement only.
                from vpt_tpu.ops.pooling import max_pool_3x3s2

                x = max_pool_3x3s2(x)
            elif self.pool_impl == "subsample":
                # DEBUG ONLY (wrong math, right shapes): strided subsample in
                # place of the pool, to measure the pool's true in-graph cost
                # by differencing against "xla"/"shifted" runs.
                x = x[:, ::2, ::2, :]
            else:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            if self.post_pool_groups is not None:
                x = nn.GroupNorm(num_groups=self.post_pool_groups, epsilon=LN_EPS,
                                 dtype=jnp.float32, param_dtype=jnp.float32, name="n")(x)
        for i in range(self.nblock):
            x = CnnBasicBlock(
                inchan=self.outchan,
                init_scale=self.init_scale / math.sqrt(self.nblock),
                batch_norm=self.batch_norm,
                group_norm_groups=self.group_norm_groups,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)
        return x

    @staticmethod
    def output_hw(h: int, w: int, pool: bool) -> Tuple[int, int]:
        if pool:
            return (h + 1) // 2, (w + 1) // 2
        return h, w


class ImpalaCNN(nn.Module):
    """Stacked downsampling stages + channel-major flatten + dense
    (reference: impala_cnn.py:132-195)."""

    chans: Sequence[int]
    outsize: int
    nblock: int
    post_pool_groups: Optional[int] = None
    batch_norm: bool = False
    group_norm_groups: Optional[int] = None
    first_conv_norm: bool = False
    dense_layer_norm: bool = True
    dtype: Any = jnp.float32
    remat: bool = False
    pool_impl: str = "xla"

    @nn.compact
    def __call__(self, x_bthwc):
        b, t = x_bthwc.shape[:2]
        x = x_bthwc.reshape((b * t,) + x_bthwc.shape[2:])
        # remat per stack: the backward recomputes each stack from its input
        # instead of keeping every conv activation alive — stack 0 of the 2x
        # model at (B*T=1024, 128, 128, 128) is 4 GB per buffer otherwise
        stack_cls = nn.remat(CnnDownStack) if self.remat else CnnDownStack
        for i, outchan in enumerate(self.chans):
            x = stack_cls(
                outchan=outchan,
                nblock=self.nblock,
                init_scale=math.sqrt(len(self.chans)),
                post_pool_groups=self.post_pool_groups,
                batch_norm=self.batch_norm,
                group_norm_groups=self.group_norm_groups,
                first_conv_norm=self.first_conv_norm if i == 0 else True,
                dtype=self.dtype,
                pool_impl=self.pool_impl,
                name=f"stacks_{i}",
            )(x)
        # channel-major (C, H, W) flatten for torch weight-layout parity
        bt, h, w, c = x.shape
        x = x.transpose(0, 3, 1, 2).reshape(bt, c * h * w)
        x = FanInInitLayer(
            outchan=self.outsize,
            layer_type="linear",
            init_scale=1.4,
            layer_norm=self.dense_layer_norm,
            dtype=self.dtype,
            name="dense",
        )(x)
        return x.reshape(b, t, self.outsize)
