"""Int8 weight quantization for serving (perf path; no reference counterpart).

TPU MXUs execute int8×int8→int32 matmuls at twice the bf16 rate, and int8
weights halve the HBM traffic (and resident footprint) of every dense layer —
the dominant cost of large-batch IDM labeling.  Scheme:

  * **weights**: symmetric per-output-channel int8, quantized ONCE offline
    (``quantize_variables``) — the checkpoint keeps its float layout; the
    quantized tree is a serving artifact;
  * **activations**: symmetric per-row int8, quantized dynamically inside the
    layer (one abs-max + scale per row — VPU work that XLA fuses into the
    surrounding elementwise ops);
  * accumulation in int32, dequantized by (row_scale × channel_scale).

``QuantDense`` is a drop-in for ``nn.Dense`` with the same module name and a
``bias`` param at the same path, so a quantized variable tree is derived from
a float one purely structurally (no name mapping).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_kernel(w: jnp.ndarray):
    """Symmetric per-output-channel (last axis) int8 quantization.

    :returns: (w_q int8 same shape, scale float32 (out,))
    """
    w32 = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=tuple(range(w32.ndim - 1))) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def dynamic_quantize_rows(x: jnp.ndarray):
    """Symmetric per-row (last axis) int8 quantization of activations."""
    x32 = jnp.asarray(x, jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    x_q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray) -> jnp.ndarray:
    """x @ dequant(w_q): int8×int8→int32 on the MXU, dequantized to float32.

    :param x: (..., K) float activations (quantized per row on the fly)
    :param w_q: (K, N) int8
    :param w_scale: (N,) float32 per-channel scales
    """
    x_q, x_scale = dynamic_quantize_rows(x)
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * x_scale * w_scale


class QuantDense(nn.Module):
    """Serving-time replacement for ``nn.Dense`` with int8 weights.

    Parameter names: ``kernel_q8`` (int8), ``kernel_scale`` (float32), and
    ``bias`` at the exact path the float layer uses — so
    :func:`quantize_variables` can fill a quantized tree from a float one.
    The zero/one initializers are placeholders: a quantized model is only
    meaningful after its variables were derived from trained float weights.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w_q = self.param(
            "kernel_q8",
            lambda key, shape: jnp.zeros(shape, jnp.int8),
            (x.shape[-1], self.features),
        )
        w_scale = self.param(
            "kernel_scale", lambda key, shape: jnp.ones(shape, jnp.float32),
            (self.features,),
        )
        y = int8_matmul(x, w_q, w_scale)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            y = y + bias
        return y.astype(self.dtype if self.dtype is not None else y.dtype)


def fake_quant_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Quantization-aware-training view of a dense kernel.

    Forward value = EXACTLY ``dequantize(quantize_kernel(w))`` (same per-
    output-channel scale, round, clip), so training sees the weights the int8
    serving path will actually use; backward is the straight-through
    estimator (gradient of identity), so the float master weights keep
    training.  Activation quantization stays dynamic at serving time and is
    not simulated — static weight rounding is the dominant logit-error source
    the QAT pass is closing.
    """
    w32 = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=tuple(range(w32.ndim - 1))) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(w32 / scale), -127, 127) * scale
    return (w32 + jax.lax.stop_gradient(w_q - w32)).astype(w.dtype)


def quantized_kernel_mask(float_params, quant_template_params):
    """Boolean pytree over ``float_params``: True exactly at the ``kernel``
    leaves the ``quantize_dense`` serving graph replaces with int8.

    Derived STRUCTURALLY from the quantized model's variable template (a dict
    level holding ``kernel_q8`` in the template corresponds to ``kernel`` in
    the float tree), so QAT and serving can never disagree about the set —
    e.g. the pi/value head denses stay float in serving (models/heads.py) and
    therefore must stay float in QAT too.
    """

    def walk(tmpl, flt):
        out = {}
        for key, fval in flt.items():
            if isinstance(fval, dict):
                sub = tmpl.get(key) if isinstance(tmpl, dict) else None
                out[key] = walk(sub if isinstance(sub, dict) else {}, fval)
            else:
                out[key] = (
                    key == "kernel" and isinstance(tmpl, dict) and "kernel_q8" in tmpl
                )
        return out

    return walk(quant_template_params, float_params)


def fake_quant_dense_params(params, mask=None):
    """Apply :func:`fake_quant_kernel` to the dense kernels int8 serving
    quantizes.

    With ``mask`` (from :func:`quantized_kernel_mask`) the set is exact by
    construction.  Without it, a rule-based fallback: every ndim-2 ``kernel``
    leaf EXCEPT under the action/value heads (``pi_head``/``value_head``),
    which serving keeps float (models/heads.py uses plain nn.Dense).
    Convolution kernels stay float either way, mirroring serving where int8
    convs measured SLOWER than bf16 on TPU.
    """
    if mask is not None:
        return jax.tree.map(
            lambda m, p: fake_quant_kernel(p) if m else p, mask, params
        )

    def one(keypath, leaf):
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        if path and path[0] in ("pi_head", "value_head"):
            return leaf
        if path[-1] == "kernel" and leaf.ndim == 2:
            return fake_quant_kernel(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(one, params)


def quantize_variables(float_variables, quant_template):
    """Derive a quantized variable tree from a float one.

    Walks ``quant_template`` (e.g. from ``jax.eval_shape`` of the quantized
    model's init): at each dict holding ``kernel_q8``/``kernel_scale``, the
    float tree holds ``kernel`` at the same path — quantize it; every other
    leaf is carried over unchanged (shapes asserted against the template).
    """

    def walk(tmpl, flt, path=""):
        assert isinstance(tmpl, dict) and isinstance(flt, dict), path
        out = {}
        for key, tval in tmpl.items():
            if key == "kernel_q8":
                w_q, scale = quantize_kernel(flt["kernel"])
                assert w_q.shape == tval.shape, (path, w_q.shape, tval.shape)
                out["kernel_q8"] = w_q
                out["kernel_scale"] = scale
            elif key == "kernel_scale":
                continue  # emitted with kernel_q8
            elif isinstance(tval, dict):
                assert key in flt, (path, key, sorted(flt))
                out[key] = walk(tval, flt[key], f"{path}/{key}")
            else:
                assert key in flt, (path, key, sorted(flt))
                leaf = flt[key]
                assert tuple(leaf.shape) == tuple(tval.shape), (path, key)
                out[key] = leaf
        return out

    return walk(quant_template, float_variables)
