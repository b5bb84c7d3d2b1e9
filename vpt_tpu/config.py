"""Typed configuration tree for the VPT policy / IDM models.

The reference treats the unpickled ``.model`` file as the authoritative
architecture config (reference: run_agent.py:11-14, behavioural_cloning.py:42-47)
with fallback module constants (reference: agent.py:16-45).  Here every kwarg the
reference accepts becomes a typed dataclass field; ``PolicyConfig.from_kwargs``
accepts a raw kwargs dict from a ``.model`` pickle (tolerating unused keys, the
same way MinecraftPolicy.__init__ swallows **unused_kwargs, reference:
lib/policy.py:125).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple


def _tupled(x):
    if isinstance(x, (list, tuple)):
        return tuple(_tupled(v) for v in x)
    return x


@dataclass(frozen=True)
class PolicyConfig:
    """Architecture config for MinecraftPolicy (reference: lib/policy.py:96-188)."""

    # Vision trunk
    impala_width: int = 1
    impala_chans: Tuple[int, ...] = (16, 32, 32)
    obs_processing_width: int = 256  # ImpalaCNN outsize (reference: policy.py:157)
    img_shape: Tuple[int, int, int] = (128, 128, 3)
    scale_input_img: bool = True
    img_statistics: Optional[str] = None
    first_conv_norm: bool = False
    impala_post_pool_groups: Optional[int] = None  # impala_kwargs={"post_pool_groups": 1}
    impala_nblock: int = 2

    # Norm style for conv layers (init_norm_kwargs)
    batch_norm: bool = False
    group_norm_groups: Optional[int] = None

    # Core / recurrence
    hidsize: int = 512
    recurrence_type: str = "lstm"
    n_recurrence_layers: int = 1
    recurrence_is_residual: bool = True
    timesteps: Optional[int] = None
    use_pre_lstm_ln: bool = True
    single_output: bool = False

    # Transformer
    attention_heads: int = 8
    attention_memory_size: int = 2048
    attention_mask_style: str = "clipped_causal"
    use_pointwise_layer: bool = True
    pointwise_ratio: int = 4
    pointwise_use_activation: bool = False

    # IDM-only: 3D conv front end (reference: lib/policy.py:342-372)
    conv3d_params: Optional[Dict[str, Any]] = None

    # Rematerialization: recompute block/CNN activations in the backward pass
    # (trades FLOPs for memory; needed for full-size T=128 training chunks).
    remat: bool = False

    # Maxpool lowering: "xla" (nn.max_pool; backward = SelectAndScatter) or
    # "shifted" (nine-slice backward, ops/pooling.py).  Values identical.
    # A third value, "subsample", is accepted for bench/profile tooling ONLY:
    # it replaces the pool with a strided subsample — WRONG VALUES, right
    # shapes — to difference out the pool's in-graph cost.  Never train with it.
    # Measured on the chip (tools/profile_hlo.py, ROADMAP "BC backward"):
    # the whole CNN backward is HBM-bound and SelectAndScatter is only 7.4%
    # of device time at ~520 GB/s, so the byte-heavier shifted backward
    # HALVES 1x BC throughput (2613 vs 5105 fps).  Keep "xla".
    pool_impl: str = "xla"

    # Sequentialize the (B·T)-folded CNN over this many chunks (0 = off).
    # The CNN is per-frame, so scanning it bounds peak activation memory at
    # (B·T/chunks) frames — the stack-0 conv buffer of the 2x model is 4 GB
    # at B·T=1024, which OOMs a 16 GB chip in the backward pass otherwise.
    cnn_scan_chunks: int = 0

    # Compute precision ("float32" for bit-parity, "bfloat16" for TPU throughput).
    # Parameters are always stored float32; attention logits/softmax, layernorms
    # and head log-softmax stay float32 regardless (reference keeps everything
    # float32; its float32 islands are at lib/xf.py:55-63, lib/action_head.py:173).
    compute_dtype: str = "float32"

    # Int8 serving: the trunk's dense layers (q/k/v/proj/r, MLPs, the
    # CNN→hidsize projection, lastlayer) use pre-quantized int8 weights with
    # dynamic per-row activation quantization (ops/int8.py).  Serving-only —
    # the variable tree must be derived with quantize_variables.
    quantize_dense: bool = False

    @property
    def chans(self) -> Tuple[int, ...]:
        return tuple(int(self.impala_width * c) for c in self.impala_chans)

    @property
    def maxlen(self) -> int:
        """Attention window: memory_size - timesteps (reference: masked_attention.py:137)."""
        return self.attention_memory_size - (self.timesteps or 0)

    @property
    def dense_use_layer_norm(self) -> bool:
        """Dense layers swap group/batch norm for layer norm (reference: policy.py:145-151)."""
        return self.group_norm_groups is not None or self.batch_norm

    @classmethod
    def from_kwargs(cls, kwargs: Dict[str, Any]) -> "PolicyConfig":
        """Build from a raw ``.model`` kwargs dict, ignoring unknown keys."""
        kwargs = dict(kwargs)
        init_norm = kwargs.pop("init_norm_kwargs", {}) or {}
        impala_kwargs = kwargs.pop("impala_kwargs", {}) or {}
        known = {f.name for f in dataclasses.fields(cls)}
        out: Dict[str, Any] = {}
        for k, v in kwargs.items():
            if k in known:
                out[k] = _tupled(v)
        out["batch_norm"] = bool(init_norm.get("batch_norm", False))
        out["group_norm_groups"] = init_norm.get("group_norm_groups", None)
        out["impala_post_pool_groups"] = impala_kwargs.get("post_pool_groups", None)
        if "nblock" in impala_kwargs:
            out["impala_nblock"] = impala_kwargs["nblock"]
        return cls(**out)

    def replace(self, **kw) -> "PolicyConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class PiHeadConfig:
    """Action head options (reference: agent.py:38, make_action_head temperature)."""

    temperature: float = 1.0

    @classmethod
    def from_kwargs(cls, kwargs: Dict[str, Any]) -> "PiHeadConfig":
        t = kwargs.get("temperature", 1.0)
        return cls(temperature=float(t))


@dataclass(frozen=True)
class ActionTransformerConfig:
    """Camera quantizer settings (reference: agent.py:40-45)."""

    camera_binsize: int = 2
    camera_maxval: int = 10
    camera_mu: float = 10.0
    camera_quantization_scheme: str = "mu_law"


# Fallback defaults matching the published foundation models
# (reference: agent.py:16-36 POLICY_KWARGS, PI_HEAD_KWARGS).
FOUNDATION_POLICY_KWARGS: Dict[str, Any] = dict(
    attention_heads=16,
    attention_mask_style="clipped_causal",
    attention_memory_size=256,
    diff_mlp_embedding=False,
    hidsize=2048,
    img_shape=[128, 128, 3],
    impala_chans=[16, 32, 32],
    impala_kwargs={"post_pool_groups": 1},
    impala_width=8,
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    n_recurrence_layers=4,
    only_img_input=True,
    pointwise_ratio=4,
    pointwise_use_activation=False,
    recurrence_is_residual=True,
    recurrence_type="transformer",
    timesteps=128,
    use_pointwise_layer=True,
    use_pre_lstm_ln=False,
)

FOUNDATION_PI_HEAD_KWARGS: Dict[str, Any] = dict(temperature=2.0)

# Camera quantizer settings shared by the policy agent, IDM agent and data
# pipeline (reference: agent.py:40-45 == inverse_dynamics_model.py:14-19)
ACTION_TRANSFORMER_KWARGS: Dict[str, Any] = dict(
    camera_binsize=2,
    camera_maxval=10,
    camera_mu=10,
    camera_quantization_scheme="mu_law",
)

AGENT_RESOLUTION = (128, 128)  # reference: agent.py:14


def foundation_policy_config(width: int = 1, **overrides) -> PolicyConfig:
    """Config for the published foundation policy at a given width multiple.

    The published 1x/2x/3x checkpoints share every kwarg except hidsize and
    impala_width; 1x is hidsize 1024 / impala_width 4, scaling linearly
    (the agent.py fallback kwargs correspond to the 2x model).
    """
    cfg = PolicyConfig.from_kwargs(FOUNDATION_POLICY_KWARGS)
    cfg = cfg.replace(hidsize=1024 * width, impala_width=4 * width, **overrides)
    return cfg
