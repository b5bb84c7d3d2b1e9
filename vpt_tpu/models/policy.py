"""The two VPT model graphs: the agent policy and the inverse-dynamics model.

Reference: lib/policy.py.  Functional flax modules; the recurrent hidden state
(per-block KV caches + state masks) is an explicit argument/return pytree, so
a jitted step/train function carries it with no module-side mutation.

Flow (policy, reference policy.py:193-218):
    uint8 frames → ImgPreprocessing (/255) → ImpalaCNN → linear → hidsize
    → [pre_lstm_ln] → 4× ResidualRecurrentBlock (clipped-causal attention)
    → ReLU → lastlayer (LN→linear→ReLU) → final LayerNorm
    → {pi_head (Dict of categoricals), value_head (ScaledMSE)}

Flow (IDM, reference policy.py:374-392): adds a Conv3D front end before the
Impala stack, uses unmasked (bidirectional) attention, has no value head, and
— quirk preserved bit-for-bit — computes ``lastlayer(x)`` only to discard it,
applying ``final_ln`` to the pre-lastlayer activations (policy.py:390-391).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vpt_tpu.config import PolicyConfig
from vpt_tpu.models.heads import (
    DictActionHead,
    HeadSpec,
    ScaledMSEHead,
    head_specs_from_space,
)
from vpt_tpu.models.impala import ImpalaCNN
from vpt_tpu.models.layers import FanInInitLayer, LayerNorm
from vpt_tpu.models.transformer import ResidualRecurrentBlocks


def _compute_dtype(cfg: PolicyConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class ImgPreprocessing(nn.Module):
    """uint8 → float32, scaled by 1/255 or normalized by dataset statistics
    (reference: policy.py:21-45).

    ``img_statistics`` is a path to an npz with full ``mean``/``std``
    *images* (reference policy.py:29-36 loads them into non-grad params).
    The file is read only inside the variable initializers, i.e. once at
    ``model.init`` — never on ``apply``, where the values come from the
    checkpoint's ``stats`` collection at their true image shapes.
    """

    scale_img: bool = True
    img_statistics: Optional[str] = None

    def setup(self):
        if self.img_statistics is not None:
            path = self.img_statistics

            def _load(key):
                def init():
                    with np.load(path) as stats:
                        return jnp.asarray(stats[key], jnp.float32)

                return init

            self.img_mean = self.variable("stats", "img_mean", _load("mean"))
            self.img_std = self.variable("stats", "img_std", _load("std"))

    def __call__(self, img):
        x = img.astype(jnp.float32)
        if self.img_statistics is not None:
            x = (x - self.img_mean.value) / self.img_std.value
        else:
            x = x / (255.0 if self.scale_img else 1.0)
        return x


class ImgObsProcess(nn.Module):
    """ImpalaCNN followed by a linear projection to hidsize
    (reference: policy.py:48-80)."""

    cfg: PolicyConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dtype = _compute_dtype(cfg)
        cnn_kwargs = dict(
            chans=cfg.chans,
            outsize=cfg.obs_processing_width,
            nblock=cfg.impala_nblock,
            post_pool_groups=cfg.impala_post_pool_groups,
            batch_norm=cfg.batch_norm,
            group_norm_groups=cfg.group_norm_groups,
            first_conv_norm=cfg.first_conv_norm,
            dense_layer_norm=cfg.dense_use_layer_norm,
            dtype=dtype,
            remat=cfg.remat,
            pool_impl=cfg.pool_impl,
        )
        chunks = cfg.cnn_scan_chunks
        b, t = x.shape[:2]
        if chunks > 1 and (b * t) % chunks == 0 and (b * t) > chunks:
            # sequentialize the per-frame CNN over chunks (params broadcast:
            # the module scope and checkpoint paths are unchanged)
            sub = (b * t) // chunks
            xs = x.reshape(chunks, 1, sub, *x.shape[2:])
            # under the scan, per-stack remat is ALWAYS off: the body-level
            # remat below subsumes it when cfg.remat is set (leaving both on
            # makes the backward recompute the CNN twice — measured -13% at
            # 2x), and it is already off otherwise
            cnn = ImpalaCNN(**{**cnn_kwargs, "remat": False}, name="cnn")

            def body(mdl, carry, xc):
                return carry, mdl(xc)

            if cfg.remat:
                # remat the WHOLE scan body, not just each stack inside it:
                # otherwise the scan saves every iteration's inter-stack
                # activations as backward residuals (e.g. f32 (chunks, sub,
                # 64, 64, 192) — gigabytes at 3x width), defeating the point
                # of chunking.  With body-level remat the only per-iteration
                # residuals are the raw chunk inputs; the backward pass
                # recomputes each chunk's CNN once.
                # prevent_cse=False is safe (and cheaper) under lax.scan.
                body = nn.remat(body, prevent_cse=False)
            scanned = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
                length=chunks,
            )
            _, ys = scanned(cnn, None, xs)
            x = ys.reshape(b, t, cfg.obs_processing_width)
        else:
            x = ImpalaCNN(**cnn_kwargs, name="cnn")(x)
        x = FanInInitLayer(
            outchan=cfg.hidsize,
            layer_type="linear",
            layer_norm=cfg.dense_use_layer_norm,
            dtype=dtype,
            name="linear",
            quantize=cfg.quantize_dense,
        )(x)
        return x


class MinecraftPolicy(nn.Module):
    """Latent trunk: vision → recurrence → pi/vf latents
    (reference: policy.py:83-224)."""

    cfg: PolicyConfig

    def setup(self):
        cfg = self.cfg
        dtype = _compute_dtype(cfg)
        self.img_preprocess = ImgPreprocessing(
            scale_img=cfg.scale_input_img,
            img_statistics=cfg.img_statistics,
        )
        self.img_process = ImgObsProcess(cfg)
        if cfg.use_pre_lstm_ln:
            self.pre_lstm_ln = LayerNorm()
        self.recurrent_layer = ResidualRecurrentBlocks(
            hidsize=cfg.hidsize,
            timesteps=cfg.timesteps,
            n_block=cfg.n_recurrence_layers,
            recurrence_type=cfg.recurrence_type,
            is_residual=cfg.recurrence_is_residual,
            use_pointwise_layer=cfg.use_pointwise_layer,
            pointwise_ratio=cfg.pointwise_ratio,
            pointwise_use_activation=cfg.pointwise_use_activation,
            attention_heads=cfg.attention_heads,
            attention_memory_size=cfg.attention_memory_size,
            attention_mask_style=cfg.attention_mask_style,
            dtype=dtype,
            remat=cfg.remat,
            quantize_dense=cfg.quantize_dense,
        ) if cfg.recurrence_type != "none" else None
        self.lastlayer = FanInInitLayer(
            outchan=cfg.hidsize,
            layer_type="linear",
            layer_norm=cfg.dense_use_layer_norm,
            dtype=dtype,
            quantize=cfg.quantize_dense,
        )
        self.final_ln = LayerNorm()

    def __call__(self, img, first, state):
        x = self.img_preprocess(img)
        x = self.img_process(x)
        if self.cfg.use_pre_lstm_ln:
            x = self.pre_lstm_ln(x)
        if self.recurrent_layer is not None:
            x, state_out = self.recurrent_layer(x, first, state)
        else:
            state_out = state
        x = nn.relu(x)
        x = self.lastlayer(x)
        x = self.final_ln(x)
        return x, state_out


class MinecraftAgentPolicy(nn.Module):
    """Trunk + action head + value head (reference: policy.py:227-269)."""

    cfg: PolicyConfig
    head_specs: Tuple[HeadSpec, ...]
    temperature: float = 1.0

    def setup(self):
        self.net = MinecraftPolicy(self.cfg)
        self.value_head = ScaledMSEHead(output_size=1, norm_axes=2)
        self.pi_head = DictActionHead(
            specs=self.head_specs,
            temperature=self.temperature,
            dtype=_compute_dtype(self.cfg),
        )

    def __call__(self, img, first, state, action_mask: Optional[Dict] = None):
        """:returns: ({"pi_logits": dict, "vpred": denormalized (B,T,1),
        "vpred_raw": normalized-space (B,T,1)}, state_out)"""
        latent, state_out = self.net(img, first, state)
        pi_logits = self.pi_head(latent, mask=action_mask)
        vpred_raw = self.value_head(latent)
        return (
            {
                "pi_logits": pi_logits,
                "vpred_raw": vpred_raw,
                "vpred": self.value_head.denormalize(vpred_raw),
            },
            state_out,
        )

    # -- pipeline-parallel split points (parallel/pp.py): __call__ ==
    # -- heads_from_recurrent(recurrent_layer(embed(img))) exactly, letting a
    # -- pp train step run the block stack as a GPipe pipeline while the CNN
    # -- front and the head tail stay data-parallel.

    def embed(self, img):
        """Pre-recurrence trunk: preprocess → CNN → [pre_lstm_ln] latents."""
        x = self.net.img_preprocess(img)
        x = self.net.img_process(x)
        if self.cfg.use_pre_lstm_ln:
            x = self.net.pre_lstm_ln(x)
        return x

    def heads_from_recurrent(self, x):
        """Post-recurrence tail: relu → lastlayer → final_ln → heads."""
        x = nn.relu(x)
        x = self.net.lastlayer(x)
        x = self.net.final_ln(x)
        pi_logits = self.pi_head(x)
        vpred_raw = self.value_head(x)
        return {
            "pi_logits": pi_logits,
            "vpred_raw": vpred_raw,
            "vpred": self.value_head.denormalize(vpred_raw),
        }

    # -- reference-API conveniences (reference: policy.py:271-339), callable
    # -- via model.apply(variables, ..., method="act") etc.

    def act(self, img, first, state, rng, stochastic: bool = True):
        """One observation step (adds/strips the time dim like the reference's
        MinecraftAgentPolicy.act, policy.py:307-328).

        :param img: (B, H, W, C) single observation per stream
        :returns: (action dict (B, ...), state_out,
                   {"log_prob": (B,), "vpred": (B,)})
        """
        from vpt_tpu.models.heads import dict_logprob, dict_sample

        out, state_out = self(img[:, None], first[:, None], state)
        logits = {k: v[:, 0] for k, v in out["pi_logits"].items()}
        action = dict_sample(rng, logits, self.head_specs, deterministic=not stochastic)
        log_prob = dict_logprob(logits, action, self.head_specs)
        return action, state_out, {"log_prob": log_prob, "vpred": out["vpred"][:, 0, 0]}

    def get_output_for_observation(self, img, state, first):
        """(pd, denormalized value, state_out) for one observation per stream
        (reference: policy.py:287-305)."""
        out, state_out = self(img[:, None], first[:, None], state)
        pd = {k: v[:, 0] for k, v in out["pi_logits"].items()}
        return pd, out["vpred"][:, 0, 0], state_out

    def v(self, img, first, state):
        """Value prediction only (reference: policy.py:330-339)."""
        out, _ = self(img[:, None], first[:, None], state)
        return out["vpred"][:, 0, 0]


class InverseActionNet(nn.Module):
    """IDM trunk: Conv3D → Impala → bidirectional transformer
    (reference: policy.py:342-403)."""

    cfg: PolicyConfig

    def setup(self):
        cfg = self.cfg
        dtype = _compute_dtype(cfg)
        self.img_preprocess = ImgPreprocessing(
            scale_img=cfg.scale_input_img,
            img_statistics=cfg.img_statistics,
        )
        if cfg.conv3d_params is not None:
            p = dict(cfg.conv3d_params)
            ks = p.get("kernel_size", 3)
            ks = (ks,) * 3 if isinstance(ks, int) else tuple(ks)
            pad = p.get("padding", 0)
            pad = (pad,) * 3 if isinstance(pad, int) else tuple(pad)
            stride = p.get("stride", 1)
            stride = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
            self.conv3d_layer = FanInInitLayer(
                outchan=p["outchan"],
                layer_type="conv3d",
                kernel_size=ks,
                strides=stride,
                padding=tuple((q, q) for q in pad),
                # 3D conv is the first layer; its input is already normalized
                # (reference: policy.py:361-372 strips norm kwargs)
                batch_norm=False,
                group_norm_groups=None,
                dtype=dtype,
            )
        else:
            self.conv3d_layer = None
        self.img_process = ImgObsProcess(
            # first Impala conv normalizes iff a conv3d front end exists
            # (reference: policy.py:354-359)
            cfg.replace(first_conv_norm=cfg.conv3d_params is not None)
        )
        self.recurrent_layer = ResidualRecurrentBlocks(
            hidsize=cfg.hidsize,
            timesteps=cfg.timesteps,
            n_block=cfg.n_recurrence_layers,
            recurrence_type=cfg.recurrence_type,
            is_residual=cfg.recurrence_is_residual,
            use_pointwise_layer=cfg.use_pointwise_layer,
            pointwise_ratio=cfg.pointwise_ratio,
            pointwise_use_activation=cfg.pointwise_use_activation,
            attention_heads=cfg.attention_heads,
            attention_memory_size=cfg.attention_memory_size,
            attention_mask_style=cfg.attention_mask_style,
            dtype=dtype,
            remat=cfg.remat,
            quantize_dense=cfg.quantize_dense,
        )
        self.lastlayer = FanInInitLayer(
            outchan=cfg.hidsize,
            layer_type="linear",
            layer_norm=cfg.dense_use_layer_norm,
            dtype=dtype,
            quantize=cfg.quantize_dense,
        )
        self.final_ln = LayerNorm()

    def __call__(self, img, first, state):
        x = self.img_preprocess(img)
        if self.conv3d_layer is not None:
            # (B, T, H, W, C) is already the TPU-native NDHWC conv layout;
            # no per-sample split needed (reference loops at policy.py:394-403
            # purely to bound torch memory)
            x = self.conv3d_layer(x)
        x = self.img_process(x)
        x, state_out = self.recurrent_layer(x, first, state)
        x = nn.relu(x)
        _discarded = self.lastlayer(x)  # reference quirk: computed, overwritten
        x = self.final_ln(x)
        return x, state_out


class InverseActionPolicy(nn.Module):
    """IDM trunk + factored action head (reference: policy.py:406-467)."""

    cfg: PolicyConfig
    head_specs: Tuple[HeadSpec, ...]
    temperature: float = 1.0

    def setup(self):
        self.net = InverseActionNet(self.cfg)
        self.pi_head = DictActionHead(
            specs=self.head_specs,
            temperature=self.temperature,
            dtype=_compute_dtype(self.cfg),
        )

    def __call__(self, img, first, state, action_mask: Optional[Dict] = None):
        latent, state_out = self.net(img, first, state)
        return {"pi_logits": self.pi_head(latent, mask=action_mask)}, state_out

    def predict(self, img, first, state, deterministic: bool = True, rng=None):
        """(action, state_out, {"log_prob", "pd"}) over a frame window
        (reference: policy.py:448-464)."""
        import jax

        from vpt_tpu.models.heads import dict_logprob, dict_sample

        out, state_out = self(img, first, state)
        pd = out["pi_logits"]
        if rng is None:
            assert deterministic, "predict(deterministic=False) requires an rng key"
            rng = jax.random.PRNGKey(0)  # unused by the argmax path
        action = dict_sample(rng, pd, self.head_specs, deterministic=deterministic)
        log_prob = dict_logprob(pd, action, self.head_specs)
        return action, state_out, {"log_prob": log_prob, "pd": pd}


def get_logprob_of_action(head_specs: Tuple[HeadSpec, ...], pd: Dict, action: Dict):
    """Log-probability of ``action`` under distribution params ``pd``
    (reference: policy.py:271-279; pure function — no params needed)."""
    from vpt_tpu.models.heads import dict_logprob

    return dict_logprob(pd, action, head_specs)


def get_kl_of_action_dists(head_specs: Tuple[HeadSpec, ...], pd1: Dict, pd2: Dict):
    """KL divergence between two action distributions
    (reference: policy.py:281-285)."""
    from vpt_tpu.models.heads import dict_kl

    return dict_kl(pd1, pd2, head_specs)


def policy_initial_state(cfg: PolicyConfig, batchsize: int, ring: bool = False):
    """Initial recurrent state for a policy/IDM config — a pure function of the
    config so callers never need a live module (reference: policy.py:220-224
    routes through module instances instead).

    ``ring=True`` returns the rotating-cache decode state (single-step
    inference only; one slot written per step instead of a full-cache shift).
    """
    from vpt_tpu.models.transformer import (
        masked_attention_initial_state,
        ring_initial_state,
    )

    if cfg.recurrence_type == "none":
        return None
    dtype = _compute_dtype(cfg)
    if cfg.recurrence_type == "transformer":
        if ring:
            return [
                ring_initial_state(batchsize, cfg.maxlen, cfg.hidsize, dtype,
                                   cfg.attention_heads)
                for _ in range(cfg.n_recurrence_layers)
            ]
        return [
            masked_attention_initial_state(batchsize, cfg.maxlen, cfg.hidsize, dtype)
            for _ in range(cfg.n_recurrence_layers)
        ]
    return [
        {
            "h": jnp.zeros((batchsize, cfg.hidsize), dtype),
            "c": jnp.zeros((batchsize, cfg.hidsize), dtype),
        }
        for _ in range(cfg.n_recurrence_layers)
    ]


def idm_input_shape(cfg: PolicyConfig) -> Tuple[int, int, int]:
    """The raw (h, w, c) VIDEO input shape of an IDM config.

    In the reference's kwargs convention ``img_shape[2]`` declares the IMPALA
    stack's input — i.e. the conv3d front end's OUTPUT channel count (the
    published 4x IDM ships ``img_shape=[128, 128, 128]``) — not the video's
    channel count.  Templates built naively from img_shape would give the
    conv3d kernel the wrong fan-in, and strict=False weight loading would
    then silently drop the published conv3d weights."""
    h, w, c = cfg.img_shape
    if cfg.conv3d_params:
        c = int(cfg.conv3d_params.get("inchan", 3))
    return (int(h), int(w), int(c))
