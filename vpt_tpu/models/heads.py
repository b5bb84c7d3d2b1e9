"""Action heads and value head.

The heads split into two parts, TPU-style:
  * flax modules producing log-probability parameters (the only part that owns
    weights) — CategoricalActionHead / DictActionHead / ScaledMSEHead;
  * pure jnp distribution math over those parameters (logprob / entropy /
    sample / KL), driven by static HeadSpec metadata derived from the action
    space — no module instance needed, so the functions compose freely under
    jit / vmap / grad.

Numerics match the reference (lib/action_head.py:136-260): temperature is
applied by dividing raw logits before a float32 log-softmax; masked logits are
set to LOG0 = -100 before the softmax; sampling uses the Gumbel-argmax trick;
logprob gathers then sums over the head's value shape; KL(q||p) is
Σ exp(q)·(q−p).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vpt_tpu.spaces import DictType, Discrete, Real, TensorType

LOG0 = -100.0


# ---------------------------------------------------------------------------
# Static head metadata
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class HeadSpec:
    """Shape metadata of one sub-head.

    value_shape: shape of one action value (e.g. (1,) joint buttons; (2,) IDM
    camera axes); num_actions: categorical cardinality per entry (ignored for
    gaussian heads); kind: "categorical" | "gaussian"."""

    key: str
    value_shape: Tuple[int, ...]
    num_actions: int = 0
    kind: str = "categorical"


def head_specs_from_space(ac_space) -> Tuple[HeadSpec, ...]:
    """DictType action space → ordered HeadSpecs (reference: make_action_head,
    lib/action_head.py:263-275).  Discrete eltypes become categorical heads,
    Real eltypes diagonal-gaussian heads."""
    specs = []
    for key, ttype in ac_space.items():
        assert isinstance(ttype, TensorType), f"unsupported space for {key}: {ttype}"
        if isinstance(ttype.eltype, Discrete):
            specs.append(HeadSpec(key=key, value_shape=tuple(ttype.shape), num_actions=ttype.eltype.n))
        elif isinstance(ttype.eltype, Real):
            assert len(ttype.shape) == 1, "Nontrivial shapes not yet implemented."
            specs.append(HeadSpec(key=key, value_shape=tuple(ttype.shape), kind="gaussian"))
        else:
            raise NotImplementedError(f"unsupported eltype for {key}: {ttype.eltype}")
    return tuple(specs)


# ---------------------------------------------------------------------------
# Weight-owning modules
# ---------------------------------------------------------------------------


class CategoricalActionHead(nn.Module):
    """Linear → reshape → /temperature → (mask) → float32 log-softmax
    (reference: lib/action_head.py:136-174)."""

    spec: HeadSpec
    temperature: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        out_shape = self.spec.value_shape + (self.spec.num_actions,)
        flat = 1
        for s in out_shape:
            flat *= s
        x = nn.Dense(
            flat,
            name="linear_layer",
            kernel_init=nn.initializers.orthogonal(0.01),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = x.reshape(x.shape[:-1] + out_shape)
        x = x / jnp.asarray(self.temperature, x.dtype)
        if mask is not None:
            x = jnp.where(mask, x, LOG0)
        return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


class DiagGaussianActionHead(nn.Module):
    """Gaussian head: means from a linear layer, per-dim learned log-std
    (reference: lib/action_head.py:54-133).  Output stacks [mean, logstd] on a
    trailing axis of size 2."""

    spec: HeadSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        assert mask is None, "Can not use a mask in a gaussian action head"
        n = self.spec.value_shape[0]
        means = nn.Dense(
            n,
            name="linear_layer",
            kernel_init=nn.initializers.orthogonal(0.01),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        log_std = self.param("log_std", nn.initializers.zeros_init(), (n,), jnp.float32)
        log_std = jnp.broadcast_to(log_std, means.shape).astype(means.dtype)
        return jnp.stack([means, log_std], axis=-1)


class DictActionHead(nn.Module):
    """One sub-head per action-space key (reference: lib/action_head.py:223-260)."""

    specs: Tuple[HeadSpec, ...]
    temperature: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[Dict[str, jnp.ndarray]] = None) -> Dict[str, jnp.ndarray]:
        out = {}
        for spec in self.specs:
            m = None if mask is None else mask.get(spec.key)
            if spec.kind == "gaussian":
                out[spec.key] = DiagGaussianActionHead(spec=spec, dtype=self.dtype, name=spec.key)(x, mask=m)
            else:
                out[spec.key] = CategoricalActionHead(
                    spec=spec, temperature=self.temperature, dtype=self.dtype, name=spec.key
                )(x, mask=m)
        return out


# ---------------------------------------------------------------------------
# Distribution math (pure)
# ---------------------------------------------------------------------------


def categorical_logprob(logits: jnp.ndarray, actions: jnp.ndarray, spec: HeadSpec) -> jnp.ndarray:
    """Σ over value_shape of log p(action); actions (..., *value_shape) int."""
    actions = actions.astype(jnp.int32)
    picked = jnp.take_along_axis(logits, actions[..., None], axis=-1)[..., 0]
    for _ in spec.value_shape:
        picked = picked.sum(axis=-1)
    return picked


def categorical_entropy(logits: jnp.ndarray, spec: HeadSpec) -> jnp.ndarray:
    ent = -jnp.sum(jnp.exp(logits) * logits, axis=-1)
    for _ in spec.value_shape:
        ent = ent.sum(axis=-1)
    return ent


def categorical_sample(key, logits: jnp.ndarray, deterministic: bool = False) -> jnp.ndarray:
    if deterministic:
        return jnp.argmax(logits, axis=-1)
    # Gumbel-argmax (reference: lib/action_head.py:195-207; jax.random.uniform
    # never returns 1.0, so the reference's u==1.0 clamp is inherently satisfied)
    u = jax.random.uniform(key, logits.shape, dtype=jnp.float32, minval=jnp.finfo(jnp.float32).tiny)
    return jnp.argmax(logits - jnp.log(-jnp.log(u)), axis=-1)


def categorical_kl(logits_q: jnp.ndarray, logits_p: jnp.ndarray, spec: HeadSpec) -> jnp.ndarray:
    """KL(q || p) = Σ exp(q)·(q−p), reduced over value_shape, keepdim on last
    (reference: lib/action_head.py:209-220)."""
    kl = jnp.sum(jnp.exp(logits_q) * (logits_q - logits_p), axis=-1, keepdims=True)
    for _ in spec.value_shape:
        kl = kl.sum(axis=-2)
    return kl


LOG2PI = 1.8378770664093453  # log(2π)


def gaussian_logprob(pd: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
    """pd (..., n, 2) = [mean, logstd]; reference: lib/action_head.py:86-95."""
    mean, log_std = pd[..., 0], pd[..., 1]
    z = (actions - mean) / jnp.exp(log_std)
    return -(0.5 * jnp.sum(z ** 2 + LOG2PI, axis=-1) + jnp.sum(log_std, axis=-1))


def gaussian_entropy(pd: jnp.ndarray) -> jnp.ndarray:
    log_std = pd[..., 1]
    return jnp.sum(log_std + 0.5 * (LOG2PI + 1.0), axis=-1)


def gaussian_sample(key, pd: jnp.ndarray, deterministic: bool = False) -> jnp.ndarray:
    mean, log_std = pd[..., 0], pd[..., 1]
    if deterministic:
        return mean
    return mean + jax.random.normal(key, mean.shape, mean.dtype) * jnp.exp(log_std)


def gaussian_kl(pd_q: jnp.ndarray, pd_p: jnp.ndarray) -> jnp.ndarray:
    """KL(q || p) per reference lib/action_head.py:114-133 (keepdim on last)."""
    mq, lq = pd_q[..., 0], pd_q[..., 1]
    mp, lp = pd_p[..., 0], pd_p[..., 1]
    sq, sp = jnp.exp(lq), jnp.exp(lp)
    kl = lp - lq + (sq ** 2 + (mq - mp) ** 2) / (2.0 * sp ** 2) - 0.5
    return jnp.sum(kl, axis=-1, keepdims=True)


def _head_logprob(pd, actions, spec: HeadSpec):
    if spec.kind == "gaussian":
        return gaussian_logprob(pd, actions)
    return categorical_logprob(pd, actions, spec)


def dict_logprob(logits: Dict[str, jnp.ndarray], actions: Dict[str, jnp.ndarray],
                 specs: Tuple[HeadSpec, ...]) -> jnp.ndarray:
    return sum(_head_logprob(logits[s.key], actions[s.key], s) for s in specs)


def dict_entropy(logits: Dict[str, jnp.ndarray], specs: Tuple[HeadSpec, ...]) -> jnp.ndarray:
    return sum(
        gaussian_entropy(logits[s.key]) if s.kind == "gaussian" else categorical_entropy(logits[s.key], s)
        for s in specs
    )


def dict_sample(key, logits: Dict[str, jnp.ndarray], specs: Tuple[HeadSpec, ...],
                deterministic: bool = False) -> Dict[str, jnp.ndarray]:
    keys = jax.random.split(key, len(specs))
    return {
        s.key: (
            gaussian_sample(k, logits[s.key], deterministic)
            if s.kind == "gaussian"
            else categorical_sample(k, logits[s.key], deterministic)
        )
        for s, k in zip(specs, keys)
    }


def dict_kl(logits_q, logits_p, specs: Tuple[HeadSpec, ...]) -> jnp.ndarray:
    return sum(
        gaussian_kl(logits_q[s.key], logits_p[s.key]) if s.kind == "gaussian"
        else categorical_kl(logits_q[s.key], logits_p[s.key], s)
        for s in specs
    )


# ---------------------------------------------------------------------------
# Value head with EWMA return normalization
# ---------------------------------------------------------------------------
#
# The normalizer math lives in pure functions over a stats dict
# {"running_mean", "running_mean_sq", "debiasing_term"} (the exact leaves the
# checkpoint stores — reference: lib/normalize_ewma.py) so consumers outside
# the module graph (the PPO value loss in training/rl.py) share one source of
# truth with ScaledMSEHead.


def ewma_mean_var(stats: Dict[str, jnp.ndarray], epsilon: float = 1e-5):
    """Debiased (mean, var) from raw EWMA accumulators
    (reference: normalize_ewma.py:25-31, 57-60)."""
    debias = jnp.clip(stats["debiasing_term"], epsilon, None)
    mean = stats["running_mean"] / debias
    mean_sq = stats["running_mean_sq"] / debias
    var = jnp.clip(mean_sq - mean ** 2, 1e-2, None)
    return mean, var


def ewma_normalize(stats: Dict[str, jnp.ndarray], x, norm_axes: int = 2,
                   epsilon: float = 1e-5):
    mean, var = ewma_mean_var(stats, epsilon)
    shape = (1,) * norm_axes + mean.shape
    return (x.astype(jnp.float32) - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape))


def ewma_denormalize(stats: Dict[str, jnp.ndarray], x, norm_axes: int = 2,
                     epsilon: float = 1e-5):
    mean, var = ewma_mean_var(stats, epsilon)
    shape = (1,) * norm_axes + mean.shape
    return x.astype(jnp.float32) * jnp.sqrt(var.reshape(shape)) + mean.reshape(shape)


def ewma_updated_stats(stats: Dict[str, jnp.ndarray], target, beta: float = 0.99999,
                       norm_axes: int = 2, per_element_update: bool = False) -> Dict[str, jnp.ndarray]:
    """Stats dict after folding in a batch of targets — functional counterpart
    of NormalizeEwma.forward's in-place update (reference:
    normalize_ewma.py:33-55)."""
    x = target.astype(jnp.float32)
    axes = tuple(range(norm_axes))
    batch_mean = x.mean(axis=axes)
    batch_sq_mean = (x ** 2).mean(axis=axes)
    if per_element_update:
        size = 1
        for a in axes:
            size *= x.shape[a]
        weight = beta ** size
    else:
        weight = beta
    return {
        "running_mean": stats["running_mean"] * weight + batch_mean * (1.0 - weight),
        "running_mean_sq": stats["running_mean_sq"] * weight + batch_sq_mean * (1.0 - weight),
        "debiasing_term": stats["debiasing_term"] * weight + (1.0 - weight),
    }


class ScaledMSEHead(nn.Module):
    """Linear value head trained in EWMA-normalized target space
    (reference: lib/scaled_mse_head.py + lib/normalize_ewma.py).

    The running statistics live in the ``stats`` variable collection (they are
    non-gradient checkpoint state in the reference too), and updates are
    explicit via ``updated_stats`` — BC never updates them, matching the
    reference where the normalizer only runs inside ``loss``.
    """

    output_size: int = 1
    norm_axes: int = 2
    beta: float = 0.99999
    epsilon: float = 1e-5
    per_element_update: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.linear = nn.Dense(
            self.output_size,
            name="linear",
            kernel_init=nn.initializers.orthogonal(),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        self.running_mean = self.variable(
            "stats", "running_mean", jnp.zeros, (self.output_size,), jnp.float32)
        self.running_mean_sq = self.variable(
            "stats", "running_mean_sq", jnp.zeros, (self.output_size,), jnp.float32)
        self.debiasing_term = self.variable(
            "stats", "debiasing_term", jnp.zeros, (), jnp.float32)

    def __call__(self, x):
        return self.linear(x)

    def _stats(self):
        return {
            "running_mean": self.running_mean.value,
            "running_mean_sq": self.running_mean_sq.value,
            "debiasing_term": self.debiasing_term.value,
        }

    def _mean_var(self):
        return ewma_mean_var(self._stats(), self.epsilon)

    def normalize(self, x):
        return ewma_normalize(self._stats(), x, self.norm_axes, self.epsilon)

    def denormalize(self, x):
        return ewma_denormalize(self._stats(), x, self.norm_axes, self.epsilon)

    def loss(self, prediction, target):
        """MSE in normalized space (reference: scaled_mse_head.py:37-43)."""
        return jnp.mean((prediction.astype(jnp.float32) - self.normalize(target)) ** 2)

    def updated_stats(self, target):
        """New (mean, mean_sq, debias) after folding in a batch of targets —
        functional counterpart of NormalizeEwma.forward's in-place update
        (reference: normalize_ewma.py:33-55)."""
        new = ewma_updated_stats(
            self._stats(), target, self.beta, self.norm_axes, self.per_element_update
        )
        return new["running_mean"], new["running_mean_sq"], new["debiasing_term"]
