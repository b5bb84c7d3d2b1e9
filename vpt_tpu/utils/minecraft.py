"""Minecraft-specific helpers (reference: lib/minecraft_util.py).

``store_args`` — constructor-argument recorder used throughout the reference;
provided for API familiarity to users porting code onto this framework.

Normalized-entropy helpers — per-head entropy divided by log(number of
available options), respecting logit masks; used for policy-entropy
diagnostics over the factored action space.
"""

from __future__ import annotations

import functools
import inspect
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from vpt_tpu.models.heads import HeadSpec


def store_args(method):
    """Store provided __init__ args as instance attributes."""
    argspec = inspect.getfullargspec(method)
    defaults = {}
    if argspec.defaults is not None:
        defaults = dict(zip(argspec.args[-len(argspec.defaults):], argspec.defaults))
    if argspec.kwonlydefaults is not None:
        defaults.update(argspec.kwonlydefaults)
    arg_names = argspec.args[1:]

    @functools.wraps(method)
    def wrapper(*positional_args, **keyword_args):
        self = positional_args[0]
        args = defaults.copy()
        for name, value in zip(arg_names, positional_args[1:]):
            args[name] = value
        args.update(keyword_args)
        self.__dict__.update(args)
        return method(*positional_args, **keyword_args)

    return wrapper


def norm_entropy_from_cat_logits(
    logits: jnp.ndarray,
    spec: HeadSpec,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(normalized entropy, counted entries) for one categorical head.

    Entropy per entry is divided by log(n options); masked heads use the
    per-sample available-option count, and single-option entries are excluded
    from both sums (their normalized entropy is ill-defined — reference:
    lib/minecraft_util.py:37-59).
    """
    entropy = -jnp.sum(jnp.exp(logits) * logits, axis=-1)
    if mask is not None:
        n = jnp.sum(mask, axis=-1).astype(jnp.float32)
        norm_entropy = jnp.where(n == 1.0, 0.0, entropy / jnp.log(jnp.maximum(n, 2.0)))
        count = (n != 1.0).astype(jnp.int32)
    else:
        n = float(logits.shape[-1])
        norm_entropy = entropy / jnp.log(jnp.asarray(n))
        count = jnp.ones_like(norm_entropy, dtype=jnp.int32)
    for _ in spec.value_shape:
        norm_entropy = norm_entropy.sum(axis=-1)
        count = count.sum(axis=-1)
    return norm_entropy, count


def norm_cat_entropy(
    logits: Dict[str, jnp.ndarray],
    specs: Tuple[HeadSpec, ...],
    masks: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Summed normalized entropy + entry counts over all categorical heads."""
    masks = masks or {}
    total, counts = 0.0, 0
    for spec in specs:
        if spec.kind != "categorical":
            continue
        e, c = norm_entropy_from_cat_logits(logits[spec.key], spec, masks.get(spec.key))
        total = total + e
        counts = counts + c
    return total, counts
