"""Bidirectional converter between torch VPT checkpoints and our flax trees.

The published checkpoint contract (reference: run_agent.py:11-14,
agent.py:132-135, behavioural_cloning.py:42-47, 131-132):

  * ``.model``  — a plain pickle whose architecture kwargs live at
    ``["model"]["args"]["net"]["args"]`` with head options at
    ``["model"]["args"]["pi_head_opts"]`` (temperature may arrive as a string);
  * ``.weights`` — a ``torch.save``'d state_dict, loaded ``strict=False``
    (unknown checkpoint keys are ignored; missing model keys keep their
    initialized values).

Key mapping is mechanical because the flax module tree mirrors the torch
module names (see vpt_tpu/models/layers.py docstring):

  torch ``a.blocks.0.layer.weight``  ⇄  flax ``params/a/blocks_0/layer/kernel``

with layout transposes: Linear (O,I)→(I,O); Conv2d (O,I,kh,kw)→(kh,kw,I,O);
Conv3d (O,I,kt,kh,kw)→(kt,kh,kw,I,O); norm weight→scale.  EWMA normalizer
statistics and image statistics land in the ``stats`` collection.

torch is used only as a host-side file reader (it is CPU-only in this image);
everything downstream is numpy/JAX.
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

_STATS_LEAVES = {"running_mean", "running_mean_sq", "debiasing_term", "img_mean", "img_std"}
_LIST_SEG = re.compile(r"^(.*)_(\d+)$")


# ---------------------------------------------------------------------------
# .model (architecture pickle)
# ---------------------------------------------------------------------------


class _TolerantUnpickler(pickle.Unpickler):
    """Unpickler that stubs unknown globals — .model files may reference
    internal classes we don't need to materialize for kwargs extraction."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return type(name, (), {"__module__": module})


def save_model_parameters(
    path: str,
    policy_kwargs: Dict[str, Any],
    pi_head_kwargs: Dict[str, Any],
) -> None:
    """Write a reference-layout ``.model`` pickle so checkpoint pairs can be
    minted entirely from this framework (inverse of load_model_parameters)."""
    blob = {
        "model": {
            "args": {
                "net": {"args": dict(policy_kwargs)},
                "pi_head_opts": dict(pi_head_kwargs),
            }
        }
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_model_parameters(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read a ``.model`` pickle → (policy_kwargs, pi_head_kwargs).

    Matches load_model_parameters (reference: behavioural_cloning.py:41-47)
    including the float() coercion of temperature.
    """
    with open(path, "rb") as f:
        agent_parameters = _TolerantUnpickler(f).load()
    policy_kwargs = agent_parameters["model"]["args"]["net"]["args"]
    pi_head_kwargs = agent_parameters["model"]["args"]["pi_head_opts"]
    if "temperature" in pi_head_kwargs:
        pi_head_kwargs["temperature"] = float(pi_head_kwargs["temperature"])
    return policy_kwargs, pi_head_kwargs


# ---------------------------------------------------------------------------
# state_dict ⇄ variables
# ---------------------------------------------------------------------------


def _torch_key_to_path(key: str) -> Tuple[Tuple[str, ...], str, str]:
    """torch dotted key → (flax path, leaf kind, collection)."""
    segs = key.split(".")
    leaf = segs[-1]
    body = segs[:-1]
    # "blocks.0" → "blocks_0" (torch ModuleList indices)
    merged = []
    for s in body:
        if s.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{s}"
        else:
            merged.append(s)
    if leaf in _STATS_LEAVES:
        # "value_head.normalizer.running_mean" → stats value_head/running_mean
        if merged and merged[-1] == "normalizer":
            merged = merged[:-1]
        return tuple(merged) + (leaf,), leaf, "stats"
    return tuple(merged) + (leaf,), leaf, "params"


def _to_flax_leaf(name: str, value: np.ndarray) -> Tuple[str, np.ndarray]:
    """Rename + re-layout one torch tensor into flax convention."""
    if name == "weight":
        if value.ndim == 1:
            return "scale", value
        if value.ndim == 2:
            return "kernel", value.transpose(1, 0)
        if value.ndim == 4:
            return "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 5:
            return "kernel", value.transpose(2, 3, 4, 1, 0)
        raise ValueError(f"unsupported weight ndim {value.ndim}")
    return name, value


def _from_flax_leaf(name: str, value: np.ndarray) -> Tuple[str, np.ndarray]:
    if name == "kernel":
        if value.ndim == 2:
            return "weight", value.transpose(1, 0)
        if value.ndim == 4:
            return "weight", value.transpose(3, 2, 0, 1)
        if value.ndim == 5:
            return "weight", value.transpose(4, 3, 0, 1, 2)
        raise ValueError(f"unsupported kernel ndim {value.ndim}")
    if name == "scale":
        return "weight", value
    return name, value


def _set_in(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for seg in path[:-1]:
        node = node.setdefault(seg, {})
    node[path[-1]] = value


def _get_in(tree: Dict, path: Tuple[str, ...]):
    node = tree
    for seg in path:
        if not isinstance(node, dict) or seg not in node:
            return None
        node = node[seg]
    return node


def state_dict_to_variables(
    state_dict: Dict[str, np.ndarray],
    variables: Optional[Dict] = None,
    strict: bool = False,
) -> Tuple[Dict, Dict[str, list]]:
    """Convert a torch state_dict into flax ``{"params", "stats"}`` collections.

    When ``variables`` (an initialized tree) is given, checkpoint values are
    merged into a copy of it — shape-checked against the existing leaves — and
    leaves absent from the checkpoint keep their initialized values, i.e. the
    reference's ``strict=False`` load (agent.py:132-135).

    :returns: (variables, report) where report lists ``unexpected`` checkpoint
        keys and (when merging) ``missing`` model leaves.
    """
    import jax

    out: Dict[str, Dict] = {"params": {}, "stats": {}}
    if variables is not None:
        out = jax.tree.map(lambda x: x, dict(variables))  # shallow-safe copy
        out.setdefault("params", {})
        out.setdefault("stats", {})

    report = {"unexpected": [], "missing": [], "shape_mismatch": []}
    seen_paths = set()
    for key, value in state_dict.items():
        value = np.asarray(value)
        path, leaf_name, collection = _torch_key_to_path(key)
        flax_name, flax_value = _to_flax_leaf(path[-1], value)
        path = path[:-1] + (flax_name,)
        if variables is not None:
            existing = _get_in(out.get(collection, {}), path)
            if existing is None:
                report["unexpected"].append(key)
                if strict:
                    raise KeyError(f"unexpected checkpoint key {key}")
                continue
            # .shape/.size/.dtype are metadata — never force a device→host
            # transfer here (remote TPU platforms pay ~0.5s RTT per transfer)
            if tuple(existing.shape) != tuple(flax_value.shape):
                if flax_value.size == existing.size and flax_value.size == 1:
                    # 0-d scalars round-trip through torch.save as shape (1,)
                    flax_value = flax_value.reshape(existing.shape)
                else:
                    report["shape_mismatch"].append(
                        (key, tuple(existing.shape), tuple(flax_value.shape))
                    )
                    if strict:
                        raise ValueError(
                            f"shape mismatch for {key}: model {existing.shape} vs ckpt {flax_value.shape}"
                        )
                    continue
            flax_value = flax_value.astype(existing.dtype)
        _set_in(out[collection], path, flax_value)
        seen_paths.add((collection,) + path)

    if variables is not None:
        flat = jax.tree_util.tree_flatten_with_path(variables)[0]
        for keypath, _ in flat:
            path = tuple(
                k.key if hasattr(k, "key") else str(k) for k in keypath
            )
            if path not in seen_paths:
                report["missing"].append("/".join(path))
    return out, report


def variables_to_state_dict(variables: Dict) -> Dict[str, np.ndarray]:
    """Flax variables → torch-layout state_dict (the inverse mapping), so
    fine-tuned weights can be saved in the reference ``.weights`` format."""
    import jax

    out: Dict[str, np.ndarray] = {}
    for collection in ("params", "stats"):
        if collection not in variables:
            continue
        flat = jax.tree_util.tree_flatten_with_path(variables[collection])[0]
        for keypath, value in flat:
            segs = [k.key if hasattr(k, "key") else str(k) for k in keypath]
            leaf = segs[-1]
            value = np.array(value)  # owned, writable copy (torch.from_numpy-safe)
            torch_leaf, torch_value = _from_flax_leaf(leaf, value)
            body = []
            for s in segs[:-1]:
                m = _LIST_SEG.match(s)
                if m and s.rsplit("_", 1)[0] in ("blocks", "stacks"):
                    body.extend([m.group(1), m.group(2)])
                else:
                    body.append(s)
            if collection == "stats" and leaf in ("running_mean", "running_mean_sq", "debiasing_term"):
                body.append("normalizer")
            out[".".join(body + [torch_leaf])] = torch_value
    return out


# ---------------------------------------------------------------------------
# .weights file IO (torch container format)
# ---------------------------------------------------------------------------


def cast_params(variables: Dict, params_dtype: str) -> Dict:
    """Cast matrix/conv parameters to bfloat16 for serving (halves weight HBM
    traffic; scalars/vectors — norm scales, biases, stats — stay float32)."""
    if params_dtype != "bfloat16":
        return variables
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 and getattr(x, "ndim", 0) >= 2
        else x,
        variables,
    )


def load_weights(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.weights`` file (torch.save'd state_dict) into numpy arrays."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v) for k, v in sd.items()}


def save_weights(path: str, variables: Dict) -> None:
    """Write flax variables as a reference-compatible ``.weights`` file."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in variables_to_state_dict(variables).items()}
    torch.save(sd, path)
