"""Checkpoint weight averaging.

The reference carries a vestigial ``load_average_with_metadata`` (torch_util.py:
121-132) from the internal system that averaged checkpoints; here it's a real,
usable tool: average N ``.weights`` files (or flax variable trees) —
e.g. tail-averaging BC fine-tunes for a small generalization bump.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from vpt_tpu.checkpoint.torch_import import load_weights


def average_state_dicts(state_dicts: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Arithmetic mean of matching tensors; keys must agree across inputs."""
    assert state_dicts, "need at least one state_dict"
    keys = set(state_dicts[0])
    for sd in state_dicts[1:]:
        assert set(sd) == keys, "state_dict keys differ"
    out = {}
    for k in keys:
        acc = np.zeros_like(np.asarray(state_dicts[0][k], dtype=np.float64))
        for sd in state_dicts:
            acc += np.asarray(sd[k], dtype=np.float64)
        out[k] = (acc / len(state_dicts)).astype(np.asarray(state_dicts[0][k]).dtype)
    return out


def load_average(paths: List[str]) -> Dict[str, np.ndarray]:
    """Average several ``.weights`` files into one state_dict."""
    return average_state_dicts([load_weights(p) for p in paths])
