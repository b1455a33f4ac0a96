"""Checkpointing: versioned pytree snapshots + the portable adaptation schema.

Replaces the reference's two mechanisms (SURVEY.md §5.4):
  * DissimilarDomains' source-embedding module pickles
    (`torch_utils/persistence.py:35`) become plain npz pytree snapshots plus a
    JSON config — we control all code, so source embedding is unnecessary;
  * SimilarDomains' portable adaptation checkpoints keep the same logical
    schema as `get_trainable_model_state` (`core/utils/common.py:343-368`):
    {model_type, patch_key/parametrization, state_dict, sg2_params}.

Orbax handles async train-state checkpoints; npz is the interchange format
for weights (tools/convert_weights.py produces it from torch pickles).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------------
# Flat npz <-> pytree


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, prefix + k + ".", out)
    else:
        out[prefix[:-1]] = np.asarray(tree)


def tree_to_flat(tree: Any) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _flatten(tree, "", out)
    return out


def flat_to_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


# ----------------------------------------------------------------------------
# Network snapshots (the network-snapshot-<kimg>.pkl equivalent)


def save_snapshot(path: str, *, g_params=None, d_params=None, g_ema=None,
                  config: Optional[Dict] = None, extra: Optional[Dict] = None):
    """Write a network snapshot: npz of all pytrees + embedded config JSON."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    for name, tree in (("G", g_params), ("D", d_params), ("G_ema", g_ema)):
        if tree is not None:
            for k, v in tree_to_flat(tree).items():
                arrays[f"{name}/{k}"] = v
    if extra:
        for k, v in extra.items():
            arrays[f"extra/{k}"] = np.asarray(v)
    meta = json.dumps(config or {})
    arrays["__config__"] = np.frombuffer(meta.encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_snapshot(path: str):
    """Returns (trees, config) where trees maps G/D/G_ema/extra -> pytree."""
    data = np.load(path, allow_pickle=False)
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    config = {}
    for key in data.files:
        if key == "__config__":
            config = json.loads(bytes(data[key]).decode())
            continue
        group, rest = key.split("/", 1)
        groups.setdefault(group, {})[rest] = data[key]
    trees = {g: flat_to_tree(flat) for g, flat in groups.items()}
    return trees, config


# ----------------------------------------------------------------------------
# Portable adaptation checkpoints (SimilarDomains schema, common.py:343-368)


def save_adaptation(path: str, *, model_type: str, parametrization: str,
                    offsets: Any, sg2_config: Dict,
                    extra_state: Optional[Dict[str, Any]] = None):
    """model_type in {'original', 'mapper', 'parametrization', 'offsets'}."""
    arrays = {f"state_dict/{k}": v for k, v in tree_to_flat(offsets).items()}
    if extra_state:
        for k, v in tree_to_flat(extra_state).items():
            arrays[f"extra_state/{k}"] = v
    meta = {
        "model_type": model_type,
        "parametrization": parametrization,
        "sg2_params": sg2_config,
    }
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def _merge_layer_keys(tree: Dict[str, Any]) -> Dict[str, Any]:
    """Re-join offsets layer names ('b<res>.<layer>') that dot-flattening
    split into two levels."""
    import re

    out: Dict[str, Any] = {}
    for k, v in tree.items():
        if re.match(r"^b\d+$", k) and isinstance(v, dict):
            for k2, v2 in v.items():
                out[f"{k}.{k2}"] = v2
        else:
            out[k] = v
    return out


def load_adaptation(path: str) -> Tuple[Dict, Any, Optional[Dict]]:
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode())
    state = {k[len("state_dict/"):]: data[k] for k in data.files
             if k.startswith("state_dict/")}
    extra = {k[len("extra_state/"):]: data[k] for k in data.files
             if k.startswith("extra_state/")}
    offsets = _merge_layer_keys(flat_to_tree(state))
    return meta, offsets, (flat_to_tree(extra) if extra else None)


# ----------------------------------------------------------------------------
# Resumable train-state checkpoints via orbax


def save_train_state(ckpt_dir: str, step: int, state) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)


def load_train_state(ckpt_dir: str, step: int, abstract_state):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract_state)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_")]
    return max(steps) if steps else None
