"""Sparse / flat StyleSpace direction model.

Port of `SimilarDomains/core/sparse_models.py`: all synthesis-conv style
vectors concatenated into one flat delta vector (6048 dims at 1024², the
"StyleSpace direction" artifact of the paper), with the conv<->style-layer
index maps (`common.py:370-396`), magnitude-based pruning, and conversion to
the offsets/hooks representation.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gagan_tpu.models.stylegan2 import SynthesisConfig


def conv_layer_names(syn_cfg: SynthesisConfig) -> List[str]:
    """Synthesis conv layers (torgb excluded), flat-vector order."""
    return [n for n in syn_cfg.layer_names() if not n.endswith("torgb")]


def conv_style_dims(syn_cfg: SynthesisConfig) -> List[int]:
    names = syn_cfg.layer_names()
    dims = syn_cfg.layer_in_channels()
    return [d for n, d in zip(names, dims) if not n.endswith("torgb")]


def flat_dim(syn_cfg: SynthesisConfig) -> int:
    """6048 for the 1024 FFHQ generator (sparse_models.py:62)."""
    return sum(conv_style_dims(syn_cfg))


def split_flat(syn_cfg: SynthesisConfig, deltas: jax.Array) -> List[jax.Array]:
    """split_stylespace (sparse_models.py:13-20)."""
    out = []
    start = 0
    for d in conv_style_dims(syn_cfg):
        out.append(deltas[..., start: start + d])
        start += d
    return out


def to_offsets(syn_cfg: SynthesisConfig, deltas: jax.Array) -> Dict:
    """Flat vector -> additive StyleSpace offsets pytree keyed by layer name
    (consumable by OffsetsSpec(style='additive') hooks)."""
    offsets = {}
    for name, seg in zip(conv_layer_names(syn_cfg),
                         split_flat(syn_cfg, deltas)):
        offsets[name] = {"offset": seg.reshape(1, -1)}
    return offsets


def to_hooks(syn_cfg: SynthesisConfig, deltas: jax.Array):
    from gagan_tpu.params.offsets import OffsetsSpec, make_hooks

    return make_hooks(OffsetsSpec(style="additive"),
                      to_offsets(syn_cfg, deltas))


def from_offsets(syn_cfg: SynthesisConfig, offsets: Dict) -> jax.Array:
    """Inverse of to_offsets (cat_stylespace, sparse_models.py:9-10)."""
    segs = [offsets[name]["offset"].reshape(-1)
            for name in conv_layer_names(syn_cfg)]
    return jnp.concatenate(segs)


def pruned(deltas: jax.Array, perc: float) -> jax.Array:
    """Zero the smallest-|delta| `perc` fraction (pruned_offsets,
    sparse_models.py:82-88)."""
    flat = deltas.reshape(-1)
    order = jnp.argsort(jnp.abs(flat))          # ascending
    k = int(flat.shape[0] * perc)
    mask = jnp.ones_like(flat).at[order[:k]].set(0.0)
    return (flat * mask).reshape(deltas.shape)


def conv_to_style_layer_index(syn_cfg: SynthesisConfig) -> Dict[int, int]:
    """conv index -> overall layer index incl. torgbs (convid_to_st,
    sparse_models.py:52-58; equals the reference table for 1024)."""
    names = syn_cfg.layer_names()
    out = {}
    conv_idx = 0
    for i, n in enumerate(names):
        if not n.endswith("torgb"):
            out[conv_idx] = i
            conv_idx += 1
    return out


def w_idx_to_style_idx(syn_cfg: SynthesisConfig) -> Dict[int, int]:
    """w-layer -> style-layer map (common.py:370-396): conv layers consume
    w indices 0..num_conv-1 in order; each block's torgb shares the w index
    of the block's last conv + 1 offsets exactly as the reference table."""
    names = syn_cfg.layer_names()
    out = {}
    w_idx = 0
    for i, n in enumerate(names):
        if n.endswith("torgb"):
            out.setdefault(w_idx, i)
        else:
            out[w_idx] = i
            w_idx += 1
    return out
