"""Import PyTorch StyleGAN2 checkpoints into gagan_tpu parameter pytrees.

Covers the NVlabs state_dict layout (`DissimilarDomains/training/networks.py`)
directly — our pytree naming deliberately mirrors it — and the rosinality
layout (`SimilarDomains/gan_models/StyleGAN2/model.py`) via a name/value
mapping (the same correspondence the reference documents in
`SimilarDomains/core/utils/karras_to_rosinality.py`).

Only numpy enters this module; callers convert torch tensors with
``{k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}`` so
the core package never depends on torch.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

# Buffers of the reference modules that have no equivalent in our pytrees
# (recomputed statically or owned by the offsets system).
_DROP_SUFFIXES = (
    "resample_filter",
    ".ones",
    ".ones_weights",
    ".offset_mask",
)


def nest_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Turn a flat dotted-key state dict into a nested pytree of jnp arrays."""
    out: Dict[str, Any] = {}
    for key, value in sd.items():
        if any(key.endswith(s) or s.strip(".") == key for s in _DROP_SUFFIXES):
            continue
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(value))
    return out


def generator_params_from_nvlabs(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """NVlabs `Generator.state_dict()` -> gagan_tpu generator params."""
    return nest_state_dict(sd)


def discriminator_params_from_nvlabs(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """NVlabs `Discriminator.state_dict()` -> gagan_tpu discriminator params."""
    return nest_state_dict(sd)


def split_offsets(params: Dict[str, Any]) -> Dict[str, Any]:
    """Extract reference-embedded offset parameters into a separate pytree.

    The reference registers offsets *inside* the generator modules
    (`networks.py:140-420`); gagan_tpu keeps them in their own pytree keyed by
    layer name ('b<res>.conv0' etc.).  Mutates ``params`` (removing the offset
    leaves) and returns the offsets pytree.
    """
    offsets: Dict[str, Any] = {}
    synthesis = params.get("synthesis", params)
    for bname, block in synthesis.items():
        if not isinstance(block, dict):
            continue
        for lname, layer in block.items():
            if not isinstance(layer, dict):
                continue
            entry: Dict[str, Any] = {}
            for k in [k for k in layer if k == "offset" or k.startswith("weights_offset")]:
                entry[k] = layer.pop(k)
            affine = layer.get("affine")
            if isinstance(affine, dict):
                aff_entry = {
                    k: affine.pop(k)
                    for k in [k for k in affine if k.startswith("weights_offset")]
                }
                if aff_entry:
                    entry["affine"] = aff_entry
            if entry:
                offsets[f"{bname}.{lname}"] = entry
    return offsets
