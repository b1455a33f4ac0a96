"""Selective-training masks: the requires-grad-parts grammar as pytree masks.

TPU-native replacement for the reference's in-place `set_requires_grad` /
`name_filters` machinery (`DissimilarDomains/training/training_loop.py:41-98`):
instead of toggling `.requires_grad_` per phase, we build a boolean pytree
mask once and wrap the optimizer in `optax.masked`.  Parameter "names" are
the dotted pytree paths, which match the reference's `named_parameters()`
strings by construction.

Part grammar (each optionally suffixed `.b<res>`):
  all | mapping
  | synt_affine | synt_conv | synt_const | synt_offset | synt_weights_offset
  | synt_affine_weights_offset
  | tRGB_affine | tRGB_conv | tRGB_offset | tRGB_weights_offset
  | tRGB_affine_weights_offset
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence, Tuple

# Buffers that never receive gradients regardless of parts.
_BUFFER_LEAVES = ("noise_const", "w_avg")

_PART_RE = re.compile(r"^([a-zA-Z_+]+)(?:\.b([0-9]+))?$")


def is_buffer(path: Tuple[str, ...]) -> bool:
    return path[-1] in _BUFFER_LEAVES


def _block_match(pname: str, res) -> bool:
    """check_block_resolution (training_loop.py:41-44) on a dotted path."""
    if res is None:
        return "synthesis" in pname
    return f"synthesis.b{res}" in pname


# Filters mirror name_filters (training_loop.py:57-72); pname is the dotted
# path prefixed with 'synthesis.' for offsets pytrees so both trees share one
# grammar.
_FILTERS = {
    "mapping": lambda res: lambda p: "mapping" in p,
    "tRGB_affine": lambda res: lambda p: _block_match(p, res) and "torgb.affine" in p,
    "tRGB_conv": lambda res: lambda p: _block_match(p, res)
    and ("torgb.weight" in p or "torgb.bias" in p)
    and "affine" not in p and "offset" not in p,
    "tRGB_offset": lambda res: lambda p: _block_match(p, res)
    and "torgb.offset" in p and "torgb.weights_offset" not in p,
    "tRGB_weights_offset": lambda res: lambda p: _block_match(p, res)
    and "torgb.weights_offset" in p,
    "tRGB_affine_weights_offset": lambda res: lambda p: _block_match(p, res)
    and "torgb.affine.weights_offset" in p,
    "synt_affine": lambda res: lambda p: _block_match(p, res)
    and "conv" in p and "affine" in p,
    "synt_conv": lambda res: lambda p: _block_match(p, res)
    and "conv" in p
    and ("weight" in p or "noise_strength" in p or "bias" in p)
    and "affine" not in p and "offset" not in p,
    "synt_const": lambda res: lambda p: _block_match(p, res) and "const" in p,
    "synt_offset": lambda res: lambda p: _block_match(p, res)
    and "conv" in p and "offset" in p and "weights_offset" not in p,
    "synt_weights_offset": lambda res: lambda p: _block_match(p, res)
    and "conv" in p and "affine" not in p and "weights_offset" in p,
    "synt_affine_weights_offset": lambda res: lambda p: _block_match(p, res)
    and "conv" in p and "affine.weights_offset" in p,
}


def path_trainable(pname: str, parts: Sequence[str]) -> bool:
    if "all" in parts:
        return True
    for part in parts:
        m = _PART_RE.match(part)
        if m is None:
            raise ValueError(f"Unknown requires-grad part: {part}")
        name, res = m.group(1), m.group(2)
        if name not in _FILTERS:
            raise ValueError(f"Unknown requires-grad part: {part}")
        if _FILTERS[name](int(res) if res else None)(pname):
            return True
    return False


def _walk(node, path, fn):
    if isinstance(node, dict):
        return {k: _walk(v, path + (k,), fn) for k, v in node.items()}
    return fn(path)


def generator_mask(params: Dict[str, Any], parts: Sequence[str]) -> Dict[str, Any]:
    """Boolean mask over a generator params pytree; buffers are always False."""

    def fn(path):
        if is_buffer(path):
            return False
        return path_trainable(".".join(path), parts)

    return _walk(params, (), fn)


def offsets_mask(offsets: Dict[str, Any], parts: Sequence[str]) -> Dict[str, Any]:
    """Mask over an offsets pytree (layer names 'b<res>.conv0' etc.)."""

    def fn(path):
        return path_trainable("synthesis." + ".".join(path), parts)

    return _walk(offsets, (), fn)


def discriminator_mask(params: Dict[str, Any], parts: Sequence[str] = ("all",),
                       freeze_layers: int = 0) -> Dict[str, Any]:
    """D mask; `freeze_layers` freezes the first N conv layers from the top
    resolution down (Freeze-D, DiscriminatorBlock networks.py:1209-1216)."""
    if freeze_layers <= 0:
        return _walk(params, (), lambda p: "all" in parts or
                     path_trainable(".".join(p), parts))

    # Enumerate layer order: per block (high res -> low): fromrgb?, conv0,
    # conv1, skip?; then epilogue always trainable.
    order: Dict[str, int] = {}
    idx = 0
    resolutions = sorted(
        (int(k[1:]) for k in params if k.startswith("b") and k[1:].isdigit()),
        reverse=True,
    )
    for res in resolutions:
        if res == 4:
            continue
        block = params[f"b{res}"]
        for lname in ("fromrgb", "conv0", "conv1", "skip"):
            if lname in block:
                order[f"b{res}.{lname}"] = idx
                idx += 1

    def fn(path):
        key = ".".join(path[:2])
        if key in order:
            return order[key] >= freeze_layers
        return True

    return _walk(params, (), fn)
