"""StyleSpace semantic modifications.

Equivalent of `get_style_space_modifications`
(`DissimilarDomains/training/networks.py:56-84`): a list of
((layer, channel), magnitude, offset_factor) edits becomes per-layer additive
vectors + masks composed with any existing offset hooks.  `offset_factor`
scales a StyleSpace *direction's* contribution on the edited channel exactly
as the reference's offset_mask adjustment (networks.py:516).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from gagan_tpu.models.stylegan2 import SynthesisConfig

Modification = Tuple[Tuple[int, int], float, float]


def build_style_modification_hooks(
    cfg: SynthesisConfig,
    modifications: Sequence[Modification],
    base_hooks: Dict = None,
    apply_first: bool = False,
):
    """Build LayerHooks applying S-space edits.

    With ``base_hooks`` (e.g. a trained StyleSpace direction), the edit's
    offset_factor multiplies the direction's effect on the edited channels:
    hooks compose as style -> base_style_fn(style) masked + modification.
    """
    names = cfg.layer_names()
    dims = cfg.layer_in_channels()
    per_layer: Dict[int, List[Modification]] = {}
    for (layer, channel), magnitude, factor in modifications:
        per_layer.setdefault(layer, []).append(
            ((layer, channel), magnitude, factor))

    hooks = {k: dict(v) for k, v in (base_hooks or {}).items()}
    for layer_idx, mods in per_layer.items():
        name = names[layer_idx]
        dim = dims[layer_idx]
        modification = np.zeros((1, dim), np.float32)
        factors = np.ones((1, dim), np.float32)
        for (_, channel), magnitude, factor in mods:
            modification[0, channel] = magnitude
            factors[0, channel] = factor
        modification = jnp.asarray(modification)
        factors = jnp.asarray(factors)

        prev = hooks.get(name, {}).get("style")
        if prev is not None:
            if apply_first:
                # edit first, then the direction
                def style_fn(s, p=prev, m=modification):
                    return p(s + m)
            else:
                # direction (scaled per-channel by offset_factor), then edit
                def style_fn(s, p=prev, m=modification, f=factors):
                    delta = p(s) - s
                    return s + delta * f + m
        else:
            def style_fn(s, m=modification):
                return s + m

        hooks.setdefault(name, {})["style"] = style_fn
    return hooks
