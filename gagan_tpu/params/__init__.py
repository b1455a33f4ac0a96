"""Parameterization system: lightweight offsets over a frozen generator."""

from .offsets import (
    OffsetsSpec,
    WeightOffsetDesc,
    init_offsets,
    make_hooks,
    parse_weight_parametrization,
    trainable_mask,
)

__all__ = [
    "OffsetsSpec",
    "WeightOffsetDesc",
    "init_offsets",
    "make_hooks",
    "parse_weight_parametrization",
    "trainable_mask",
]
