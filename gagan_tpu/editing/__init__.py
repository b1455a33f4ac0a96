"""Latent editing: StyleSpace modifications, InterFaceGAN directions,
StyleFlow CNF editor."""

from .stylespace import build_style_modification_hooks
from .interfacegan import LatentEditor

__all__ = ["LatentEditor", "build_style_modification_hooks"]
