"""InterFaceGAN latent editing (`SimilarDomains/editing/latent_editor_wrapper.py:7-40`):
precomputed semantic directions added in W/W+ space."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class LatentEditor:
    """Holds named directions (age/smile/rotation/...) loaded from npz files
    ({'direction': [w_dim] or [num_ws, w_dim]})."""

    def __init__(self, directions: Optional[Dict[str, np.ndarray]] = None):
        self.directions = {k: jnp.asarray(v)
                           for k, v in (directions or {}).items()}

    @classmethod
    def from_files(cls, paths: Dict[str, str]) -> "LatentEditor":
        directions = {}
        for name, path in paths.items():
            data = np.load(path)
            directions[name] = data["direction"] if "direction" in data \
                else data[data.files[0]]
        return cls(directions)

    def apply_interfacegan(self, latent, direction, factor: float = 1.0,
                           factor_range: Optional[tuple] = None):
        """latent + factor * direction; with factor_range, the whole sweep
        is returned concatenated (latent_editor_wrapper.py:33-41)."""
        if isinstance(direction, str):
            direction = self.directions[direction]
        if factor_range is not None:
            return jnp.concatenate(
                [latent + f * direction for f in range(*factor_range)])
        return latent + factor * direction

    def get_single_interface_gan_edits_with_direction(
            self, start_w, factors: Sequence[float], direction: str):
        return [self.apply_interfacegan(start_w, direction, f / 2)
                for f in factors]
