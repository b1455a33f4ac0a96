"""e4e encoder-training modules: latent-codes discriminator + replay pool.

Parity targets (reference: SimilarDomains/restyle_encoders/e4e_modules/):
  - ``LatentCodesDiscriminator`` — discriminator.py:4-20 (an n_mlp-layer
    LeakyReLU(0.2) MLP over single w codes; the reference hardcodes the
    final Linear's input to 512, we use style_dim).
  - ``LatentCodesPool`` — latent_codes_pool.py:5-55 (50% replay buffer of
    past w codes for discriminator updates).
  - The adversarial-w losses of the e4e coach (non-saturating logistic +
    R1 on w), expressed functionally for jit.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]


def init_latent_discriminator(key: jax.Array, style_dim: int = 512,
                              n_mlp: int = 4) -> Params:
    """Parameters for the w-space discriminator (discriminator.py:4-17);
    names mirror the torch Sequential ('mlp.{i}.weight'/'bias') so torch
    checkpoints convert 1:1."""
    params: Params = {}
    idx = 0
    for _ in range(n_mlp - 1):
        k = jax.random.fold_in(key, idx)
        params[f"mlp.{idx}"] = {
            "weight": jax.random.normal(k, (style_dim, style_dim))
            / np.sqrt(style_dim),
            "bias": jnp.zeros((style_dim,)),
        }
        idx += 2  # LeakyReLU occupies the odd slots in the Sequential
    k = jax.random.fold_in(key, idx)
    params[f"mlp.{idx}"] = {
        "weight": jax.random.normal(k, (1, style_dim)) / np.sqrt(style_dim),
        "bias": jnp.zeros((1,)),
    }
    return params


def latent_discriminator_apply(params: Params, w: jax.Array) -> jax.Array:
    """D(w): [N, style_dim] (or [N, L, style_dim]) → [N(, L), 1]."""
    x = w
    layers = sorted(params, key=lambda n: int(n.split(".")[1]))
    for i, name in enumerate(layers):
        p = params[name]
        x = x @ p["weight"].T + p["bias"]
        if i < len(layers) - 1:
            x = jnp.where(x >= 0, x, 0.2 * x)
    return x


def d_logistic_loss(real_pred: jax.Array, fake_pred: jax.Array) -> jax.Array:
    """Non-saturating logistic D loss used by the e4e coach."""
    return (jax.nn.softplus(-real_pred) + jax.nn.softplus(fake_pred)).mean()


def g_nonsaturating_loss(fake_pred: jax.Array) -> jax.Array:
    return jax.nn.softplus(-fake_pred).mean()


def d_r1_loss(params: Params, real_w: jax.Array) -> jax.Array:
    """R1 gradient penalty on real w codes."""
    def score(w):
        return latent_discriminator_apply(params, w).sum()

    grad = jax.grad(score)(real_w)
    return jnp.sum(jnp.square(grad)) / real_w.shape[0]


class LatentCodesPool:
    """50%-replay buffer of past w codes (latent_codes_pool.py:5-55).

    Host-side with an explicit numpy RNG (the reference uses the global
    ``random`` module)."""

    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.rng = np.random.RandomState(seed)
        self.ws: List[np.ndarray] = []

    def query(self, ws) -> np.ndarray:
        if self.pool_size == 0:
            return np.asarray(ws)
        out = []
        for w in np.asarray(ws):
            if w.ndim == 2:  # [n_latent, dim]: pick one random layer's code
                w = w[self.rng.randint(0, len(w))]
            out.append(self._handle(w))
        return np.stack(out, 0)

    def _handle(self, w: np.ndarray) -> np.ndarray:
        if len(self.ws) < self.pool_size:
            self.ws.append(w)
            return w
        if self.rng.uniform() > 0.5:
            idx = self.rng.randint(0, self.pool_size)
            old = self.ws[idx].copy()
            self.ws[idx] = w
            return old
        return w
