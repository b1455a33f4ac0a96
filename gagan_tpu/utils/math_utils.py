"""Embedding-space resampling utilities (StyleDomain's DiFA/indomain angle
sampling).

Parity targets (reference: SimilarDomains/core/utils/math_utils.py):
  ``resample_single_vector`` (:4), ``resample_batch_vectors`` (:41),
  ``resample_batch_templated_embeddings`` (:71), ``convex_hull`` (:85),
  ``convex_hull_small`` (:110).

All samplers are functional: randomness comes from an explicit PRNG key
instead of torch's global generator, and the perpendicular-component loop
becomes a batched einsum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _resample(key: jax.Array, u_unit: jax.Array,
              cos_lower_bound: float) -> jax.Array:
    """Shared core: draw a random perpendicular direction per row and a
    cosine uniform in [cos_lower_bound, 1] (math_utils.py:28-38)."""
    n, dim = u_unit.shape
    k_r, k_c = jax.random.split(key)
    r = jax.random.uniform(k_r, (n, dim), minval=-1.0, maxval=1.0)
    proj = jnp.einsum("nd,nd->n", r, u_unit)[:, None]
    uperp = r - proj * u_unit
    uperp = uperp / jnp.linalg.norm(uperp, axis=1, keepdims=True)
    cos_theta = jax.random.uniform(
        k_c, (n, 1), minval=cos_lower_bound, maxval=1.0)
    return cos_theta * u_unit + jnp.sqrt(1.0 - cos_theta**2) * uperp


def resample_single_vector(key: jax.Array, target_vector: jax.Array,
                           cos_lower_bound: float,
                           n_vectors: int = 1) -> jax.Array:
    """Sample ``n_vectors`` unit vectors with cos(v, target) >=
    cos_lower_bound (math_utils.py:4-38).  target: [dim] or [1, dim]."""
    if target_vector.ndim == 1:
        target_vector = target_vector[None]
    u = target_vector / jnp.linalg.norm(target_vector, axis=-1, keepdims=True)
    u = jnp.broadcast_to(u, (n_vectors, u.shape[-1]))
    return _resample(key, u, cos_lower_bound)


def resample_batch_vectors(key: jax.Array, target_vectors: jax.Array,
                           cos_lower_bound: float) -> jax.Array:
    """Per-row resampling of a [b, dim] batch (math_utils.py:41-68)."""
    u = target_vectors / jnp.linalg.norm(target_vectors, axis=-1,
                                         keepdims=True)
    return _resample(key, u, cos_lower_bound)


def resample_batch_templated_embeddings(key: jax.Array,
                                        embeddings: jax.Array,
                                        cos_lower_bound: float) -> jax.Array:
    """[b, templates, dim] (or [b, dim]) variant (math_utils.py:71-79)."""
    if embeddings.ndim == 2:
        return resample_batch_vectors(key, embeddings, cos_lower_bound)
    b, t, d = embeddings.shape
    flat = resample_batch_vectors(key, embeddings.reshape(b * t, d),
                                  cos_lower_bound)
    return flat.reshape(b, t, d)


def convex_hull(target_vectors: jax.Array, alphas: jax.Array) -> jax.Array:
    """Normalized convex combinations of [b, d1, d2] vector sets with mixing
    weights [m, b] (math_utils.py:85-107)."""
    out = jnp.einsum("mb,bij->mij", alphas, target_vectors)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def convex_hull_small(target_vectors: jax.Array,
                      alphas: jax.Array) -> jax.Array:
    """[b, dim] variant (math_utils.py:110-130)."""
    out = jnp.einsum("mb,bd->md", alphas, target_vectors)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)
