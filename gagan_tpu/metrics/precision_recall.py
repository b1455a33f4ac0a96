"""Improved Precision & Recall (`metrics/precision_recall.py:15-61`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gagan_tpu.metrics import feature_stats as fs


def _pairwise_dist(row: jax.Array, col: jax.Array) -> jax.Array:
    # Squared-distance trick matching compute_distances
    # (precision_recall.py:17-32).
    r2 = jnp.sum(jnp.square(row), axis=1, keepdims=True)
    c2 = jnp.sum(jnp.square(col), axis=1, keepdims=True)
    d2 = r2 - 2 * (row @ col.T) + c2.T
    return jnp.maximum(d2, 0)


def knn_precision_recall(real_features: np.ndarray,
                         gen_features: np.ndarray,
                         nhood_size: int = 3,
                         row_batch_size: int = 10000) -> tuple:
    results = {}
    dist_fn = jax.jit(_pairwise_dist)
    for name, manifold, probes in [
        ("precision", real_features, gen_features),
        ("recall", gen_features, real_features),
    ]:
        manifold_j = jnp.asarray(manifold)
        kth = []
        for start in range(0, manifold.shape[0], row_batch_size):
            batch = manifold_j[start: start + row_batch_size]
            d = np.asarray(dist_fn(batch, manifold_j))
            kth.append(np.partition(d, nhood_size, axis=1)[:, nhood_size])
        kth = np.concatenate(kth)
        pred = []
        for start in range(0, probes.shape[0], row_batch_size):
            batch = jnp.asarray(probes[start: start + row_batch_size])
            d = np.asarray(dist_fn(batch, manifold_j))
            pred.append((d <= kth[None, :]).any(axis=1))
        results[name] = float(np.concatenate(pred).mean())
    return results["precision"], results["recall"]


def compute_pr(opts: fs.MetricOptions, max_real, num_gen, nhood_size: int = 3,
               detector_name: str = "vgg16") -> tuple:
    real = fs.compute_feature_stats_for_dataset(
        opts, detector_name, capture_all=True, max_items=max_real).get_all()
    gen = fs.compute_feature_stats_for_generator(
        opts, detector_name, capture_all=True, max_items=num_gen).get_all()
    return knn_precision_recall(real, gen, nhood_size=nhood_size)
