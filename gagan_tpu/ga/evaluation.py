"""GA fitness metrics (`GA/evaluation.py:7-16`): FID + KID + LPIPS between
real and generated batches, computed with the gagan_tpu metric stack instead
of torchmetrics/lpips."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gagan_tpu.metrics import fid as fid_lib
from gagan_tpu.metrics import kid as kid_lib


def extract_features(images, feature_fn: Optional[Callable] = None,
                     batch_size: int = 32) -> np.ndarray:
    """Batched backbone features of [N, C, H, W] images in [-1, 1]
    (reference GA/feature_extraction.py:6-14, which uses torchvision
    Swin-T `.features`).  Defaults to the Swin-T backbone
    (`gagan_tpu.models.swin`); convert ImageNet weights from HF
    `microsoft/swin-tiny-patch4-window7-224` via swin.params_from_hf."""
    if feature_fn is None:
        from gagan_tpu.models import swin

        feature_fn = swin.make_feature_extractor()
    feats = []
    for i in range(0, images.shape[0], batch_size):
        feats.append(np.asarray(feature_fn(images[i:i + batch_size])))
    return np.concatenate(feats, axis=0)


def make_alex_lpips(params=None, key=None) -> Callable:
    """Pairwise LPIPS(net='alex') distance fn — the reference GA fitness
    metric (`GA/evaluation.py:13`, `lpips.LPIPS(net='alex')`).

    ``params``: converted weights (metrics/alexnet.py naming; see
    tools/convert_weights.py::convert_lpips_alex) or None for tagged random
    weights (machinery runs; values need the real tower).  Returns
    f(a, b) -> [N] per-pair distances for [-1, 1] NCHW images."""
    import jax

    from gagan_tpu.metrics import alexnet

    if params is None:
        params = alexnet.init_alexnet_lpips(
            key if key is not None else jax.random.PRNGKey(0))
    return jax.jit(lambda a, b: alexnet.lpips_distance(params, a, b))


def calculate_metrics(
    real_images: jnp.ndarray,        # [N, C, H, W] uint8 [0, 255]
    generated_images: jnp.ndarray,
    feature_fn: Callable,            # images -> [N, D] (e.g. inception)
    lpips_fn: Optional[Callable] = None,
    kid_subset_size: int = 100,
    lpips_pair_fn: Optional[Callable] = None,
) -> Tuple[float, float, float]:
    """Returns (fid, kid, lpips) like the reference calculate_metrics.

    LPIPS comes from either interface:
      * ``lpips_pair_fn(a, b) -> [N]`` — exact pairwise distances (the
        reference protocol: `make_alex_lpips`, matching LPIPS(net='alex'));
      * ``lpips_fn(images) -> [N, D]`` — an embedding whose squared L2
        distance is the LPIPS value (e.g. vgg16.vgg16_lpips).
    Images reach the LPIPS tower in [-1, 1] (the lpips-package input
    convention) regardless of the uint8 [0, 255] metric-feature range.
    """
    real_f = np.asarray(feature_fn(real_images))
    gen_f = np.asarray(feature_fn(generated_images))

    mu_r, cov_r = real_f.mean(0), np.cov(real_f.T, bias=True)
    mu_g, cov_g = gen_f.mean(0), np.cov(gen_f.T, bias=True)
    fid = fid_lib.frechet_distance(mu_r, cov_r, mu_g, cov_g)

    kid = kid_lib.kid_from_features(
        real_f, gen_f, num_subsets=10,
        max_subset_size=min(kid_subset_size, real_f.shape[0]))

    lpips = float("nan")
    n = min(real_images.shape[0], generated_images.shape[0])
    if lpips_pair_fn is not None:
        a = jnp.asarray(real_images[:n], jnp.float32) / 127.5 - 1.0
        b = jnp.asarray(generated_images[:n], jnp.float32) / 127.5 - 1.0
        lpips = float(jnp.mean(lpips_pair_fn(a, b)))
    elif lpips_fn is not None:
        a = lpips_fn(real_images[:n])
        b = lpips_fn(generated_images[:n])
        lpips = float(jnp.mean(jnp.sum(jnp.square(a - b), axis=-1)))
    return fid, kid, lpips
