"""CLIP-based quality/diversity evaluation of adapted generators.

Port of `SimilarDomains/core/evaluation.py` (`EvaluationManager:23`,
`get_metrics:136`, `MTGEvaluator:183`): quality = mean CLIP cosine similarity
of generated images to the target embedding; diversity = mean pairwise
(1 - cos) among generated images; the MTG variant adds FID against a
reference folder.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gagan_tpu.clip import model as clip_model
from gagan_tpu.models import stylegan2 as sg2
from gagan_tpu.train.adapt_losses import tril_mask


@dataclasses.dataclass
class CLIPEvalConfig:
    data_size: int = 500
    batch_size: int = 24
    truncation: float = 0.7


def clip_quality_diversity(
    embeddings: jax.Array,          # [N, D] image embeddings (normalized)
    target_emb: jax.Array,          # [D] or [T, D]
) -> Tuple[float, float]:
    emb = embeddings / jnp.linalg.norm(embeddings, axis=-1, keepdims=True)
    trg = target_emb / jnp.linalg.norm(target_emb, axis=-1, keepdims=True)
    if trg.ndim == 2:
        trg = jnp.mean(trg, axis=0)
        trg = trg / jnp.linalg.norm(trg)
    quality = float(jnp.mean(emb @ trg))

    n = emb.shape[0]
    cos = emb @ emb.T
    mask = jnp.asarray(tril_mask(n))
    diversity = float(jnp.mean(1.0 - cos[mask]))
    return quality, diversity


def evaluate_generator(
    cfg: CLIPEvalConfig,
    g_cfg: sg2.GeneratorConfig,
    g_params,
    clip_cfg: clip_model.CLIPConfig,
    clip_params,
    target_emb: jax.Array,
    key: jax.Array,
    hooks=None,
) -> Dict[str, float]:
    """Sample data_size images through the (adapted) generator and score."""

    @jax.jit
    def sample_embed(params, z, k):
        img = sg2.generator_apply(g_cfg, params, z,
                                  truncation_psi=cfg.truncation,
                                  noise_mode="random", rng=k, hooks=hooks)
        img_u8 = jnp.clip(img * 127.5 + 128, 0, 255)
        emb, _ = clip_model.encode_image(clip_cfg, clip_params, img_u8)
        return emb

    embs = []
    n = 0
    while n < cfg.data_size:
        key, k_z, k_n = jax.random.split(key, 3)
        z = jax.random.normal(k_z, (cfg.batch_size, g_cfg.z_dim))
        embs.append(np.asarray(sample_embed(g_params, z, k_n)))
        n += cfg.batch_size
    embs = jnp.asarray(np.concatenate(embs)[: cfg.data_size])
    quality, diversity = clip_quality_diversity(embs, target_emb)
    return {"clip_quality": quality, "clip_diversity": diversity}
