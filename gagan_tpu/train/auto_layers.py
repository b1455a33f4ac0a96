"""Adaptive layer selection (StyleGAN-NADA style) for domain adaptation.

Parity target: ``determine_opt_layers`` (reference:
SimilarDomains/core/utils/common.py:148-198) — optimize a batch of W+
codes for ``auto_layer_iters`` SGD steps against the global CLIP loss,
rank layers by how far their w moved, and unfreeze only the top-k.

TPU-native shape: the whole probe (mapping → SGD-on-W+ loop → per-layer
movement score) is one jitted function built around ``lax.fori_loop``;
selection itself returns a dense [num_ws] score vector, and the chosen
top-k becomes a 0/1 gradient mask over the offsets pytree (a jit-friendly
argument), not a mutable requires_grad flip.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from gagan_tpu.clip import model as clip_model
from gagan_tpu.models import stylegan2 as sg2


def make_layer_score_fn(g_cfg: sg2.GeneratorConfig,
                        clip_cfg: clip_model.CLIPConfig,
                        auto_layer_iters: int,
                        lr: float = 0.01):
    """Returns jittable ``score(g_params, clip_params, target_emb, z, key)
    -> [num_ws] movement scores`` (common.py:159-186)."""

    def global_clip_loss(cparams, img, target_emb):
        px = jnp.clip(img * 127.5 + 128, 0, 255)
        emb, _ = clip_model.encode_image(clip_cfg, cparams, px)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        t = target_emb / jnp.linalg.norm(target_emb, axis=-1, keepdims=True)
        if t.ndim > 1:
            # [T, D] or [1, T, D] template embeddings -> mean direction.
            t = t.reshape(-1, t.shape[-1]).mean(0)
            t = t / jnp.linalg.norm(t)
        return (1.0 - emb @ t).mean()

    def score(g_params, clip_params, target_emb, z, key):
        w = sg2.mapping_apply(g_cfg.mapping, g_params["mapping"], z,
                              broadcast=False)
        w0 = jnp.repeat(w[:, None], g_cfg.num_ws, axis=1)

        def loss_fn(w_codes, noise_key):
            img = sg2.synthesis_apply(
                g_cfg.synthesis, g_params["synthesis"], w_codes,
                noise_mode="random", rng=noise_key)
            return global_clip_loss(clip_params, img, target_emb)

        def body(i, w_codes):
            g = jax.grad(loss_fn)(w_codes, jax.random.fold_in(key, i))
            return w_codes - lr * g

        w_opt = jax.lax.fori_loop(0, auto_layer_iters, body, w0)
        return jnp.abs(w_opt - w0).mean(axis=-1).mean(axis=0)

    return score


def choose_layers(layer_scores, layer_names: Sequence[str],
                  auto_layer_k: int, skip_last: bool = True) -> List[str]:
    """Top-k layer names by movement score.  ``skip_last`` drops the final
    torgb from the candidate set (common.py:194, ``layer_weights[:-1]`` on
    the offsets path)."""
    import numpy as np

    scores = np.asarray(layer_scores)
    names = list(layer_names)
    if skip_last:
        scores, names = scores[:-1], names[:-1]
    idx = np.argsort(scores)[::-1][:auto_layer_k]
    return [names[i] for i in idx]


def layer_grad_mask(offsets: Dict[str, Dict], chosen: Sequence[str]):
    """0/1 float mask pytree over the offsets: gradients outside ``chosen``
    layers are zeroed (the functional equivalent of the reference's
    requires_grad toggling, trainers.py:339-356)."""
    chosen_set = set(chosen)
    return {
        lname: jax.tree.map(
            lambda x, on=(lname in chosen_set): jnp.asarray(
                1.0 if on else 0.0, x.dtype), layer)
        for lname, layer in offsets.items()
    }


def determine_opt_layers(key: jax.Array,
                         g_cfg: sg2.GeneratorConfig,
                         g_params,
                         clip_cfg: clip_model.CLIPConfig,
                         clip_params,
                         target_embedding: jax.Array,
                         *,
                         auto_layer_iters: int,
                         auto_layer_batch: int,
                         auto_layer_k: int,
                         lr: float = 0.01) -> Tuple[List[str], jax.Array]:
    """One-call variant mirroring the reference signature: returns
    (chosen layer names, full [num_ws] score vector)."""
    k_z, k_opt = jax.random.split(key)
    z = jax.random.normal(k_z, (auto_layer_batch, g_cfg.z_dim))
    score_fn = jax.jit(make_layer_score_fn(g_cfg, clip_cfg, auto_layer_iters,
                                           lr))
    scores = score_fn(g_params, clip_params, target_embedding, z, k_opt)
    names = g_cfg.synthesis.layer_names()
    return choose_layers(scores, names, auto_layer_k), scores
