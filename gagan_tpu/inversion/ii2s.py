"""II2S inversion: per-layer W+ optimization with a PCA-regularized prior.

Port of `SimilarDomains/core/utils/II2S.py` (`II2S:149`, `invert_image:256`,
`Net.build_PCA_model:87`, `cal_p_norm_loss:137`): Adam over per-layer W+
latents initialized at latent_avg, loss = L2(full res) + LPIPS(256, bicubic
downsample) + p-norm of the LeakyReLU(5)-mapped latents in a PCA basis fit on
1M mapped W samples.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gagan_tpu.models import stylegan2 as sg2


@dataclasses.dataclass(frozen=True)
class II2SConfig:
    steps: int = 1300
    learning_rate: float = 0.01
    l2_lambda: float = 1.0
    percept_lambda: float = 1.0
    p_norm_lambda: float = 1e-3
    pca_samples: int = 100_000          # reference uses 1M; configurable


def leaky5(x):
    """LeakyReLU(negative_slope=5) — the PULSE latent-space trick
    (II2S.py:92)."""
    return jnp.where(x >= 0, x, 5.0 * x)


def build_pca_model(g_cfg: sg2.GeneratorConfig, g_params, key,
                    n_samples: int = 100_000,
                    batch: int = 65536) -> Dict[str, np.ndarray]:
    """PCA of LeakyReLU(5)(mapping(z)) (II2S.py:87-105); exact SVD over the
    sampled matrix replaces the reference's incremental PCA."""
    samples = []
    done = 0
    i = 0
    map_fn = jax.jit(lambda z: leaky5(sg2.mapping_apply(
        g_cfg.mapping, g_params["mapping"], z, broadcast=False)))
    while done < n_samples:
        n = min(batch, n_samples - done)
        z = jax.random.normal(jax.random.fold_in(key, i),
                              (n, g_cfg.z_dim))
        samples.append(np.asarray(map_fn(z)))
        done += n
        i += 1
    X = np.concatenate(samples)
    X_mean = X.mean(axis=0)
    Xc = X - X_mean
    # SVD-based PCA.
    _, s, vt = np.linalg.svd(Xc, full_matrices=False)
    X_comp = vt                                  # [k, D] components
    X_stdev = s / np.sqrt(X.shape[0] - 1)
    return {"X_mean": X_mean, "X_comp": X_comp, "X_stdev": X_stdev}


def p_norm_loss(pca: Dict, latent_in: jax.Array, p_norm_lambda: float):
    """(II2S.py:137-147): project mapped latents into the PCA basis."""
    lat = leaky5(latent_in) - jnp.asarray(pca["X_mean"])
    proj = lat @ jnp.asarray(pca["X_comp"]).T / jnp.asarray(pca["X_stdev"])
    return p_norm_lambda * jnp.mean(jnp.square(proj))


def bicubic_256(img: jax.Array) -> jax.Array:
    if img.shape[2] == 256:
        return img
    return jax.image.resize(img, img.shape[:2] + (256, 256), method="cubic")


def invert_image(
    cfg: II2SConfig,
    g_cfg: sg2.GeneratorConfig,
    g_params,
    image_high: np.ndarray,              # [C, H, W] float [-1, 1]
    lpips_fn: Optional[Callable] = None,
    pca: Optional[Dict] = None,
    key: Optional[jax.Array] = None,
    verbose: bool = False,
) -> np.ndarray:
    """Returns W+ latents [num_ws, w_dim] (invert_image, II2S.py:256-289)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    if pca is None:
        pca = build_pca_model(g_cfg, g_params, key,
                              n_samples=min(cfg.pca_samples, 100_000))
    if lpips_fn is None:
        from gagan_tpu.metrics import detectors

        lpips_fn = detectors.make_default("vgg16_lpips")

    ref_h = jnp.asarray(image_high)[None]
    ref_l = bicubic_256(ref_h)
    ref_l_feats = lpips_fn((ref_l + 1) * 127.5)

    # Latents init at latent_avg per layer (II2S.py:169-191); estimate
    # latent_avg from the mapping if w_avg is untrained.
    w_avg = g_params["mapping"]["w_avg"]
    if float(jnp.sum(jnp.abs(w_avg))) == 0.0:
        z = jax.random.normal(key, (4096, g_cfg.z_dim))
        w_avg = jnp.mean(sg2.mapping_apply(
            g_cfg.mapping, g_params["mapping"], z, broadcast=False), axis=0)
    latent = jnp.tile(w_avg[None, None], (1, g_cfg.num_ws, 1))

    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(latent)

    @jax.jit
    def step(latent, opt_state):
        def loss_fn(latent):
            img = sg2.synthesis_apply(g_cfg.synthesis, g_params["synthesis"],
                                      latent, noise_mode="const")
            l2 = jnp.mean(jnp.square(img - ref_h))
            gen_feats = lpips_fn((bicubic_256(img) + 1) * 127.5)
            percep = jnp.sum(jnp.square(gen_feats - ref_l_feats))
            pn = p_norm_loss(pca, latent, cfg.p_norm_lambda)
            total = cfg.l2_lambda * l2 + cfg.percept_lambda * percep + pn
            return total, (l2, percep, pn)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(latent)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(latent, updates), opt_state, loss, aux

    for i in range(cfg.steps):
        latent, opt_state, loss, aux = step(latent, opt_state)
        if verbose and (i + 1) % 100 == 0:
            l2, percep, pn = aux
            print(f"II2S {i + 1}/{cfg.steps}: loss {float(loss):.4f} "
                  f"l2 {float(l2):.4f} percep {float(percep):.4f} "
                  f"p-norm {float(pn):.5f}")
    return np.asarray(latent[0])
