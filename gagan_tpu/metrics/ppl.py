"""Perceptual Path Length (`metrics/perceptual_path_length.py:25-131`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gagan_tpu.metrics import feature_stats as fs


def slerp(a: jax.Array, b: jax.Array, t) -> jax.Array:
    """Spherical interpolation (perceptual_path_length.py:15-23)."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    p = t * jnp.arccos(d)
    c = b - d * a
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    d = a * jnp.cos(p) + c * jnp.sin(p)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def compute_ppl(opts: fs.MetricOptions, num_samples: int,
                epsilon: float = 1e-4, space: str = "w",
                sampling: str = "end", crop: bool = True,
                detector_name: str = "vgg16_lpips") -> float:
    from gagan_tpu.models import stylegan2 as sg2

    g_cfg = opts.g_cfg
    lpips = fs.get_detector(opts, detector_name)
    batch = opts.batch_size
    dataset = opts.dataset
    has_labels = dataset is not None and dataset.label_dim > 0

    @jax.jit
    def sampler(params, z0, z1, c, t, key):
        if space == "w":
            w0 = sg2.mapping_apply(g_cfg.mapping, params["mapping"], z0, c)
            w1 = sg2.mapping_apply(g_cfg.mapping, params["mapping"], z1, c)
            tt = t[:, None, None]
            wt0 = w0 + (w1 - w0) * tt
            wt1 = w0 + (w1 - w0) * (tt + epsilon)
        else:
            zt0 = slerp(z0, z1, t[:, None])
            zt1 = slerp(z0, z1, t[:, None] + epsilon)
            wt0 = sg2.mapping_apply(g_cfg.mapping, params["mapping"], zt0, c)
            wt1 = sg2.mapping_apply(g_cfg.mapping, params["mapping"], zt1, c)

        ws = jnp.concatenate([wt0, wt1])
        # Randomized noise buffers (the reference re-randomizes noise_const
        # each forward, ppl.py:64-67) == noise_mode='random'; the SAME key is
        # used for both endpoints so the noise matches across the pair.
        img = sg2.synthesis_apply(g_cfg.synthesis, params["synthesis"], ws,
                                  noise_mode="random", rng=key,
                                  force_fp32=True, hooks=opts.hooks)
        if crop:
            c8 = img.shape[2] // 8
            img = img[:, :, c8 * 3: c8 * 7, c8 * 2: c8 * 6]
        factor = img.shape[2] // 256 if img.shape[2] >= 256 else 1
        if factor > 1:
            n, ch, h, w = img.shape
            img = img.reshape(n, ch, h // factor, factor, w // factor,
                              factor).mean(axis=(3, 5))
        img = (img + 1) * (255 / 2)
        if g_cfg.img_channels == 1:
            img = jnp.tile(img, (1, 3, 1, 1))
        feats = lpips(img)
        f0, f1 = jnp.split(feats, 2)
        return jnp.sum(jnp.square(f0 - f1), axis=1) / epsilon ** 2

    key = jax.random.PRNGKey(opts.rng_seed)
    rnd = np.random.RandomState(opts.rng_seed)
    dist = []
    n_done = 0
    while n_done < num_samples:
        key, k0, k1, kt, kn = jax.random.split(key, 5)
        z0 = jax.random.normal(k0, (batch, g_cfg.z_dim))
        z1 = jax.random.normal(k1, (batch, g_cfg.z_dim))
        t = jax.random.uniform(kt, (batch,)) * (
            1.0 if sampling == "full" else 0.0)
        c = None
        if has_labels:
            c = jnp.asarray(np.stack([
                dataset.get_label(rnd.randint(len(dataset)))
                for _ in range(batch)]))
        dist.append(np.asarray(sampler(opts.g_params, z0, z1, c, t, kn)))
        n_done += batch

    dist = np.concatenate(dist)[:num_samples]
    lo = np.percentile(dist, 1, method="lower")
    hi = np.percentile(dist, 99, method="higher")
    return float(np.extract((dist >= lo) & (dist <= hi), dist).mean())
