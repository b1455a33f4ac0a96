"""LPIPS latent projection (`DissimilarDomains/projector.py:37-164`).

Optimization-based inversion: Adam over a latent (w or z space) plus the
per-layer noise buffers, with the reference's cosine lr ramp, annealed latent
noise, multi-scale noise autocorrelation regularization, and per-step noise
renormalization — all inside one jit'd `lax.fori_loop`-free python loop whose
step is a single compiled function.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gagan_tpu.models import stylegan2 as sg2


def _default_lpips_fn():
    from gagan_tpu.metrics import detectors

    det = detectors.make_default("vgg16_lpips")
    return det


def _area_resize_256(img: jax.Array) -> jax.Array:
    """F.interpolate(mode='area') to 256 = mean pooling for integer factors."""
    n, c, h, w = img.shape
    if h <= 256:
        return img
    factor = h // 256
    return img.reshape(n, c, 256, factor, 256, factor).mean(axis=(3, 5))


def noise_regularization(noise_bufs) -> jax.Array:
    """Multi-scale autocorrelation penalty (projector.py:136-143)."""
    reg = 0.0
    for v in noise_bufs.values():
        noise = v[None, None]
        while True:
            reg = reg + jnp.square(jnp.mean(
                noise * jnp.roll(noise, 1, axis=3)))
            reg = reg + jnp.square(jnp.mean(
                noise * jnp.roll(noise, 1, axis=2)))
            if noise.shape[2] <= 8:
                break
            n, c, h, w = noise.shape
            noise = noise.reshape(n, c, h // 2, 2, w // 2, 2).mean(
                axis=(3, 5))
    return reg


def _collect_noise_bufs(synthesis_params) -> Dict[str, jax.Array]:
    out = {}
    for bname, block in synthesis_params.items():
        for lname, layer in block.items():
            if isinstance(layer, dict) and "noise_const" in layer:
                out[f"{bname}.{lname}"] = layer["noise_const"]
    return out


def _apply_noise_bufs(synthesis_params, noise_bufs):
    import copy

    params = jax.tree.map(lambda x: x, synthesis_params)
    for key, buf in noise_bufs.items():
        bname, lname = key.split(".")
        params[bname][lname]["noise_const"] = buf
    return params


def project(
    g_cfg: sg2.GeneratorConfig,
    g_params,
    target: np.ndarray,                 # [C, H, W] uint8 [0, 255]
    num_steps: int = 1000,
    w_avg_samples: int = 10000,
    initial_learning_rate: float = 0.1,
    initial_noise_factor: float = 0.05,
    lr_rampdown_length: float = 0.25,
    lr_rampup_length: float = 0.05,
    noise_ramp_length: float = 0.75,
    regularize_noise_weight: float = 1e5,
    space: str = "w",
    truncation_psi: float = 1.0,
    lpips_fn: Optional[Callable] = None,
    key: Optional[jax.Array] = None,
    verbose: bool = False,
    return_trajectory: bool = False,
    hooks=None,
):
    """Returns projected W+ latents [num_ws, w_dim] (or the whole trajectory
    [num_steps, num_ws, w_dim] with return_trajectory)."""
    assert space in ("w", "z")
    key = key if key is not None else jax.random.PRNGKey(0)
    lpips = lpips_fn or _default_lpips_fn()

    target_images = jnp.asarray(target, jnp.float32)[None]
    target_images = _area_resize_256(target_images)
    target_features = lpips(target_images)

    # Latent statistics (projector.py:78-88).
    if space == "w":
        z_samples = np.random.RandomState(123).randn(w_avg_samples,
                                                     g_cfg.z_dim)
        w_samples = sg2.mapping_apply(
            g_cfg.mapping, g_params["mapping"], jnp.asarray(z_samples),
            truncation_psi=truncation_psi)
        w_samples = np.asarray(w_samples[:, :1])
        latent_avg = np.mean(w_samples, axis=0, keepdims=True)
        latent_std = float(np.sum((w_samples - latent_avg) ** 2)
                           / w_avg_samples) ** 0.5
        latent_opt = jnp.asarray(latent_avg[:, 0])       # [1, C]
    else:
        latent_std = 1.0
        latent_opt = jnp.zeros((1, g_cfg.z_dim))

    noise_bufs = {k: jax.random.normal(jax.random.fold_in(key, i), v.shape)
                  for i, (k, v) in enumerate(
                      _collect_noise_bufs(g_params["synthesis"]).items())}

    tx = optax.adam(1.0, b1=0.9, b2=0.999)   # lr folded into the schedule
    opt_vars = {"latent": latent_opt, "noise": noise_bufs}
    opt_state = tx.init(opt_vars)

    def synth(latent, noise_bufs):
        syn_params = _apply_noise_bufs(g_params["synthesis"], noise_bufs)
        if space == "w":
            ws = jnp.repeat(latent[:, None, :], g_cfg.num_ws, axis=1)
        else:
            ws = sg2.mapping_apply(g_cfg.mapping, g_params["mapping"],
                                   latent, truncation_psi=truncation_psi)
        return sg2.synthesis_apply(g_cfg.synthesis, syn_params, ws,
                                   noise_mode="const", hooks=hooks)

    @jax.jit
    def step_fn(opt_vars, opt_state, noise_scale, lr, key):
        def loss_fn(ov):
            latent_noise = jax.random.normal(
                key, ov["latent"].shape) * noise_scale
            img = synth(ov["latent"] + latent_noise, ov["noise"])
            img = (img + 1) * (255 / 2)
            img = _area_resize_256(img)
            feats = lpips(img)
            dist = jnp.sum(jnp.square(target_features - feats))
            reg = noise_regularization(ov["noise"])
            return dist + reg * regularize_noise_weight, dist

        (loss, dist), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            opt_vars)
        updates, opt_state = tx.update(grads, opt_state, opt_vars)
        updates = jax.tree.map(lambda u: u * lr, updates)
        opt_vars = optax.apply_updates(opt_vars, updates)
        # Normalize noise buffers (projector.py:156-159).
        opt_vars["noise"] = {
            k: (v - jnp.mean(v)) * jax.lax.rsqrt(jnp.mean(jnp.square(v)))
            for k, v in opt_vars["noise"].items()}
        return opt_vars, opt_state, loss, dist

    trajectory = []
    for step in range(num_steps):
        t = step / num_steps
        noise_scale = (latent_std * initial_noise_factor
                       * max(0.0, 1.0 - t / noise_ramp_length) ** 2)
        lr_ramp = min(1.0, (1.0 - t) / lr_rampdown_length)
        lr_ramp = 0.5 - 0.5 * np.cos(lr_ramp * np.pi)
        lr_ramp = lr_ramp * min(1.0, t / lr_rampup_length)
        lr = initial_learning_rate * lr_ramp
        key, k_step = jax.random.split(key)
        opt_vars, opt_state, loss, dist = step_fn(
            opt_vars, opt_state, jnp.float32(noise_scale), jnp.float32(lr),
            k_step)
        if verbose and (step + 1) % 50 == 0:
            print(f"step {step + 1:>4d}/{num_steps}: dist {float(dist):.3f} "
                  f"loss {float(loss):.3f}")
        if return_trajectory:
            trajectory.append(np.asarray(opt_vars["latent"][0]))

    final = opt_vars["latent"]
    if space == "z":
        final = sg2.mapping_apply(g_cfg.mapping, g_params["mapping"], final,
                                  truncation_psi=truncation_psi)[0]
    else:
        final = jnp.repeat(final[:, None, :], g_cfg.num_ws, axis=1)[0]
    if return_trajectory:
        return np.stack(trajectory), np.asarray(final)
    return np.asarray(final)
