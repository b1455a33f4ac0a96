"""In-training GA refinement of near-boundary fakes.

Clean re-implementation of the *intended* semantics of the GA-GAN splice
(`DissimilarDomains/training/training_loop.py:412-434` `apply_genetic_algorithm`
— the reference version is broken: wrong indentation, a feature extractor
whose outputs cannot feed G, and masked in-place assignment that does not jit;
see SURVEY.md §0/§3.2).  Intended behavior: find real/fake pairs whose D
scores are within `threshold`, cross the pair's representations, mutate, and
regenerate replacements for those fakes.

TPU-native formulation: the crossover happens in W+ latent space (the fake's
known latents crossed with the real's latents from an encoder when available,
else with a re-mapped fresh z), and the data-dependent replacement is a
fixed-shape `jnp.where` select — no dynamic shapes under jit.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from gagan_tpu.ga.crossover_mutation import dynamic_mutation, gaussian_crossover
from gagan_tpu.models import stylegan2 as sg2

Params = Dict


def wgan_gradient_penalty(
    d_cfg: sg2.DiscriminatorConfig,
    d_params: Params,
    real_img: jax.Array,
    fake_img: jax.Array,
    key: jax.Array,
    c: Optional[jax.Array] = None,
    critic_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> jax.Array:
    """WGAN-GP gradient penalty on real/fake interpolates.

    Re-expression of the GA splice's helper
    (`DissimilarDomains/training/training_loop.py:394-410`): per-sample
    alpha ~ U[0,1), x_hat = alpha*real + (1-alpha)*fake, penalty =
    mean((||d D(x_hat)/d x_hat||_2 - 1)^2).  The reference's
    torch.autograd.grad w.r.t. the interpolated inputs is jax.grad of the
    summed critic score (grad_outputs=ones == sum's pullback).
    ``critic_fn`` overrides the default discriminator critic (any
    [N, ...] -> [N] or [N, 1] scorer)."""
    alpha = jax.random.uniform(key, (real_img.shape[0], 1, 1, 1),
                               dtype=real_img.dtype)
    interp = alpha * real_img + (1.0 - alpha) * fake_img

    def critic_sum(x):
        if critic_fn is not None:
            return jnp.sum(critic_fn(x))
        return jnp.sum(sg2.discriminator_apply(d_cfg, d_params, x, c=c))

    grads = jax.grad(critic_sum)(interp)
    norms = jnp.sqrt(jnp.sum(jnp.square(
        grads.reshape(grads.shape[0], -1)), axis=1) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))


def apply_genetic_refinement(
    g_cfg: sg2.GeneratorConfig,
    g_params: Params,
    d_cfg: sg2.DiscriminatorConfig,
    d_params: Params,
    real_img: jax.Array,
    fake_img: jax.Array,
    fake_ws: jax.Array,            # [N, num_ws, w_dim] latents of the fakes
    key: jax.Array,
    threshold: float = 0.5,
    mutation_rate: float = 0.1,
    encoder_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    hooks=None,
    return_mask: bool = False,
    d_constraint=None,
) -> jax.Array:
    """Returns fakes with near-boundary samples replaced by GA offspring.

    With ``return_mask=True`` also returns the [N] replacement mask so the
    training step can report the replaced fraction (`Loss/ga/replaced`).
    ``d_constraint`` forwards to discriminator_apply's spatial_constraint
    (required when the step runs spatially sharded).
    """
    d_real = sg2.discriminator_apply(d_cfg, d_params, real_img,
                                     spatial_constraint=d_constraint)[:, 0]
    d_fake = sg2.discriminator_apply(d_cfg, d_params, fake_img,
                                     spatial_constraint=d_constraint)[:, 0]
    mask = jnp.abs(d_real - d_fake) < threshold            # [N]

    k_enc, k_cx, k_mut, k_noise = jax.random.split(key, 4)
    if encoder_fn is not None:
        real_latents = encoder_fn(real_img)
    else:
        # No encoder: cross with the mapping of a fresh z (keeps offspring on
        # the generator manifold).
        z2 = jax.random.normal(k_enc, (fake_ws.shape[0], g_cfg.z_dim))
        real_latents = sg2.mapping_apply(g_cfg.mapping, g_params["mapping"],
                                         z2)

    children = gaussian_crossover(k_cx, real_latents, fake_ws)
    children = dynamic_mutation(k_mut, children, mutation_rate)
    new_imgs = sg2.synthesis_apply(
        g_cfg.synthesis, g_params["synthesis"], children,
        noise_mode="random", rng=k_noise, hooks=hooks)
    out = jnp.where(mask[:, None, None, None], new_imgs, fake_img)
    if return_mask:
        return out, mask
    return out
