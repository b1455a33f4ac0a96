"""StyleGAN2 adversarial losses as pure functions.

TPU-native re-expression of `DissimilarDomains/training/loss.py:26-152`
(`StyleGAN2Loss`): non-saturating logistic G/D losses, path-length
regularization with pl_mean EMA, R1 gradient penalty, and style mixing.
Gradient-of-gradient terms (R1, PL) use jax.grad composition instead of
torch's conv2d_gradfix workarounds — XLA differentiates convolutions to any
order natively.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gagan_tpu.models import stylegan2 as sg2

Params = Dict[str, Any]
# augment_fn(img, p, key) -> img; `p` is the ADA probability scalar.
AugmentFn = Optional[Callable[[jax.Array, jax.Array, jax.Array], jax.Array]]


@dataclasses.dataclass(frozen=True)
class GANLossConfig:
    style_mixing_prob: float = 0.9
    r1_gamma: float = 10.0
    pl_batch_shrink: int = 2
    pl_decay: float = 0.01
    pl_weight: float = 2.0


def softplus(x: jax.Array) -> jax.Array:
    # -log(sigmoid(-x)); matches torch.nn.functional.softplus semantics.
    return jnp.where(x > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))))


def run_mapping_with_mixing(
    g_cfg: sg2.GeneratorConfig,
    g_params: Params,
    z: jax.Array,
    c: Optional[jax.Array],
    key: jax.Array,
    style_mixing_prob: float,
) -> jax.Array:
    """Mapping + style mixing (reference loss.py:44-55).

    Picks cutoff ~ U{1..num_ws-1} with prob style_mixing_prob (else num_ws)
    and replaces ws[:, cutoff:] with the mapping of a fresh z.
    """
    ws = sg2.mapping_apply(g_cfg.mapping, g_params["mapping"], z, c)
    if style_mixing_prob <= 0:
        return ws
    k1, k2, k3 = jax.random.split(key, 3)
    num_ws = g_cfg.num_ws
    cutoff = jax.random.randint(k1, (), 1, num_ws)
    cutoff = jnp.where(jax.random.uniform(k2) < style_mixing_prob, cutoff, num_ws)
    z2 = jax.random.normal(k3, z.shape, dtype=z.dtype)
    ws2 = sg2.mapping_apply(g_cfg.mapping, g_params["mapping"], z2, c)
    layer_idx = jnp.arange(num_ws)[None, :, None]
    return jnp.where(layer_idx < cutoff, ws, ws2)


def run_G(
    g_cfg: sg2.GeneratorConfig,
    g_params: Params,
    z: jax.Array,
    c: Optional[jax.Array],
    key: jax.Array,
    style_mixing_prob: float,
    hooks=None,
) -> Tuple[jax.Array, jax.Array]:
    k_mix, k_noise = jax.random.split(key)
    ws = run_mapping_with_mixing(g_cfg, g_params, z, c, k_mix, style_mixing_prob)
    img = sg2.synthesis_apply(g_cfg.synthesis, g_params["synthesis"], ws,
                              noise_mode="random", rng=k_noise, hooks=hooks)
    return img, ws


def run_D(
    d_cfg: sg2.DiscriminatorConfig,
    d_params: Params,
    img: jax.Array,
    c: Optional[jax.Array],
    augment_fn: AugmentFn,
    ada_p: Optional[jax.Array],
    key: Optional[jax.Array],
    d_constraint=None,
) -> jax.Array:
    if augment_fn is not None:
        img = augment_fn(img, ada_p, key)
    return sg2.discriminator_apply(d_cfg, d_params, img, c,
                                   spatial_constraint=d_constraint)


def g_main_loss(
    cfg: GANLossConfig,
    g_cfg: sg2.GeneratorConfig,
    d_cfg: sg2.DiscriminatorConfig,
    g_params: Params,
    d_params: Params,
    z: jax.Array,
    c: Optional[jax.Array],
    key: jax.Array,
    augment_fn: AugmentFn = None,
    ada_p: Optional[jax.Array] = None,
    hooks=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Gmain: maximize D logits on fakes (loss.py:77-86)."""
    k_g, k_aug = jax.random.split(key)
    gen_img, gen_ws = run_G(g_cfg, g_params, z, c, k_g, cfg.style_mixing_prob,
                            hooks=hooks)
    gen_logits = run_D(d_cfg, d_params, gen_img, c, augment_fn, ada_p, k_aug)
    loss = jnp.mean(softplus(-gen_logits))
    metrics = {
        "Loss/scores/fake": jnp.mean(gen_logits),
        "Loss/signs/fake": jnp.mean(jnp.sign(gen_logits)),
        "Loss/G/loss": loss,
        # Batch-mean w for the trainer's functional w_avg update
        # (MappingNetwork.forward, networks.py:824-827).
        "aux/mean_w": jnp.mean(gen_ws[:, 0].astype(jnp.float32), axis=0),
    }
    return loss, metrics


def g_pl_loss(
    cfg: GANLossConfig,
    g_cfg: sg2.GeneratorConfig,
    g_params: Params,
    z: jax.Array,
    c: Optional[jax.Array],
    key: jax.Array,
    pl_mean: jax.Array,
    hooks=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Greg: path-length regularization (loss.py:89-111).

    Returns (loss, metrics) where metrics['aux/pl_mean'] is the updated EMA
    (the trainer stores it; reference mutates self.pl_mean in place).
    """
    batch = z.shape[0] // cfg.pl_batch_shrink
    z = z[:batch]
    if c is not None:
        c = c[:batch]
    k_mix, k_noise, k_pl = jax.random.split(key, 3)
    ws = run_mapping_with_mixing(g_cfg, g_params, z, c, k_mix,
                                 cfg.style_mixing_prob)

    def synth(ws_in):
        img = sg2.synthesis_apply(g_cfg.synthesis, g_params["synthesis"], ws_in,
                                  noise_mode="random", rng=k_noise, hooks=hooks)
        return img

    img = synth(ws)
    pl_noise = jax.random.normal(k_pl, img.shape, dtype=img.dtype) / np.sqrt(
        img.shape[2] * img.shape[3])

    # d/dws sum(img * noise): one VJP through the synthesis network.
    _, vjp_fn = jax.vjp(synth, ws)
    (pl_grads,) = vjp_fn(pl_noise)
    pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1))
    new_pl_mean = pl_mean + cfg.pl_decay * (jnp.mean(pl_lengths) - pl_mean)
    pl_penalty = jnp.square(pl_lengths - jax.lax.stop_gradient(new_pl_mean))
    loss = jnp.mean(pl_penalty) * cfg.pl_weight
    metrics = {
        "Loss/pl_penalty": jnp.mean(pl_penalty),
        "Loss/G/reg": loss,
        "aux/pl_mean": jax.lax.stop_gradient(new_pl_mean),
    }
    return loss, metrics


def _ga_refine_fakes(
    g_cfg: sg2.GeneratorConfig,
    d_cfg: sg2.DiscriminatorConfig,
    g_params: Params,
    d_params: Params,
    real_img: jax.Array,
    gen_img: jax.Array,
    gen_ws: jax.Array,
    key: jax.Array,
    ga_threshold: float,
    ga_mutation_rate: float,
    hooks,
    d_constraint=None,
) -> Tuple[jax.Array, jax.Array]:
    """GA refinement of near-boundary fakes before the D step.

    The intended semantics of the reference splice
    (`DissimilarDomains/training/training_loop.py:392-434`, `threshold`
    kwarg at `:199`): fakes whose |D(real) - D(fake)| < threshold are
    replaced by crossed+mutated offspring regenerated through G.  Runs
    entirely under stop_gradient — like the reference, the GA block is a
    data transformation outside autograd; the D loss differentiates only
    through the scoring of the (possibly replaced) fakes.
    """
    from gagan_tpu.ga.refine import apply_genetic_refinement

    refined, mask = apply_genetic_refinement(
        g_cfg, jax.lax.stop_gradient(g_params),
        d_cfg, jax.lax.stop_gradient(d_params),
        jax.lax.stop_gradient(real_img), jax.lax.stop_gradient(gen_img),
        jax.lax.stop_gradient(gen_ws), key,
        threshold=ga_threshold, mutation_rate=ga_mutation_rate,
        hooks=hooks, return_mask=True, d_constraint=d_constraint)
    return jax.lax.stop_gradient(refined), jnp.mean(
        mask.astype(jnp.float32))


def d_main_loss(
    cfg: GANLossConfig,
    g_cfg: sg2.GeneratorConfig,
    d_cfg: sg2.DiscriminatorConfig,
    g_params: Params,
    d_params: Params,
    real_img: jax.Array,
    real_c: Optional[jax.Array],
    z: jax.Array,
    gen_c: Optional[jax.Array],
    key: jax.Array,
    augment_fn: AugmentFn = None,
    ada_p: Optional[jax.Array] = None,
    hooks=None,
    ga_threshold: Optional[float] = None,
    ga_mutation_rate: float = 0.1,
    d_constraint=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Dmain: minimize logits on fakes, maximize on reals (loss.py:115-138).

    With ``ga_threshold`` set, near-boundary fakes are first replaced by GA
    offspring (the GA-GAN splice, training_loop.py:392-434 intended
    semantics) before D scores them.
    """
    k_g, k_aug1, k_aug2, k_ga = jax.random.split(key, 4)
    gen_img, gen_ws = run_G(g_cfg, g_params, z, gen_c, k_g,
                            cfg.style_mixing_prob, hooks=hooks)
    gen_img = jax.lax.stop_gradient(gen_img)
    metrics: Dict[str, jax.Array] = {}
    if ga_threshold is not None:
        gen_img, replaced = _ga_refine_fakes(
            g_cfg, d_cfg, g_params, d_params, real_img, gen_img, gen_ws,
            k_ga, ga_threshold, ga_mutation_rate, hooks,
            d_constraint=d_constraint)
        metrics["Loss/ga/replaced"] = replaced
    gen_logits = run_D(d_cfg, d_params, gen_img, gen_c, augment_fn, ada_p,
                       k_aug1, d_constraint=d_constraint)
    loss_Dgen = jnp.mean(softplus(gen_logits))

    real_logits = run_D(d_cfg, d_params, real_img, real_c, augment_fn, ada_p,
                        k_aug2, d_constraint=d_constraint)
    loss_Dreal = jnp.mean(softplus(-real_logits))
    metrics.update({
        "Loss/scores/fake": jnp.mean(gen_logits),
        "Loss/signs/fake": jnp.mean(jnp.sign(gen_logits)),
        "Loss/scores/real": jnp.mean(real_logits),
        "Loss/signs/real": jnp.mean(jnp.sign(real_logits)),
        "Loss/D/loss": loss_Dgen + loss_Dreal,
    })
    return loss_Dgen + loss_Dreal, metrics


def gd_main_loss(
    cfg: GANLossConfig,
    g_cfg: sg2.GeneratorConfig,
    d_cfg: sg2.DiscriminatorConfig,
    g_params: Params,
    d_params: Params,
    real_img: jax.Array,
    real_c: Optional[jax.Array],
    z: jax.Array,
    gen_c: Optional[jax.Array],
    key: jax.Array,
    augment_fn: AugmentFn = None,
    ada_p: Optional[jax.Array] = None,
    hooks=None,
    ga_threshold: Optional[float] = None,
    ga_mutation_rate: float = 0.1,
    d_constraint=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Gmain + Dmain as ONE scalar loss over a SHARED forward.

    Returns loss_g + loss_d where loss_g sees stop_gradient(d_params) and
    loss_d sees stop_gradient(fakes): differentiating the sum w.r.t.
    (g_params, d_params) yields exactly the per-phase gradients, while the
    G forward, the augmented D(fake) forward and the augment draw are
    computed once (the two D(fake) forwards trace to identical HLO and CSE
    into one).  Deliberate deviations from the reference's alternating
    phase schedule (training_loop.py:460-516), traded for ~20% step time:

      * D's gradient uses fakes from the PRE-update G (the reference
        updates G first, then regenerates fakes from the updated G);
      * G-loss and D-loss share one fake sample and one augment parameter
        draw per image (the reference draws each phase independently).

    Both are the standard "simultaneous" GAN update; disable via
    TrainConfig.simultaneous_main for reference semantics.

    Note: augmenting cat(fakes, reals) in one pipe call was measured SLOWER
    (1.77 vs 1.57 s/step at 1024²/batch 32) — the joint call drags the real
    half through the augment VJP, which the split form never computes (reals
    need no image gradient outside R1).
    """
    k_g, k_aug, k_ga = jax.random.split(key, 3)
    k_aug1, k_aug2 = jax.random.split(k_aug)
    gen_img, gen_ws = run_G(g_cfg, g_params, z, gen_c, k_g,
                            cfg.style_mixing_prob, hooks=hooks)

    # G route: D applied with frozen d_params (same forward HLO).
    d_frozen = jax.lax.stop_gradient(d_params)
    gen_logits_g = run_D(d_cfg, d_frozen, gen_img, gen_c, augment_fn, ada_p,
                         k_aug1, d_constraint=d_constraint)
    loss_g = jnp.mean(softplus(-gen_logits_g))

    # D route: same fake image, detached (loss.py:115-124 semantics).
    # With the GA splice on, near-boundary fakes are replaced by GA
    # offspring on the D route only (G still learns from its own fakes —
    # the reference splice feeds refined fakes to the D step).
    gen_img_d = jax.lax.stop_gradient(gen_img)
    metrics: Dict[str, jax.Array] = {}
    if ga_threshold is not None:
        gen_img_d, replaced = _ga_refine_fakes(
            g_cfg, d_cfg, g_params, d_params, real_img, gen_img_d, gen_ws,
            k_ga, ga_threshold, ga_mutation_rate, hooks,
            d_constraint=d_constraint)
        metrics["Loss/ga/replaced"] = replaced
    gen_logits_d = run_D(d_cfg, d_params, gen_img_d,
                         gen_c, augment_fn, ada_p, k_aug1,
                         d_constraint=d_constraint)
    real_logits = run_D(d_cfg, d_params, real_img, real_c, augment_fn,
                        ada_p, k_aug2, d_constraint=d_constraint)
    loss_d = jnp.mean(softplus(gen_logits_d)) + jnp.mean(softplus(-real_logits))

    metrics.update({
        "Loss/scores/fake": jnp.mean(gen_logits_d),
        "Loss/signs/fake": jnp.mean(jnp.sign(gen_logits_d)),
        "Loss/scores/real": jnp.mean(real_logits),
        "Loss/signs/real": jnp.mean(jnp.sign(real_logits)),
        "Loss/G/loss": loss_g,
        "Loss/D/loss": loss_d,
        "aux/mean_w": jnp.mean(gen_ws[:, 0].astype(jnp.float32), axis=0),
    })
    return loss_g + loss_d, metrics


def d_r1_loss(
    cfg: GANLossConfig,
    d_cfg: sg2.DiscriminatorConfig,
    d_params: Params,
    real_img: jax.Array,
    real_c: Optional[jax.Array],
    key: jax.Array,
    augment_fn: AugmentFn = None,
    ada_p: Optional[jax.Array] = None,
    d_constraint=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Dreg: R1 gradient penalty on reals (loss.py:140-152)."""

    def d_sum(img):
        logits = run_D(d_cfg, d_params, img, real_c, augment_fn, ada_p, key,
                       d_constraint=d_constraint)
        return jnp.sum(logits), logits

    grads, logits = jax.grad(d_sum, has_aux=True)(real_img)
    r1_penalty = jnp.sum(jnp.square(grads), axis=(1, 2, 3))
    loss = jnp.mean(r1_penalty) * (cfg.r1_gamma / 2.0)
    metrics = {
        "Loss/r1_penalty": jnp.mean(r1_penalty),
        "Loss/D/reg": loss,
        "Loss/scores/real": jnp.mean(logits),
        "Loss/signs/real": jnp.mean(jnp.sign(logits)),
    }
    return loss, metrics
