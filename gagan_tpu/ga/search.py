"""GA-driven StyleSpace direction search, vmapped over the population.

The BASELINE config-5 workload: a population of StyleSpace directions evolved
with `gaussian_crossover` + `dynamic_mutation` under a feature-based fitness
(`GA/feature_extraction.py`, `GA/evaluation.py`), re-expressed TPU-first:

  * a direction is one flat vector over all per-layer style dims
    (the SparsedModel flat s-vector of the reference,
    `SimilarDomains/core/sparse_models.py:46-99`);
  * candidate evaluation is `lax.map`-batched and vmappable, and the
    population axis shards over the device mesh ('data' axis) so each chip
    evaluates its slice of the population;
  * selection/crossover/mutation are pure key-threaded array ops.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gagan_tpu.ga.crossover_mutation import dynamic_mutation, gaussian_crossover
from gagan_tpu.models import stylegan2 as sg2

Params = Dict


def style_dims(syn_cfg: sg2.SynthesisConfig) -> List[int]:
    return syn_cfg.layer_in_channels()


def direction_dim(syn_cfg: sg2.SynthesisConfig) -> int:
    return sum(style_dims(syn_cfg))


def direction_to_hooks(syn_cfg: sg2.SynthesisConfig, direction: jax.Array):
    """Flat direction vector -> additive StyleSpace hooks (s_delta)."""
    names = syn_cfg.layer_names()
    dims = style_dims(syn_cfg)
    hooks = {}
    start = 0
    for name, d in zip(names, dims):
        seg = jax.lax.dynamic_slice(direction, (start,), (d,))
        hooks[name] = {"style": (lambda s, o=seg: s + o.astype(s.dtype))}
        start += d
    return hooks


def batched_direction_hooks(syn_cfg: sg2.SynthesisConfig,
                            directions: jax.Array):
    """Per-SAMPLE additive StyleSpace hooks: ``directions`` [B, D] applies
    row b to sample b — the whole population rides ONE generator batch."""
    names = syn_cfg.layer_names()
    dims = style_dims(syn_cfg)
    hooks = {}
    start = 0
    for name, d in zip(names, dims):
        seg = jax.lax.dynamic_slice_in_dim(directions, start, d, axis=1)
        hooks[name] = {"style": (lambda s, o=seg: s + o.astype(s.dtype))}
        start += d
    return hooks


@dataclasses.dataclass(frozen=True)
class GASearchConfig:
    population: int = 32
    generations: int = 10
    elite: int = 4
    batch_per_candidate: int = 4
    mutation_rate: float = 0.1
    init_sigma: float = 1.0
    truncation_psi: float = 0.7
    # 'scan': one candidate per generator pass (lax.map — small batches,
    # latency-bound on TPU).  'batched': the population rides one
    # [population * batch_per_candidate] generator batch via per-sample
    # style hooks — the MXU-shaped form (measured in
    # tools/bench_ga_search.py); numerics identical per-sample.
    eval_mode: str = "scan"


def evolve_directions(
    key: jax.Array,
    g_cfg: sg2.GeneratorConfig,
    g_params: Params,
    fitness_fn: Callable[[jax.Array], jax.Array],
    cfg: GASearchConfig = GASearchConfig(),
    mesh=None,
    progress: Optional[Callable] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Evolve StyleSpace directions maximizing fitness_fn(images)->scalar.

    Returns (best_direction [D], history [generations]).  With ``mesh`` the
    population axis is sharded across devices (each chip evaluates its
    candidates; selection happens on replicated scores).
    """
    dim = direction_dim(g_cfg.synthesis)
    key, k_init = jax.random.split(key)
    population = jax.random.normal(k_init, (cfg.population, dim)) \
        * cfg.init_sigma

    def eval_candidate(direction, z, noise_key):
        hooks = direction_to_hooks(g_cfg.synthesis, direction)
        img = sg2.generator_apply(
            g_cfg, g_params, z, truncation_psi=cfg.truncation_psi,
            noise_mode="const", hooks=hooks)
        img_u8 = jnp.clip(img * 127.5 + 128, 0, 255)
        return fitness_fn(img_u8)

    @jax.jit
    def eval_population_scan(population, z, noise_key):
        return jax.lax.map(
            lambda d: eval_candidate(d, z, noise_key), population)

    @jax.jit
    def eval_population_batched(population, z, noise_key):
        b = cfg.batch_per_candidate
        pop = population.shape[0]
        dirs_rep = jnp.repeat(population, b, axis=0)      # candidate-major
        z_rep = jnp.tile(z, (pop, 1))
        hooks = batched_direction_hooks(g_cfg.synthesis, dirs_rep)
        img = sg2.generator_apply(
            g_cfg, g_params, z_rep, truncation_psi=cfg.truncation_psi,
            noise_mode="const", hooks=hooks)
        img_u8 = jnp.clip(img * 127.5 + 128, 0, 255)
        imgs = img_u8.reshape((pop, b) + img_u8.shape[1:])
        return jax.vmap(fitness_fn)(imgs)

    eval_population = (eval_population_batched if cfg.eval_mode == "batched"
                       else eval_population_scan)

    @jax.jit
    def next_generation(population, scores, key):
        order = jnp.argsort(-scores)                     # descending fitness
        elite = population[order[: cfg.elite]]
        n_children = cfg.population - cfg.elite
        k_p1, k_p2, k_cx, k_mut = jax.random.split(key, 4)
        # Rank-based parent sampling from the top half.
        top_half = population[order[: max(cfg.population // 2, 2)]]
        p1 = top_half[jax.random.randint(k_p1, (n_children,), 0,
                                         top_half.shape[0])]
        p2 = top_half[jax.random.randint(k_p2, (n_children,), 0,
                                         top_half.shape[0])]
        children = jax.vmap(gaussian_crossover)(
            jax.random.split(k_cx, n_children), p1, p2)
        children = jax.vmap(
            lambda k, x: dynamic_mutation(k, x, cfg.mutation_rate))(
                jax.random.split(k_mut, n_children), children)
        return jnp.concatenate([elite, children], axis=0)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        pop_sharding = NamedSharding(mesh, P("data"))
        population = jax.device_put(population, pop_sharding)

    history = []
    for gen in range(cfg.generations):
        key, k_z, k_n, k_next = jax.random.split(key, 4)
        z = jax.random.normal(k_z, (cfg.batch_per_candidate, g_cfg.z_dim))
        scores = eval_population(population, z, k_n)
        history.append(float(jnp.max(scores)))
        if progress is not None:
            progress(gen, history[-1])
        population = next_generation(population, scores, k_next)
        if mesh is not None:
            population = jax.device_put(population, pop_sharding)

    key, k_z, k_n = jax.random.split(key, 3)
    z = jax.random.normal(k_z, (cfg.batch_per_candidate, g_cfg.z_dim))
    scores = eval_population(population, z, k_n)
    best = population[jnp.argmax(scores)]
    return np.asarray(best), np.asarray(history)
