"""GA primitives (`GA/crossover_mutation.py:4-19`) as key-threaded pure
functions, vmappable over a population axis."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_crossover(key: jax.Array, parent1: jax.Array,
                       parent2: jax.Array) -> jax.Array:
    """child = mu * p1 + (1 - mu) * p2, elementwise mu ~ N(0, 1)
    (GA/crossover_mutation.py:4-7)."""
    mu = jax.random.normal(key, parent1.shape, dtype=parent1.dtype)
    return mu * parent1 + (1 - mu) * parent2


def simulated_binary_crossover(key: jax.Array, parent1: jax.Array,
                               parent2: jax.Array):
    """beta ~ U[0,1); children = 0.5((1±beta) p1 + (1∓beta) p2)
    (GA/crossover_mutation.py:10-14)."""
    beta = jax.random.uniform(key, (), dtype=parent1.dtype)
    child1 = 0.5 * ((1 + beta) * parent1 + (1 - beta) * parent2)
    child2 = 0.5 * ((1 - beta) * parent1 + (1 + beta) * parent2)
    return child1, child2


def dynamic_mutation(key: jax.Array, features: jax.Array,
                     mutation_rate: float = 0.1) -> jax.Array:
    """x + rate * N(0,1) (GA/crossover_mutation.py:17-19)."""
    return features + mutation_rate * jax.random.normal(
        key, features.shape, dtype=features.dtype)
