"""Genetic-algorithm layer: crossover/mutation primitives, fitness
evaluation, population search over StyleSpace directions, and the in-training
refinement hook."""

from .crossover_mutation import (
    dynamic_mutation,
    gaussian_crossover,
    simulated_binary_crossover,
)
from .evaluation import calculate_metrics, make_alex_lpips
from .search import GASearchConfig, evolve_directions
from .refine import apply_genetic_refinement, wgan_gradient_penalty

__all__ = [
    "GASearchConfig",
    "apply_genetic_refinement",
    "wgan_gradient_penalty",
    "calculate_metrics",
    "dynamic_mutation",
    "evolve_directions",
    "gaussian_crossover",
    "make_alex_lpips",
    "simulated_binary_crossover",
]
