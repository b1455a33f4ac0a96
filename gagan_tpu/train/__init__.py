"""Trainers: adversarial (ADA) and CLIP-directional steps as jit'd SPMD programs."""
