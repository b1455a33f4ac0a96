"""gagan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) StyleGAN2 domain-adaptation
framework with the capabilities of the ndhlt/GA-GAN reference (StyleDomain + GA).

Subpackages
-----------
ops       Core image-resampling / activation / modulated-conv kernels
          (XLA formulations + Pallas TPU kernels for the hot paths).
models    Unified StyleGAN2 generator / discriminator as pure functions over
          parameter pytrees (replaces the reference's dual rosinality/NVlabs stacks).
params    Offset / parameterization system: StyleSpace directions, Affine+,
          AffineLight+, and the full weight-offset grammar as pure pytree transforms.
train     Adversarial (ADA) and CLIP-directional trainers as jit'd SPMD steps.
parallel  Mesh construction and sharding policies (ICI data axis, DCN multihost).
data      Dataset tooling (zip datasets, preprocessing) and input pipelines.
metrics   FID/KID/PR/PPL/IS and CLIP quality/diversity evaluators.
ga        Genetic-algorithm direction search, vmapped over a population axis.
"""

__version__ = "0.1.0"
