"""Model zoo: unified StyleGAN2 generator/discriminator (pure-function pytrees)."""

from .stylegan2 import (
    DiscriminatorConfig,
    GeneratorConfig,
    MappingConfig,
    SynthesisConfig,
    discriminator_apply,
    generator_apply,
    generator_styles,
    init_discriminator,
    init_generator,
    mapping_apply,
    synthesis_apply,
    synthesis_from_styles,
)

__all__ = [
    "DiscriminatorConfig",
    "GeneratorConfig",
    "MappingConfig",
    "SynthesisConfig",
    "discriminator_apply",
    "generator_apply",
    "generator_styles",
    "init_discriminator",
    "init_generator",
    "mapping_apply",
    "synthesis_apply",
    "synthesis_from_styles",
]
