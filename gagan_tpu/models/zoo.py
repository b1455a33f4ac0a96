"""Uniform generator registry + shift API.

Port of `SimilarDomains/gan_models/gan_load.py:18-128` and
`gan_with_shift.py`: a name->factory registry for the generator families
(stylegan2 / biggan / proggan / sn_anime / sn_mnist) with a uniform
`gen_shifted(z, shift)` direction-transfer API.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

generator_registry: Dict[str, Callable] = {}


def register_generator(name):
    def deco(fn):
        generator_registry[name] = fn
        return fn

    return deco


@dataclasses.dataclass
class GeneratorHandle:
    """Uniform wrapper: forward(z) and gen_shifted(z, shift)."""

    forward: Callable[[jax.Array], jax.Array]
    dim_z: int
    dim_shift: int
    gen_shifted: Callable[[jax.Array, jax.Array], jax.Array] = None

    def __post_init__(self):
        if self.gen_shifted is None:
            # Default: shift in z (gan_with_shift.py:5-9).
            self.gen_shifted = lambda z, shift: self.forward(z + shift)


@register_generator("stylegan2")
def make_stylegan2(snapshot_path: str, shift_in_w: bool = True,
                   truncation: float = 1.0) -> GeneratorHandle:
    """(gan_load.py:53-78): StyleGAN2 with shifts in w or z space."""
    from gagan_tpu.cli.generate import load_generator
    from gagan_tpu.models import stylegan2 as sg2

    g_cfg, params = load_generator(snapshot_path)

    @jax.jit
    def forward(z):
        return sg2.generator_apply(g_cfg, params, z,
                                   truncation_psi=truncation)

    @jax.jit
    def forward_w(w):
        ws = jnp.repeat(w[:, None, :], g_cfg.num_ws, axis=1)
        return sg2.synthesis_apply(g_cfg.synthesis, params["synthesis"], ws)

    @jax.jit
    def style(z):
        return sg2.mapping_apply(g_cfg.mapping, params["mapping"], z,
                                 broadcast=False)

    if shift_in_w:
        def gen_shifted(z, shift):
            return forward_w(style(z) + shift)
    else:
        def gen_shifted(z, shift):
            return forward(z + shift)

    return GeneratorHandle(forward=forward, dim_z=g_cfg.z_dim,
                           dim_shift=g_cfg.w_dim if shift_in_w else g_cfg.z_dim,
                           gen_shifted=gen_shifted)


@register_generator("biggan")
def make_biggan(weights_path: Optional[str] = None,
                target_classes=(239,), **cfg_kwargs) -> GeneratorHandle:
    """(gan_load.py:88-103 + ConditionedBigGAN:21-50)."""
    from gagan_tpu.models import biggan as bg
    from gagan_tpu.utils import checkpoint as ckpt_lib

    cfg = bg.BigGANConfig(**cfg_kwargs)
    if weights_path:
        data = np.load(weights_path, allow_pickle=False)
        params = ckpt_lib.flat_to_tree({k: data[k] for k in data.files})
    else:
        params = bg.init_biggan(jax.random.PRNGKey(0), cfg)
    classes = np.asarray(target_classes)

    rng_state = {"i": 0}

    def mixed_classes(batch):
        rnd = np.random.RandomState(rng_state["i"])
        rng_state["i"] += 1
        return jnp.asarray(rnd.choice(classes, batch))

    @jax.jit
    def _fwd(z, c):
        return bg.biggan_apply(cfg, params, z, c)

    def forward(z, class_ids=None):
        c = (mixed_classes(z.shape[0]) if class_ids is None
             else jnp.asarray(class_ids))
        return _fwd(z, c)

    return GeneratorHandle(forward=forward, dim_z=cfg.dim_z,
                           dim_shift=cfg.dim_z)


@register_generator("proggan")
def make_proggan(weights_path: Optional[str] = None) -> GeneratorHandle:
    from gagan_tpu.models import proggan as pg
    from gagan_tpu.utils import checkpoint as ckpt_lib

    if weights_path:
        data = np.load(weights_path, allow_pickle=False)
        params = ckpt_lib.flat_to_tree({k: data[k] for k in data.files})
    else:
        params = pg.init_proggan(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda z: pg.proggan_apply(params, z))
    return GeneratorHandle(forward=fwd, dim_z=512, dim_shift=512)


def _make_sngan(arch: str, weights_path: Optional[str]) -> GeneratorHandle:
    from gagan_tpu.models import sngan as sn
    from gagan_tpu.utils import checkpoint as ckpt_lib

    cfg = sn.SNGANConfig(arch=arch)
    if weights_path:
        data = np.load(weights_path, allow_pickle=False)
        params = ckpt_lib.flat_to_tree({k: data[k] for k in data.files})
    else:
        params = sn.init_sngan(jax.random.PRNGKey(0), cfg)
    fwd = jax.jit(lambda z: sn.sngan_apply(cfg, params, z))
    return GeneratorHandle(forward=fwd, dim_z=cfg.dim_z, dim_shift=cfg.dim_z)


@register_generator("sn_anime")
def make_sn_anime(weights_path: Optional[str] = None) -> GeneratorHandle:
    return _make_sngan("sn_resnet128", weights_path)


@register_generator("sn_mnist")
def make_sn_mnist(weights_path: Optional[str] = None) -> GeneratorHandle:
    cfg_handle = _make_sngan("sn_resnet32", weights_path)
    return cfg_handle


def make_generator(name: str, **kwargs) -> GeneratorHandle:
    return generator_registry[name](**kwargs)
