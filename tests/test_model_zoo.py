"""Auxiliary generator zoo tests: shapes, registry, shift API, and BigGAN
parity vs the reference torch implementation on converted random weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.models import biggan as bg
from gagan_tpu.models import proggan as pg
from gagan_tpu.models import sngan as sn
from gagan_tpu.models import zoo


@pytest.mark.slow
def test_proggan_shapes():
    # Fixed FFHQ-1024 arch: the full apply is ~30 s of CPU conv compute,
    # so the end-to-end smoke lives in the slow tier (zoo loader/registry
    # coverage stays in core).
    params = pg.init_proggan(jax.random.PRNGKey(0))
    # Tiny smoke: run through the first blocks only via full apply at low
    # cost is impossible (fixed 1024 arch), so check full apply on batch 1.
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
    img = pg.proggan_apply(params, z)
    assert img.shape == (1, 3, 1024, 1024)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_sngan_shapes():
    cfg = sn.SNGANConfig(arch="sn_resnet32")
    params = sn.init_sngan(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 128))
    img = sn.sngan_apply(cfg, params, z)
    assert img.shape == (2, 3, 32, 32)
    assert float(jnp.max(jnp.abs(img))) <= 1.0


def test_biggan_shapes_small():
    cfg = bg.BigGANConfig(ch=16, resolution=32, n_classes=10, dim_z=120,
                          shared_dim=32, attention=16)
    params = bg.init_biggan(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.dim_z))
    c = jnp.asarray([1, 7])
    img = bg.biggan_apply(cfg, params, z, c)
    assert img.shape == (2, 3, 32, 32)
    # Different classes give different images.
    img2 = bg.biggan_apply(cfg, params, z, jnp.asarray([3, 3]))
    assert not bool(jnp.allclose(img, img2))


def test_biggan_parity_vs_reference():
    import sys

    sys.path.insert(0, "/root/reference/SimilarDomains/gan_models")
    sys.path.insert(0, "/root/reference/SimilarDomains")
    from gan_models.BigGAN import BigGAN as ref_biggan

    torch.manual_seed(0)
    G = ref_biggan.Generator(
        G_ch=16, dim_z=120, resolution=32, n_classes=10, G_shared=True,
        shared_dim=32, hier=True, G_attn="16", G_param="N",  # no SN
        skip_init=True, no_optim=True,
    ).eval()
    # Randomize weights (skip_init leaves default torch init).
    sd = {k: v.detach().numpy() for k, v in G.state_dict().items()
          if "num_batches_tracked" not in k}

    from gagan_tpu.utils import checkpoint as ckpt_lib

    cfg = bg.BigGANConfig(ch=16, resolution=32, n_classes=10, dim_z=120,
                          shared_dim=32, attention=16)
    params = ckpt_lib.flat_to_tree(sd)
    rng = np.random.RandomState(0)
    z = rng.randn(2, cfg.dim_z).astype(np.float32)
    cls = np.asarray([3, 7])
    with torch.no_grad():
        y = G.shared(torch.from_numpy(cls))
        want = G(torch.from_numpy(z), y).numpy()
    got = np.asarray(bg.biggan_apply(cfg, params, jnp.asarray(z),
                                     jnp.asarray(cls)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_zoo_registry_and_shift():
    handle = zoo.make_generator("sn_mnist")
    z = jax.random.normal(jax.random.PRNGKey(0), (2, handle.dim_z))
    img = handle.forward(z)
    assert img.shape[0] == 2
    shift = jnp.ones((handle.dim_shift,)) * 0.5
    shifted = handle.gen_shifted(z, shift)
    assert not bool(jnp.allclose(img, shifted))
    assert set(zoo.generator_registry) >= {
        "stylegan2", "biggan", "proggan", "sn_anime", "sn_mnist"}
