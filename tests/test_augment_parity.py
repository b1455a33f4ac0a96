"""Parity of the XLA ADA pipe vs the reference AugmentPipe via the
deterministic debug_percentile hook (augment.py:253-511)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.train import augment as aug

from . import oracle

oracle.patch_reference()
import sys

sys.path.insert(0, "/root/reference/DissimilarDomains")
from training import augment as ref_augment  # noqa: E402


# 'noise' is excluded: the reference draws fresh gaussian noise even under
# debug_percentile (augment.py:500), so no cross-framework oracle exists;
# see test_noise_statistics below.
SPECS = ["blit", "geom", "color", "filter", "cutout", "bgc"]


@pytest.mark.parametrize("spec", SPECS)
@pytest.mark.parametrize("q", [0.1, 0.5, 0.9])
def test_augment_parity(spec, q):
    torch.manual_seed(0)
    kwargs = aug.AUGPIPE_SPECS[spec]
    pipe = ref_augment.AugmentPipe(**kwargs)
    pipe.p.copy_(torch.tensor(0.8))

    rng = np.random.RandomState(0)
    # >= 44px so the reference's 43-tap filter-bank reflect pad fits.
    img = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = pipe(torch.from_numpy(img), debug_percentile=q).numpy()

    cfg = aug.make_config(spec)
    got = np.asarray(aug.augment_pipe(
        cfg, jnp.asarray(img), 0.8, jax.random.PRNGKey(0), debug_percentile=q))
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_noise_statistics():
    # debug_percentile fixes sigma = erfinv(q) * noise_std; the added noise is
    # gaussian with that std.
    import scipy.special

    cfg = aug.make_config("noise")
    img = jnp.zeros((4, 3, 64, 64))
    q = 0.9
    out = aug.augment_pipe(cfg, img, 1.0, jax.random.PRNGKey(0),
                           debug_percentile=q)
    want_sigma = scipy.special.erfinv(q) * cfg.noise_std
    got_sigma = float(jnp.std(out))
    np.testing.assert_allclose(got_sigma, want_sigma, rtol=0.05)


def test_augment_identity_at_p0():
    # With p=0 and no debug percentile, geometric paths still execute but all
    # draws collapse to identity; output must equal input (up to resampling
    # roundtrip error for the geometric branch).
    cfg = aug.make_config("bgc")
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
    out = aug.augment_pipe(cfg, img, 0.0, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                               rtol=1e-3, atol=1e-3)


def test_augment_grad_flows():
    cfg = aug.make_config("bgc")
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))

    def loss(x):
        return jnp.mean(jnp.square(aug.augment_pipe(
            cfg, x, 0.5, jax.random.PRNGKey(1))))

    g = jax.grad(loss)(img)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.linalg.norm(g)) > 0


def test_augment_jits_inside_step():
    cfg = aug.make_config("bgc")
    fn = jax.jit(lambda x, p, k: aug.augment_pipe(cfg, x, p, k))
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
    out = fn(img, jnp.float32(0.3), jax.random.PRNGKey(1))
    assert out.shape == img.shape
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("q", [0.35, 0.5, 0.65])
def test_jit_fast_path_close_to_eager(q):
    # The jit path replaces the upsample-2x FIR pyramid + bilinear gather
    # with a native-resolution scale-aware triangle resampler
    # (train/warp.py).  Interior outputs must stay close to the exact
    # eager path for typical draws.
    cfg = aug.make_config("bgc")
    rng = np.random.RandomState(0)
    base = jnp.asarray(rng.randn(2, 3, 16, 16).astype(np.float32))
    img = jax.image.resize(base, (2, 3, 128, 128), "cubic")
    p = jnp.float32(0.8)
    key = jax.random.PRNGKey(1)
    want = np.asarray(aug.augment_pipe(cfg, img, p, key, debug_percentile=q))
    got = np.asarray(jax.jit(
        lambda im: aug.augment_pipe(cfg, im, p, key, debug_percentile=q))(img))
    err = np.abs(want - got)[:, :, 16:-16, 16:-16]
    assert err.mean() < 0.04, (q, err.mean())


@pytest.mark.parametrize("q", [0.25, 0.75])
def test_exact_geom_mode_under_jit(q):
    # geom_mode="exact" must reproduce the eager reference pyramid
    # bit-for-bit even under jit (static full-width reflect margin replaces
    # the data-dependent one; sample positions never exceed either).
    import dataclasses

    cfg = aug.make_config("bgc")
    exact_cfg = dataclasses.replace(cfg, geom_mode="exact")
    rng = np.random.RandomState(2)
    base = jnp.asarray(rng.randn(2, 3, 16, 16).astype(np.float32))
    img = jax.image.resize(base, (2, 3, 64, 64), "cubic")
    p = jnp.float32(0.8)
    key = jax.random.PRNGKey(3)
    want = np.asarray(aug.augment_pipe(cfg, img, p, key, debug_percentile=q))
    got = np.asarray(jax.jit(lambda im: aug.augment_pipe(
        exact_cfg, im, p, key, debug_percentile=q))(img))
    # jit reorders float ops; anything beyond reassociation noise fails.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fast_geom_mode_eagerly():
    # geom_mode="fast" runs the gather-free warp outside jit too, matching
    # what the jit auto path computes.
    import dataclasses

    cfg = aug.make_config("bgc")
    fast_cfg = dataclasses.replace(cfg, geom_mode="fast")
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    p = jnp.float32(0.8)
    key = jax.random.PRNGKey(5)
    want = np.asarray(jax.jit(lambda im: aug.augment_pipe(
        cfg, im, p, key, debug_percentile=0.3))(img))
    got = np.asarray(aug.augment_pipe(fast_cfg, img, p, key,
                                      debug_percentile=0.3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
