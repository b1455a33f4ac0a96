"""Gather-free affine warp: correctness vs the exact bilinear sampler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gagan_tpu.train import augment as aug
from gagan_tpu.train import warp


def theta_of(angle, scale, tx, ty, flip=1.0):
    c, s = np.cos(angle), np.sin(angle)
    return np.asarray([[c * scale * flip, -s * scale, tx],
                       [s * scale * flip, c * scale, ty]], np.float32)


@pytest.fixture(scope="module")
def smooth_img():
    rng = np.random.RandomState(0)
    base = rng.randn(2, 3, 12, 12).astype(np.float32)
    return jax.image.resize(jnp.asarray(base), (2, 3, 96, 96), "cubic")


CASES = {
    "identity": theta_of(0, 1, 0, 0),
    "translate": theta_of(0, 1, 0.1, -0.07),
    "rot20": theta_of(0.35, 1, 0, 0),
    "rot90ish": theta_of(np.pi / 2 - 0.1, 1, 0, 0),
    "rot180ish": theta_of(np.pi - 0.2, 1, 0, 0),
    "rot270ish": theta_of(-np.pi / 2 + 0.2, 1, 0, 0),
    "zoom_in": theta_of(0.2, 0.7, 0.05, 0),
    "zoom_out": theta_of(-0.3, 1.6, 0, 0.05),
    "flip": theta_of(0.1, 1.0, 0, 0, flip=-1),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_warp_close_to_bilinear(smooth_img, name):
    m = CASES[name]
    theta = jnp.asarray(np.stack([m, m]))
    want = np.asarray(aug.affine_grid_sample(smooth_img, theta, 96, 96))
    got = np.asarray(warp.affine_warp(smooth_img, theta, 96, 96))
    # Interior comparison; the composed triangle*lerp kernel is slightly
    # softer than pure bilinear (exact for axis-aligned transforms).
    err = np.abs(want - got)[:, :, 8:-8, 8:-8]
    assert err.mean() < 0.02, (name, err.mean())
    if name in ("identity", "translate"):
        assert err.max() < 1e-4


def test_warp_exact_integer_translate(smooth_img):
    # integer-pixel translate in pixel space: tx = 2*k/W in normalized coords
    m = theta_of(0, 1, 2 * 8 / 96, 0)
    theta = jnp.asarray(np.stack([m, m]))
    want = np.asarray(aug.affine_grid_sample(smooth_img, theta, 96, 96))
    got = np.asarray(warp.affine_warp(smooth_img, theta, 96, 96))
    np.testing.assert_allclose(got[:, :, 8:-8, 8:-8],
                               want[:, :, 8:-8, 8:-8], atol=1e-4)


def test_warp_grad_flows(smooth_img):
    m = CASES["rot20"]
    theta = jnp.asarray(np.stack([m, m]))

    def loss(x):
        return jnp.mean(jnp.square(warp.affine_warp(x, theta, 96, 96)))

    g = jax.grad(loss)(smooth_img)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.linalg.norm(g)) > 0


def test_augment_jit_uses_fast_warp(smooth_img):
    # Under jit the pipe must still be finite/identity-ish at p=0.
    cfg = aug.make_config("bgc")
    fn = jax.jit(lambda x: aug.augment_pipe(cfg, x, 0.0, jax.random.PRNGKey(0)))
    out = fn(smooth_img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(smooth_img),
                               rtol=1e-3, atol=2e-3)
