"""Projector tests: recover latents of a generated image (self-inversion)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gagan_tpu.inversion import projector
from gagan_tpu.metrics.detectors import Detector
from gagan_tpu.models import stylegan2 as sg2


def pixel_lpips():
    # Cheap stand-in LPIPS: downsampled pixels (keeps the test fast and
    # makes 'perceptual' distance == pixel distance).
    def fn(images):
        x = images.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, x.shape[:2] + (16, 16), method="bilinear")
        return x.reshape(x.shape[0], -1)

    return fn


@pytest.fixture(scope="module")
def tiny_g():
    g_cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=32, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=1024, channel_max=64))
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    return g_cfg, g_params


def test_projector_recovers_generated_image(tiny_g):
    g_cfg, g_params = tiny_g
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    target_img = sg2.generator_apply(g_cfg, g_params, z, noise_mode="const")
    target_u8 = np.asarray(
        jnp.clip(target_img * 127.5 + 128, 0, 255)).astype(np.uint8)[0]

    w = projector.project(
        g_cfg, g_params, target_u8, num_steps=60, w_avg_samples=256,
        lpips_fn=pixel_lpips(), key=jax.random.PRNGKey(2))
    assert w.shape == (g_cfg.num_ws, 32)

    recon = sg2.synthesis_apply(g_cfg.synthesis, g_params["synthesis"],
                                jnp.asarray(w)[None], noise_mode="const")
    err = float(jnp.mean(jnp.abs(recon - target_img)))
    base = float(jnp.mean(jnp.abs(target_img)))
    assert err < 0.6 * base, (err, base)


def test_projector_z_space_runs(tiny_g):
    g_cfg, g_params = tiny_g
    rng = np.random.RandomState(0)
    target = rng.randint(0, 255, (3, 32, 32), np.uint8)
    w = projector.project(
        g_cfg, g_params, target, num_steps=5, w_avg_samples=64, space="z",
        lpips_fn=pixel_lpips(), key=jax.random.PRNGKey(0))
    assert w.shape == (g_cfg.num_ws, 32)


def test_noise_regularization_zero_for_white_noise_large():
    # The reg penalizes autocorrelation; iid noise has near-zero expected
    # penalty while constant buffers score high.
    key = jax.random.PRNGKey(0)
    iid = {"b.conv": jax.random.normal(key, (32, 32))}
    const = {"b.conv": jnp.ones((32, 32))}
    assert float(projector.noise_regularization(iid)) < \
        float(projector.noise_regularization(const))
