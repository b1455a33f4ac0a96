"""Rosinality-checkpoint conversion parity: a random rosinality Generator's
outputs must match our unified generator on the converted weights.

This closes the dual-stack story (SURVEY.md §1 L2): one implementation loads
both NVlabs (identity map, tests/test_stylegan2_parity.py) and rosinality
(this test) checkpoints.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.models import stylegan2 as sg2
from gagan_tpu.utils import checkpoint as ckpt_lib

from . import oracle  # noqa: F401  (sys.path setup)

sys.path.insert(0, "/root/reference/SimilarDomains")

from tools.convert_weights import rosinality_to_flat  # noqa: E402


@pytest.fixture(scope="module")
def ros_pair():
    from gan_models.StyleGAN2 import model as ros

    torch.manual_seed(0)
    size = 64
    G = ros.Generator(size=size, style_dim=512, n_mlp=2,
                      channel_multiplier=2).eval()
    sd = {k: v.detach().numpy() for k, v in G.state_dict().items()}
    flat = rosinality_to_flat(sd, size=size, n_mlp=2)
    params = ckpt_lib.flat_to_tree(flat)
    g_cfg = sg2.GeneratorConfig(
        z_dim=512, w_dim=512, img_resolution=size, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2, lr_multiplier=0.01),
        synthesis=sg2.SynthesisConfig(channel_base=32768, channel_max=512))
    return G, g_cfg, params


def test_mapping_parity(ros_pair):
    G, g_cfg, params = ros_pair
    z = np.random.RandomState(0).randn(2, 512).astype(np.float32)
    with torch.no_grad():
        want = G.style(torch.from_numpy(z)).numpy()
    got = np.asarray(sg2.mapping_apply(
        g_cfg.mapping, params["mapping"], jnp.asarray(z), broadcast=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_synthesis_parity(ros_pair):
    G, g_cfg, params = ros_pair
    z = np.random.RandomState(1).randn(2, 512).astype(np.float32)
    with torch.no_grad():
        want, _ = G([torch.from_numpy(z)], randomize_noise=False)
    want = want.numpy()
    got = np.asarray(sg2.generator_apply(
        g_cfg, params, jnp.asarray(z), noise_mode="const"))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_w_input_parity(ros_pair):
    # input_is_latent path == synthesis from broadcast w.
    G, g_cfg, params = ros_pair
    z = np.random.RandomState(2).randn(2, 512).astype(np.float32)
    with torch.no_grad():
        w = G.style(torch.from_numpy(z))
        want, _ = G([w], input_is_latent=True, randomize_noise=False)
    want = want.numpy()
    ws = jnp.repeat(jnp.asarray(w.numpy())[:, None], g_cfg.num_ws, axis=1)
    got = np.asarray(sg2.synthesis_apply(
        g_cfg.synthesis, params["synthesis"], ws, noise_mode="const"))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
