"""StyleFlow CNF invertibility + II2S inversion tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gagan_tpu.editing import styleflow as sf
from gagan_tpu.inversion import ii2s
from gagan_tpu.models import stylegan2 as sg2


def test_cnf_forward_reverse_invertible():
    cfg = sf.StyleFlowConfig(input_dim=16, hidden_dims=(32, 32),
                             context_dim=5, rk4_steps=60)
    params = sf.init_styleflow(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 5))
    z = sf.flow_apply(params, cfg, x, ctx, reverse=False)
    back = sf.flow_apply(params, cfg, z, ctx, reverse=True)
    assert not bool(jnp.allclose(z, x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-3, atol=1e-4)


def test_editor_changes_latents_and_preserves_layers():
    cfg = sf.StyleFlowConfig(input_dim=32, hidden_dims=(64,), context_dim=17,
                             rk4_steps=30)
    params = sf.init_styleflow(jax.random.PRNGKey(0), cfg)
    editor = sf.StyleFlowEditor(params, cfg, num_ws=18)
    w = jax.random.normal(jax.random.PRNGKey(1), (1, 18, 32))
    attrs = np.zeros(8, np.float32)
    light = np.zeros(9, np.float32)
    edited = editor.edit(w, attrs, light, attr_idx=0, edit_power=1.0)
    assert edited.shape == w.shape
    # Gender edit preserves layers 8+ (editor.py:73-74).
    np.testing.assert_allclose(np.asarray(edited[:, 8:]),
                               np.asarray(w[:, 8:]))
    assert not bool(jnp.allclose(edited[:, :8], w[:, :8]))


def test_ii2s_inverts_generated_image():
    g_cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=32, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=1024, channel_max=64))
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    target = sg2.generator_apply(g_cfg, g_params, z, noise_mode="const")

    def pixel_lpips(images):
        x = images.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, x.shape[:2] + (8, 8), method="bilinear")
        return x.reshape(x.shape[0], -1)

    cfg = ii2s.II2SConfig(steps=40, learning_rate=0.05, p_norm_lambda=1e-4,
                          pca_samples=512)
    w = ii2s.invert_image(cfg, g_cfg, g_params,
                          np.asarray(target[0]), lpips_fn=pixel_lpips,
                          key=jax.random.PRNGKey(2))
    assert w.shape == (g_cfg.num_ws, 32)
    recon = sg2.synthesis_apply(g_cfg.synthesis, g_params["synthesis"],
                                jnp.asarray(w)[None], noise_mode="const")
    err = float(jnp.mean(jnp.abs(recon - target)))
    base = float(jnp.mean(jnp.abs(target)))
    assert err < 0.8 * base, (err, base)


def test_pca_model_shapes():
    g_cfg = sg2.GeneratorConfig(
        z_dim=16, w_dim=16, img_resolution=16, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=1),
        synthesis=sg2.SynthesisConfig(channel_base=256, channel_max=16))
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    pca = ii2s.build_pca_model(g_cfg, g_params, jax.random.PRNGKey(1),
                               n_samples=256)
    assert pca["X_mean"].shape == (16,)
    assert pca["X_comp"].shape == (16, 16)
    assert pca["X_stdev"].shape == (16,)
    # p-norm of the mean latent in PCA space is small vs a far-out latent.
    lat_mean = jnp.asarray(pca["X_mean"][None, None])
    # invert leaky5 of the mean: for the prior value only shape matters here
    near = ii2s.p_norm_loss(pca, jnp.zeros((1, 1, 16)), 1.0)
    far = ii2s.p_norm_loss(pca, jnp.full((1, 1, 16), 100.0), 1.0)
    assert float(far) > float(near)
