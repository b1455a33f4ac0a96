"""GA layer tests: primitive parity vs reference formulas, population search
convergence, refinement hook, mesh sharding."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.ga import (
    GASearchConfig,
    apply_genetic_refinement,
    calculate_metrics,
    dynamic_mutation,
    evolve_directions,
    gaussian_crossover,
    simulated_binary_crossover,
)
from gagan_tpu.ga import search as ga_search
from gagan_tpu.models import stylegan2 as sg2


def test_gaussian_crossover_matches_reference_formula():
    key = jax.random.PRNGKey(0)
    p1 = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32))
    p2 = jnp.asarray(np.random.RandomState(1).randn(4, 8).astype(np.float32))
    child = gaussian_crossover(key, p1, p2)
    mu = jax.random.normal(key, p1.shape, dtype=p1.dtype)
    want = mu * p1 + (1 - mu) * p2
    np.testing.assert_allclose(np.asarray(child), np.asarray(want), rtol=1e-6)


def test_sbx_children_sum():
    key = jax.random.PRNGKey(1)
    p1 = jnp.ones((3, 4))
    p2 = jnp.full((3, 4), 2.0)
    c1, c2 = simulated_binary_crossover(key, p1, p2)
    # children average to the parents' average for any beta
    np.testing.assert_allclose(np.asarray((c1 + c2) / 2),
                               np.asarray((p1 + p2) / 2), rtol=1e-6)


def test_dynamic_mutation_scale():
    key = jax.random.PRNGKey(2)
    x = jnp.zeros((1000,))
    m = dynamic_mutation(key, x, mutation_rate=0.1)
    assert 0.05 < float(jnp.std(m)) < 0.2


@pytest.fixture(scope="module")
def tiny_gd():
    g_cfg = sg2.GeneratorConfig(
        z_dim=16, w_dim=16, img_resolution=16, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=1),
        synthesis=sg2.SynthesisConfig(channel_base=256, channel_max=16))
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    d_cfg = sg2.DiscriminatorConfig(
        img_resolution=16, img_channels=3, channel_base=256, channel_max=16,
        mbstd_group_size=2)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(1), d_cfg)
    return g_cfg, g_params, d_cfg, d_params


def test_direction_roundtrip(tiny_gd):
    g_cfg, g_params, _, _ = tiny_gd
    dim = ga_search.direction_dim(g_cfg.synthesis)
    assert dim == sum(g_cfg.synthesis.layer_in_channels())
    direction = jnp.zeros((dim,))
    hooks = ga_search.direction_to_hooks(g_cfg.synthesis, direction)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    base = sg2.generator_apply(g_cfg, g_params, z)
    with_zero = sg2.generator_apply(g_cfg, g_params, z, hooks=hooks)
    np.testing.assert_allclose(np.asarray(with_zero), np.asarray(base),
                               rtol=1e-5, atol=1e-6)


def test_evolution_improves_fitness(tiny_gd):
    g_cfg, g_params, _, _ = tiny_gd

    # Fitness: mean brightness of generated images (easy to optimize).
    def fitness(img_u8):
        return jnp.mean(img_u8.astype(jnp.float32))

    cfg = GASearchConfig(population=8, generations=5, elite=2,
                         batch_per_candidate=2, mutation_rate=0.3,
                         init_sigma=0.5)
    best, history = evolve_directions(
        jax.random.PRNGKey(0), g_cfg, g_params, fitness, cfg)
    assert best.shape == (ga_search.direction_dim(g_cfg.synthesis),)
    assert history[-1] >= history[0]


def test_evolution_sharded_over_mesh(tiny_gd):
    from gagan_tpu.parallel import create_mesh

    g_cfg, g_params, _, _ = tiny_gd
    mesh = create_mesh(8)
    assert mesh.devices.size == 8

    def fitness(img_u8):
        return -jnp.mean(jnp.square(img_u8.astype(jnp.float32) / 255 - 0.5))

    cfg = GASearchConfig(population=16, generations=2, elite=2,
                         batch_per_candidate=2)
    best, history = evolve_directions(
        jax.random.PRNGKey(0), g_cfg, g_params, fitness, cfg, mesh=mesh)
    assert np.isfinite(history).all()


def test_evolution_mesh_matches_single_device(tiny_gd):
    """Sharding the population axis over the 8-device mesh is a pure layout
    choice: selection happens on replicated scores, so the evolved best
    direction and fitness history must equal the single-device run
    (BASELINE config 5 determinism; VERDICT r4 #6)."""
    from gagan_tpu.parallel import create_mesh

    g_cfg, g_params, _, _ = tiny_gd

    def fitness(img_u8):
        return -jnp.mean(jnp.square(img_u8.astype(jnp.float32) / 255 - 0.5))

    cfg = GASearchConfig(population=16, generations=3, elite=2,
                         batch_per_candidate=2)
    best_1, hist_1 = evolve_directions(
        jax.random.PRNGKey(0), g_cfg, g_params, fitness, cfg)
    best_8, hist_8 = evolve_directions(
        jax.random.PRNGKey(0), g_cfg, g_params, fitness, cfg,
        mesh=create_mesh(8))
    np.testing.assert_allclose(hist_8, hist_1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(best_8, best_1, rtol=1e-5, atol=1e-5)


def test_evolution_batched_matches_scan(tiny_gd):
    """eval_mode='batched' (population in one generator batch via
    per-sample style hooks) scores each candidate identically to the
    per-candidate scan, so the evolution trajectory matches."""
    g_cfg, g_params, _, _ = tiny_gd

    def fitness(img_u8):
        return jnp.mean(img_u8.astype(jnp.float32))

    base = dict(population=8, generations=2, elite=2, batch_per_candidate=2)
    best_s, hist_s = evolve_directions(
        jax.random.PRNGKey(1), g_cfg, g_params, fitness,
        GASearchConfig(eval_mode="scan", **base))
    best_b, hist_b = evolve_directions(
        jax.random.PRNGKey(1), g_cfg, g_params, fitness,
        GASearchConfig(eval_mode="batched", **base))
    np.testing.assert_allclose(hist_b, hist_s, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(best_b, best_s, rtol=1e-4, atol=1e-4)


def test_genetic_refinement_replaces_only_masked(tiny_gd):
    g_cfg, g_params, d_cfg, d_params = tiny_gd
    key = jax.random.PRNGKey(3)
    z = jax.random.normal(key, (4, 16))
    ws = sg2.mapping_apply(g_cfg.mapping, g_params["mapping"], z)
    fake = sg2.synthesis_apply(g_cfg.synthesis, g_params["synthesis"], ws)
    real = jax.random.normal(jax.random.PRNGKey(4), fake.shape)

    # threshold=inf: every fake replaced; threshold=0: none replaced.
    out_all = apply_genetic_refinement(
        g_cfg, g_params, d_cfg, d_params, real, fake, ws,
        jax.random.PRNGKey(5), threshold=1e9)
    out_none = apply_genetic_refinement(
        g_cfg, g_params, d_cfg, d_params, real, fake, ws,
        jax.random.PRNGKey(5), threshold=0.0)
    assert not bool(jnp.allclose(out_all, fake))
    np.testing.assert_array_equal(np.asarray(out_none), np.asarray(fake))


def test_ga_splice_loss_level(tiny_gd):
    """The GA splice at the loss level (cheap, stays in the core tier):
    threshold=inf replaces every fake (reported fraction 1.0, different D
    loss), threshold=0 is bit-identical to GA off."""
    from gagan_tpu.train import gan_loss

    g_cfg, g_params, d_cfg, d_params = tiny_gd
    real = jax.random.normal(jax.random.PRNGKey(10), (4, 3, 16, 16))
    z = jax.random.normal(jax.random.PRNGKey(11), (4, 16))
    key = jax.random.PRNGKey(12)
    lcfg = gan_loss.GANLossConfig()

    def run(thr, loss_fn):
        return jax.jit(lambda: loss_fn(
            lcfg, g_cfg, d_cfg, g_params, d_params, real, None, z, None,
            key, ga_threshold=thr))()

    # gd path only in the core tier — the slow fused-step test covers the
    # alternating d_main path with the same three thresholds.
    for loss_fn in (gan_loss.gd_main_loss,):
        (l_off, m_off) = run(None, loss_fn)
        (l_all, m_all) = run(1e9, loss_fn)
        (l_none, m_none) = run(0.0, loss_fn)
        assert "Loss/ga/replaced" not in m_off
        assert float(m_all["Loss/ga/replaced"]) == 1.0
        assert float(m_none["Loss/ga/replaced"]) == 0.0
        np.testing.assert_array_equal(np.asarray(m_none["Loss/D/loss"]),
                                      np.asarray(m_off["Loss/D/loss"]))
        assert not np.allclose(float(m_all["Loss/D/loss"]),
                               float(m_off["Loss/D/loss"]))
        assert np.isfinite(float(l_all))


@pytest.mark.slow
def test_ga_splice_wired_into_train_step(tiny_gd):
    """TrainConfig.ga_threshold reaches the jitted D phases: the replaced
    fraction is reported, threshold=inf replaces everything, and
    threshold=0 is bit-identical to GA off (reference training_loop.py:199
    threshold kwarg; splice at :392-434).  Slow: compiles six fused-step
    programs; the loss-level core test covers the same semantics."""
    from gagan_tpu.train import gan_loss, train_step as ts

    g_cfg, g_params, d_cfg, d_params = tiny_gd
    real = jax.random.normal(jax.random.PRNGKey(10), (4, 3, 16, 16))
    z = jax.random.normal(jax.random.PRNGKey(11), (4, 16))
    key = jax.random.PRNGKey(12)

    for simultaneous in (False, True):
        def run(thr):
            cfg = ts.TrainConfig(batch_size=4, ga_threshold=thr,
                                 simultaneous_main=simultaneous)
            g_tx, d_tx, _, _ = ts.build_optimizers(cfg, g_params, d_params)
            state = ts.init_train_state(cfg, g_params, d_params, g_tx, d_tx)
            step = jax.jit(ts.make_fused_step(
                cfg, g_cfg, d_cfg, g_tx, d_tx, do_g_reg=False,
                do_d_reg=False))
            return step(state, real, None, z, None, key)

        state_off, m_off = run(None)
        state_all, m_all = run(1e9)
        state_none, m_none = run(0.0)

        assert "Loss/ga/replaced" not in m_off
        assert float(m_all["Loss/ga/replaced"]) == 1.0
        assert float(m_none["Loss/ga/replaced"]) == 0.0
        # threshold=0 never replaces: D loss identical to GA off.
        np.testing.assert_array_equal(np.asarray(m_none["Loss/D/loss"]),
                                      np.asarray(m_off["Loss/D/loss"]))
        np.testing.assert_allclose(
            np.asarray(state_none.d_params["b16"]["conv0"]["weight"]),
            np.asarray(state_off.d_params["b16"]["conv0"]["weight"]))
        # threshold=inf replaces all fakes: the D update must differ.
        assert not np.allclose(
            np.asarray(state_all.d_params["b16"]["conv0"]["weight"]),
            np.asarray(state_off.d_params["b16"]["conv0"]["weight"]))
        for v in m_all.values():
            assert np.all(np.isfinite(np.asarray(v)))


def test_calculate_metrics(tiny_gd):
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randint(0, 255, (64, 3, 16, 16), np.uint8))
    gen = jnp.asarray(rng.randint(0, 255, (64, 3, 16, 16), np.uint8))

    w = jnp.asarray(rng.randn(768, 8).astype(np.float32))

    def feat(images):
        x = images.astype(jnp.float32).reshape(images.shape[0], -1) / 255.0
        return x @ w

    fid, kid, lpips = calculate_metrics(real, gen, feat, lpips_fn=feat)
    assert np.isfinite(fid) and fid >= 0
    assert np.isfinite(kid)
    assert np.isfinite(lpips)


def test_wgan_gradient_penalty_matches_torch(tiny_gd):
    """Formula parity with the reference helper
    (DissimilarDomains/training/training_loop.py:394-410) on a shared
    critic, plus the analytic linear-critic case on the real D path."""
    from gagan_tpu.ga import wgan_gradient_penalty

    rng = np.random.RandomState(0)
    real = rng.randn(4, 3, 16, 16).astype(np.float32)
    fake = rng.randn(4, 3, 16, 16).astype(np.float32)
    w = rng.randn(3, 16, 16).astype(np.float32)
    key = jax.random.PRNGKey(7)
    # Shared nonlinear critic: D(x) = sum(w * tanh(x)) per sample.
    gp = wgan_gradient_penalty(
        None, None, jnp.asarray(real), jnp.asarray(fake), key,
        critic_fn=lambda x: jnp.sum(
            jnp.asarray(w)[None] * jnp.tanh(x), axis=(1, 2, 3)))

    # Torch replica of the reference lines, with the SAME alpha draw.
    alpha_np = np.asarray(jax.random.uniform(key, (4, 1, 1, 1)))
    alpha = torch.from_numpy(alpha_np)
    t_real, t_fake = torch.from_numpy(real), torch.from_numpy(fake)
    interpolates = (alpha * t_real + (1 - alpha) * t_fake).requires_grad_(True)
    d_interp = (torch.from_numpy(w)[None] * torch.tanh(interpolates)).sum(
        dim=(1, 2, 3))
    grads = torch.autograd.grad(
        outputs=d_interp, inputs=interpolates,
        grad_outputs=torch.ones_like(d_interp), create_graph=True,
        retain_graph=True, only_inputs=True)[0]
    grads = grads.view(grads.size(0), -1)
    want = ((grads.norm(2, dim=1) - 1) ** 2).mean().item()
    np.testing.assert_allclose(float(gp), want, rtol=1e-5)

    # Real D path: linear critic D(x) = sum(g * x) has constant gradient g,
    # so the penalty is exactly (||g||_2 - 1)^2.
    _, _, d_cfg, d_params = tiny_gd
    gp_d = wgan_gradient_penalty(
        d_cfg, d_params, jnp.asarray(real), jnp.asarray(fake), key,
        critic_fn=lambda x: jnp.sum(jnp.asarray(w)[None] * x, axis=(1, 2, 3)))
    gnorm = float(np.linalg.norm(w.reshape(-1)))
    np.testing.assert_allclose(float(gp_d), (gnorm - 1.0) ** 2, rtol=1e-4)
    # And the default discriminator critic runs and is finite/nonnegative.
    gp_full = wgan_gradient_penalty(
        d_cfg, d_params, jnp.asarray(real), jnp.asarray(fake), key)
    assert np.isfinite(float(gp_full)) and float(gp_full) >= 0.0
