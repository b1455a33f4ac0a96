"""Training-step tests: loss parity vs reference StyleGAN2Loss, phase steps,
EMA, masks, and the 8-device data-parallel mesh."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.models import stylegan2 as sg2
from gagan_tpu.parallel import create_mesh, place_state, shard_batch, shard_train_step
from gagan_tpu.train import gan_loss, masks as masks_lib, train_step as ts
from gagan_tpu.utils import torch_import

from . import oracle

networks = oracle.ref_networks()


def tiny_configs(res=16):
    g_cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=res, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=512, channel_max=32))
    d_cfg = sg2.DiscriminatorConfig(
        img_resolution=res, img_channels=3, channel_base=512, channel_max=32,
        mbstd_group_size=2)
    return g_cfg, d_cfg


def ref_modules(res=16):
    torch.manual_seed(0)
    G = networks.Generator(
        z_dim=32, c_dim=0, w_dim=32, img_resolution=res, img_channels=3,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=512, channel_max=32))
    D = networks.Discriminator(
        c_dim=0, img_resolution=res, img_channels=3, channel_base=512,
        channel_max=32, epilogue_kwargs=dict(mbstd_group_size=2))
    return G, D


def import_params(G, D):
    sd = lambda m: {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}
    return (torch_import.generator_params_from_nvlabs(sd(G)),
            torch_import.discriminator_params_from_nvlabs(sd(D)))


def test_g_main_loss_parity():
    # With style mixing off and fixed fake images, G loss = softplus(-D(G(z)));
    # compare against the reference loss on identical weights/latents.
    G, D = ref_modules()
    g_cfg, d_cfg = tiny_configs()
    g_params, d_params = import_params(G, D)
    lcfg = gan_loss.GANLossConfig(style_mixing_prob=0.0)
    z = np.random.RandomState(0).randn(4, 32).astype(np.float32)

    # Reference: run_G with noise_mode default 'random' — compare via 'const'
    # by monkeypatching; easier is to run both paths without noise.
    with torch.no_grad():
        ws = G.mapping(torch.from_numpy(z), None)
        img = G.synthesis(ws, noise_mode="none")
        logits = D(img, None)
        want = torch.nn.functional.softplus(-logits).mean().item()

    ws_j = sg2.mapping_apply(g_cfg.mapping, g_params["mapping"], jnp.asarray(z))
    img_j = sg2.synthesis_apply(g_cfg.synthesis, g_params["synthesis"], ws_j,
                                noise_mode="none")
    logits_j = sg2.discriminator_apply(d_cfg, d_params, img_j)
    got = float(jnp.mean(gan_loss.softplus(-logits_j)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_r1_penalty_parity():
    # R1 penalty = |d D(x) / dx|^2 summed per-sample; oracle via torch autograd.
    G, D = ref_modules()
    g_cfg, d_cfg = tiny_configs()
    _, d_params = import_params(G, D)
    img = np.random.RandomState(1).randn(4, 3, 16, 16).astype(np.float32)

    x = torch.from_numpy(img).requires_grad_(True)
    logits = D(x, None)
    (r1_grads,) = torch.autograd.grad(outputs=[logits.sum()], inputs=[x])
    want = r1_grads.square().sum([1, 2, 3]).mean().item() * (10.0 / 2)

    lcfg = gan_loss.GANLossConfig()
    loss, metrics = gan_loss.d_r1_loss(
        lcfg, d_cfg, d_params, jnp.asarray(img), None, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss), want, rtol=1e-3, atol=1e-4)


def test_style_mixing_shapes_and_prob():
    g_cfg, _ = tiny_configs()
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    ws_nomix = gan_loss.run_mapping_with_mixing(
        g_cfg, g_params, z, None, jax.random.PRNGKey(2), 0.0)
    # prob=1 -> some suffix must differ from the unmixed ws
    ws_mix = gan_loss.run_mapping_with_mixing(
        g_cfg, g_params, z, None, jax.random.PRNGKey(2), 1.0)
    assert ws_mix.shape == (2, g_cfg.num_ws, 32)
    assert not bool(jnp.allclose(ws_mix, ws_nomix))
    # prefix up to cutoff must match
    assert bool(jnp.allclose(ws_mix[:, 0], ws_nomix[:, 0]))


@pytest.fixture(scope="module")
def fused_env():
    """One compiled single-device fused step (the 'both' reg variant is the
    heaviest compile in this module, ~40 s on 1 CPU core) shared by the
    improve-state check and the data-parallel comparison."""
    g_cfg, d_cfg = tiny_configs()
    cfg = ts.TrainConfig(batch_size=8, ema_kimg=0.01,
                         loss=gan_loss.GANLossConfig(pl_batch_shrink=2))
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(1), d_cfg)
    g_tx, d_tx, _, _ = ts.build_optimizers(cfg, g_params, d_params)
    state = ts.init_train_state(cfg, g_params, d_params, g_tx, d_tx)
    step_fn = ts.make_fused_step(cfg, g_cfg, d_cfg, g_tx, d_tx)

    real = jax.random.normal(jax.random.PRNGKey(2), (8, 3, 16, 16))
    z = jax.random.normal(jax.random.PRNGKey(3), (8, 32))
    key = jax.random.PRNGKey(4)
    state2, metrics = jax.jit(step_fn)(state, real, None, z, None, key)
    return dict(g_cfg=g_cfg, d_cfg=d_cfg, cfg=cfg, step_fn=step_fn,
                state=state, state2=state2, metrics=metrics,
                real=real, z=z, key=key)


def test_fused_step_runs_and_improves_state(fused_env):
    state, state2, metrics = (fused_env["state"], fused_env["state2"],
                              fused_env["metrics"])
    assert int(state2.cur_nimg) == 8
    for k in ("Loss/G/loss", "Loss/D/loss", "Loss/r1_penalty", "Loss/pl_penalty",
              "Loss/signs/real"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    # Params actually moved.
    delta = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state.g_params, state2.g_params)
    assert max(jax.tree.leaves(delta)) > 0
    # Buffers did not get optimizer updates (w_avg moves only via its EMA rule).
    nc0 = state.g_params["synthesis"]["b4"]["conv1"]["noise_const"]
    nc1 = state2.g_params["synthesis"]["b4"]["conv1"]["noise_const"]
    assert bool(jnp.array_equal(nc0, nc1))
    # EMA tracked but distinct from live params after a step.
    assert float(jnp.mean(jnp.abs(
        state2.g_ema["synthesis"]["b4"]["conv1"]["weight"] -
        state2.g_params["synthesis"]["b4"]["conv1"]["weight"]))) > 0


def test_offsets_only_training_masks():
    # synt_offset-style selective training: only offset leaves are trainable.
    g_cfg, _ = tiny_configs()
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    mask = masks_lib.generator_mask(g_params, ("mapping", "synt_affine"))
    assert mask["mapping"]["fc0"]["weight"] is True
    assert mask["mapping"]["w_avg"] is False          # buffer
    assert mask["synthesis"]["b4"]["conv1"]["affine"]["weight"] is True
    assert mask["synthesis"]["b4"]["conv1"]["weight"] is False
    assert mask["synthesis"]["b4"]["const"] is False

    mask_res = masks_lib.generator_mask(g_params, ("synt_conv.b8",))
    assert mask_res["synthesis"]["b8"]["conv0"]["weight"] is True
    assert mask_res["synthesis"]["b16"]["conv0"]["weight"] is False


def test_freeze_d_layers():
    _, d_cfg = tiny_configs()
    d_params = sg2.init_discriminator(jax.random.PRNGKey(0), d_cfg)
    mask = masks_lib.discriminator_mask(d_params, ("all",), freeze_layers=2)
    # b16: fromrgb (0), conv0 (1) frozen; conv1 (2), skip (3) trainable.
    assert mask["b16"]["fromrgb"]["weight"] is False
    assert mask["b16"]["conv0"]["weight"] is False
    assert mask["b16"]["conv1"]["weight"] is True
    assert mask["b4"]["conv"]["weight"] is True


def test_data_parallel_step_matches_single_device(fused_env):
    # The same fused step, jitted over an 8-device mesh with the batch
    # sharded, must produce the same state as single-device execution
    # (the single-device side comes precomputed from the shared fixture).
    step_fn, state = fused_env["step_fn"], fused_env["state"]
    real, z, key = fused_env["real"], fused_env["z"], fused_env["key"]
    ref_state, ref_metrics = fused_env["state2"], fused_env["metrics"]

    assert len(jax.devices()) >= 8, "test requires the 8-device CPU mesh"
    mesh = create_mesh(8)
    assert mesh.devices.size == 8
    dp_step = shard_train_step(step_fn, mesh, donate_state=False)
    state_dp = place_state(mesh, state)
    real_dp, z_dp = shard_batch(mesh, (real, z))
    got_state, got_metrics = dp_step(state_dp, real_dp, None, z_dp, None, key)

    np.testing.assert_allclose(
        float(got_metrics["Loss/D/loss"]), float(ref_metrics["Loss/D/loss"]),
        rtol=1e-4, atol=1e-5)
    a = np.asarray(ref_state.g_params["synthesis"]["b4"]["conv1"]["weight"])
    b = np.asarray(got_state.g_params["synthesis"]["b4"]["conv1"]["weight"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_spatial_sharded_full_train_step():
    """ONE image spans 8 devices through the FULL fused train step
    (VERDICT r2 #7): spatial hooks merged into the step via extra_hooks,
    numerics == unsharded, halo-exchange collectives present in the HLO."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gagan_tpu.parallel import mesh as mesh_lib
    from gagan_tpu.parallel import spatial

    g_cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=32, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=1024, channel_max=64))
    d_cfg = sg2.DiscriminatorConfig(
        img_resolution=32, img_channels=3, channel_base=1024, channel_max=64,
        mbstd_group_size=1)
    cfg = ts.TrainConfig(batch_size=1, simultaneous_main=True)
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(1), d_cfg)
    g_tx, d_tx, _, _ = ts.build_optimizers(cfg, g_params, d_params)
    state = ts.init_train_state(cfg, g_params, d_params, g_tx, d_tx)

    real = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 32, 32))
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 32))
    key = jax.random.PRNGKey(4)

    ref_step = ts.make_fused_step(cfg, g_cfg, d_cfg, g_tx, d_tx)
    ref_state, ref_metrics = jax.jit(ref_step)(state, real, None, z, None,
                                               key)

    mesh = mesh_lib.create_mesh(8)
    hooks = spatial.spatial_sharding_hooks(g_cfg.synthesis, mesh, min_res=8)
    assert hooks, "no layers sharded"
    # min_rows floor: levels below 2 rows/device are NOT constrained (XLA
    # SPMD miscompiles stride-2 convs at 1-row shards; d_spatial_constraint
    # docstring).
    assert "b8.conv1" not in hooks and "b16.conv1" in hooks
    sp_step = jax.jit(ts.make_fused_step(
        cfg, g_cfg, d_cfg, g_tx, d_tx, extra_hooks=hooks,
        d_constraint=spatial.d_spatial_constraint(mesh)))
    state_sp = mesh_lib.place_state(mesh, state)
    real_sp = jax.device_put(real,
                             NamedSharding(mesh, P(None, None, "data", None)))
    z_sp = jax.device_put(z, mesh_lib.replicated(mesh))
    got_state, got_metrics = sp_step(state_sp, real_sp, None, z_sp, None, key)

    for k in ("Loss/G/loss", "Loss/D/loss", "Loss/r1_penalty"):
        np.testing.assert_allclose(float(got_metrics[k]),
                                   float(ref_metrics[k]),
                                   rtol=1e-4, atol=1e-5)
    a = np.asarray(ref_state.g_params["synthesis"]["b32"]["conv1"]["weight"])
    b = np.asarray(got_state.g_params["synthesis"]["b32"]["conv1"]["weight"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    hlo = sp_step.lower(state_sp, real_sp, None, z_sp, None,
                        key).compile().as_text()
    assert ("collective-permute" in hlo or "all-gather" in hlo
            or "all-to-all" in hlo), "no spatial collectives in HLO"


def test_ada_update_direction():
    cfg = ts.TrainConfig(batch_size=8, ada_target=0.6, ada_interval=4,
                         ada_kimg=500)
    p = ts.ada_update(cfg, 0.5, real_signs_mean=0.9)   # overfit -> p up
    assert p > 0.5
    p = ts.ada_update(cfg, 0.5, real_signs_mean=0.1)   # underfit -> p down
    assert p < 0.5
    assert ts.ada_update(cfg, 0.0, real_signs_mean=0.0) == 0.0  # clipped


def test_check_replica_consistency():
    import numpy as np

    from gagan_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.create_mesh(8)
    tree = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.zeros((4,))}
    placed = mesh_lib.place_state(mesh, tree)
    mesh_lib.check_replica_consistency(placed)  # replicated: passes

    # Simulate divergence: same replicated sharding, one device differs.
    devs = mesh.devices.reshape(-1)
    arrs = [jax.device_put(np.full((4,), float(i == 3)), d)
            for i, d in enumerate(devs)]
    bad = jax.make_array_from_single_device_arrays(
        (4,), mesh_lib.replicated(mesh), arrs)
    with pytest.raises(AssertionError, match="replica mismatch"):
        mesh_lib.check_replica_consistency({"b": bad})

    # Sharded leaves are skipped (legitimately different per device).
    batch = mesh_lib.shard_batch(mesh, jnp.arange(16.0).reshape(8, 2))
    mesh_lib.check_replica_consistency({"x": batch})


def test_spatial_sharding_synthesis():
    # H-sharded high-res synthesis (parallel/spatial.py): numerically
    # identical to the unsharded forward, and the compiled program keeps
    # the activations distributed (halo-exchange collectives present).
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.parallel import mesh as mesh_lib
    from gagan_tpu.parallel import spatial

    g_cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=64, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=1024, channel_max=64))
    params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    ws = sg2.mapping_apply(g_cfg.mapping, params["mapping"], z)
    want = sg2.synthesis_apply(g_cfg.synthesis, params["synthesis"], ws)

    mesh = mesh_lib.create_mesh(8)
    fn = spatial.spatial_synthesis_fn(g_cfg, mesh, min_res=16)
    placed = mesh_lib.place_state(mesh, params)
    got = fn(placed, jax.device_put(ws, mesh_lib.replicated(mesh)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    compiled = fn.lower(placed, ws).compile()
    hlo = compiled.as_text()
    assert ("collective-permute" in hlo or "all-gather" in hlo
            or "all-to-all" in hlo), "no spatial collectives in HLO"


def test_spatial_hooks_compose_with_offsets():
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.parallel import mesh as mesh_lib
    from gagan_tpu.parallel import spatial
    from gagan_tpu.params import offsets as offs

    g_cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=32, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=1024, channel_max=64))
    params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    spec = offs.OffsetsSpec.from_string("additive")
    o = jax.tree.map(lambda x: x + 0.05,
                     offs.init_offsets(jax.random.PRNGKey(1),
                                       g_cfg.synthesis, spec))
    base_hooks = offs.make_hooks(spec, o)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    ws = sg2.mapping_apply(g_cfg.mapping, params["mapping"], z)
    want = sg2.synthesis_apply(g_cfg.synthesis, params["synthesis"], ws,
                               hooks=base_hooks)
    mesh = mesh_lib.create_mesh(8)
    fn = spatial.spatial_synthesis_fn(g_cfg, mesh, min_res=16,
                                      base_hooks=base_hooks)
    got = fn(mesh_lib.place_state(mesh, params), ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_accum_rounds_match_full_batch():
    # Gradient accumulation (TrainConfig.accum_rounds; reference rounds loop
    # training_loop.py:496-516) is exact for the noise-free phases: with
    # style mixing off, no noise, no augmentation, and no minibatch-std
    # (mbstd couples samples within a round, so chunked grouping differs by
    # design — in the reference too, where mbstd runs per batch_gpu round),
    # d_main grads over 2 rounds of 2 equal the full-batch-of-4 grads; the
    # reg phases run and stay finite (per-round RNG differs by construction).
    g_cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=16, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=512, channel_max=32,
                                      use_noise=False))
    d_cfg = sg2.DiscriminatorConfig(
        img_resolution=16, img_channels=3, channel_base=512, channel_max=32,
        mbstd_group_size=None, mbstd_num_channels=0)
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(1), d_cfg)

    lcfg = gan_loss.GANLossConfig(style_mixing_prob=0.0)
    key = jax.random.PRNGKey(2)
    real = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 16, 16))
    z = jax.random.normal(jax.random.PRNGKey(4), (4, 32))

    states, grads = [], []
    # The unrolled accumulation path (accum_scan=False) is covered by the
    # slow-tier test_accum_unrolled_matches_scan; core compiles 2 variants.
    for accum, scan in ((1, True), (2, True)):
        cfg = ts.TrainConfig(batch_size=4, accum_rounds=accum,
                             accum_scan=scan, loss=lcfg)
        g_tx, d_tx, _, _ = ts.build_optimizers(cfg, g_params, d_params)
        state = ts.init_train_state(cfg, g_params, d_params, g_tx, d_tx)
        _, _, d_main, _, _ = ts.make_phase_steps(cfg, g_cfg, d_cfg, g_tx, d_tx)
        new_state, metrics = jax.jit(d_main)(state, real, None, z, None, key)
        states.append(new_state)
        assert np.isfinite(float(metrics["Loss/D/loss"]))

    # With use_noise off and mixing off, run_G is key-independent, so the
    # chunked d_params update must match the full-batch one exactly-ish
    # (fp reassociation of the chunk mean only).
    flat1 = jax.tree_util.tree_leaves(states[0].d_params)
    for other in states[1:]:
        for a, b in zip(flat1, jax.tree_util.tree_leaves(other.d_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    # Reg phases run under accumulation (finiteness smoke).
    cfg = ts.TrainConfig(batch_size=4, accum_rounds=1, reg_accum_rounds=2,
                         loss=lcfg)
    g_tx, d_tx, _, _ = ts.build_optimizers(cfg, g_params, d_params)
    state = ts.init_train_state(cfg, g_params, d_params, g_tx, d_tx)
    _, g_reg, _, d_reg, _ = ts.make_phase_steps(cfg, g_cfg, d_cfg, g_tx, d_tx)
    state, m1 = jax.jit(g_reg)(state, z, None, key)
    state, m2 = jax.jit(d_reg)(state, real, None, key)
    assert np.isfinite(float(m1["Loss/G/reg"]))
    assert np.isfinite(float(m2["Loss/D/reg"]))


@pytest.mark.slow
def test_accum_unrolled_matches_scan():
    # The unrolled accumulation path (accum_scan=False) must match the
    # lax.scan path bit-for-bit-ish (chunk-mean reassociation only).
    g_cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=16, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=512, channel_max=32,
                                      use_noise=False))
    d_cfg = sg2.DiscriminatorConfig(
        img_resolution=16, img_channels=3, channel_base=512, channel_max=32,
        mbstd_group_size=None, mbstd_num_channels=0)
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(1), d_cfg)
    lcfg = gan_loss.GANLossConfig(style_mixing_prob=0.0)
    key = jax.random.PRNGKey(2)
    real = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 16, 16))
    z = jax.random.normal(jax.random.PRNGKey(4), (4, 32))

    states = []
    for scan in (True, False):
        cfg = ts.TrainConfig(batch_size=4, accum_rounds=2,
                             accum_scan=scan, loss=lcfg)
        g_tx, d_tx, _, _ = ts.build_optimizers(cfg, g_params, d_params)
        state = ts.init_train_state(cfg, g_params, d_params, g_tx, d_tx)
        _, _, d_main, _, _ = ts.make_phase_steps(cfg, g_cfg, d_cfg,
                                                 g_tx, d_tx)
        new_state, _ = jax.jit(d_main)(state, real, None, z, None, key)
        states.append(new_state)
    for a, b in zip(jax.tree_util.tree_leaves(states[0].d_params),
                    jax.tree_util.tree_leaves(states[1].d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_gd_main_loss_gradient_routing():
    # The simultaneous Gmain+Dmain scalar (gan_loss.gd_main_loss) must
    # yield exactly the per-phase gradients: d/d(g) sees only loss_g
    # (through frozen D), d/d(d) sees only loss_d (on detached fakes).
    g_cfg, d_cfg = tiny_configs()
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(1), d_cfg)
    lcfg = gan_loss.GANLossConfig(style_mixing_prob=0.9)
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    real = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 16, 16))
    key = jax.random.PRNGKey(4)

    (_, metrics), (gg, _, gd) = jax.value_and_grad(
        lambda gp, off, dp: gan_loss.gd_main_loss(
            lcfg, g_cfg, d_cfg, gp, dp, real, None, z, None, key),
        argnums=(0, 1, 2), has_aux=True)(g_params, None, d_params)

    # Reconstruct the two phase losses from the same key split / shared
    # fakes (mirrors gd_main_loss's internal structure).
    k_g, _k_aug = jax.random.split(key)

    def loss_g_fn(gp):
        img, _ = gan_loss.run_G(g_cfg, gp, z, None, k_g, 0.9)
        return jnp.mean(gan_loss.softplus(
            -sg2.discriminator_apply(d_cfg, d_params, img, None)))

    def loss_d_fn(dp):
        img, _ = gan_loss.run_G(g_cfg, g_params, z, None, k_g, 0.9)
        img = jax.lax.stop_gradient(img)
        return (jnp.mean(gan_loss.softplus(
                    sg2.discriminator_apply(d_cfg, dp, img, None)))
                + jnp.mean(gan_loss.softplus(
                    -sg2.discriminator_apply(d_cfg, dp, real, None))))

    want_gg = jax.grad(loss_g_fn)(g_params)
    want_gd = jax.grad(loss_d_fn)(d_params)
    for got, want in ((gg, want_gg), (gd, want_gd)):
        for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_leaves_with_path(got),
                jax.tree_util.tree_leaves_with_path(want)):
            assert p1 == p2
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=str(p1))
    assert "Loss/G/loss" in metrics and "Loss/D/loss" in metrics


def test_gd_main_loss_augment_routing():
    # With an augment pipe active, gradients must still route exactly as in
    # the separated phases with the same transform applied.  A deterministic
    # "augment" isolates routing from RNG-draw layout.
    g_cfg, d_cfg = tiny_configs()
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(1), d_cfg)
    lcfg = gan_loss.GANLossConfig(style_mixing_prob=0.9)
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    real = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 16, 16))
    key = jax.random.PRNGKey(4)

    def det_aug(img, p, k):
        return jnp.tanh(img) * 1.5     # nonlinear: exercises the aug VJP

    (_, _), (gg, _, gd) = jax.value_and_grad(
        lambda gp, off, dp: gan_loss.gd_main_loss(
            lcfg, g_cfg, d_cfg, gp, dp, real, None, z, None, key,
            augment_fn=det_aug, ada_p=jnp.float32(0.5)),
        argnums=(0, 1, 2), has_aux=True)(g_params, None, d_params)

    k_g, _k_aug = jax.random.split(key)

    def loss_g_fn(gp):
        img, _ = gan_loss.run_G(g_cfg, gp, z, None, k_g, 0.9)
        img = det_aug(img, None, None)
        return jnp.mean(gan_loss.softplus(
            -sg2.discriminator_apply(d_cfg, d_params, img, None)))

    def loss_d_fn(dp):
        img, _ = gan_loss.run_G(g_cfg, g_params, z, None, k_g, 0.9)
        img = jax.lax.stop_gradient(det_aug(img, None, None))
        return (jnp.mean(gan_loss.softplus(
                    sg2.discriminator_apply(d_cfg, dp, img, None)))
                + jnp.mean(gan_loss.softplus(-sg2.discriminator_apply(
                    d_cfg, dp, det_aug(real, None, None), None))))

    want_gg = jax.grad(loss_g_fn)(g_params)
    want_gd = jax.grad(loss_d_fn)(d_params)
    for got, want in ((gg, want_gg), (gd, want_gd)):
        for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_leaves_with_path(got),
                jax.tree_util.tree_leaves_with_path(want)):
            assert p1 == p2
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=str(p1))


@pytest.mark.slow
def test_simultaneous_fused_step_runs():
    g_cfg, d_cfg = tiny_configs()
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(1), d_cfg)
    cfg = ts.TrainConfig(batch_size=4, accum_rounds=2, ada_target=0.6,
                         simultaneous_main=True)
    g_tx, d_tx, _, _ = ts.build_optimizers(cfg, g_params, d_params)
    state = ts.init_train_state(cfg, g_params, d_params, g_tx, d_tx)
    from gagan_tpu.train import augment as aug_lib
    augment_fn = aug_lib.make_augment_fn(aug_lib.make_config("bgc"))
    step = jax.jit(ts.make_fused_step(cfg, g_cfg, d_cfg, g_tx, d_tx,
                                      augment_fn=augment_fn))
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    real = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 16, 16))
    state2, metrics = step(state, real, None, z, None, jax.random.PRNGKey(4))
    assert int(state2.cur_nimg) == 4
    for name in ("Loss/G/loss", "Loss/D/loss", "Loss/signs/real",
                 "Loss/pl_penalty", "Loss/r1_penalty"):
        assert name in metrics, name
    # Both nets actually moved.
    g0 = jax.tree.leaves(state.g_params)[0]
    g1 = jax.tree.leaves(state2.g_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    d0 = jax.tree.leaves(state.d_params)[0]
    d1 = jax.tree.leaves(state2.d_params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_data_parallel_hlo_collectives_are_grad_allreduce_only():
    """Compile the 8-way data-parallel fused step and audit its collectives:
    gradient/metric all-reduces must be present, and nothing may all-gather
    or all-to-all activations or parameters — the silent multi-chip perf
    killer this guards against (params are replicated, batch stays sharded,
    so XLA's only legitimate cross-device traffic is psum)."""
    import re

    g_cfg, d_cfg = tiny_configs()
    cfg = ts.TrainConfig(batch_size=8)
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(1), d_cfg)
    g_tx, d_tx, _, _ = ts.build_optimizers(cfg, g_params, d_params)
    state = ts.init_train_state(cfg, g_params, d_params, g_tx, d_tx)
    step_fn = ts.make_fused_step(cfg, g_cfg, d_cfg, g_tx, d_tx)

    real = jax.random.normal(jax.random.PRNGKey(2), (8, 3, 16, 16))
    z = jax.random.normal(jax.random.PRNGKey(3), (8, 32))

    mesh = create_mesh(8)
    dp_step = shard_train_step(step_fn, mesh, donate_state=False)
    state_dp = place_state(mesh, state)
    real_dp, z_dp = shard_batch(mesh, (real, z))
    hlo = dp_step.lower(state_dp, real_dp, None, z_dp, None,
                        jax.random.PRNGKey(4)).compile().as_text()

    assert "all-reduce" in hlo, "no gradient all-reduce in the DP step HLO"
    for op in ("all-gather", "all-to-all", "collective-permute"):
        found = re.findall(rf"^\s*\S+ = \S+ {op}\(", hlo, flags=re.M)
        assert not found, f"unexpected {op} in DP HLO: {found[:3]}"
