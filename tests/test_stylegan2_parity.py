"""Parity of the unified StyleGAN2 stack against the NVlabs reference (CPU)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.models import stylegan2 as sg2
from gagan_tpu.utils import torch_import

from . import oracle

networks = oracle.ref_networks()


def make_ref_G(res=32, cbase=1024, cmax=64, z=64, c_dim=0):
    torch.manual_seed(0)
    return networks.Generator(
        z_dim=z, c_dim=c_dim, w_dim=z, img_resolution=res, img_channels=3,
        synthesis_kwargs=dict(channel_base=cbase, channel_max=cmax),
        mapping_kwargs=dict(num_layers=2),
    ).eval()


def make_ref_D(res=32, cbase=1024, cmax=64, c_dim=0, **kw):
    torch.manual_seed(1)
    return networks.Discriminator(
        c_dim=c_dim, img_resolution=res, img_channels=3,
        channel_base=cbase, channel_max=cmax, **kw,
    ).eval()


def g_cfg(res=32, cbase=1024, cmax=64, z=64, c_dim=0, num_fp16_res=0,
          conv_clamp=None):
    return sg2.GeneratorConfig(
        z_dim=z, c_dim=c_dim, w_dim=z, img_resolution=res, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(
            channel_base=cbase, channel_max=cmax,
            num_fp16_res=num_fp16_res, conv_clamp=conv_clamp),
    )


def sd_of(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def test_config_num_ws():
    G = make_ref_G()
    cfg = g_cfg()
    assert cfg.num_ws == G.num_ws
    # Layer enumeration must match the reference layer_idx assignment.
    names = cfg.synthesis.layer_names()
    ref_names = []
    import regex
    for mname, module in G.named_modules():
        if regex.match("synthesis.b[0-9]*.conv[0-1]$", mname) or regex.match(
            "synthesis.b[0-9]*.torgb$", mname
        ):
            ref_names.append(mname.replace("synthesis.", ""))
    assert names == ref_names


def test_mapping_parity():
    G = make_ref_G()
    cfg = g_cfg()
    params = torch_import.generator_params_from_nvlabs(sd_of(G))
    z = np.random.RandomState(0).randn(4, 64).astype(np.float32)
    with torch.no_grad():
        want = G.mapping(torch.from_numpy(z), None).numpy()
    got = np.asarray(sg2.mapping_apply(cfg.mapping, params["mapping"],
                                       jnp.asarray(z)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mapping_truncation_parity():
    G = make_ref_G()
    cfg = g_cfg()
    params = torch_import.generator_params_from_nvlabs(sd_of(G))
    # Seed a nonzero w_avg on both sides.
    w_avg = np.random.RandomState(1).randn(64).astype(np.float32)
    G.mapping.w_avg.copy_(torch.from_numpy(w_avg))
    params["mapping"]["w_avg"] = jnp.asarray(w_avg)
    z = np.random.RandomState(2).randn(3, 64).astype(np.float32)
    with torch.no_grad():
        want = G.mapping(torch.from_numpy(z), None, truncation_psi=0.7,
                         truncation_cutoff=4).numpy()
    got = np.asarray(sg2.mapping_apply(
        cfg.mapping, params["mapping"], jnp.asarray(z),
        truncation_psi=0.7, truncation_cutoff=4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("noise_mode", ["const", "none"])
def test_generator_parity(noise_mode):
    G = make_ref_G()
    cfg = g_cfg()
    params = torch_import.generator_params_from_nvlabs(sd_of(G))
    z = np.random.RandomState(3).randn(2, 64).astype(np.float32)
    with torch.no_grad():
        want = G(torch.from_numpy(z), None, noise_mode=noise_mode).numpy()
    got = np.asarray(sg2.generator_apply(cfg, params, jnp.asarray(z),
                                         noise_mode=noise_mode))
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_generator_parity_64_conv_clamp():
    torch.manual_seed(0)
    G = networks.Generator(
        z_dim=32, c_dim=0, w_dim=32, img_resolution=64, img_channels=3,
        synthesis_kwargs=dict(channel_base=2048, channel_max=128, conv_clamp=256),
        mapping_kwargs=dict(num_layers=2),
    ).eval()
    cfg = sg2.GeneratorConfig(
        z_dim=32, c_dim=0, w_dim=32, img_resolution=64, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=2048, channel_max=128,
                                      conv_clamp=256),
    )
    params = torch_import.generator_params_from_nvlabs(sd_of(G))
    z = np.random.RandomState(4).randn(2, 32).astype(np.float32)
    with torch.no_grad():
        want = G(torch.from_numpy(z), None, noise_mode="const").numpy()
    got = np.asarray(sg2.generator_apply(cfg, params, jnp.asarray(z)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_conditional_generator_parity():
    G = make_ref_G(c_dim=5)
    cfg = g_cfg(c_dim=5)
    params = torch_import.generator_params_from_nvlabs(sd_of(G))
    rng = np.random.RandomState(5)
    z = rng.randn(2, 64).astype(np.float32)
    c = np.eye(5, dtype=np.float32)[rng.randint(0, 5, size=2)]
    with torch.no_grad():
        want = G(torch.from_numpy(z), torch.from_numpy(c), noise_mode="const").numpy()
    got = np.asarray(sg2.generator_apply(cfg, params, jnp.asarray(z),
                                         jnp.asarray(c)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_styles_roundtrip():
    # synthesis_from_styles(generator_styles(ws)) == synthesis_apply(ws)
    cfg = g_cfg()
    params = sg2.init_generator(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    ws = sg2.mapping_apply(cfg.mapping, params["mapping"], z)
    direct = sg2.synthesis_apply(cfg.synthesis, params["synthesis"], ws,
                                 noise_mode="const")
    styles = sg2.generator_styles(cfg.synthesis, params["synthesis"], ws)
    assert len(styles) == len(cfg.synthesis.layer_names())
    via_s = sg2.synthesis_from_styles(cfg.synthesis, params["synthesis"], styles,
                                      noise_mode="const")
    np.testing.assert_allclose(np.asarray(via_s), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("c_dim", [0, 5])
def test_discriminator_parity(c_dim):
    D = make_ref_D(c_dim=c_dim)
    cfg = sg2.DiscriminatorConfig(
        c_dim=c_dim, img_resolution=32, img_channels=3,
        channel_base=1024, channel_max=64)
    params = torch_import.discriminator_params_from_nvlabs(sd_of(D))
    rng = np.random.RandomState(6)
    img = rng.randn(4, 3, 32, 32).astype(np.float32)
    c = np.eye(5, dtype=np.float32)[rng.randint(0, 5, 4)] if c_dim else None
    with torch.no_grad():
        want = D(torch.from_numpy(img),
                 torch.from_numpy(c) if c_dim else None).numpy()
    got = np.asarray(sg2.discriminator_apply(
        cfg, params, jnp.asarray(img), jnp.asarray(c) if c_dim else None))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_discriminator_mbstd_groups():
    D = make_ref_D(epilogue_kwargs=dict(mbstd_group_size=2))
    cfg = sg2.DiscriminatorConfig(
        c_dim=0, img_resolution=32, img_channels=3,
        channel_base=1024, channel_max=64, mbstd_group_size=2)
    params = torch_import.discriminator_params_from_nvlabs(sd_of(D))
    img = np.random.RandomState(7).randn(4, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = D(torch.from_numpy(img), None).numpy()
    got = np.asarray(sg2.discriminator_apply(cfg, params, jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_bf16_path_runs():
    cfg = g_cfg(num_fp16_res=2, conv_clamp=256)
    params = sg2.init_generator(jax.random.PRNGKey(0), cfg)
    img = sg2.generator_apply(cfg, params,
                              jax.random.normal(jax.random.PRNGKey(1), (2, 64)))
    assert img.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(img)))


def test_packed_last_block_parity():
    # The space-to-depth tail fast path must be numerically identical to the
    # plain path (ops/packed.py builders are exact reformulations).
    import dataclasses

    # res 32 / cbase 1024 keeps the shipping 32-channel packed boundary
    # (b1024 at cbase 32768) at a fraction of the res-64 compile+compute.
    cfg = g_cfg(res=32, cbase=1024, cmax=128)
    params = sg2.init_generator(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    base = sg2.generator_apply(cfg, params, z, noise_mode="const")
    cfg_p = dataclasses.replace(cfg, synthesis=dataclasses.replace(
        cfg.synthesis, packed_last_block=True))
    packed = sg2.generator_apply(cfg_p, params, z, noise_mode="const")
    np.testing.assert_allclose(np.asarray(packed), np.asarray(base),
                               rtol=1e-4, atol=1e-5)
    # Gradients flow through the packed path (kernel builders are
    # differentiable index maps).
    def loss(p):
        return jnp.mean(jnp.square(sg2.generator_apply(cfg_p, p, z)))

    g = jax.grad(loss)(params)
    w_grad = g["synthesis"][f"b{cfg.img_resolution}"]["conv0"]["weight"]
    assert float(jnp.linalg.norm(w_grad)) > 0


@pytest.mark.slow
def test_packed_unfused_torgb_parity():
    # The non-default packed-1x1 + unpack boundary form
    # (packed_fused_torgb=False) must also match the plain path.
    import dataclasses

    cfg = g_cfg(res=32, cbase=1024, cmax=128)
    params = sg2.init_generator(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    base = sg2.generator_apply(cfg, params, z, noise_mode="const")
    cfg_u = dataclasses.replace(cfg, synthesis=dataclasses.replace(
        cfg.synthesis, packed_last_block=True, packed_fused_torgb=False))
    packed_u = sg2.generator_apply(cfg_u, params, z, noise_mode="const")
    np.testing.assert_allclose(np.asarray(packed_u), np.asarray(base),
                               rtol=1e-4, atol=1e-5)


def test_packed_first_block_discriminator_parity():
    import dataclasses

    cfg = sg2.DiscriminatorConfig(
        img_resolution=32, img_channels=3, channel_base=1024,
        channel_max=128, mbstd_group_size=2)
    params = sg2.init_discriminator(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    base = sg2.discriminator_apply(cfg, params, img)
    packed = sg2.discriminator_apply(
        dataclasses.replace(cfg, packed_first_block=True), params, img)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(base),
                               rtol=1e-4, atol=1e-5)


def test_packed_head_blocks_discriminator_parity():
    """packed_head_blocks > 1: later head blocks pack their input with a
    transpose and reuse the composed packed kernels (same math)."""
    import dataclasses

    cfg = sg2.DiscriminatorConfig(
        img_resolution=32, img_channels=3, channel_base=1024,
        channel_max=128, mbstd_group_size=2)
    params = sg2.init_discriminator(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    base = sg2.discriminator_apply(cfg, params, img)
    for n in (2, 3):
        packed = sg2.discriminator_apply(
            dataclasses.replace(cfg, packed_first_block=True,
                                packed_head_blocks=n), params, img)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(base),
                                   rtol=1e-4, atol=1e-5, err_msg=f"n={n}")

    # Gradients flow through the packed head path.
    cfg_p = dataclasses.replace(cfg, packed_first_block=True,
                                packed_head_blocks=2)

    def loss(p):
        return jnp.mean(jnp.square(sg2.discriminator_apply(cfg_p, p, img)))

    g = jax.grad(loss)(params)
    w_grad = g["b32"]["conv0"]["weight"]
    assert float(jnp.linalg.norm(w_grad)) > 0


def test_remat_matches_plain():
    import dataclasses

    # res 16 exercises the same block-level jax.checkpoint wrapping at a
    # fraction of the compile.
    cfg = g_cfg(res=16)
    params = sg2.init_generator(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    base = sg2.generator_apply(cfg, params, z)
    cfg_r = dataclasses.replace(cfg, synthesis=dataclasses.replace(
        cfg.synthesis, remat=True))
    rem = sg2.generator_apply(cfg_r, params, z)
    np.testing.assert_allclose(np.asarray(rem), np.asarray(base),
                               rtol=1e-5, atol=1e-6)

    def loss(p, c):
        return jnp.mean(jnp.square(sg2.generator_apply(c, p, z)))

    g1 = jax.grad(lambda p: loss(p, cfg))(params)
    g2 = jax.grad(lambda p: loss(p, cfg_r))(params)
    a = g1["synthesis"]["b8"]["conv0"]["weight"]
    b = g2["synthesis"]["b8"]["conv0"]["weight"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.slow
def test_packed_two_block_tail_parity():
    # packed_tail_blocks=2: the feature map crosses the block boundary still
    # packed (ops/packed.py build_packed_upconv_packed); must be numerically
    # identical to the plain path, with gradients flowing.
    import dataclasses

    cfg = g_cfg(res=32, cbase=1024, cmax=128)
    params = sg2.init_generator(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    base = sg2.generator_apply(cfg, params, z, noise_mode="const")
    cfg_p = dataclasses.replace(cfg, synthesis=dataclasses.replace(
        cfg.synthesis, packed_last_block=True, packed_tail_blocks=2))
    packed = sg2.generator_apply(cfg_p, params, z, noise_mode="const")
    np.testing.assert_allclose(np.asarray(packed), np.asarray(base),
                               rtol=1e-4, atol=1e-5)

    # random-noise path parity (noise is drawn identically per layer name)
    rng = jax.random.PRNGKey(7)
    base_n = sg2.generator_apply(cfg, params, z, noise_mode="random", rng=rng)
    packed_n = sg2.generator_apply(cfg_p, params, z, noise_mode="random",
                                   rng=rng)
    np.testing.assert_allclose(np.asarray(packed_n), np.asarray(base_n),
                               rtol=1e-4, atol=1e-5)

    def loss(p):
        return jnp.mean(jnp.square(sg2.generator_apply(cfg_p, p, z)))

    g = jax.grad(loss)(params)
    for layer in ("b16.conv0", "b32.conv0"):
        res, name = layer.split(".")
        w_grad = g["synthesis"][res][name]["weight"]
        assert float(jnp.linalg.norm(w_grad)) > 0

    # remat variant compiles and matches.
    cfg_r = dataclasses.replace(cfg_p, synthesis=dataclasses.replace(
        cfg_p.synthesis, remat=True))
    rem = sg2.generator_apply(cfg_r, params, z, noise_mode="const")
    np.testing.assert_allclose(np.asarray(rem), np.asarray(base),
                               rtol=1e-4, atol=1e-5)
