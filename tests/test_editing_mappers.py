"""Tests: StyleSpace modifications, InterFaceGAN, mappers, sparse model,
CLIP evaluation, Inferencer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gagan_tpu.editing import LatentEditor, build_style_modification_hooks
from gagan_tpu.metrics.clip_eval import clip_quality_diversity
from gagan_tpu.models import stylegan2 as sg2
from gagan_tpu.params import mappers as mp
from gagan_tpu.params import sparse as sp


@pytest.fixture(scope="module")
def tiny_g():
    g_cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=32, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=1024, channel_max=64))
    return g_cfg, sg2.init_generator(jax.random.PRNGKey(0), g_cfg)


def test_style_modifications(tiny_g):
    g_cfg, params = tiny_g
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    base = sg2.generator_apply(g_cfg, params, z)
    hooks = build_style_modification_hooks(
        g_cfg.synthesis, [((2, 5), 10.0, 1.0)])
    edited = sg2.generator_apply(g_cfg, params, z, hooks=hooks)
    assert not bool(jnp.allclose(edited, base))
    # Zero-magnitude edit is identity.
    hooks0 = build_style_modification_hooks(
        g_cfg.synthesis, [((2, 5), 0.0, 1.0)])
    same = sg2.generator_apply(g_cfg, params, z, hooks=hooks0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(base), atol=1e-6)


def test_style_modification_offset_factor(tiny_g):
    # offset_factor=0 must cancel a direction's effect on that channel.
    g_cfg, params = tiny_g
    names = g_cfg.synthesis.layer_names()
    dims = g_cfg.synthesis.layer_in_channels()
    direction_hooks = {
        names[2]: {"style": lambda s: s + 100.0}}  # huge direction, layer 2
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 32))
    with_dir = sg2.generator_apply(g_cfg, params, z, hooks=direction_hooks)
    # Cancel the direction on ALL channels of layer 2 via offset_factor=0.
    mods = [((2, c), 0.0, 0.0) for c in range(dims[2])]
    cancel_hooks = build_style_modification_hooks(
        g_cfg.synthesis, mods, base_hooks=direction_hooks)
    cancelled = sg2.generator_apply(g_cfg, params, z, hooks=cancel_hooks)
    base = sg2.generator_apply(g_cfg, params, z)
    assert not bool(jnp.allclose(with_dir, base))
    np.testing.assert_allclose(np.asarray(cancelled), np.asarray(base),
                               rtol=1e-4, atol=1e-5)


def test_interfacegan_editor():
    editor = LatentEditor({"age": np.ones((1, 8), np.float32)})
    w = jnp.zeros((1, 8))
    edited = editor.apply_interfacegan(w, "age", factor=2.0)
    np.testing.assert_allclose(np.asarray(edited), 2.0)
    sweep = editor.apply_interfacegan(w, "age", factor_range=(-2, 2))
    assert sweep.shape == (4, 8)


def test_mapper_shapes_and_hooks(tiny_g):
    g_cfg, params = tiny_g
    mcfg = mp.MapperConfig(width=64, input_dimension=16, backbone_depth=2,
                           head_depth=2)
    mparams = mp.init_mapper(jax.random.PRNGKey(0), mcfg, g_cfg.synthesis)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    out = mp.mapper_apply(mparams, mcfg, g_cfg.synthesis, emb)
    dims = mp.conv_dimensions(g_cfg.synthesis)
    assert len(out) == len(dims)
    for i, (c_in, c_out) in enumerate(dims):
        assert out[f"conv_{i}"]["in"].shape == (2, c_in)
        assert out[f"conv_{i}"]["out"].shape == (2, c_out)

    hooks = mp.mapper_hooks(g_cfg.synthesis, out)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    img = sg2.generator_apply(g_cfg, params, z, hooks=hooks)
    assert bool(jnp.all(jnp.isfinite(img)))
    # Mapper with zeroed outputs is identity.
    zero_out = jax.tree.map(jnp.zeros_like, out)
    hooks0 = mp.mapper_hooks(g_cfg.synthesis, zero_out)
    img0 = sg2.generator_apply(g_cfg, params, z, hooks=hooks0)
    base = sg2.generator_apply(g_cfg, params, z)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(base), atol=1e-5)


def test_mapper_is_trainable(tiny_g):
    g_cfg, params = tiny_g
    mcfg = mp.MapperConfig(width=32, input_dimension=8, backbone_depth=2,
                           head_depth=2, mapper_type="base_channelwise_sep")
    mparams = mp.init_mapper(jax.random.PRNGKey(0), mcfg, g_cfg.synthesis)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    target = sg2.generator_apply(g_cfg, params, z) + 0.1

    def loss(mparams):
        out = mp.mapper_apply(mparams, mcfg, g_cfg.synthesis, emb)
        hooks = mp.mapper_hooks(g_cfg.synthesis, out)
        img = sg2.generator_apply(g_cfg, params, z, hooks=hooks)
        return jnp.mean(jnp.square(img - target))

    g = jax.grad(loss)(mparams)
    assert any(float(jnp.linalg.norm(x)) > 0 for x in jax.tree.leaves(g))


def test_sparse_model_roundtrip(tiny_g):
    g_cfg, params = tiny_g
    dim = sp.flat_dim(g_cfg.synthesis)
    deltas = jax.random.normal(jax.random.PRNGKey(0), (dim,))
    offsets = sp.to_offsets(g_cfg.synthesis, deltas)
    back = sp.from_offsets(g_cfg.synthesis, offsets)
    np.testing.assert_allclose(np.asarray(back), np.asarray(deltas))

    pruned = sp.pruned(deltas, 0.5)
    n_zero = int(jnp.sum(pruned == 0))
    assert n_zero >= dim // 2
    # Surviving entries are the largest-magnitude ones.
    surviving = np.abs(np.asarray(deltas))[np.asarray(pruned) != 0]
    removed = np.abs(np.asarray(deltas))[np.asarray(pruned) == 0]
    assert surviving.min() >= removed.max() - 1e-6


def test_sparse_index_maps_1024():
    # The reference tables (sparse_models.py:52-58, common.py:370-396) are
    # for the 1024 generator; ours must reproduce them.
    syn = sg2.SynthesisConfig(img_resolution=1024)
    conv_map = sp.conv_to_style_layer_index(syn)
    assert conv_map == {0: 0, 1: 2, 2: 3, 3: 5, 4: 6, 5: 8, 6: 9, 7: 11,
                        8: 12, 9: 14, 10: 15, 11: 17, 12: 18, 13: 20,
                        14: 21, 15: 23, 16: 24}
    assert sp.flat_dim(syn) == 6048
    w_map = sp.w_idx_to_style_idx(syn)
    assert w_map[0] == 0 and w_map[1] == 2 and w_map[16] == 24


def test_clip_quality_diversity():
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.randn(8).astype(np.float32))
    # All embeddings == target -> quality 1, diversity 0.
    same = jnp.tile(target[None], (10, 1))
    q, d = clip_quality_diversity(same, target)
    np.testing.assert_allclose(q, 1.0, rtol=1e-5)
    np.testing.assert_allclose(d, 0.0, atol=1e-5)
    rand = jnp.asarray(rng.randn(10, 8).astype(np.float32))
    q2, d2 = clip_quality_diversity(rand, target)
    assert q2 < q and d2 > d


def test_inferencer_roundtrip(tiny_g, tmp_path):
    from gagan_tpu.inference import Inferencer
    from gagan_tpu.params import offsets as offs_lib
    from gagan_tpu.utils import checkpoint as ckpt_lib
    from gagan_tpu.utils.config import to_dict

    g_cfg, params = tiny_g
    gen_path = str(tmp_path / "gen.npz")
    ckpt_lib.save_snapshot(gen_path, g_ema=jax.device_get(params),
                           config={"g_cfg": to_dict(g_cfg)})

    spec = offs_lib.OffsetsSpec.from_string("additive")
    offsets = offs_lib.init_offsets(jax.random.PRNGKey(1), g_cfg.synthesis,
                                    spec)
    offsets = jax.tree.map(
        lambda x: x + 0.3 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        offsets)
    ad_path = str(tmp_path / "adapt.npz")
    ckpt_lib.save_adaptation(ad_path, model_type="parametrization",
                             parametrization="additive",
                             offsets=jax.device_get(offsets),
                             sg2_config=to_dict(g_cfg))

    inf = Inferencer(ad_path, gen_path)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 32))
    src, trg = inf(z, truncation=0.7)
    assert src.shape == trg.shape == (2, 3, 32, 32)
    assert not bool(jnp.allclose(src, trg))

    # MTG mixing path with style latents.
    style_latents = np.asarray(jax.random.normal(
        jax.random.PRNGKey(4), (1, g_cfg.num_ws, 32)))
    inf2 = Inferencer(ad_path, gen_path, style_latents=style_latents)
    src_m, trg_m = inf2(z, mtg_mixing=True)
    assert not bool(jnp.allclose(src_m, src))
