"""Parity of the offsets/parameterization system against the reference
register_* + w_to_s/weight_to_weight paths (networks.py:140-579)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.models import stylegan2 as sg2
from gagan_tpu.params import offsets as offs
from gagan_tpu.utils import torch_import

from . import oracle

networks = oracle.ref_networks()


def build_pair(parametrization, parts=("all",), res=32):
    """Reference G with offsets registered + our (cfg, params, offsets, hooks)."""
    torch.manual_seed(0)
    G = networks.Generator(
        z_dim=64, c_dim=0, w_dim=64, img_resolution=res, img_channels=3,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(
            channel_base=1024, channel_max=64,
            use_domain_modulation=True,
            domain_modulation_parametrization=parametrization,
            generator_requires_grad_parts=tuple(parts)),
    ).eval()
    # Give every offset parameter a nonzero random value so the test is
    # sensitive to application semantics, not just shapes.
    rng = np.random.RandomState(42)
    with torch.no_grad():
        for name, p in G.named_parameters():
            if "offset" in name:
                p.copy_(torch.from_numpy(
                    rng.randn(*p.shape).astype(np.float32) * 0.1))

    cfg = sg2.GeneratorConfig(
        z_dim=64, c_dim=0, w_dim=64, img_resolution=res, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=1024, channel_max=64))
    sd = {k: v.detach().cpu().numpy() for k, v in G.state_dict().items()}
    params = torch_import.generator_params_from_nvlabs(sd)
    offsets = torch_import.split_offsets(params)
    spec = offs.OffsetsSpec.from_string(parametrization, weight_parts=tuple(parts))
    hooks = offs.make_hooks(spec, offsets)
    return G, cfg, params, offsets, spec, hooks


PARAMETRIZATIONS = [
    "additive",                      # StyleSpace offsets (S space)
    "multiplicative",
    "additive_w_space",
    "multiplicative_w_space",
    "out_in_additive",               # Affine+
    "out_in",
    "in",
    "out_spatial_additive",
    "out_in_5_additive",
    "out_in_5_2_additive",
    "out_in_5_2_train_in_additive",
    "out_in_5_2_train_out_additive",
    "out_in_5_dual_additive",
    "affine_out_in_5_2_additive",    # AffineLight+
    "affine_out_in_5_1",
    "additive,out_in_additive,affine_out_in_5_1_additive",  # combined
]


@pytest.mark.parametrize("parametrization", PARAMETRIZATIONS)
def test_offsets_forward_parity(parametrization):
    G, cfg, params, offsets, spec, hooks = build_pair(parametrization)
    z = np.random.RandomState(1).randn(2, 64).astype(np.float32)
    with torch.no_grad():
        want = G(torch.from_numpy(z), None, noise_mode="const").numpy()
    got = np.asarray(sg2.generator_apply(cfg, params, jnp.asarray(z),
                                         hooks=hooks))
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_out_plus_in_intended_semantics():
    # The reference's 'out+in' application path crashes (weight_to_weight
    # networks.py:567 concatenates the bookkeeping lists instead of the
    # tensors), so there is no oracle; we implement the intended broadcast
    # add: WO[o, i] = out[o, 0] + in[0, i].
    spec = offs.OffsetsSpec.from_string("out+in_additive")
    desc = offs.parse_weight_parametrization("out+in_additive")
    rng = np.random.RandomState(0)
    layer = {
        "weights_offset_in_0": jnp.asarray(rng.randn(1, 4).astype(np.float32)),
        "weights_offset_out_0": jnp.asarray(rng.randn(3, 1).astype(np.float32)),
    }
    hooks = offs.make_hooks(spec, {"b8.conv0": layer})
    w = jnp.asarray(rng.randn(3, 4, 3, 3).astype(np.float32))
    got = np.asarray(hooks["b8.conv0"]["weight"](w))
    wo = (np.asarray(layer["weights_offset_out_0"]) +
          np.asarray(layer["weights_offset_in_0"]))[:, :, None, None]
    np.testing.assert_allclose(got, np.asarray(w) + wo, rtol=1e-6, atol=1e-6)


def test_weight_parts_gating():
    # Only b8 synt conv layers get weight offsets.
    parts = ("synt_weights_offset.b8",)
    G, cfg, params, offsets, spec, hooks = build_pair("out_in_additive", parts)
    assert "b8.conv0" in offsets and "b8.conv1" in offsets
    assert "b4.conv1" not in offsets
    assert not any(k.endswith("torgb") for k in offsets)
    z = np.random.RandomState(2).randn(2, 64).astype(np.float32)
    with torch.no_grad():
        want = G(torch.from_numpy(z), None, noise_mode="const").numpy()
    got = np.asarray(sg2.generator_apply(cfg, params, jnp.asarray(z),
                                         hooks=hooks))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_init_shapes_match_reference():
    parametrization = "additive,out_in_5_2_dual_additive"
    # dual with explicit terms isn't in the grammar; use plain dual
    parametrization = "additive,out_in_5_dual_additive"
    G, cfg, params, ref_offsets, spec, hooks = build_pair(parametrization)
    ours = offs.init_offsets(jax.random.PRNGKey(0), cfg.synthesis, spec)
    ref_leaves = jax.tree.leaves(ref_offsets)
    our_leaves = jax.tree.leaves(ours)
    assert jax.tree.structure(ref_offsets) == jax.tree.structure(ours)
    for a, b in zip(ref_leaves, our_leaves):
        assert a.shape == b.shape


def test_trainable_mask_dual():
    spec = offs.OffsetsSpec.from_string("out_in_5_dual_additive")
    cfg = sg2.SynthesisConfig(img_resolution=16, channel_base=1024,
                              channel_max=64)
    o = offs.init_offsets(jax.random.PRNGKey(0), cfg, spec)
    m = offs.trainable_mask(spec, o)
    layer = m["b8.conv0"]
    assert layer["weights_offset_in_0"] is False   # random buffer
    assert layer["weights_offset_in_1"] is True
    assert layer["weights_offset_out_0"] is True
    assert layer["weights_offset_out_1"] is False  # random buffer


def test_offsets_are_differentiable():
    spec = offs.OffsetsSpec.from_string("additive,out_in_additive")
    cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=16, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=512, channel_max=32))
    params = sg2.init_generator(jax.random.PRNGKey(0), cfg)
    offsets = offs.init_offsets(jax.random.PRNGKey(1), cfg.synthesis, spec)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 32))

    def loss_fn(o):
        hooks = offs.make_hooks(spec, o)
        img = sg2.generator_apply(cfg, params, z, hooks=hooks)
        return jnp.mean(jnp.square(img))

    g = jax.grad(loss_fn)(offsets)
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    assert any(n > 0 for n in norms)


def test_patch_key_aliases():
    # SimilarDomains patch_key names parse to the unified grammar
    # (core/parametrizations.py registry names).
    from gagan_tpu.params.offsets import OffsetsSpec

    assert OffsetsSpec.from_string("s_delta").style == "additive"
    assert OffsetsSpec.from_string("s_mod").style == "multiplicative"
    assert OffsetsSpec.from_string("w_delta").style == "additive_w_space"
    assert OffsetsSpec.from_string("cin_mult").weights == "in"
    assert OffsetsSpec.from_string("cout_mult").weights == "out"
    assert OffsetsSpec.from_string("cfull_mult").weights == "out_in"
