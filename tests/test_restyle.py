"""ReStyle encoder-family parity vs the reference torch implementations
(random weights, converted), plus the iterative inference protocol.

Reference modules under test:
  restyle_encoders/encoders/restyle_psp_encoders.py (Backbone/ResNetBackbone)
  restyle_encoders/encoders/restyle_e4e_encoders.py (Progressive variants)
  restyle_encoders/encoders/fpn_encoders.py (GradualStyle FPN variants)
  core/utils/example_utils.py:135-170 (get_avg_image / run_on_batch)

The torch side runs on a hand-built torchvision-resnet34 stub (identical
BasicBlock layout + state_dict names; see tests/oracle.py) because this
environment has no torchvision and no egress for pretrained weights.
"""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.inversion import restyle
from gagan_tpu.models import stylegan2 as sg2
from gagan_tpu.utils import checkpoint as ckpt_lib

from . import oracle

oracle.install_torchvision_stub()

SIZE = 256          # stylegan_size -> n_styles = 14
N_STYLES = 14


def _to_params(net):
    return ckpt_lib.flat_to_tree(
        {k: v.detach().numpy() for k, v in net.state_dict().items()
         if "num_batches_tracked" not in k})


def _ref_modules():
    import sys

    sys.path.insert(0, "/root/reference/SimilarDomains")
    from restyle_encoders.encoders import (fpn_encoders,
                                           restyle_e4e_encoders,
                                           restyle_psp_encoders)

    return restyle_psp_encoders, restyle_e4e_encoders, fpn_encoders


def _check(torch_net, enc_type, input_nc, x_np, rtol=5e-3, atol=5e-3):
    cfg = restyle.RestyleEncoderConfig(encoder_type=enc_type,
                                       stylegan_size=SIZE,
                                       input_nc=input_nc)
    params = _to_params(torch_net.eval())
    with torch.no_grad():
        want = torch_net(torch.from_numpy(x_np)).numpy()
    got = np.asarray(restyle.restyle_encode(cfg, params, jnp.asarray(x_np)))
    assert got.shape == want.shape == (x_np.shape[0], N_STYLES, 512)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def x6():
    return np.random.RandomState(0).randn(1, 6, 256, 256).astype(np.float32)


def test_resnet_backbone_encoder_parity(x6):
    psp_mod, _, _ = _ref_modules()
    torch.manual_seed(0)
    net = psp_mod.ResNetBackboneEncoder(
        n_styles=N_STYLES, opts=types.SimpleNamespace(input_nc=6))
    _check(net, "ResNetBackboneEncoder", 6, x6)


def test_resnet_progressive_encoder_parity(x6):
    _, e4e_mod, _ = _ref_modules()
    torch.manual_seed(1)
    net = e4e_mod.ResNetProgressiveBackboneEncoder(
        n_styles=N_STYLES, opts=types.SimpleNamespace(input_nc=6))
    assert net.progressive_stage.value >= N_STYLES   # Inference stage
    _check(net, "ResNetProgressiveBackboneEncoder", 6, x6)


def test_progressive_stage_parity(x6):
    """set_progressive_stage(k) semantics (restyle_e4e_encoders.py:71-88):
    deltas apply only for layers 1..k; later layers repeat w0."""
    _, e4e_mod, _ = _ref_modules()
    torch.manual_seed(6)
    net = e4e_mod.ResNetProgressiveBackboneEncoder(
        n_styles=N_STYLES, opts=types.SimpleNamespace(input_nc=6)).eval()
    net.set_progressive_stage(e4e_mod.ProgressiveStage(3))
    cfg = restyle.RestyleEncoderConfig(
        encoder_type="ResNetProgressiveBackboneEncoder",
        stylegan_size=SIZE, input_nc=6)
    params = _to_params(net)
    with torch.no_grad():
        want = net(torch.from_numpy(x6)).numpy()
    got = np.asarray(restyle.restyle_encode(cfg, params, jnp.asarray(x6),
                                            stage=3))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    # Layers beyond the stage repeat w0 exactly.
    np.testing.assert_array_equal(got[:, 5], got[:, 10])


@pytest.mark.slow
def test_backbone_encoder_parity(x6):
    # IR-SE-50 single-map restyle pSp; slow tier (24 bottlenecks @256²).
    psp_mod, _, _ = _ref_modules()
    torch.manual_seed(2)
    net = psp_mod.BackboneEncoder(
        50, "ir_se", n_styles=N_STYLES,
        opts=types.SimpleNamespace(input_nc=6))
    _check(net, "BackboneEncoder", 6, x6)


def test_progressive_backbone_encoder_parity(x6):
    _, e4e_mod, _ = _ref_modules()
    torch.manual_seed(3)
    net = e4e_mod.ProgressiveBackboneEncoder(
        50, "ir_se", n_styles=N_STYLES,
        opts=types.SimpleNamespace(input_nc=6))
    _check(net, "ProgressiveBackboneEncoder", 6, x6)


def test_resnet_fpn_encoder_parity(x6):
    _, _, fpn_mod = _ref_modules()
    torch.manual_seed(4)
    net = fpn_mod.ResNetGradualStyleEncoder(
        n_styles=N_STYLES, opts=types.SimpleNamespace(input_nc=6))
    # align_corners=True bilinear in the torch _upsample_add vs jax
    # resize('bilinear'): the 16->32/64 upsamples differ at the borders, so
    # compare at a looser tolerance (same policy as test_encoders.py's FPN
    # cases, which share this structural difference).
    _check(net, "ResNetGradualStyleEncoder", 6, x6, rtol=5e-2, atol=5e-2)


@pytest.mark.slow
def test_ir_fpn_encoder_parity(x6):
    _, _, fpn_mod = _ref_modules()
    torch.manual_seed(5)
    net = fpn_mod.GradualStyleEncoder(
        50, "ir_se", n_styles=N_STYLES,
        opts=types.SimpleNamespace(input_nc=6))
    _check(net, "GradualStyleEncoder", 6, x6, rtol=5e-2, atol=5e-2)


# ----------------------------------------------------------------------------
# Iterative protocol semantics (example_utils.py:135-170).


@pytest.fixture(scope="module")
def tiny_net():
    g_cfg = sg2.GeneratorConfig(
        img_resolution=SIZE,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=1024, channel_max=64))
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    enc_cfg = restyle.RestyleEncoderConfig(
        encoder_type="ResNetProgressiveBackboneEncoder", stylegan_size=SIZE)
    enc_params = restyle.init_restyle_encoder(jax.random.PRNGKey(1), enc_cfg)
    latent_avg = jax.random.normal(jax.random.PRNGKey(2), (N_STYLES, 512))
    return restyle.RestyleNet(enc_cfg=enc_cfg, enc_params=enc_params,
                              g_cfg=g_cfg, g_params=g_params,
                              latent_avg=latent_avg)


def test_run_on_batch_protocol(tiny_net):
    """Unrolls the reference loop by hand: iteration 0 conditions on the
    avg image + latent_avg; iteration i on the pooled previous decode +
    accumulated codes (example_utils.py:144-170)."""
    net = tiny_net
    inputs = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 256, 256))
    images, latents = restyle.run_on_batch(net, inputs, n_iters=2)
    assert len(images) == len(latents) == 2
    assert images[0].shape == (2, 3, SIZE, SIZE)
    assert latents[0].shape == (2, N_STYLES, 512)

    avg = restyle.get_avg_image(net)
    x0 = jnp.concatenate(
        [inputs, jnp.broadcast_to(avg[None], inputs.shape)], axis=1)
    def rel(a, b, tol=1e-4):
        # Random-init towers produce O(1e7) activations and jit-fused vs
        # eager float32 accumulation orders differ; elementwise rtol blows
        # up at zero crossings, so compare max-abs error against the
        # tensor's global scale.
        a, b = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-6)
        assert err < tol, err

    codes0 = restyle.restyle_encode(net.enc_cfg, net.enc_params, x0) \
        + net.latent_avg[None]
    rel(latents[0], codes0)
    img0 = net.decode(codes0, resize=False)
    rel(images[0], img0)

    x1 = jnp.concatenate([inputs, restyle.adaptive_avg_pool(img0)], axis=1)
    codes1 = restyle.restyle_encode(net.enc_cfg, net.enc_params, x1) + codes0
    rel(latents[1], codes1, tol=2e-3)


def test_adaptive_avg_pool_matches_torch():
    x = np.random.RandomState(1).randn(1, 3, 64, 64).astype(np.float32)
    want = torch.nn.AdaptiveAvgPool2d((16, 16))(torch.from_numpy(x)).numpy()
    got = np.asarray(restyle.adaptive_avg_pool(jnp.asarray(x), 16))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_converter_roundtrip(tmp_path):
    """convert_restyle npz -> load_net rebuilds encoder params exactly and
    carries latent_avg / meta."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.convert_weights import restyle_from_torch

    psp_mod, _, _ = _ref_modules()
    torch.manual_seed(6)
    enc = psp_mod.ResNetBackboneEncoder(
        n_styles=18, opts=types.SimpleNamespace(input_nc=6))
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    ckpt = {
        "state_dict": sd,
        "opts": {"encoder_type": "ResNetBackboneEncoder",
                 "output_size": 1024, "input_nc": 6},
        "latent_avg": torch.randn(512),
    }
    enc_flat, dec_flat, latent_avg, meta = restyle_from_torch(ckpt)
    assert meta["encoder_type"] == "ResNetBackboneEncoder"
    assert latent_avg.shape == (18, 512)     # [512] tiled over layers
    assert not dec_flat
    tree = ckpt_lib.flat_to_tree(enc_flat)
    want = enc.state_dict()["conv1.weight"].numpy()
    np.testing.assert_array_equal(tree["conv1"]["weight"], want)

    x = np.random.RandomState(2).randn(1, 6, 256, 256).astype(np.float32)
    cfg = restyle.RestyleEncoderConfig(encoder_type="ResNetBackboneEncoder",
                                       stylegan_size=1024)
    with torch.no_grad():
        ref = enc.eval()(torch.from_numpy(x)).numpy()
    got = np.asarray(restyle.restyle_encode(cfg, tree, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
