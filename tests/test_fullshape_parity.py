"""Full-shape (shipping-config) parity vs the torch reference on CPU.

Round-1 parity ran at 32-64 px with channel_max 64; these tests prove the
conversion + forward path at the shapes the real checkpoints ship with
(BASELINE targets 1-2), so real weights become turnkey when files arrive:

* NVlabs config-f generator/discriminator (1024², channel_base 32768,
  channel_max 512, 8-layer mapping, num_fp16_res=4 + conv_clamp=256 as
  `DissimilarDomains/train.py:258-267` configures them), via the identity
  name map (`legacy.py:21-117` pickle layout == state_dict layout).
* Rosinality generator at size 1024 / n_mlp 8 / channel_multiplier 2
  (`SimilarDomains/gan_models/StyleGAN2/model.py:364`), via
  tools/convert_weights.rosinality_to_flat.
* CLIP ViT-B/32 and ViT-B/16 at the real OpenAI dimensions vs
  random-weight HF `transformers.CLIPModel` at the same config.
* pytorch-fid InceptionV3 (the fid_inception_v3 patched blocks,
  `core/utils/fid.py:194-212`) and torchvision VGG16 at full dims.

Everything runs fp32 on random weights (zero egress), batch 1-2, single
forward per side — bounded CPU cost, marked slow.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.models import stylegan2 as sg2
from gagan_tpu.utils import checkpoint as ckpt_lib, torch_import

from . import oracle

pytestmark = pytest.mark.slow

networks = oracle.ref_networks()


def sd_of(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def configf_cfg():
    return sg2.GeneratorConfig(
        z_dim=512, w_dim=512, img_resolution=1024, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=8),
        synthesis=sg2.SynthesisConfig(
            channel_base=32768, channel_max=512, num_fp16_res=4,
            conv_clamp=256))


@pytest.fixture(scope="module")
def nvlabs_configf():
    torch.manual_seed(0)
    G = networks.Generator(
        z_dim=512, c_dim=0, w_dim=512, img_resolution=1024, img_channels=3,
        synthesis_kwargs=dict(channel_base=32768, channel_max=512,
                              num_fp16_res=4, conv_clamp=256),
        mapping_kwargs=dict(num_layers=8),
    ).eval()
    cfg = configf_cfg()
    params = torch_import.generator_params_from_nvlabs(sd_of(G))
    return G, cfg, params


def test_nvlabs_configf_mapping_parity(nvlabs_configf):
    G, cfg, params = nvlabs_configf
    z = np.random.RandomState(0).randn(2, 512).astype(np.float32)
    with torch.no_grad():
        want = G.mapping(torch.from_numpy(z), None,
                         truncation_psi=0.7).numpy()
    got = np.asarray(sg2.mapping_apply(cfg.mapping, params["mapping"],
                                       jnp.asarray(z), truncation_psi=0.7))
    assert got.shape == want.shape == (2, cfg.num_ws, 512)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)


def test_nvlabs_configf_synthesis_parity(nvlabs_configf):
    # Full 1024² synthesis, 512-wide channels, conv_clamp active; both
    # sides forced fp32 (the reference's force_fp32 flag vs ours) so the
    # comparison isolates the conversion + op semantics from fp16 noise.
    G, cfg, params = nvlabs_configf
    w = np.random.RandomState(1).randn(1, 512).astype(np.float32) * 0.5
    ws = np.repeat(w[:, None], cfg.num_ws, axis=1)
    with torch.no_grad():
        want = G.synthesis(torch.from_numpy(ws), noise_mode="const",
                           force_fp32=True).numpy()
    got = np.asarray(sg2.synthesis_apply(
        cfg.synthesis, params["synthesis"], jnp.asarray(ws),
        noise_mode="const", force_fp32=True))
    assert got.shape == want.shape == (1, 3, 1024, 1024)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=3e-4)


def test_nvlabs_configf_packed_tail_consistency(nvlabs_configf):
    # The packed (space-to-depth) tail at real 1024² shapes must reproduce
    # the plain path on the same converted full-shape weights.
    import dataclasses

    _, cfg, params = nvlabs_configf
    w = np.random.RandomState(2).randn(1, 512).astype(np.float32) * 0.5
    ws = jnp.asarray(np.repeat(w[:, None], cfg.num_ws, axis=1))
    plain = sg2.synthesis_apply(cfg.synthesis, params["synthesis"], ws,
                                noise_mode="const", force_fp32=True)
    packed_cfg = dataclasses.replace(cfg.synthesis, packed_last_block=True,
                                     packed_tail_blocks=2)
    packed = sg2.synthesis_apply(packed_cfg, params["synthesis"], ws,
                                 noise_mode="const", force_fp32=True)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(plain),
                               rtol=2e-3, atol=2e-4)


def test_nvlabs_configf_bf16_path_close(nvlabs_configf):
    # The shipping mixed-precision path (bf16 for the top 4 resolutions +
    # conv_clamp, mirroring the reference's fp16 cutover) must stay close
    # to the fp32 reference at full shape: relative RMSE on the image.
    G, cfg, params = nvlabs_configf
    w = np.random.RandomState(3).randn(1, 512).astype(np.float32) * 0.5
    ws = np.repeat(w[:, None], cfg.num_ws, axis=1)
    with torch.no_grad():
        want = G.synthesis(torch.from_numpy(ws), noise_mode="const",
                           force_fp32=True).numpy()
    got = np.asarray(sg2.synthesis_apply(
        cfg.synthesis, params["synthesis"], jnp.asarray(ws),
        noise_mode="const")).astype(np.float32)
    rel = np.sqrt(np.mean((got - want) ** 2)) / (np.std(want) + 1e-12)
    assert rel < 0.02, f"bf16 path diverges: rel RMSE {rel:.4f}"


def test_nvlabs_configf_discriminator_parity():
    torch.manual_seed(1)
    D = networks.Discriminator(
        c_dim=0, img_resolution=1024, img_channels=3,
        channel_base=32768, channel_max=512, num_fp16_res=4, conv_clamp=256,
        epilogue_kwargs=dict(mbstd_group_size=2),
    ).eval()
    d_cfg = sg2.DiscriminatorConfig(
        img_resolution=1024, channel_base=32768, channel_max=512,
        num_fp16_res=4, conv_clamp=256, mbstd_group_size=2)
    d_params = torch_import.discriminator_params_from_nvlabs(sd_of(D))
    img = np.random.RandomState(4).randn(2, 3, 1024, 1024).astype(np.float32)
    with torch.no_grad():
        want = D(torch.from_numpy(img), None, force_fp32=True).numpy()
    got = np.asarray(sg2.discriminator_apply(
        d_cfg, d_params, jnp.asarray(img), None, force_fp32=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=3e-4)


def test_rosinality_1024_conversion_parity():
    import sys

    sys.path.insert(0, "/root/reference/SimilarDomains")
    from gan_models.StyleGAN2 import model as ros

    from tools.convert_weights import rosinality_to_flat

    torch.manual_seed(2)
    G = ros.Generator(size=1024, style_dim=512, n_mlp=8,
                      channel_multiplier=2).eval()
    flat = rosinality_to_flat(sd_of(G), size=1024, n_mlp=8)
    params = ckpt_lib.flat_to_tree(flat)
    cfg = sg2.GeneratorConfig(
        z_dim=512, w_dim=512, img_resolution=1024,
        mapping=sg2.MappingConfig(num_layers=8, lr_multiplier=0.01),
        synthesis=sg2.SynthesisConfig(channel_base=32768, channel_max=512))

    z = np.random.RandomState(5).randn(1, 512).astype(np.float32)
    with torch.no_grad():
        w = G.style(torch.from_numpy(z))
        want, _ = G([w], input_is_latent=True, randomize_noise=False)
    want = want.numpy()
    ws = jnp.repeat(jnp.asarray(w.numpy())[:, None], cfg.num_ws, axis=1)
    got = np.asarray(sg2.synthesis_apply(
        cfg.synthesis, params["synthesis"], ws, noise_mode="const"))
    assert got.shape == want.shape == (1, 3, 1024, 1024)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=3e-4)


# ----------------------------------------------------------------------------
# Frozen towers at shipping dimensions.


@pytest.mark.parametrize("patch,width,layers,heads", [(32, 768, 12, 12),
                                                      (16, 768, 12, 12)])
def test_clip_vit_b_full_config_parity(patch, width, layers, heads):
    import transformers

    from gagan_tpu.clip import convert as clip_convert
    from gagan_tpu.clip import model as clip_model

    hf_cfg = transformers.CLIPConfig(
        projection_dim=512,
        text_config=dict(hidden_size=512, intermediate_size=2048,
                         num_hidden_layers=12, num_attention_heads=8,
                         max_position_embeddings=77, vocab_size=49408),
        vision_config=dict(hidden_size=width, intermediate_size=width * 4,
                           num_hidden_layers=layers, num_attention_heads=heads,
                           image_size=224, patch_size=patch))
    torch.manual_seed(3)
    hf = transformers.CLIPModel(hf_cfg).eval()
    params = clip_convert.from_hf_state_dict(sd_of(hf))
    cfg = clip_model.CLIPConfig(
        embed_dim=512, image_resolution=224, vision_layers=layers,
        vision_width=width, vision_patch_size=patch, context_length=77,
        vocab_size=49408, transformer_width=512, transformer_heads=8,
        transformer_layers=12)

    x = np.random.RandomState(6).randn(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = hf.get_image_features(pixel_values=torch.from_numpy(x)).numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    got, _ = clip_model.encode_image(cfg, params, jnp.asarray(x),
                                     preprocess=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)

    toks = np.random.RandomState(7).randint(1, 49406, size=(2, 77))
    toks[:, 0] = 49406
    toks[:, -1] = 49407                      # eot = max id (argmax rule)
    with torch.no_grad():
        want_t = hf.get_text_features(input_ids=torch.from_numpy(toks)).numpy()
    want_t = want_t / np.linalg.norm(want_t, axis=-1, keepdims=True)
    got_t = np.asarray(clip_model.encode_text(cfg, params,
                                              jnp.asarray(toks)))
    np.testing.assert_allclose(got_t, want_t, rtol=2e-3, atol=2e-3)


# torchvision is not installed in this image; the oracles below are
# hand-built torch modules following the published torchvision InceptionV3
# (with the pytorch-fid patches, fid.py:194-320) and VGG16-D layouts, with
# state_dict keys matching what tools/convert_weights.py consumes.


def _bc(in_ch, out_ch, **kw):
    import torch.nn as nn

    class BasicConv2d(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(in_ch, out_ch, bias=False, **kw)
            self.bn = nn.BatchNorm2d(out_ch, eps=0.001)

        def forward(self, x):
            return torch.relu(self.bn(self.conv(x)))

    return BasicConv2d()


def _torch_fid_inception():
    """pytorch-fid's patched InceptionV3 feature extractor in plain torch
    (fid.py:194-320 + torchvision inception_v3), random weights."""
    import torch.nn as nn
    import torch.nn.functional as F

    def avgp(x):
        return F.avg_pool2d(x, 3, stride=1, padding=1,
                            count_include_pad=False)

    class A(nn.Module):                      # FIDInceptionA
        def __init__(self, in_ch, pf):
            super().__init__()
            self.branch1x1 = _bc(in_ch, 64, kernel_size=1)
            self.branch5x5_1 = _bc(in_ch, 48, kernel_size=1)
            self.branch5x5_2 = _bc(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = _bc(in_ch, 64, kernel_size=1)
            self.branch3x3dbl_2 = _bc(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = _bc(96, 96, kernel_size=3, padding=1)
            self.branch_pool = _bc(in_ch, pf, kernel_size=1)

        def forward(self, x):
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(
                    self.branch3x3dbl_1(x))),
                self.branch_pool(avgp(x))], 1)

    class B(nn.Module):                      # InceptionB (Mixed_6a)
        def __init__(self, in_ch):
            super().__init__()
            self.branch3x3 = _bc(in_ch, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = _bc(in_ch, 64, kernel_size=1)
            self.branch3x3dbl_2 = _bc(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = _bc(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(
                    self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, stride=2)], 1)

    class C(nn.Module):                      # FIDInceptionC
        def __init__(self, in_ch, c7):
            super().__init__()
            self.branch1x1 = _bc(in_ch, 192, kernel_size=1)
            self.branch7x7_1 = _bc(in_ch, c7, kernel_size=1)
            self.branch7x7_2 = _bc(c7, c7, kernel_size=(1, 7),
                                   padding=(0, 3))
            self.branch7x7_3 = _bc(c7, 192, kernel_size=(7, 1),
                                   padding=(3, 0))
            self.branch7x7dbl_1 = _bc(in_ch, c7, kernel_size=1)
            self.branch7x7dbl_2 = _bc(c7, c7, kernel_size=(7, 1),
                                      padding=(3, 0))
            self.branch7x7dbl_3 = _bc(c7, c7, kernel_size=(1, 7),
                                      padding=(0, 3))
            self.branch7x7dbl_4 = _bc(c7, c7, kernel_size=(7, 1),
                                      padding=(3, 0))
            self.branch7x7dbl_5 = _bc(c7, 192, kernel_size=(1, 7),
                                      padding=(0, 3))
            self.branch_pool = _bc(in_ch, 192, kernel_size=1)

        def forward(self, x):
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_1(x)
            for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                      self.branch7x7dbl_4, self.branch7x7dbl_5):
                bd = m(bd)
            return torch.cat([self.branch1x1(x), b7, bd,
                              self.branch_pool(avgp(x))], 1)

    class D(nn.Module):                      # InceptionD (Mixed_7a)
        def __init__(self, in_ch):
            super().__init__()
            self.branch3x3_1 = _bc(in_ch, 192, kernel_size=1)
            self.branch3x3_2 = _bc(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = _bc(in_ch, 192, kernel_size=1)
            self.branch7x7x3_2 = _bc(192, 192, kernel_size=(1, 7),
                                     padding=(0, 3))
            self.branch7x7x3_3 = _bc(192, 192, kernel_size=(7, 1),
                                     padding=(3, 0))
            self.branch7x7x3_4 = _bc(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            b7 = self.branch7x7x3_1(x)
            for m in (self.branch7x7x3_2, self.branch7x7x3_3,
                      self.branch7x7x3_4):
                b7 = m(b7)
            return torch.cat([self.branch3x3_2(self.branch3x3_1(x)), b7,
                              F.max_pool2d(x, 3, stride=2)], 1)

    class E(nn.Module):                      # FIDInceptionE_1 / _2
        def __init__(self, in_ch, pool):
            super().__init__()
            self.pool = pool
            self.branch1x1 = _bc(in_ch, 320, kernel_size=1)
            self.branch3x3_1 = _bc(in_ch, 384, kernel_size=1)
            self.branch3x3_2a = _bc(384, 384, kernel_size=(1, 3),
                                    padding=(0, 1))
            self.branch3x3_2b = _bc(384, 384, kernel_size=(3, 1),
                                    padding=(1, 0))
            self.branch3x3dbl_1 = _bc(in_ch, 448, kernel_size=1)
            self.branch3x3dbl_2 = _bc(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = _bc(384, 384, kernel_size=(1, 3),
                                       padding=(0, 1))
            self.branch3x3dbl_3b = _bc(384, 384, kernel_size=(3, 1),
                                       padding=(1, 0))
            self.branch_pool = _bc(in_ch, 192, kernel_size=1)

        def forward(self, x):
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd),
                            self.branch3x3dbl_3b(bd)], 1)
            bp = (avgp(x) if self.pool == "avg"
                  else F.max_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([self.branch1x1(x), b3, bd,
                              self.branch_pool(bp)], 1)

    class FIDInception(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = _bc(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = _bc(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = _bc(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = _bc(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = _bc(80, 192, kernel_size=3)
            self.Mixed_5b = A(192, 32)
            self.Mixed_5c = A(256, 64)
            self.Mixed_5d = A(288, 64)
            self.Mixed_6a = B(288)
            self.Mixed_6b = C(768, 128)
            self.Mixed_6c = C(768, 160)
            self.Mixed_6d = C(768, 160)
            self.Mixed_6e = C(768, 192)
            self.Mixed_7a = D(768)
            self.Mixed_7b = E(1280, "avg")
            self.Mixed_7c = E(2048, "max")   # fid.py:320 max-pool quirk
            self.fc = nn.Linear(2048, 1008)

        def forward(self, x):
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                         "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                         "Mixed_7a", "Mixed_7b", "Mixed_7c"):
                x = getattr(self, name)(x)
            return x.mean(dim=(2, 3))

    return FIDInception().eval()


def test_inception_v3_full_parity():
    torch.manual_seed(4)
    inc = _torch_fid_inception()
    # Randomize BN running stats so the eval-mode math is exercised.
    with torch.no_grad():
        for m in inc.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in inc.state_dict().items()
          if "num_batches_tracked" not in k}
    params = ckpt_lib.flat_to_tree(sd)

    from gagan_tpu.metrics import inception as inc_lib

    x01 = np.random.RandomState(8).rand(2, 3, 299, 299).astype(np.float32)
    with torch.no_grad():
        want = inc(torch.from_numpy(x01) * 2 - 1).numpy()

    # Ours takes [0, 255] and normalizes to (-1, 1) the same way.
    got = np.asarray(inc_lib.inception_v3_features(
        params, jnp.asarray(x01 * 255.0), resize_input=False))
    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_vgg16_full_parity():
    import torch.nn as nn

    from gagan_tpu.metrics import vgg16 as vgg_lib

    # torchvision VGG16-D `features` stack, exact module indices.
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU()]
            in_ch = v

    class VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)

    torch.manual_seed(5)
    tv = VGG().eval()
    sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    params = ckpt_lib.flat_to_tree(sd)

    x = np.random.RandomState(9).rand(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = tv.features(torch.from_numpy(x)).numpy()
    final, _ = vgg_lib.vgg16_backbone(params, jnp.asarray(x))
    got = np.asarray(final)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
