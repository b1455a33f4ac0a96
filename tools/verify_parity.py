"""One-command real-weight parity verification vs torch-CPU.

The moment real pretrained files arrive (FFHQ checkpoints, OpenAI/HF CLIP,
pytorch-fid Inception, VGG16), this converts them and runs the same
comparisons as tests/test_fullshape_parity.py, printing a pass/fail report —
BASELINE targets 1-2 become provable in one step (anchors:
`DissimilarDomains/legacy.py:21-117`,
`SimilarDomains/core/uda_models.py:27-35`).

Usage:
    python tools/verify_parity.py CKPT --kind rosinality [--size 1024]
    python tools/verify_parity.py CKPT --kind nvlabs
    python tools/verify_parity.py CKPT --kind clip-hf
    python tools/verify_parity.py CKPT --kind inception
    python tools/verify_parity.py CKPT --kind vgg16
    python tools/verify_parity.py HF_DIR --kind swin-hf
    python tools/verify_parity.py [WEIGHTS_DIR] --kind mtcnn   # real in-tree
    python tools/verify_parity.py CKPT --kind psp|e4e [--size 1024]
    python tools/verify_parity.py CKPT --kind adaptation  # .pt ref schema/.npz
    python tools/verify_parity.py --self-test [--json report.json]

CKPT formats: torch .pt/.pth state dicts (rosinality `g_ema` key or raw),
NVlabs network pickles (loaded through the reference's legacy loader,
imported read-only), HF CLIP state dicts / model dirs, torch state dicts
for the towers.  `--self-test` builds random-weight torch fixtures for
every kind and must print all PASS — proving the tool end-to-end with no
files.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


RESULTS: list = []     # machine-readable report rows (--json)


def _report(name, max_err, tol, extra=""):
    ok = max_err <= tol
    print(f"{'PASS' if ok else 'FAIL'}  {name:42s} max_err={max_err:.3e} "
          f"tol={tol:.0e} {extra}")
    RESULTS.append({"name": name, "max_err": float(max_err),
                    "tol": float(tol), "pass": bool(ok),
                    **({"extra": extra} if extra else {})})
    return ok


def _rel_err(got, want):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = np.max(np.abs(want)) + 1e-12
    return float(np.max(np.abs(got - want)) / scale)


# ----------------------------------------------------------------------------


def verify_rosinality(sd: dict, size: int, n_mlp: int = 8) -> bool:
    """Rosinality G state dict -> converted flat tree; compare mapping +
    synthesis vs the reference module on CPU (test_fullshape_parity.py:150)."""
    import torch

    import jax.numpy as jnp

    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.utils import checkpoint as ckpt_lib
    from tools.convert_weights import rosinality_to_flat

    sys.path.insert(0, "/root/reference/SimilarDomains")
    from gan_models.StyleGAN2 import model as ros

    G = ros.Generator(size=size, style_dim=512, n_mlp=n_mlp,
                      channel_multiplier=2).eval()
    G.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()},
                      strict=False)
    flat = rosinality_to_flat({k: np.asarray(v) for k, v in sd.items()},
                              size=size, n_mlp=n_mlp)
    params = ckpt_lib.flat_to_tree(flat)
    cfg = sg2.GeneratorConfig(
        z_dim=512, w_dim=512, img_resolution=size,
        mapping=sg2.MappingConfig(num_layers=n_mlp, lr_multiplier=0.01),
        synthesis=sg2.SynthesisConfig(channel_base=32768, channel_max=512))

    z = np.random.RandomState(5).randn(1, 512).astype(np.float32)
    with torch.no_grad():
        w = G.style(torch.from_numpy(z))
        want, _ = G([w], input_is_latent=True, randomize_noise=False)
    ws = jnp.repeat(jnp.asarray(w.numpy())[:, None], cfg.num_ws, axis=1)
    got = sg2.synthesis_apply(cfg.synthesis, params["synthesis"], ws,
                              noise_mode="const")
    return _report(f"rosinality-{size} synthesis", _rel_err(got, want.numpy()),
                   5e-3)


def verify_nvlabs(G_torch, init_kwargs=None) -> bool:
    """NVlabs Generator module (from a legacy pickle) vs the converted
    params, force_fp32 both sides (test_fullshape_parity.py:79)."""
    import torch

    import jax.numpy as jnp

    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.utils import torch_import

    G = G_torch.eval()
    k = (init_kwargs if init_kwargs is not None
         else (G.init_kwargs if hasattr(G, "init_kwargs") else {}))
    syn_kw = dict(k.get("synthesis_kwargs", {}))
    cfg = sg2.GeneratorConfig(
        z_dim=G.z_dim, w_dim=G.w_dim, c_dim=G.c_dim,
        img_resolution=G.img_resolution, img_channels=G.img_channels,
        mapping=sg2.MappingConfig(
            num_layers=k.get("mapping_kwargs", {}).get("num_layers", 8)),
        synthesis=sg2.SynthesisConfig(
            channel_base=syn_kw.get("channel_base", 32768),
            channel_max=syn_kw.get("channel_max", 512),
            num_fp16_res=syn_kw.get("num_fp16_res", 4),
            conv_clamp=syn_kw.get("conv_clamp", 256)))
    sd = {kk: v.detach().cpu().numpy() for kk, v in G.state_dict().items()}
    params = torch_import.generator_params_from_nvlabs(sd)

    z = np.random.RandomState(0).randn(2, G.z_dim).astype(np.float32)
    with torch.no_grad():
        ws_t = G.mapping(torch.from_numpy(z), None, truncation_psi=0.7)
    ws = sg2.mapping_apply(cfg.mapping, params["mapping"], jnp.asarray(z),
                           truncation_psi=0.7)
    ok = _report("nvlabs mapping", _rel_err(ws, ws_t.numpy()), 5e-3)

    # Synthesis on a controlled broadcast W (test_fullshape_parity.py:84
    # protocol): an untruncated random-mapping W drives random-weight
    # activations onto the conv_clamp boundary, where 1e-6 input wiggles
    # amplify chaotically — real checkpoints don't ride the clamp, and the
    # controlled W keeps the self-test meaningful.
    wv = np.random.RandomState(1).randn(1, G.w_dim).astype(np.float32) * 0.5
    ws2 = np.repeat(wv[:, None], cfg.num_ws, axis=1)
    with torch.no_grad():
        want = G.synthesis(torch.from_numpy(ws2), noise_mode="const",
                           force_fp32=True).numpy()
    got = sg2.synthesis_apply(cfg.synthesis, params["synthesis"],
                              jnp.asarray(ws2), noise_mode="const",
                              force_fp32=True)
    return _report("nvlabs synthesis (force_fp32)", _rel_err(got, want),
                   5e-3) and ok


def verify_clip_hf(hf_model) -> bool:
    """HF transformers.CLIPModel vs the converted JAX tower
    (test_fullshape_parity.py:186)."""
    import torch

    import jax.numpy as jnp

    from gagan_tpu.clip import convert as clip_convert
    from gagan_tpu.clip import model as clip_model

    hf = hf_model.eval()
    v = hf.config.vision_config
    t = hf.config.text_config
    params = clip_convert.from_hf_state_dict(
        {k: x.detach().cpu().numpy() for k, x in hf.state_dict().items()})
    cfg = clip_model.CLIPConfig(
        embed_dim=hf.config.projection_dim, image_resolution=v.image_size,
        vision_layers=v.num_hidden_layers, vision_width=v.hidden_size,
        vision_patch_size=v.patch_size, context_length=77,
        vocab_size=t.vocab_size, transformer_width=t.hidden_size,
        transformer_heads=t.num_attention_heads,
        transformer_layers=t.num_hidden_layers,
        vision_heads_override=v.num_attention_heads)

    x = np.random.RandomState(6).randn(2, 3, v.image_size,
                                       v.image_size).astype(np.float32)
    with torch.no_grad():
        want = hf.get_image_features(pixel_values=torch.from_numpy(x)).numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    got, _ = clip_model.encode_image(cfg, params, jnp.asarray(x),
                                     preprocess=False)
    ok = _report("clip image tower", _rel_err(got, want), 5e-3)

    toks = np.random.RandomState(7).randint(1, t.vocab_size - 2, size=(2, 77))
    toks[:, 0] = t.vocab_size - 2
    toks[:, -1] = t.vocab_size - 1
    with torch.no_grad():
        want_t = hf.get_text_features(input_ids=torch.from_numpy(toks)).numpy()
    want_t = want_t / np.linalg.norm(want_t, axis=-1, keepdims=True)
    # 1e-2 tolerance: tiny random self-test towers produce near-zero-norm
    # embeddings whose normalization amplifies fp noise; real OpenAI/HF
    # weights measure well below 5e-3 at the full config
    # (test_fullshape_parity.py:186 passes 2e-3 there).
    got_t = clip_model.encode_text(cfg, params, jnp.asarray(toks))
    return _report("clip text tower", _rel_err(got_t, want_t), 1e-2) and ok


def _torch_vgg16_features():
    """torchvision VGG16-D `features` stack (exact module indices)."""
    import torch.nn as nn

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

    return VGG()


def verify_inception(sd: dict) -> bool:
    """pytorch-fid InceptionV3 state dict: converted features vs the torch
    oracle module loaded with the SAME weights (test_fullshape_parity.py:409)."""
    import torch

    import jax.numpy as jnp

    from gagan_tpu.metrics import inception as inc_lib
    from gagan_tpu.utils import checkpoint as ckpt_lib
    from tests.test_fullshape_parity import _torch_fid_inception

    net = _torch_fid_inception()
    net.load_state_dict({k: torch.as_tensor(np.asarray(v))
                         for k, v in sd.items()}, strict=False)
    params = ckpt_lib.flat_to_tree(
        {k: np.asarray(v) for k, v in sd.items()
         if "num_batches_tracked" not in k})
    x01 = np.random.RandomState(8).rand(2, 3, 299, 299).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x01) * 2 - 1).numpy()
    got = inc_lib.inception_v3_features(params, jnp.asarray(x01 * 255.0),
                                        resize_input=False)
    return _report("inception pool3 features", _rel_err(got, want), 5e-3)


def verify_vgg16(sd: dict) -> bool:
    """torchvision VGG16 `features` state dict vs the converted backbone
    (test_fullshape_parity.py:435)."""
    import torch

    import jax.numpy as jnp

    from gagan_tpu.metrics import vgg16 as vgg_lib
    from gagan_tpu.utils import checkpoint as ckpt_lib

    net = _torch_vgg16_features().eval()
    net.load_state_dict({k: torch.as_tensor(np.asarray(v))
                         for k, v in sd.items()}, strict=False)
    params = ckpt_lib.flat_to_tree({k: np.asarray(v) for k, v in sd.items()
                                    if k.startswith("features.")})
    x = np.random.RandomState(9).rand(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = net.features(torch.from_numpy(x)).numpy()
    final, _ = vgg_lib.vgg16_backbone(params, jnp.asarray(x))
    return _report("vgg16 conv5_3 features", _rel_err(final, want), 5e-3)


def verify_swin_hf(hf_model) -> bool:
    """HF transformers.SwinModel vs the converted backbone (tests/test_swin.py;
    the GA fitness extractor, `GA/feature_extraction.py:6-14`)."""
    import torch

    import jax.numpy as jnp

    from gagan_tpu.models import swin

    hf = hf_model.eval()
    c = hf.config
    cfg = swin.SwinConfig(image_size=c.image_size, patch_size=c.patch_size,
                          embed_dim=c.embed_dim, depths=tuple(c.depths),
                          num_heads=tuple(c.num_heads),
                          window_size=c.window_size)
    params = swin.params_from_hf(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, cfg)
    x = np.random.RandomState(10).randn(
        2, 3, c.image_size, c.image_size).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(x),
                  output_hidden_states=True).hidden_states[-1].numpy()
    got = np.asarray(swin.swin_features(cfg, params, jnp.asarray(x)))
    got = got.reshape(got.shape[0], -1, got.shape[-1])
    return _report("swin encoder features", _rel_err(got, want), 5e-3)


MTCNN_WEIGHTS = ("/root/reference/SimilarDomains/restyle_encoders/mtcnn/"
                 "mtcnn_pytorch/src/weights")


def verify_mtcnn(weights_dir: str) -> bool:
    """{pnet,rnet,onet}.npy dir vs the reference torch nets loaded with the
    SAME weights (the reference ships real pretrained .npy in-tree, so this
    is real-weight parity today; `mtcnn_pytorch/src/get_nets.py`)."""
    import importlib.util
    import types

    import torch

    import jax.numpy as jnp

    from gagan_tpu.face import mtcnn as fm

    cfg_pkg = types.ModuleType("configs")
    cfg_mod = types.ModuleType("configs.paths_config")
    cfg_mod.model_paths = {f"mtcnn_{n}": f"{weights_dir}/{n}.npy"
                           for n in ("pnet", "rnet", "onet")}
    cfg_pkg.paths_config = cfg_mod
    sys.modules.setdefault("configs", cfg_pkg)
    sys.modules["configs.paths_config"] = cfg_mod
    spec = importlib.util.spec_from_file_location(
        "ref_mtcnn_get_nets",
        "/root/reference/SimilarDomains/restyle_encoders/mtcnn/"
        "mtcnn_pytorch/src/get_nets.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    def ours(name):
        w = np.load(f"{weights_dir}/{name}.npy", allow_pickle=True)[()]
        return fm.params_from_npy(w)

    rng = np.random.RandomState(11)
    ok = True
    with torch.no_grad():
        x = rng.rand(2, 3, 37, 41).astype(np.float32) - 0.5
        wb, wa = [t.numpy() for t in ref.PNet().cpu().eval()(
            torch.from_numpy(x))]
        gb, ga = fm.pnet_apply(ours("pnet"), jnp.asarray(x))
        ok &= _report("mtcnn pnet", max(_rel_err(gb, wb), _rel_err(ga, wa)),
                      1e-4)
        x24 = rng.rand(3, 3, 24, 24).astype(np.float32) - 0.5
        wb, wa = [t.numpy() for t in ref.RNet().cpu().eval()(
            torch.from_numpy(x24))]
        gb, ga = fm.rnet_apply(ours("rnet"), jnp.asarray(x24))
        ok &= _report("mtcnn rnet", max(_rel_err(gb, wb), _rel_err(ga, wa)),
                      1e-4)
        x48 = rng.rand(3, 3, 48, 48).astype(np.float32) - 0.5
        wc, wb, wa = [t.numpy() for t in ref.ONet().cpu().eval()(
            torch.from_numpy(x48))]
        gc, gb, ga = fm.onet_apply(ours("onet"), jnp.asarray(x48))
        ok &= _report("mtcnn onet", max(_rel_err(gc, wc), _rel_err(gb, wb),
                                        _rel_err(ga, wa)), 1e-4)
    return ok


def verify_encoder(sd: dict, which: str, stylegan_size: int = 1024) -> bool:
    """pSp/e4e checkpoint state dict vs the reference GradualStyleEncoder /
    Encoder4Editing on CPU (tests/test_encoders.py; `restyle_encoders/
    encoders/psp_encoders.py`).  `sd` keys may carry the wrapper's
    'encoder.' prefix (psp.py saves the full net)."""
    import types as _types

    import torch

    import jax.numpy as jnp

    from gagan_tpu.inversion import encoders as enc
    from gagan_tpu.utils import checkpoint as ckpt_lib

    sys.path.insert(0, "/root/reference/SimilarDomains")
    from restyle_encoders.encoders import psp_encoders

    if any(k.startswith("encoder.") for k in sd):
        sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    opts = _types.SimpleNamespace(stylegan_size=stylegan_size)
    cls = (psp_encoders.GradualStyleEncoder if which == "psp"
           else psp_encoders.Encoder4Editing)
    net = cls(50, "ir_se", opts).eval()
    net.load_state_dict({k: torch.as_tensor(np.asarray(v))
                         for k, v in sd.items()}, strict=False)
    params = ckpt_lib.flat_to_tree(
        {k: np.asarray(v) for k, v in sd.items()
         if "num_batches_tracked" not in k})
    cfg = enc.EncoderConfig(stylegan_size=stylegan_size)
    x = np.random.RandomState(12).randn(2, 3, 256, 256).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    fn = enc.psp_encode if which == "psp" else enc.e4e_encode
    got = np.asarray(fn(cfg, params, jnp.asarray(x)))
    # 2e-2: 50 IR-SE blocks of float noise; with RANDOM weights the W+ codes
    # sit near zero so the global-max normalization amplifies it (the suite's
    # elementwise rtol/atol=5e-3 passes, tests/test_encoders.py:56).  Real
    # pretrained encoders produce O(1) codes and measure far below this.
    return _report(f"{which} encoder W+ codes", _rel_err(got, want), 2e-2)


def verify_restyle(ckpt: dict, size: int = 1024) -> bool:
    """ReStyle pSp/e4e checkpoint ({state_dict, opts, latent_avg}) vs the
    reference encoder classes on CPU (`restyle_psp_encoders.py` /
    `restyle_e4e_encoders.py` / `fpn_encoders.py`), through
    tools/convert_weights.restyle_from_torch.  The decoder sub-dict is a
    rosinality Generator — its parity is `verify_rosinality`'s job."""
    import types as _types

    import torch

    import jax.numpy as jnp

    from gagan_tpu.inversion import restyle as restyle_lib
    from gagan_tpu.utils import checkpoint as ckpt_lib
    from tests.oracle import install_torchvision_stub
    from tools.convert_weights import restyle_from_torch

    install_torchvision_stub()
    sys.path.insert(0, "/root/reference/SimilarDomains")
    from restyle_encoders.encoders import (fpn_encoders,
                                           restyle_psp_encoders)

    enc_flat, _, latent_avg, meta = restyle_from_torch(ckpt, size)
    enc_type = meta["encoder_type"]
    n_styles = 2 * int(np.log2(meta["output_size"])) - 2
    opts = _types.SimpleNamespace(input_nc=meta["input_nc"])
    builders = {
        "BackboneEncoder": lambda: restyle_psp_encoders.BackboneEncoder(
            50, "ir_se", n_styles, opts),
        "ResNetBackboneEncoder":
            lambda: restyle_psp_encoders.ResNetBackboneEncoder(
                n_styles, opts),
        "GradualStyleEncoder": lambda: fpn_encoders.GradualStyleEncoder(
            50, "ir_se", n_styles, opts),
        "ResNetGradualStyleEncoder":
            lambda: fpn_encoders.ResNetGradualStyleEncoder(n_styles, opts),
    }
    if "Progressive" in enc_type:
        # importable thanks to install_torchvision_stub's models.encoders
        # aliasing (the reference file keeps the upstream repo's layout)
        from restyle_encoders.encoders import restyle_e4e_encoders

        builders["ProgressiveBackboneEncoder"] = \
            lambda: restyle_e4e_encoders.ProgressiveBackboneEncoder(
                50, "ir_se", n_styles, opts)
        builders["ResNetProgressiveBackboneEncoder"] = \
            lambda: restyle_e4e_encoders.ResNetProgressiveBackboneEncoder(
                n_styles, opts)
    net = builders[enc_type]().eval()
    net.load_state_dict({k: torch.as_tensor(np.asarray(v))
                         for k, v in enc_flat.items()}, strict=False)

    cfg = restyle_lib.RestyleEncoderConfig(
        encoder_type=enc_type, stylegan_size=meta["output_size"],
        input_nc=meta["input_nc"])
    params = ckpt_lib.flat_to_tree(enc_flat)
    x = np.random.RandomState(13).randn(
        2, meta["input_nc"], 256, 256).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(restyle_lib.restyle_encode(cfg, params,
                                                jnp.asarray(x)))
    ok = _report(f"restyle {enc_type} W+ codes", _rel_err(got, want), 2e-2)
    if latent_avg is not None:
        ok &= _report("restyle latent_avg shape",
                      0.0 if latent_avg.shape == (n_styles, 512) else 1.0,
                      0.5)
    return ok


def verify_lpips_alex(sd: dict) -> bool:
    """LPIPS(net='alex') state_dict vs a torch replication of the lpips
    package forward (lpips/lpips.py; reference use: GA/evaluation.py:13)."""
    import torch

    import jax.numpy as jnp

    from gagan_tpu.metrics import alexnet
    from gagan_tpu.utils import checkpoint as ckpt_lib
    from tools.convert_weights import lpips_alex_to_flat

    flat = lpips_alex_to_flat(sd)
    params = ckpt_lib.flat_to_tree(flat)

    def np_of(v):
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    shift = torch.as_tensor(
        flat.get("scaling.shift",
                 np.array([-0.030, -0.088, -0.188]))).view(1, 3, 1, 1)
    scale = torch.as_tensor(
        flat.get("scaling.scale",
                 np.array([0.458, 0.448, 0.450]))).view(1, 3, 1, 1)

    def torch_taps(x):
        taps = []
        for idx in (0, 3, 6, 8, 10):
            _, _, _, stride, pad = alexnet.ALEX_CONVS[idx]
            w = torch.as_tensor(flat[f"features.{idx}.weight"])
            b = torch.as_tensor(flat[f"features.{idx}.bias"])
            x = torch.nn.functional.relu(
                torch.nn.functional.conv2d(x, w, b, stride, pad))
            taps.append(x)
            if idx in (0, 3):
                x = torch.nn.functional.max_pool2d(x, 3, 2)
        return taps

    def normalize(t):
        return t / (torch.sqrt((t ** 2).sum(1, keepdim=True)) + 1e-10)

    rng = np.random.RandomState(14)
    a = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ta = torch_taps((torch.from_numpy(a) - shift.float())
                        / scale.float())
        tb = torch_taps((torch.from_numpy(b) - shift.float())
                        / scale.float())
        want = sum(
            (torch.nn.functional.conv2d(
                (normalize(x) - normalize(y)) ** 2,
                torch.as_tensor(flat[f"lin.{i}.weight"])
                .view(1, -1, 1, 1).float())
             .mean(dim=(2, 3)).squeeze(1))
            for i, (x, y) in enumerate(zip(ta, tb))).numpy()
    got = np.asarray(alexnet.lpips_distance(params, jnp.asarray(a),
                                            jnp.asarray(b)))
    return _report("lpips-alex distances", _rel_err(got, want), 1e-4)


def verify_adaptation(path: str) -> bool:
    """Portable adaptation checkpoint: our npz schema (roundtrip + hooks
    apply) or the reference torch schema ({model_type, patch_key,
    state_dict, sg2_params}, `common.py:343-368`) via
    tools/convert_weights.adaptation_from_torch."""
    import jax
    import jax.numpy as jnp

    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.params import offsets as offs_lib
    from gagan_tpu.utils import checkpoint as ckpt_lib

    if path.endswith((".pt", ".pth")):
        import torch

        from tools.convert_weights import adaptation_from_torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        size = int(obj.get("sg2_params", {}).get("img_size", 1024))
        g_cfg = sg2.GeneratorConfig(img_resolution=size)
        meta, offsets_np = adaptation_from_torch(obj, g_cfg.synthesis)
        ok = _report("adaptation head mapping",
                     float(meta["heads_expected"] - meta["heads_consumed"]),
                     0, extra=f"{meta['heads_consumed']}/"
                              f"{meta['heads_expected']} heads")
        offsets = jax.tree.map(jnp.asarray, offsets_np)
        parametrization = meta["parametrization"]
    else:
        meta, offsets, _ = ckpt_lib.load_adaptation(path)
        size = int(meta.get("sg2_params", {}).get("img_resolution",
                   meta.get("sg2_params", {}).get("img_size", 1024)))
        g_cfg = sg2.GeneratorConfig(img_resolution=size)
        parametrization = meta["parametrization"]
        ok = True

    # The offsets must build hooks and change a synthesis forward (tiny
    # random G — checks application end-to-end without the real G weights;
    # combine with --kind rosinality for the full numeric story).
    spec = offs_lib.OffsetsSpec.from_string(parametrization)
    tiny = sg2.GeneratorConfig(img_resolution=32)
    tiny_params = sg2.init_generator(jax.random.PRNGKey(0), tiny)
    tiny_offsets = offs_lib.init_offsets(jax.random.PRNGKey(1), tiny.synthesis,
                                         spec)
    # graft the loaded leading-res offsets onto the tiny tree where shapes
    # match; otherwise keep random nonzero values.
    for k in tiny_offsets:
        if k in offsets:
            for leaf in tiny_offsets[k]:
                src = np.asarray(offsets[k][leaf])
                if src.shape == tiny_offsets[k][leaf].shape:
                    tiny_offsets[k][leaf] = jnp.asarray(
                        src if np.any(src) else
                        np.full_like(src, 0.1))
    hooks = offs_lib.make_hooks(spec, tiny_offsets)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, tiny.z_dim))
    ws = sg2.mapping_apply(tiny.mapping, tiny_params["mapping"], z)
    base = sg2.synthesis_apply(tiny.synthesis, tiny_params["synthesis"], ws,
                               noise_mode="const")
    mod = sg2.synthesis_apply(tiny.synthesis, tiny_params["synthesis"], ws,
                              noise_mode="const", hooks=hooks)
    delta = float(jnp.max(jnp.abs(base - mod)))
    ok &= _report("adaptation offsets apply", 0.0 if delta > 0 else 1.0, 0.5,
                  extra=f"forward delta {delta:.3e}")
    return ok


# ----------------------------------------------------------------------------


def self_test() -> bool:
    """Random-weight fixtures through every verifier (no files needed)."""
    import torch

    ok = True

    sys.path.insert(0, "/root/reference/SimilarDomains")
    from gan_models.StyleGAN2 import model as ros

    torch.manual_seed(2)
    G = ros.Generator(size=256, style_dim=512, n_mlp=8, channel_multiplier=2)
    ok &= verify_rosinality(
        {k: v.detach().numpy() for k, v in G.state_dict().items()}, size=256)

    from tests import oracle
    networks = oracle.ref_networks()
    torch.manual_seed(0)
    kw = dict(
        synthesis_kwargs=dict(channel_base=16384, channel_max=512,
                              num_fp16_res=4, conv_clamp=256),
        mapping_kwargs=dict(num_layers=8))
    Gn = networks.Generator(z_dim=512, c_dim=0, w_dim=512,
                            img_resolution=256, img_channels=3, **kw)
    ok &= verify_nvlabs(Gn, init_kwargs=kw)

    import transformers
    hf_cfg = transformers.CLIPConfig(
        projection_dim=64,
        text_config=dict(hidden_size=64, intermediate_size=256,
                         num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=77, vocab_size=49408),
        vision_config=dict(hidden_size=64, intermediate_size=256,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=224, patch_size=32))
    torch.manual_seed(3)
    ok &= verify_clip_hf(transformers.CLIPModel(hf_cfg))

    from tests.test_fullshape_parity import _torch_fid_inception
    torch.manual_seed(4)
    inc_net = _torch_fid_inception()
    with torch.no_grad():   # randomize BN stats so eval-mode math is real
        for m in inc_net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
    ok &= verify_inception(
        {k: v.detach().numpy() for k, v in inc_net.state_dict().items()})
    torch.manual_seed(5)
    vgg_net = _torch_vgg16_features()
    ok &= verify_vgg16(
        {k: v.detach().numpy() for k, v in vgg_net.state_dict().items()})

    from transformers import SwinConfig as HFSwinConfig
    from transformers import SwinModel
    torch.manual_seed(6)
    swin_hf = SwinModel(HFSwinConfig(
        image_size=32, patch_size=4, embed_dim=24, depths=[2, 2],
        num_heads=[2, 4], window_size=4, num_channels=3,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0))
    ok &= verify_swin_hf(swin_hf)

    ok &= verify_mtcnn(MTCNN_WEIGHTS)   # real in-tree pretrained weights

    from restyle_encoders.encoders import psp_encoders
    import types as _types
    torch.manual_seed(7)
    psp_net = psp_encoders.GradualStyleEncoder(
        50, "ir_se", _types.SimpleNamespace(stylegan_size=256))
    psp_sd = {k: v.detach().numpy() for k, v in psp_net.state_dict().items()}
    ok &= verify_encoder(psp_sd, "psp", stylegan_size=256)
    ok &= verify_encoder(psp_sd, "e4e", stylegan_size=256)

    # reference-schema adaptation ckpt (random s_delta heads) -> tmp .pt
    import tempfile

    # core.utils.common imports dlib/clip at module scope (unused by the
    # parametrization heads); stub them so the reference class imports.
    import types as _t
    for _m in ("dlib", "clip", "torchvision", "torchvision.transforms",
               "omegaconf"):
        sys.modules.setdefault(_m, _t.ModuleType(_m))
    sys.modules["torchvision"].transforms = \
        sys.modules["torchvision.transforms"]
    if not hasattr(sys.modules["omegaconf"], "MISSING"):
        sys.modules["omegaconf"].MISSING = "???"
    from core.parametrizations import BaseParametrization
    from gagan_tpu.params.mappers import conv_dimensions
    from gagan_tpu.models.stylegan2 import GeneratorConfig
    torch.manual_seed(8)
    dims = conv_dimensions(GeneratorConfig(img_resolution=64).synthesis)
    par = BaseParametrization("s_delta", dims)
    with torch.no_grad():
        for p in par.parameters():
            p.normal_(0, 0.05)
    with tempfile.NamedTemporaryFile(suffix=".pt", delete=False) as f:
        torch.save({"model_type": "parametrization", "patch_key": "s_delta",
                    "state_dict": par.state_dict(),
                    "sg2_params": {"img_size": 64}}, f.name)
        ok &= verify_adaptation(f.name)
    os.unlink(f.name)

    # restyle iterative-encoder fixture (ResNet34 backbone via the
    # torchvision stub; IR variants share verify_encoder's backbone).
    from tests.oracle import install_torchvision_stub

    install_torchvision_stub()
    from restyle_encoders.encoders import restyle_psp_encoders
    torch.manual_seed(9)
    rnet = restyle_psp_encoders.ResNetBackboneEncoder(
        n_styles=14, opts=_types.SimpleNamespace(input_nc=6))
    ok &= verify_restyle({
        "state_dict": {f"encoder.{k}": v
                       for k, v in rnet.state_dict().items()},
        "opts": {"encoder_type": "ResNetBackboneEncoder",
                 "output_size": 256, "input_nc": 6},
        "latent_avg": torch.randn(512),
    }, size=256)

    # lpips-alex fixture: hand-built tower in the lpips state_dict layout.
    torch.manual_seed(10)
    alex_sd = {}
    slice_of = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    from gagan_tpu.metrics.alexnet import ALEX_CONVS, LPIPS_CHANNELS
    for idx, (in_c, out_c, k, _, _) in ALEX_CONVS.items():
        alex_sd[f"net.slice{slice_of[idx]}.{idx}.weight"] = \
            torch.randn(out_c, in_c, k, k) * 0.05
        alex_sd[f"net.slice{slice_of[idx]}.{idx}.bias"] = \
            torch.zeros(out_c)
    for i, c in enumerate(LPIPS_CHANNELS):
        alex_sd[f"lin{i}.model.1.weight"] = torch.rand(1, c, 1, 1) * 0.2
    ok &= verify_lpips_alex(alex_sd)
    return ok


def _load_torch_sd(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("g_ema", "state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
            for k, v in obj.items()}


def main():
    import jax

    # torch-CPU comparisons: force jax onto CPU BEFORE any backend query
    # (jax.default_backend() would initialize and pin the axon TPU plugin),
    # and use highest matmul precision like tests/conftest.py — the TPU
    # default (bf16 passes) would turn exact comparisons into 1e-2 noise.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", help="checkpoint file")
    ap.add_argument("--kind", choices=["rosinality", "nvlabs", "clip-hf",
                                       "inception", "vgg16", "swin-hf",
                                       "mtcnn", "psp", "e4e", "adaptation",
                                       "restyle", "lpips-alex"])
    ap.add_argument("--size", type=int, default=1024,
                    help="rosinality generator / encoder stylegan size")
    ap.add_argument("--self-test", action="store_true")
    ap.add_argument("--json", metavar="PATH",
                    help="write the machine-readable report here")
    args = ap.parse_args()

    def finish(ok):
        if args.json:
            import json

            with open(args.json, "w") as f:
                json.dump({"pass": bool(ok), "results": RESULTS}, f,
                          indent=1)
            print(f"report -> {args.json}")
        sys.exit(0 if ok else 1)

    if args.self_test:
        ok = self_test()
        print("SELF-TEST", "PASS" if ok else "FAIL")
        finish(ok)

    if args.kind == "mtcnn":
        finish(verify_mtcnn(args.ckpt or MTCNN_WEIGHTS))
    if not args.ckpt or not args.kind:
        ap.error("CKPT and --kind required (or --self-test)")

    if args.kind == "rosinality":
        ok = verify_rosinality(_load_torch_sd(args.ckpt), size=args.size)
    elif args.kind == "nvlabs":
        sys.path.insert(0, "/root/reference/DissimilarDomains")
        import dnnlib  # noqa: F401  (legacy unpickles into these modules)
        import legacy

        with open(args.ckpt, "rb") as f:
            data = legacy.load_network_pkl(f)
        ok = verify_nvlabs(data["G_ema"])
    elif args.kind == "clip-hf":
        import transformers

        ok = verify_clip_hf(transformers.CLIPModel.from_pretrained(args.ckpt))
    elif args.kind == "swin-hf":
        import transformers

        ok = verify_swin_hf(transformers.SwinModel.from_pretrained(args.ckpt))
    elif args.kind in ("psp", "e4e"):
        ok = verify_encoder(_load_torch_sd(args.ckpt), args.kind,
                            stylegan_size=args.size)
    elif args.kind == "restyle":
        import torch

        ok = verify_restyle(
            torch.load(args.ckpt, map_location="cpu", weights_only=False),
            size=args.size)
    elif args.kind == "lpips-alex":
        import torch

        ok = verify_lpips_alex(
            torch.load(args.ckpt, map_location="cpu", weights_only=False))
    elif args.kind == "adaptation":
        ok = verify_adaptation(args.ckpt)
    elif args.kind == "inception":
        ok = verify_inception(_load_torch_sd(args.ckpt))
    else:
        ok = verify_vgg16(_load_torch_sd(args.ckpt))
    finish(ok)


if __name__ == "__main__":
    main()
