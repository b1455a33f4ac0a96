"""Offline weight converters: PyTorch checkpoints -> gagan_tpu npz.

Covers the reference's checkpoint zoo (torch is used on CPU as a conversion
tool only; the framework itself never imports it):

  * rosinality StyleGAN2 .pt (`SimilarDomains/gan_models/StyleGAN2/model.py`,
    the `g_ema` key of stylegan2-ffhq-config-f.pt etc.) -> snapshot npz.
    The name/value mapping mirrors the correspondence the reference documents
    in `core/utils/karras_to_rosinality.py` (inverted): rosinality
    `channel_multiplier=cm` equals NVlabs `channel_base=16384*cm`.
  * NVlabs StyleGAN2-ADA .pkl (network snapshots with source-embedded
    classes) -> snapshot npz.  Unpickling needs the NVlabs/reference
    `torch_utils` importable (pass --reference-path); our pytree naming
    equals the NVlabs state_dict so the map is the identity.
  * HuggingFace CLIP -> clip npz (vit_b_32.npz / vit_b_16.npz).
  * pytorch-fid InceptionV3 / torchvision VGG16 + LPIPS lin weights ->
    detector npz.

Usage:
  python tools/convert_weights.py rosinality --src ckpt.pt --dest out.npz
  python tools/convert_weights.py nvlabs --src snap.pkl --dest out.npz \
      --reference-path /root/reference/DissimilarDomains
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _save_snapshot(dest, g_ema_flat=None, g_flat=None, d_flat=None,
                   config=None):
    arrays = {}
    for name, flat in (("G_ema", g_ema_flat), ("G", g_flat), ("D", d_flat)):
        if flat:
            for k, v in flat.items():
                arrays[f"{name}/{k}"] = np.asarray(v)
    arrays["__config__"] = np.frombuffer(
        json.dumps(config or {}).encode(), dtype=np.uint8)
    np.savez(dest, **arrays)


# ----------------------------------------------------------------------------
# rosinality -> unified


def rosinality_to_flat(sd: dict, size: int, style_dim: int = 512,
                       n_mlp: int = 8) -> dict:
    """rosinality Generator state_dict -> flat NVlabs-style keys."""
    import math

    out = {}
    for i in range(n_mlp):
        # style.0 is PixelNorm; EqualLinear layers start at style.1.
        out[f"mapping.fc{i}.weight"] = sd[f"style.{i + 1}.weight"]
        out[f"mapping.fc{i}.bias"] = sd[f"style.{i + 1}.bias"]
    out["mapping.w_avg"] = np.zeros(style_dim, np.float32)

    out["synthesis.b4.const"] = sd["input.input"][0]

    def conv_entry(prefix, dst, noise_key):
        out[f"{dst}.weight"] = sd[f"{prefix}.conv.weight"][0]
        out[f"{dst}.affine.weight"] = sd[f"{prefix}.conv.modulation.weight"]
        out[f"{dst}.affine.bias"] = sd[f"{prefix}.conv.modulation.bias"]
        out[f"{dst}.noise_strength"] = sd[f"{prefix}.noise.weight"].reshape(())
        out[f"{dst}.bias"] = sd[f"{prefix}.activate.bias"]
        out[f"{dst}.noise_const"] = sd[noise_key][0, 0]

    def torgb_entry(prefix, dst):
        out[f"{dst}.weight"] = sd[f"{prefix}.conv.weight"][0]
        out[f"{dst}.affine.weight"] = sd[f"{prefix}.conv.modulation.weight"]
        out[f"{dst}.affine.bias"] = sd[f"{prefix}.conv.modulation.bias"]
        out[f"{dst}.bias"] = sd[f"{prefix}.bias"].reshape(-1)

    conv_entry("conv1", "synthesis.b4.conv1", "noises.noise_0")
    torgb_entry("to_rgb1", "synthesis.b4.torgb")

    log_size = int(math.log2(size))
    layer_idx = 1
    for block_i, i in enumerate(range(3, log_size + 1)):
        res = 2 ** i
        conv_entry(f"convs.{2 * block_i}", f"synthesis.b{res}.conv0",
                   f"noises.noise_{layer_idx}")
        conv_entry(f"convs.{2 * block_i + 1}", f"synthesis.b{res}.conv1",
                   f"noises.noise_{layer_idx + 1}")
        torgb_entry(f"to_rgbs.{block_i}", f"synthesis.b{res}.torgb")
        layer_idx += 2
    return out


def convert_rosinality(src: str, dest: str, size: int = None,
                       channel_multiplier: int = 2, n_mlp: int = 8,
                       compute_w_avg: bool = True):
    import torch

    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    sd = ckpt.get("g_ema", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    if size is None:
        # Infer from the largest noise buffer.
        noise_res = max(v.shape[-1] for k, v in sd.items()
                        if k.startswith("noises."))
        size = noise_res
    flat = rosinality_to_flat(sd, size, n_mlp=n_mlp)

    config = {
        "g_cfg": {
            "z_dim": 512, "c_dim": 0, "w_dim": 512,
            "img_resolution": size, "img_channels": 3,
            "mapping": {"num_layers": n_mlp, "lr_multiplier": 0.01},
            "synthesis": {"channel_base": 16384 * channel_multiplier,
                          "channel_max": 512},
        }
    }

    if compute_w_avg:
        import jax

        from gagan_tpu.models import stylegan2 as sg2
        from gagan_tpu.utils import checkpoint as ckpt_lib
        from gagan_tpu.utils.config import generator_config_from_dict

        g_cfg = generator_config_from_dict(config["g_cfg"])
        params = ckpt_lib.flat_to_tree(flat)
        z = jax.random.normal(jax.random.PRNGKey(0), (4096, 512))
        ws = sg2.mapping_apply(g_cfg.mapping, params["mapping"], z,
                               broadcast=False)
        flat["mapping.w_avg"] = np.asarray(ws.mean(axis=0))

    _save_snapshot(dest, g_ema_flat=flat, config=config)
    print(f"converted rosinality ckpt ({size}px) -> {dest}")


# ----------------------------------------------------------------------------
# NVlabs pkl -> unified


def convert_nvlabs_pkl(src: str, dest: str, reference_path: str):
    import pickle

    sys.path.insert(0, reference_path)

    with open(src, "rb") as f:
        data = pickle.load(f)

    out = {}
    config = {}
    for name in ("G_ema", "G", "D"):
        module = data.get(name)
        if module is None:
            continue
        out[name] = {k: v.detach().cpu().numpy()
                     for k, v in module.state_dict().items()
                     if not any(k.endswith(s) for s in
                                ("resample_filter", ".ones", ".ones_weights",
                                 ".offset_mask"))}
        if name == "G_ema":
            config["g_cfg"] = {
                "z_dim": module.z_dim, "c_dim": module.c_dim,
                "w_dim": module.w_dim,
                "img_resolution": module.img_resolution,
                "img_channels": module.img_channels,
            }
    _save_snapshot(dest, g_ema_flat=out.get("G_ema"), g_flat=out.get("G"),
                   d_flat=out.get("D"), config=config)
    print(f"converted NVlabs pkl -> {dest}")


# ----------------------------------------------------------------------------
# CLIP / detectors


def convert_hf_clip(src: str, dest: str):
    """src: HF model dir or name (must be locally cached; zero-egress)."""
    import transformers

    from gagan_tpu.clip.convert import from_hf_state_dict
    from gagan_tpu.utils.checkpoint import tree_to_flat

    model = transformers.CLIPModel.from_pretrained(src)
    params = from_hf_state_dict(
        {k: v.detach().numpy() for k, v in model.state_dict().items()})
    np.savez(dest, **tree_to_flat(jax_tree_to_np(params)))
    print(f"converted HF CLIP -> {dest}")


def convert_openai_clip(src: str, dest: str):
    """src: OpenAI CLIP .pt (jit archive or state dict)."""
    import torch

    from gagan_tpu.clip.convert import from_openai_state_dict
    from gagan_tpu.utils.checkpoint import tree_to_flat

    try:
        model = torch.jit.load(src, map_location="cpu")
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
    except RuntimeError:
        sd = {k: v.numpy()
              for k, v in torch.load(src, map_location="cpu").items()}
    params = from_openai_state_dict(sd)
    np.savez(dest, **tree_to_flat(jax_tree_to_np(params)))
    print(f"converted OpenAI CLIP -> {dest}")


def convert_inception(src: str, dest: str):
    """src: pytorch-fid pt_inception-2015-12-05 state dict (.pth)."""
    import torch

    sd = torch.load(src, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    np.savez(dest, **{k: v.numpy() for k, v in sd.items()
                      if "num_batches_tracked" not in k})
    print(f"converted InceptionV3 -> {dest}")


def convert_vgg16(src: str, dest: str, lpips_lin: str = None):
    """src: torchvision vgg16 state dict; lpips_lin: LPIPS vgg lin .pth."""
    import torch

    sd = torch.load(src, map_location="cpu", weights_only=False)
    flat = {k: v.numpy() for k, v in sd.items()}
    if lpips_lin:
        lin = torch.load(lpips_lin, map_location="cpu", weights_only=False)
        for i in range(5):
            w = lin[f"lin{i}.model.1.weight"]
            flat[f"lin.{i}.weight"] = w.numpy().reshape(-1)
    np.savez(dest, **flat)
    print(f"converted VGG16 -> {dest}")


def lpips_alex_to_flat(sd: dict, alexnet_sd: dict = None) -> dict:
    """lpips-package LPIPS(net='alex') weights -> our flat naming
    (`gagan_tpu/metrics/alexnet.py`).

    Accepts either a FULL LPIPS module state_dict (net.sliceK.I.* +
    linI.model.1.weight + scaling_layer.*) or the package's lin-only
    weight file (lpips/weights/v0.1/alex.pth) plus a torchvision AlexNet
    state_dict for the tower.
    """
    def np_of(v):
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    flat = {}
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                flat[f"lin.{i}.weight"] = np_of(sd[key]).reshape(-1)
                break
        else:
            raise KeyError(f"lin{i} weight not found")
    for k, v in sd.items():
        if k.startswith("net.slice"):       # net.sliceK.<tv_idx>.<param>
            _, _, idx, param = k.split(".")
            flat[f"features.{idx}.{param}"] = np_of(v)
    if alexnet_sd is not None:
        for k, v in alexnet_sd.items():
            if k.startswith("features."):
                flat[k] = np_of(v)
    if "scaling_layer.shift" in sd:
        flat["scaling.shift"] = np_of(sd["scaling_layer.shift"]).reshape(-1)
        flat["scaling.scale"] = np_of(sd["scaling_layer.scale"]).reshape(-1)
    missing = [i for i in (0, 3, 6, 8, 10)
               if f"features.{i}.weight" not in flat]
    if missing:
        raise KeyError(f"AlexNet conv weights missing for features "
                       f"{missing}: pass a torchvision alexnet state_dict")
    return flat


def convert_lpips_alex(src: str, dest: str, alexnet_src: str = None):
    """src: lpips LPIPS(net='alex') state_dict (or lin-only alex.pth with
    --alexnet-src torchvision alexnet) -> npz for metrics/alexnet.py."""
    import torch

    sd = torch.load(src, map_location="cpu", weights_only=False)
    alex_sd = None
    if alexnet_src:
        alex_sd = torch.load(alexnet_src, map_location="cpu",
                             weights_only=False)
    np.savez(dest, **lpips_alex_to_flat(sd, alex_sd))
    print(f"converted LPIPS-alex -> {dest}")


def jax_tree_to_np(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


# ----------------------------------------------------------------------------
# ReStyle psp/e4e checkpoints


def restyle_from_torch(ckpt: dict, size: int = None):
    """ReStyle pSp/e4e checkpoint ({state_dict, opts, latent_avg},
    `SimilarDomains/restyle_encoders/psp.py:76-84` / `e4e_restyle.py:36-49`)
    -> (enc_flat, dec_flat, latent_avg, meta).

    The encoder sub-dict maps 1:1 onto our
    `inversion/restyle.py::init_restyle_encoder` tree; the decoder is a
    rosinality Generator (n_mlp=8) handled by `rosinality_to_flat`.
    """
    sd = ckpt["state_dict"]
    opts = ckpt.get("opts", {}) or {}
    if hasattr(opts, "__dict__"):          # Namespace
        opts = dict(vars(opts))
    size = size or int(opts.get("output_size", 1024))

    def np_of(v):
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    enc_flat = {k[len("encoder."):]: np_of(v) for k, v in sd.items()
                if k.startswith("encoder.")
                and "num_batches_tracked" not in k}
    dec_sd = {k[len("decoder."):]: np_of(v) for k, v in sd.items()
              if k.startswith("decoder.")}
    dec_flat = rosinality_to_flat(dec_sd, size=size, n_mlp=8) \
        if dec_sd else {}
    latent_avg = ckpt.get("latent_avg")
    if latent_avg is not None:
        latent_avg = np_of(latent_avg)
        n_styles = 2 * int(np.log2(size)) - 2
        if latent_avg.ndim == 1:           # [512] -> repeat over layers
            latent_avg = np.tile(latent_avg[None], (n_styles, 1))
    meta = {
        "encoder_type": opts.get("encoder_type",
                                 "ProgressiveBackboneEncoder"),
        "output_size": size,
        "input_nc": int(opts.get("input_nc", 6)),
    }
    return enc_flat, dec_flat, latent_avg, meta


def convert_restyle(src: str, dest: str, size: int = None):
    """src: restyle .pt checkpoint -> npz {enc/<k>, dec/<k>, latent_avg,
    __config__}; load back via `gagan_tpu.inversion.restyle.load_net`."""
    import torch

    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    enc_flat, dec_flat, latent_avg, meta = restyle_from_torch(ckpt, size)
    arrays = {f"enc/{k}": v for k, v in enc_flat.items()}
    arrays.update({f"dec/{k}": v for k, v in dec_flat.items()})
    if latent_avg is not None:
        arrays["latent_avg"] = latent_avg
    arrays["__config__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(dest, **arrays)
    print(f"converted ReStyle {meta['encoder_type']} -> {dest}")


# Reference offset-head param name -> our offsets leaf name, per patch_key
# family (`core/parametrizations.py:123-203`; our naming from
# `params/offsets.init_offsets`).
_ADAPT_HEAD_LEAF = {
    "s_delta": {"params_in": "offset"},
    "s_mod": {"params_in": "offset"},
    "w_delta": {"w_offsets": "offset"},
    "w_mod": {"w_offsets": "offset"},
    "cin_mult": {"params_in": "weights_offset"},
    "cin_delta": {"params_in": "weights_offset"},
    "cin_offset": {"params_in": "weights_offset"},
    "cout_mult": {"params_out": "weights_offset"},
    "cfull_mult": {"shift": "weights_offset"},
    "cfull_delta": {"shift": "weights_offset"},
}


def adaptation_from_torch(obj: dict, syn_cfg=None):
    """Reference portable adaptation checkpoint
    ({model_type, patch_key, state_dict, sg2_params},
    `SimilarDomains/core/utils/common.py:343-368`) -> (meta, offsets tree).

    The reference trains one head per conv, named ``heads.conv_{i}`` over the
    rosinality conv list (conv1 + convs[0..], no ToRGBs,
    `core/parametrizations.py:226-229`); our tree keys those convs
    `b{res}.conv{0,1}` in the same order (`params/sparse.conv_layer_names`)
    and keeps the (untrained) torgb heads at zero.
    """
    import jax

    from gagan_tpu.models.stylegan2 import (GeneratorConfig, SynthesisConfig)
    from gagan_tpu.params import offsets as offs_lib
    from gagan_tpu.params.sparse import conv_layer_names

    patch_key = obj.get("patch_key") or obj.get("parametrization")
    if patch_key not in _ADAPT_HEAD_LEAF:
        raise ValueError(f"unsupported patch_key for conversion: {patch_key}")
    leaf_map = _ADAPT_HEAD_LEAF[patch_key]
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v)
          for k, v in obj["state_dict"].items()}

    if syn_cfg is None:
        size = int(obj.get("sg2_params", {}).get("img_size", 1024))
        syn_cfg = GeneratorConfig(img_resolution=size).synthesis
    names = conv_layer_names(syn_cfg)

    spec = offs_lib.OffsetsSpec.from_string(patch_key)
    offsets = offs_lib.init_offsets(jax.random.PRNGKey(0), syn_cfg, spec)
    offsets = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), offsets)

    consumed = 0
    for key, arr in sd.items():
        parts = key.split(".")          # heads.conv_{i}.{param}
        if len(parts) != 3 or parts[0] != "heads":
            continue
        idx = int(parts[1].split("_")[1])
        leaf = leaf_map.get(parts[2])
        if leaf is None or idx >= len(names):
            continue
        dst = offsets[names[idx]][leaf]
        offsets[names[idx]][leaf] = arr.reshape(dst.shape).astype(dst.dtype)
        consumed += 1
    meta = {
        "model_type": obj.get("model_type", "parametrization"),
        "parametrization": patch_key,
        "sg2_params": dict(obj.get("sg2_params", {})),
        "heads_consumed": consumed,
        "heads_expected": sum(1 for k in sd
                              if k.startswith("heads.") and
                              k.split(".")[-1] in leaf_map),
    }
    return meta, offsets


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("rosinality", "nvlabs", "hf_clip", "openai_clip",
                 "inception", "vgg16", "restyle", "lpips_alex"):
        sp = sub.add_parser(name)
        sp.add_argument("--src", required=True)
        sp.add_argument("--dest", required=True)
        if name == "nvlabs":
            sp.add_argument("--reference-path", required=True)
        if name in ("rosinality", "restyle"):
            sp.add_argument("--size", type=int, default=None)
        if name == "lpips_alex":
            sp.add_argument("--alexnet-src", default=None,
                            help="torchvision alexnet state_dict (when src "
                                 "is the lin-only lpips alex.pth)")
            sp.add_argument("--channel-multiplier", type=int, default=2)
        if name == "vgg16":
            sp.add_argument("--lpips-lin", default=None)
    args = p.parse_args()

    if args.cmd == "rosinality":
        convert_rosinality(args.src, args.dest, size=args.size,
                           channel_multiplier=args.channel_multiplier)
    elif args.cmd == "nvlabs":
        convert_nvlabs_pkl(args.src, args.dest, args.reference_path)
    elif args.cmd == "hf_clip":
        convert_hf_clip(args.src, args.dest)
    elif args.cmd == "openai_clip":
        convert_openai_clip(args.src, args.dest)
    elif args.cmd == "inception":
        convert_inception(args.src, args.dest)
    elif args.cmd == "vgg16":
        convert_vgg16(args.src, args.dest, args.lpips_lin)
    elif args.cmd == "restyle":
        convert_restyle(args.src, args.dest, size=args.size)
    elif args.cmd == "lpips_alex":
        convert_lpips_alex(args.src, args.dest, args.alexnet_src)


if __name__ == "__main__":
    main()
