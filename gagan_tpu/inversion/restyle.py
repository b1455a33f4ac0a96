"""ReStyle iterative encoders (pSp + e4e variants) in JAX.

Port of the reference ReStyle stack:

* simplified single-map encoders — every style head reads the final
  512x16x16 feature map — over the IR-SE-50 or ResNet34 backbone
  (`SimilarDomains/restyle_encoders/encoders/restyle_psp_encoders.py:10-93`,
  `restyle_e4e_encoders.py:32-149`);
* the FPN (pSp GradualStyle) encoders over both backbones
  (`fpn_encoders.py:11-159`);
* the avg-image-conditioned iterative inference protocol — 6-channel input
  [image ; previous reconstruction], residual latent accumulation, 5
  iterations (`core/utils/example_utils.py:135-170` `get_avg_image` /
  `run_on_batch`, `restyle_encoders/psp.py:93-141` / `e4e_restyle.py:52-100`
  forward).

Parameter names mirror the torch state_dicts (conv1.weight, body.N.conv1,
styles.N.convs.0, latlayer1, ...) so published restyle checkpoints convert
via `tools/convert_weights.py::convert_restyle`.

TPU notes: the 5-iteration loop re-runs encoder+generator with identical
shapes, so one jitted step is compiled once and reused; all iterations run
batched (no per-image Python), and the 256-pool is a reshape-mean.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gagan_tpu.inversion import encoders as enc
from gagan_tpu.models import stylegan2 as sg2

Params = Dict[str, Any]

ENCODER_TYPES = (
    "BackboneEncoder",                    # restyle pSp, IR-SE-50
    "ResNetBackboneEncoder",              # restyle pSp, ResNet34
    "ProgressiveBackboneEncoder",         # restyle e4e, IR-SE-50
    "ResNetProgressiveBackboneEncoder",   # restyle e4e, ResNet34
    "GradualStyleEncoder",                # pSp FPN, IR-SE-50
    "ResNetGradualStyleEncoder",          # pSp FPN, ResNet34
)

# torchvision resnet34: layers [3, 4, 6, 3] of BasicBlocks; the reference
# flattens layer1..layer4 into one `body` Sequential (indices 0..15) and
# SKIPS resnet's maxpool, so 256 input -> conv1/2 -> 128 -> strides at the
# first block of layers 2-4 -> final 512x16x16.
def resnet34_blocks() -> List[Tuple[int, int, int]]:
    plan = []
    for in_c, depth, n_units in [(64, 64, 3), (64, 128, 4), (128, 256, 6),
                                 (256, 512, 3)]:
        stride = 1 if in_c == depth else 2
        plan.append((in_c, depth, stride))
        plan.extend((depth, depth, 1) for _ in range(n_units - 1))
    return plan


# FPN taps for the ResNet34 body (fpn_encoders.py:140-145): c1 after
# layer2 (body.6, 128ch@64), c2 after layer3 (body.12, 256ch@32), c3 after
# layer4 (body.15, 512ch@16).
RESNET_TAPS = {6: "c1", 12: "c2", 15: "c3"}


def _basic_block(p: Params, x: jax.Array, in_c: int, depth: int,
                 stride: int) -> jax.Array:
    """torchvision BasicBlock: conv3-bn-relu-conv3-bn + (downsampled) skip."""
    y = enc._conv(x, p["conv1"]["weight"], stride=stride, padding=1)
    y = enc._bn(p["bn1"], y)
    y = jax.nn.relu(y)
    y = enc._conv(y, p["conv2"]["weight"], padding=1)
    y = enc._bn(p["bn2"], y)
    if "downsample" in p:
        x = enc._bn(p["downsample"]["1"],
                    enc._conv(x, p["downsample"]["0"]["weight"],
                              stride=stride))
    return jax.nn.relu(y + x)


def resnet34_features(params: Params, x: jax.Array,
                      want_taps: bool = False) -> Dict[str, jax.Array]:
    """conv1(7x7/2) + bn + PReLU + flattened BasicBlock body (no maxpool,
    restyle_psp_encoders.py:61-76).  Returns {'final'} and, with
    ``want_taps``, the FPN taps {'c1','c2','c3'}."""
    x = enc._conv(x, params["conv1"]["weight"], stride=2, padding=3)
    x = enc._bn(params["bn1"], x)
    x = enc._prelu(params["relu"], x)
    feats = {}
    for i, (in_c, depth, stride) in enumerate(resnet34_blocks()):
        x = _basic_block(params["body"][str(i)], x, in_c, depth, stride)
        if want_taps and i in RESNET_TAPS:
            feats[RESNET_TAPS[i]] = x
    feats["final"] = x
    return feats


@dataclasses.dataclass(frozen=True)
class RestyleEncoderConfig:
    """Shapes of one ReStyle encoder tower.

    ``input_nc=6`` is the iterative-protocol default (image stacked with
    the previous reconstruction); single-pass pSp/e4e use 3.
    """
    encoder_type: str = "ProgressiveBackboneEncoder"
    stylegan_size: int = 1024
    input_nc: int = 6
    mode: str = "ir_se"       # IR backbones: 'ir' or 'ir_se'
    coarse_ind: int = 3       # FPN variants only
    middle_ind: int = 7

    def __post_init__(self):
        assert self.encoder_type in ENCODER_TYPES, self.encoder_type

    @property
    def style_count(self) -> int:
        return 2 * int(np.log2(self.stylegan_size)) - 2

    @property
    def is_resnet(self) -> bool:
        return self.encoder_type.startswith("ResNet")

    @property
    def is_progressive(self) -> bool:
        return "Progressive" in self.encoder_type

    @property
    def is_fpn(self) -> bool:
        return "GradualStyle" in self.encoder_type


def _styles_from_final(cfg: RestyleEncoderConfig, params: Params,
                       x: jax.Array, stage: Optional[int] = None,
                       ) -> jax.Array:
    """Single-map style heads (restyle_psp_encoders.py:43-50 /
    restyle_e4e_encoders.py:76-89): all heads read the final 16x16 map;
    progressive variants emit w0 + per-layer deltas.

    ``stage`` (progressive variants): deltas are learned only up to the
    current ProgressiveStage — layers beyond it repeat w0
    (restyle_e4e_encoders.py:85-88; Inference == all layers)."""
    if cfg.is_progressive:
        stage = cfg.style_count if stage is None else stage
        w0 = enc._gradual_style_block(params["styles"]["0"], x, 16)
        ws = [w0]
        for i in range(1, cfg.style_count):
            if i < min(stage + 1, cfg.style_count):
                delta = enc._gradual_style_block(params["styles"][str(i)],
                                                 x, 16)
                ws.append(w0 + delta)
            else:
                ws.append(w0)
        return jnp.stack(ws, axis=1)
    latents = [enc._gradual_style_block(params["styles"][str(j)], x, 16)
               for j in range(cfg.style_count)]
    return jnp.stack(latents, axis=1)


def _fpn_styles(cfg: RestyleEncoderConfig, params: Params,
                feats: Dict[str, jax.Array]) -> jax.Array:
    """GradualStyle FPN heads (fpn_encoders.py:56-82/131-159)."""
    c1, c2, c3 = feats["c1"], feats["c2"], feats["c3"]
    latents = []
    for j in range(cfg.coarse_ind):
        latents.append(
            enc._gradual_style_block(params["styles"][str(j)], c3, 16))
    p2 = enc._upsample_add(c3, enc._conv(c2, params["latlayer1"]["weight"],
                                         bias=params["latlayer1"]["bias"]))
    for j in range(cfg.coarse_ind, cfg.middle_ind):
        latents.append(
            enc._gradual_style_block(params["styles"][str(j)], p2, 32))
    p1 = enc._upsample_add(p2, enc._conv(c1, params["latlayer2"]["weight"],
                                         bias=params["latlayer2"]["bias"]))
    for j in range(cfg.middle_ind, cfg.style_count):
        latents.append(
            enc._gradual_style_block(params["styles"][str(j)], p1, 64))
    return jnp.stack(latents, axis=1)


def restyle_encode(cfg: RestyleEncoderConfig, params: Params,
                   x: jax.Array, stage: Optional[int] = None) -> jax.Array:
    """Encoder forward: [N, input_nc, 256, 256] -> [N, style_count, 512].

    ``stage`` limits learned deltas on the progressive variants (the
    e4e_modules ProgressiveStage training schedule); None == Inference."""
    if cfg.is_resnet:
        feats = resnet34_features(params, x, want_taps=cfg.is_fpn)
    else:
        feats = enc.backbone_features(params, x, want_final=True)
    if cfg.is_fpn:
        return _fpn_styles(cfg, params, feats)
    return _styles_from_final(cfg, params, feats["final"], stage=stage)


# ----------------------------------------------------------------------------
# Iterative inference protocol.


def adaptive_avg_pool(img: jax.Array, size: int = 256) -> jax.Array:
    """AdaptiveAvgPool2d((size, size)) for divisible inputs — the psp/e4e
    face_pool (psp.py:58).  Reshape-mean, no gather."""
    n, c, h, w = img.shape
    if h == size and w == size:
        return img
    assert h % size == 0 and w % size == 0, (h, w, size)
    fh, fw = h // size, w // size
    return img.reshape(n, c, size, fh, size, fw).mean(axis=(3, 5))


@dataclasses.dataclass(frozen=True)
class RestyleNet:
    """Encoder + frozen SG2 decoder + latent_avg: the pSp/e4e wrapper
    (restyle_encoders/psp.py:50-141, e4e_restyle.py:14-100) as data."""
    enc_cfg: RestyleEncoderConfig
    enc_params: Params
    g_cfg: sg2.GeneratorConfig
    g_params: Params
    latent_avg: jax.Array            # [style_count, 512]

    def decode(self, codes: jax.Array, resize: bool = True) -> jax.Array:
        img = sg2.synthesis_apply(self.g_cfg.synthesis,
                                  self.g_params["synthesis"], codes,
                                  noise_mode="const")
        return adaptive_avg_pool(img) if resize else img

    def forward(self, x: jax.Array, latent: Optional[jax.Array] = None,
                resize: bool = True) -> Tuple[jax.Array, jax.Array]:
        """One restyle iteration (psp.py:93-141): codes = encoder(x) +
        (previous latent | latent_avg); decode.  Returns (images, codes)."""
        codes = restyle_encode(self.enc_cfg, self.enc_params, x)
        prev = self.latent_avg[None] if latent is None else latent
        codes = codes + prev
        return self.decode(codes, resize=resize), codes


def get_avg_image(net: RestyleNet) -> jax.Array:
    """The average-latent reconstruction that seeds iteration 0
    (example_utils.py:135-141): decode latent_avg, face-pool to 256."""
    return net.decode(net.latent_avg[None])[0]


def run_on_batch(net: RestyleNet, inputs: jax.Array, n_iters: int = 5,
                 resize_outputs: bool = False,
                 ) -> Tuple[List[jax.Array], List[jax.Array]]:
    """The ReStyle iterative protocol (example_utils.py:144-170): seed with
    [inputs ; avg image], accumulate residual latents for ``n_iters``
    rounds (opts.n_iters_per_batch = 5).  Returns per-iteration lists of
    images [N,3,H,W] and latents [N,L,512] — index [-1] is the result.

    The per-iteration program is shape-stable, so the jitted step compiles
    once; the whole batch rides each pass (no per-image loop).  Weights
    travel as jit ARGUMENTS — a closure-held tree would bake the encoder +
    generator params into the executable as literals."""
    assert inputs.shape[1] == 3 and inputs.shape[2:] == (256, 256), \
        inputs.shape
    enc_cfg, g_cfg = net.enc_cfg, net.g_cfg

    @jax.jit
    def step(enc_params, g_params, inputs, y_hat256, latent):
        x = jnp.concatenate([inputs, y_hat256], axis=1)
        codes = restyle_encode(enc_cfg, enc_params, x) + latent
        img = sg2.synthesis_apply(g_cfg.synthesis, g_params["synthesis"],
                                  codes, noise_mode="const")
        out = adaptive_avg_pool(img) if resize_outputs else img
        return out, codes, adaptive_avg_pool(img)

    avg = get_avg_image(net)
    y_hat = jnp.broadcast_to(avg[None], inputs.shape)
    latent = jnp.broadcast_to(net.latent_avg[None],
                              (inputs.shape[0],) + net.latent_avg.shape)
    images, latents = [], []
    for _ in range(n_iters):
        img, latent, y_hat = step(net.enc_params, net.g_params, inputs,
                                  y_hat, latent)
        images.append(img)
        latents.append(latent)
    return images, latents


# ----------------------------------------------------------------------------
# Initialization (random; pretrained ckpts convert via tools/convert_weights).


def _init_resnet34(key) -> Params:
    ks = iter(jax.random.split(key, 80))
    p: Params = {
        "conv1": enc._init_conv(next(ks), 64, 6, 7),
        "bn1": enc._init_bn_params(64),
        "relu": {"weight": jnp.full((64,), 0.25)},
        "body": {},
    }
    for i, (in_c, depth, stride) in enumerate(resnet34_blocks()):
        blk: Params = {
            "conv1": enc._init_conv(next(ks), depth, in_c, 3),
            "bn1": enc._init_bn_params(depth),
            "conv2": enc._init_conv(next(ks), depth, depth, 3),
            "bn2": enc._init_bn_params(depth),
        }
        if stride != 1 or in_c != depth:
            blk["downsample"] = {
                "0": enc._init_conv(next(ks), depth, in_c, 1),
                "1": enc._init_bn_params(depth),
            }
        p["body"][str(i)] = blk
    return p


def _init_style_heads(key, cfg: RestyleEncoderConfig) -> Params:
    ks = iter(jax.random.split(key, 8 * cfg.style_count + 4))
    styles: Params = {}
    for j in range(cfg.style_count):
        if cfg.is_fpn:
            spatial = 16 if j < cfg.coarse_ind else (
                32 if j < cfg.middle_ind else 64)
        else:
            spatial = 16
        convs = {str(2 * i): enc._init_conv(next(ks), 512, 512, 3, bias=True)
                 for i in range(int(np.log2(spatial)))}
        styles[str(j)] = {
            "convs": convs,
            "linear": {"weight": jax.random.normal(next(ks), (512, 512)),
                       "bias": jnp.zeros((512,))},
        }
    return styles


def load_net(path: str) -> RestyleNet:
    """Load a converted ReStyle npz (tools/convert_weights.py::convert_restyle
    — {enc/<k>, dec/<k>, latent_avg, __config__}) into a ready RestyleNet."""
    import json

    from gagan_tpu.utils import checkpoint as ckpt_lib

    with np.load(path) as z:
        meta = json.loads(bytes(z["__config__"]).decode())
        enc_flat = {k[len("enc/"):]: z[k] for k in z.files
                    if k.startswith("enc/")}
        dec_flat = {k[len("dec/"):]: z[k] for k in z.files
                    if k.startswith("dec/")}
        latent_avg = z["latent_avg"] if "latent_avg" in z.files else None
    size = int(meta["output_size"])
    enc_cfg = RestyleEncoderConfig(encoder_type=meta["encoder_type"],
                                   stylegan_size=size,
                                   input_nc=int(meta.get("input_nc", 6)))
    # The decoder is a rosinality config-f Generator (psp.py:57):
    # channel_multiplier=2 == channel_base 32768, 8-layer mapping, lr-mul
    # 0.01 on the mapping.
    g_cfg = sg2.GeneratorConfig(
        img_resolution=size,
        mapping=sg2.MappingConfig(num_layers=8, lr_multiplier=0.01),
        synthesis=sg2.SynthesisConfig(channel_base=32768, channel_max=512))
    if latent_avg is None:
        latent_avg = np.zeros((enc_cfg.style_count, 512), np.float32)
    return RestyleNet(
        enc_cfg=enc_cfg,
        enc_params=ckpt_lib.flat_to_tree(enc_flat),
        g_cfg=g_cfg,
        g_params=ckpt_lib.flat_to_tree(dec_flat),
        latent_avg=jnp.asarray(latent_avg))


def init_restyle_encoder(key, cfg: RestyleEncoderConfig) -> Params:
    k_body, k_heads, k_lat = jax.random.split(key, 3)
    if cfg.is_resnet:
        p = _init_resnet34(k_body)
        if cfg.input_nc != 6:
            p["conv1"] = enc._init_conv(k_body, 64, cfg.input_nc, 7)
    else:
        base = enc.init_encoder(
            k_body, enc.EncoderConfig(stylegan_size=cfg.stylegan_size,
                                      mode=cfg.mode))
        p = {"input_layer": base["input_layer"], "body": base["body"]}
        p["input_layer"]["0"] = enc._init_conv(k_body, 64, cfg.input_nc, 3)
    p["styles"] = _init_style_heads(k_heads, cfg)
    if cfg.is_fpn:
        p["latlayer1"] = enc._init_conv(k_lat, 512, 256, 1, bias=True)
        p["latlayer2"] = enc._init_conv(
            jax.random.fold_in(k_lat, 1), 512, 128, 1, bias=True)
    return p
