"""pSp / e4e image->W+ encoders in JAX.

Port of the reference ReStyle encoder stack
(`SimilarDomains/restyle_encoders/encoders/psp_encoders.py:57-200`,
`helpers.py:57-120` — the TreB1eN ArcFace IR-SE backbone with FPN-style
GradualStyle heads).  Parameter names mirror the torch state_dict
(input_layer.0.weight, body.N.res_layer.3.weight, styles.N.convs.0.weight,
latlayer1.weight, ...) so pretrained e4e/pSp checkpoints convert by the
generic nest map in tools/convert_weights.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# IR-50 block plan (helpers.get_blocks(50)): (in, depth, stride) per unit.
def ir50_blocks() -> List[Tuple[int, int, int]]:
    plan = []
    for in_c, depth, n_units in [(64, 64, 3), (64, 128, 4), (128, 256, 14),
                                 (256, 512, 3)]:
        plan.append((in_c, depth, 2))
        plan.extend((depth, depth, 1) for _ in range(n_units - 1))
    return plan


# Feature-tap block indices (psp_encoders.py:100-107): c1@6, c2@20, c3@23.
TAPS = {6: "c1", 20: "c2", 23: "c3"}


def _conv(x, w, stride=1, padding=0, bias=None):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if bias is not None:
        y = y + bias[None, :, None, None].astype(x.dtype)
    return y


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["running_var"] + eps)
    return ((x - p["running_mean"][None, :, None, None])
            * inv[None, :, None, None] * p["weight"][None, :, None, None]
            + p["bias"][None, :, None, None])


def _prelu(p, x):
    a = p["weight"][None, :, None, None]
    return jnp.where(x >= 0, x, a * x)


def _se_module(p, x):
    """Squeeze-excitation (helpers.py:57-74)."""
    s = jnp.mean(x, axis=(2, 3), keepdims=True)
    s = _conv(s, p["fc1"]["weight"])
    s = jax.nn.relu(s)
    s = _conv(s, p["fc2"]["weight"])
    return x * jax.nn.sigmoid(s)


def _bottleneck_ir_se(p, x, in_c, depth, stride):
    """(helpers.py:98-120): shortcut (maxpool-1/stride or 1x1conv+bn) +
    res (bn, conv3, prelu, conv3-stride, bn, se)."""
    if in_c == depth:
        # MaxPool2d(1, stride) == strided identity.
        shortcut = x[:, :, ::stride, ::stride]
    else:
        shortcut = _bn(p["shortcut_layer"]["1"],
                       _conv(x, p["shortcut_layer"]["0"]["weight"],
                             stride=stride))
    r = p["res_layer"]
    y = _bn(r["0"], x)
    y = _conv(y, r["1"]["weight"], padding=1)
    y = _prelu(r["2"], y)
    y = _conv(y, r["3"]["weight"], stride=stride, padding=1)
    y = _bn(r["4"], y)
    if "5" in r:                      # SE module (ir_se mode)
        y = _se_module(r["5"], y)
    return y + shortcut


def backbone_features(params: Params, x: jax.Array,
                      want_final: bool = False) -> Dict[str, jax.Array]:
    """Input [N,3,256,256] in [-1,1] -> {'c1','c2','c3'} feature maps.

    With ``want_final`` the dict also carries 'final' — the 512x16x16 map
    after the last bottleneck, which the ReStyle Backbone/Progressive
    encoders feed to every style head (restyle_psp_encoders.py:43-50)."""
    il = params["input_layer"]
    x = _conv(x, il["0"]["weight"], padding=1)
    x = _bn(il["1"], x)
    x = _prelu(il["2"], x)
    feats = {}
    for i, (in_c, depth, stride) in enumerate(ir50_blocks()):
        x = _bottleneck_ir_se(params["body"][str(i)], x, in_c, depth, stride)
        if i in TAPS:
            feats[TAPS[i]] = x
    if want_final:
        feats["final"] = x
    return feats


def _gradual_style_block(p, x, spatial: int):
    """(psp_encoders.py:34-55): log2(spatial) stride-2 convs + EqualLinear."""
    num_pools = int(np.log2(spatial))
    for i in range(num_pools):
        c = p["convs"][str(2 * i)]
        x = _conv(x, c["weight"], stride=2, padding=1, bias=c["bias"])
        x = jnp.where(x >= 0, x, 0.01 * x)       # nn.LeakyReLU default
    x = x.reshape(x.shape[0], -1)
    lin = p["linear"]
    scale = 1.0 / np.sqrt(x.shape[1])
    return x @ (lin["weight"].T * scale) + lin["bias"]


def _upsample_add(x, y):
    """(helpers.py _upsample_add): bilinear-upsample x to y's size, add."""
    n, c, h, w = y.shape
    x_up = jax.image.resize(x, (x.shape[0], x.shape[1], h, w),
                            method="bilinear")
    return x_up + y


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    stylegan_size: int = 1024
    mode: str = "ir_se"
    coarse_ind: int = 3
    middle_ind: int = 7

    @property
    def style_count(self) -> int:
        return 2 * int(np.log2(self.stylegan_size)) - 2


def psp_encode(cfg: EncoderConfig, params: Params, x: jax.Array) -> jax.Array:
    """GradualStyleEncoder forward (psp_encoders.py:95-121) -> [N, L, 512]."""
    f = backbone_features(params, x)
    c1, c2, c3 = f["c1"], f["c2"], f["c3"]
    latents = []
    for j in range(cfg.coarse_ind):
        latents.append(_gradual_style_block(params["styles"][str(j)], c3, 16))
    p2 = _upsample_add(c3, _conv(c2, params["latlayer1"]["weight"],
                                 bias=params["latlayer1"]["bias"]))
    for j in range(cfg.coarse_ind, cfg.middle_ind):
        latents.append(_gradual_style_block(params["styles"][str(j)], p2, 32))
    p1 = _upsample_add(p2, _conv(c1, params["latlayer2"]["weight"],
                                 bias=params["latlayer2"]["bias"]))
    for j in range(cfg.middle_ind, cfg.style_count):
        latents.append(_gradual_style_block(params["styles"][str(j)], p1, 64))
    return jnp.stack(latents, axis=1)


def e4e_encode(cfg: EncoderConfig, params: Params, x: jax.Array,
               stage: int = None) -> jax.Array:
    """Encoder4Editing forward (psp_encoders.py:172-200): w0 broadcast +
    progressive deltas."""
    stage = cfg.style_count if stage is None else stage
    f = backbone_features(params, x)
    c1, c2, c3 = f["c1"], f["c2"], f["c3"]
    w0 = _gradual_style_block(params["styles"]["0"], c3, 16)
    ws = [w0]
    features = c3
    spatial = 16
    p2 = p1 = None
    for i in range(1, min(stage + 1, cfg.style_count)):
        if i == cfg.coarse_ind:
            p2 = _upsample_add(c3, _conv(c2, params["latlayer1"]["weight"],
                                         bias=params["latlayer1"]["bias"]))
            features, spatial = p2, 32
        elif i == cfg.middle_ind:
            p1 = _upsample_add(p2, _conv(c1, params["latlayer2"]["weight"],
                                         bias=params["latlayer2"]["bias"]))
            features, spatial = p1, 64
        delta = _gradual_style_block(params["styles"][str(i)], features,
                                     spatial)
        ws.append(w0 + delta)
    while len(ws) < cfg.style_count:
        ws.append(w0)
    return jnp.stack(ws, axis=1)


def encode_image_to_wplus(cfg: EncoderConfig, params: Params,
                          images: jax.Array, latent_avg=None,
                          kind: str = "e4e") -> jax.Array:
    """Full psp/e4e wrapper (psp.py:49/e4e.py:31): resize to 256, encode,
    add latent_avg."""
    x = images.astype(jnp.float32)
    if x.shape[2:] != (256, 256):
        x = jax.image.resize(x, x.shape[:2] + (256, 256), method="bilinear")
    ws = psp_encode(cfg, params, x) if kind == "psp" else \
        e4e_encode(cfg, params, x)
    if latent_avg is not None:
        ws = ws + latent_avg[None]
    return ws


# ----------------------------------------------------------------------------
# Initialization (random; pretrained ckpts convert via tools/convert_weights).


def _init_conv(key, o, i, k, bias=False):
    p = {"weight": jax.random.normal(key, (o, i, k, k)) * 0.05}
    if bias:
        p["bias"] = jnp.zeros((o,))
    return p


def _init_bn_params(n):
    return {"weight": jnp.ones((n,)), "bias": jnp.zeros((n,)),
            "running_mean": jnp.zeros((n,)), "running_var": jnp.ones((n,))}


def init_encoder(key, cfg: EncoderConfig) -> Params:
    ks = iter(jax.random.split(key, 400))
    p: Params = {
        "input_layer": {
            "0": _init_conv(next(ks), 64, 3, 3),
            "1": _init_bn_params(64),
            "2": {"weight": jnp.full((64,), 0.25)},
        },
        "body": {},
        "styles": {},
        "latlayer1": _init_conv(next(ks), 512, 256, 1, bias=True),
        "latlayer2": _init_conv(next(ks), 512, 128, 1, bias=True),
    }
    for i, (in_c, depth, stride) in enumerate(ir50_blocks()):
        blk: Params = {"res_layer": {
            "0": _init_bn_params(in_c),
            "1": _init_conv(next(ks), depth, in_c, 3),
            "2": {"weight": jnp.full((depth,), 0.25)},
            "3": _init_conv(next(ks), depth, depth, 3),
            "4": _init_bn_params(depth),
        }}
        if cfg.mode == "ir_se":
            blk["res_layer"]["5"] = {
                "fc1": _init_conv(next(ks), depth // 16, depth, 1),
                "fc2": _init_conv(next(ks), depth, depth // 16, 1),
            }
        if in_c != depth:
            blk["shortcut_layer"] = {
                "0": _init_conv(next(ks), depth, in_c, 1),
                "1": _init_bn_params(depth),
            }
        p["body"][str(i)] = blk
    for j in range(cfg.style_count):
        spatial = 16 if j < cfg.coarse_ind else (
            32 if j < cfg.middle_ind else 64)
        num_pools = int(np.log2(spatial))
        convs = {}
        for i in range(num_pools):
            convs[str(2 * i)] = _init_conv(
                next(ks), 512, 512, 3, bias=True)
        p["styles"][str(j)] = {
            "convs": convs,
            "linear": {"weight": jax.random.normal(next(ks), (512, 512)),
                       "bias": jnp.zeros((512,))},
        }
    return p
