"""VGG16 feature network + LPIPS embedding as pure JAX functions.

Covers both reference uses:
  * `return_features` (4096-d fc features) for Precision/Recall and the
    projector (`metrics/precision_recall.py:37`, `projector.py:85-96`);
  * `return_lpips` (unit-normalized, lin-weighted conv features) for PPL and
    LPIPS distances (`metrics/perceptual_path_length.py:89`,
    `SimilarDomains/core/lpips/networks_basic.py:187`).

Parameter naming mirrors torchvision's VGG16 state_dict (features.N.weight)
plus LPIPS 'lin' weights, so weight conversion is mechanical.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# torchvision VGG16 'D' configuration: conv indices within .features
# (M = maxpool).  Layer indices: 0,2 | 5,7 | 10,12,14 | 17,19,21 | 24,26,28
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
# Last relu of each block (LPIPS taps): relu1_2, relu2_2, relu3_3, relu4_3,
# relu5_3 -> after conv indices 2, 7, 14, 21, 28.
LPIPS_TAPS = [2, 7, 14, 21, 28]
LPIPS_CHANNELS = [64, 128, 256, 512, 512]

# ImageNet normalization used by torchvision / LPIPS 'scaling layer'.
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _conv3x3(x, w, b):
    x = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return x + b[None, :, None, None]


def _max_pool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
        [(0, 0)] * 4)


def vgg16_backbone(params: Params, x: jax.Array,
                   collect_taps: bool = False):
    """x: float NCHW, already normalized.  Returns (final, taps)."""
    taps: List[jax.Array] = []
    idx = 0
    for v in VGG16_CFG:
        if v == "M":
            x = _max_pool2(x)
            idx += 1
        else:
            p = params["features"][str(idx)]
            x = jax.nn.relu(_conv3x3(x, p["weight"], p["bias"]))
            if collect_taps and idx in LPIPS_TAPS:
                taps.append(x)
            idx += 2  # conv + relu occupy two indices in torchvision
    return x, taps


def preprocess(images: jax.Array, size: int = 224,
               resize: bool = True) -> jax.Array:
    """uint8/float NCHW RGB [0,255] -> ImageNet-normalized float."""
    x = images.astype(jnp.float32) / 255.0
    if x.shape[1] == 1:
        x = jnp.tile(x, (1, 3, 1, 1))
    if resize and x.shape[2:] != (size, size):
        x = jax.image.resize(x, x.shape[:2] + (size, size), method="bilinear")
    return (x - _MEAN[None, :, None, None]) / _STD[None, :, None, None]


def vgg16_features(params: Params, images: jax.Array) -> jax.Array:
    """4096-d classifier features (after fc1-relu-fc2-relu)."""
    x = preprocess(images)
    x, _ = vgg16_backbone(params, x)
    x = _max_pool2(x) if x.shape[2] > 7 else x
    x = x.reshape(x.shape[0], -1)
    c = params["classifier"]
    x = jax.nn.relu(x @ c["0"]["weight"].T + c["0"]["bias"])
    x = jax.nn.relu(x @ c["3"]["weight"].T + c["3"]["bias"])
    return x


def vgg16_lpips(params: Params, images: jax.Array) -> jax.Array:
    """LPIPS embedding: per-tap unit-normalized channels scaled by the lin
    weights, spatially averaged and concatenated.  The squared L2 distance of
    two embeddings equals the LPIPS distance (spatial-average variant)."""
    x = preprocess(images, resize=False)
    _, taps = vgg16_backbone(params, x, collect_taps=True)
    outs = []
    for i, t in enumerate(taps):
        norm = t * jax.lax.rsqrt(
            jnp.sum(jnp.square(t), axis=1, keepdims=True) + 1e-10)
        lin = params["lin"][str(i)]["weight"]  # [C]
        weighted = norm * jnp.sqrt(jnp.maximum(lin, 0))[None, :, None, None]
        # ||e_a - e_b||^2 == sum_taps mean_spatial(sum_c lin_c (na - nb)^2),
        # the spatial-average LPIPS distance.
        h, w = weighted.shape[2:]
        outs.append((weighted / np.sqrt(h * w)).reshape(weighted.shape[0], -1))
    return jnp.concatenate(outs, axis=1)


def init_vgg16(key, with_lpips: bool = True) -> Params:
    keys = iter(jax.random.split(key, 64))
    features: Params = {}
    idx = 0
    in_ch = 3
    for v in VGG16_CFG:
        if v == "M":
            idx += 1
            continue
        features[str(idx)] = {
            "weight": jax.random.normal(next(keys), (v, in_ch, 3, 3)) * 0.05,
            "bias": jnp.zeros((v,)),
        }
        in_ch = v
        idx += 2
    classifier = {
        "0": {"weight": jax.random.normal(next(keys), (4096, 512 * 7 * 7)) * 0.01,
              "bias": jnp.zeros((4096,))},
        "3": {"weight": jax.random.normal(next(keys), (4096, 4096)) * 0.01,
              "bias": jnp.zeros((4096,))},
    }
    p: Params = {"features": features, "classifier": classifier}
    if with_lpips:
        p["lin"] = {str(i): {"weight": jnp.abs(jax.random.normal(
            next(keys), (c,))) * 0.1} for i, c in enumerate(LPIPS_CHANNELS)}
    return p
