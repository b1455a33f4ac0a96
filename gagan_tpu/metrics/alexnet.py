"""AlexNet feature tower + LPIPS(net='alex') as pure JAX functions.

The reference GA fitness uses the `lpips` package's alex variant
(`/root/reference/GA/evaluation.py:13` — `LPIPS(net='alex')`), which is a
different tower and lin-head set than the VGG16 LPIPS the metrics stack
already ships (`metrics/vgg16.py`).  This module reproduces it exactly:

  * scaling layer: (x - shift) / scale on [-1, 1] inputs
    (lpips/lpips.py ScalingLayer);
  * torchvision AlexNet `.features` with ReLU taps after each of the 5
    conv stages (lpips/pretrained_networks.py `alexnet`: slice1=0:2,
    slice2=2:5, slice3=5:8, slice4=8:10, slice5=10:12);
  * per-tap channel-unit-normalization (eps=1e-10 added to the norm),
    squared diff, 1x1 lin conv, spatial mean, summed over taps
    (lpips/lpips.py forward, spatial=False).

Parameter names mirror torchvision (`features.N.weight`) plus `lin.N.weight`
and `scaling.shift/scale`; published weights convert via
tools/convert_weights.py::convert_lpips_alex.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# torchvision AlexNet features: index -> (in, out, kernel, stride, pad).
ALEX_CONVS = {
    0: (3, 64, 11, 4, 2),
    3: (64, 192, 5, 1, 2),
    6: (192, 384, 3, 1, 1),
    8: (384, 256, 3, 1, 1),
    10: (256, 256, 3, 1, 1),
}
ALEX_POOLS = (2, 5)              # MaxPool2d(3, 2) positions
ALEX_TAPS = (1, 4, 7, 9, 11)     # ReLU outputs feeding the lin heads
LPIPS_CHANNELS = (64, 192, 384, 256, 256)

# lpips ScalingLayer constants (lpips/lpips.py:149-153).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


def _max_pool32(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), [(0, 0)] * 4)


def alexnet_taps(params: Params, x: jax.Array) -> List[jax.Array]:
    """Scaled input -> the 5 ReLU tap activations."""
    taps = []
    idx = 0
    while idx <= max(ALEX_TAPS):
        if idx in ALEX_CONVS:
            _, _, _, stride, pad = ALEX_CONVS[idx]
            p = params["features"][str(idx)]
            x = jax.nn.relu(_conv(x, p["weight"], p["bias"], stride, pad))
            taps.append(x)
            idx += 2          # conv + relu
        elif idx in ALEX_POOLS:
            x = _max_pool32(x)
            idx += 1
        else:                 # relu indices already consumed
            idx += 1
    return taps


def _scale_input(params: Params, images: jax.Array) -> jax.Array:
    shift = params.get("scaling", {}).get("shift", _SHIFT)
    scale = params.get("scaling", {}).get("scale", _SCALE)
    shift = jnp.asarray(shift).reshape(1, 3, 1, 1)
    scale = jnp.asarray(scale).reshape(1, 3, 1, 1)
    return (images - shift) / scale


def _unit_normalize(t: jax.Array) -> jax.Array:
    # lpips.normalize_tensor: x / (||x||_c + 1e-10)  (eps OUTSIDE the sqrt).
    norm = jnp.sqrt(jnp.sum(jnp.square(t), axis=1, keepdims=True))
    return t / (norm + 1e-10)


def lpips_distance(params: Params, a: jax.Array, b: jax.Array) -> jax.Array:
    """Exact LPIPS(net='alex') per-pair distances for [N,3,H,W] images in
    [-1, 1] — bit-matches lpips.LPIPS.forward (spatial=False)."""
    taps_a = alexnet_taps(params, _scale_input(params, a))
    taps_b = alexnet_taps(params, _scale_input(params, b))
    total = 0.0
    for i, (ta, tb) in enumerate(zip(taps_a, taps_b)):
        diff = jnp.square(_unit_normalize(ta) - _unit_normalize(tb))
        lin = params["lin"][str(i)]["weight"]          # [C]
        val = jnp.einsum("nchw,c->n", diff, lin) / (
            diff.shape[2] * diff.shape[3])
        total = total + val
    return total


def lpips_embedding(params: Params, images: jax.Array) -> jax.Array:
    """Embedding whose squared L2 distance equals LPIPS — the interface
    `ga.evaluation.calculate_metrics(lpips_fn=...)` consumes.  Requires the
    (standard) non-negative lin weights; negatives are clamped."""
    taps = alexnet_taps(params, _scale_input(params, images))
    outs = []
    for i, t in enumerate(taps):
        norm = _unit_normalize(t)
        lin = params["lin"][str(i)]["weight"]
        weighted = norm * jnp.sqrt(jnp.maximum(lin, 0.0))[None, :, None,
                                                          None]
        h, w = weighted.shape[2:]
        outs.append((weighted / np.sqrt(h * w)).reshape(weighted.shape[0],
                                                        -1))
    return jnp.concatenate(outs, axis=1)


def init_alexnet_lpips(key) -> Params:
    keys = iter(jax.random.split(key, 16))
    features: Params = {}
    for idx, (in_c, out_c, k, _, _) in ALEX_CONVS.items():
        features[str(idx)] = {
            "weight": jax.random.normal(next(keys),
                                        (out_c, in_c, k, k)) * 0.05,
            "bias": jnp.zeros((out_c,)),
        }
    lin = {str(i): {"weight": jnp.abs(jax.random.normal(
        next(keys), (c,))) * 0.1} for i, c in enumerate(LPIPS_CHANNELS)}
    return {"features": features, "lin": lin,
            "scaling": {"shift": jnp.asarray(_SHIFT),
                        "scale": jnp.asarray(_SCALE)}}


def load_params(path: str) -> Params:
    from gagan_tpu.utils import checkpoint as ckpt_lib

    with np.load(path) as z:
        return ckpt_lib.flat_to_tree({k: z[k] for k in z.files})
