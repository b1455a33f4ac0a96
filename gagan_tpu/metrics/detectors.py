"""Named feature detectors used by the metrics suite.

The reference downloads TorchScript detectors by URL
(`metric_utils.py:44-62`); here detectors are constructed from converted
weight files (npz produced by tools/convert_weights.py) pointed to by the
GAGAN_DETECTOR_DIR environment variable, falling back to deterministic
random-weight networks so the metric *machinery* works out of the box (the
absolute metric values then differ from the canonical constants until real
weights are supplied).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp


class Detector:
    def __init__(self, name: str, fn: Callable, num_features: int):
        self.name = name
        self._fn = fn
        self.num_features = num_features

    def __call__(self, images):
        return self._fn(images)


def _load_or_init(filename: str, init_fn):
    from gagan_tpu.utils import checkpoint as ckpt

    det_dir = os.environ.get("GAGAN_DETECTOR_DIR", "")
    path = os.path.join(det_dir, filename) if det_dir else filename
    if det_dir and os.path.isfile(path):
        import numpy as np

        data = np.load(path, allow_pickle=False)
        return ckpt.flat_to_tree({k: data[k] for k in data.files}), True
    return init_fn(jax.random.PRNGKey(0)), False


def make_default(name: str) -> Detector:
    if name in ("inception", "inception_softmax"):
        from gagan_tpu.metrics import inception

        params, pretrained = _load_or_init("inception_v3.npz",
                                           inception.init_inception_v3)
        tag = "inception-2015-12-05" if pretrained else "inception-random"

        if name == "inception":
            return Detector(tag, lambda img: inception.inception_v3_features(
                params, img), 2048)

        def softmax_no_bias(img):
            _f, logits, _lb = inception.inception_v3_features(
                params, img, return_logits=True)
            return jax.nn.softmax(logits, axis=1)

        return Detector(tag + "-softmax", softmax_no_bias, 1008)

    if name == "vgg16":
        from gagan_tpu.metrics import vgg16

        params, pretrained = _load_or_init("vgg16.npz", vgg16.init_vgg16)
        tag = "vgg16" if pretrained else "vgg16-random"
        return Detector(tag, lambda img: vgg16.vgg16_features(params, img),
                        4096)

    if name == "vgg16_lpips":
        from gagan_tpu.metrics import vgg16

        params, pretrained = _load_or_init("vgg16.npz", vgg16.init_vgg16)
        tag = "vgg16-lpips" if pretrained else "vgg16-lpips-random"
        return Detector(tag, lambda img: vgg16.vgg16_lpips(params, img), -1)

    raise ValueError(f"Unknown detector: {name}")
