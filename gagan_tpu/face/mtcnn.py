"""MTCNN face detector (PNet / RNet / ONet cascade), TPU-native.

Parity target: reference restyle_encoders/mtcnn/ — network definitions
mtcnn_pytorch/src/get_nets.py:32-171, cascade mtcnn.py:45-157, proposal
stage first_stage.py:12-66, box utilities box_utils.py:5-238.

The three nets are pure functions over parameter pytrees (conv + PReLU +
ceil-mode max-pool expressed with ``lax.reduce_window``), so every stage
jits and batches on TPU.  The cascade itself (image pyramid, NMS, box
bookkeeping) is host-side numpy — it is data preprocessing with
dynamic-size survivors, exactly the part that should NOT be traced.

Two reference quirks are kept bit-for-bit because the pretrained weights
depend on them:
  - PNet applies softmax over dim=-1 (the WIDTH axis of the [N,2,H,W]
    score map, get_nets.py:74) and the cascade thresholds (0.15/0.25/0.35,
    mtcnn.py:46-47) are calibrated to that.
  - RNet/ONet flatten with a (3,2)-transpose first (get_nets.py:27-29),
    i.e. channel-w-h order.

Weights: ``GAGAN_MTCNN_DIR`` with {pnet,rnet,onet}.npy (the standard
name→array dicts); ``params_from_npy`` converts.  Without weights the
nets initialize randomly (shape/pipeline tests only).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]


# ----------------------------------------------------------------------------
# Functional layers


def _conv(p: Params, x: jax.Array, stride: int = 1) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"][None, :, None, None]


def _prelu(a: jax.Array, x: jax.Array) -> jax.Array:
    return jnp.where(x >= 0, x, a[None, :, None, None] * x)


def _maxpool_ceil(x: jax.Array, k: int, s: int) -> jax.Array:
    """Max pool with ceil_mode=True (torch MaxPool2d semantics)."""
    n, c, h, w = x.shape
    out_h = -(-(h - k) // s) + 1
    out_w = -(-(w - k) // s) + 1
    pad_h = max(0, (out_h - 1) * s + k - h)
    pad_w = max(0, (out_w - 1) * s + k - w)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s),
        ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))


def _linear(p: Params, x: jax.Array) -> jax.Array:
    return x @ p["w"].T + p["b"]


def _softmax_last(x: jax.Array) -> jax.Array:
    """Explicit keepdims softmax over the last axis.  jax.nn.softmax on the
    [N,2,H,W] PNet score map trips an XLA:TPU AOT layout bug (reduce over
    {1,2} materializes a transposed shape) on the axon compile service."""
    shp = x.shape
    x2 = x.reshape(-1, shp[-1])
    m = jnp.max(x2, axis=-1, keepdims=True)
    e = jnp.exp(x2 - m)
    return (e / jnp.sum(e, axis=-1, keepdims=True)).reshape(shp)


def _flatten_wh(x: jax.Array) -> jax.Array:
    """The reference's Flatten (get_nets.py:13-29): transpose(3, 2) then
    reshape, giving channel-major / width-then-height feature order."""
    n = x.shape[0]
    return jnp.transpose(x, (0, 1, 3, 2)).reshape(n, -1)


# ----------------------------------------------------------------------------
# Networks (get_nets.py:32-171)


def pnet_apply(params: Params, x: jax.Array):
    """Proposal net.  Returns (offsets [N,4,h,w], probs [N,2,h,w]).
    Softmax over the LAST axis — the reference quirk (get_nets.py:74)."""
    x = _prelu(params["prelu1"], _conv(params["conv1"], x))
    x = _maxpool_ceil(x, 2, 2)
    x = _prelu(params["prelu2"], _conv(params["conv2"], x))
    x = _prelu(params["prelu3"], _conv(params["conv3"], x))
    a = _conv(params["conv4_1"], x)
    b = _conv(params["conv4_2"], x)
    return b, _softmax_last(a)


def rnet_apply(params: Params, x: jax.Array):
    """Refinement net on 24x24 crops → (offsets [N,4], probs [N,2])."""
    x = _prelu(params["prelu1"], _conv(params["conv1"], x))
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(params["prelu2"], _conv(params["conv2"], x))
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(params["prelu3"], _conv(params["conv3"], x))
    x = _linear(params["conv4"], _flatten_wh(x))
    x = jnp.where(x >= 0, x, params["prelu4"] * x)
    a = _linear(params["conv5_1"], x)
    b = _linear(params["conv5_2"], x)
    return b, _softmax_last(a)


def onet_apply(params: Params, x: jax.Array):
    """Output net on 48x48 crops → (landmarks [N,10], offsets [N,4],
    probs [N,2])."""
    x = _prelu(params["prelu1"], _conv(params["conv1"], x))
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(params["prelu2"], _conv(params["conv2"], x))
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(params["prelu3"], _conv(params["conv3"], x))
    x = _maxpool_ceil(x, 2, 2)
    x = _prelu(params["prelu4"], _conv(params["conv4"], x))
    x = _linear(params["conv5"], _flatten_wh(x))
    x = jnp.where(x >= 0, x, params["prelu5"] * x)
    a = _linear(params["conv6_1"], x)
    b = _linear(params["conv6_2"], x)
    c = _linear(params["conv6_3"], x)
    return c, b, _softmax_last(a)


_PNET_SHAPES = {
    "conv1": (10, 3, 3), "conv2": (16, 10, 3), "conv3": (32, 16, 3),
    "conv4_1": (2, 32, 1), "conv4_2": (4, 32, 1),
}
_RNET_SHAPES = {
    "conv1": (28, 3, 3), "conv2": (48, 28, 3), "conv3": (64, 48, 2),
    "conv4": (128, 576), "conv5_1": (2, 128), "conv5_2": (4, 128),
}
_ONET_SHAPES = {
    "conv1": (32, 3, 3), "conv2": (64, 32, 3), "conv3": (64, 64, 3),
    "conv4": (128, 64, 2), "conv5": (256, 1152),
    "conv6_1": (2, 256), "conv6_2": (4, 256), "conv6_3": (10, 256),
}
_PRELU_DIMS = {
    "pnet": {"prelu1": 10, "prelu2": 16, "prelu3": 32},
    "rnet": {"prelu1": 28, "prelu2": 48, "prelu3": 64, "prelu4": 128},
    "onet": {"prelu1": 32, "prelu2": 64, "prelu3": 64, "prelu4": 128,
             "prelu5": 256},
}


def _init_net(key: jax.Array, shapes, prelus) -> Params:
    params: Params = {}
    for i, (name, shp) in enumerate(shapes.items()):
        k = jax.random.fold_in(key, i)
        if len(shp) == 3:
            o, c, ks = shp
            w = jax.random.normal(k, (o, c, ks, ks)) * 0.1
        else:
            w = jax.random.normal(k, shp) * 0.1
        params[name] = {"w": w, "b": jnp.zeros(shp[0])}
    for name, dim in prelus.items():
        params[name] = jnp.full((dim,), 0.25)
    return params


def init_pnet(key):
    return _init_net(key, _PNET_SHAPES, _PRELU_DIMS["pnet"])


def init_rnet(key):
    return _init_net(key, _RNET_SHAPES, _PRELU_DIMS["rnet"])


def init_onet(key):
    return _init_net(key, _ONET_SHAPES, _PRELU_DIMS["onet"])


def params_from_npy(weights: Dict[str, np.ndarray]) -> Params:
    """Convert the reference .npy name→array dict (keys like
    'features.conv1.weight', 'conv4_1.bias') to our pytree."""
    params: Params = {}
    for name, arr in weights.items():
        parts = name.replace("features.", "").split(".")
        layer, kind = parts[0], parts[-1]
        arr = jnp.asarray(np.asarray(arr, np.float32))
        if layer.startswith("prelu"):
            params[layer] = arr.reshape(-1)
        else:
            params.setdefault(layer, {})
            params[layer]["w" if kind == "weight" else "b"] = arr
    return params


# ----------------------------------------------------------------------------
# Box utilities (box_utils.py:5-238) — host-side numpy.


def nms(boxes: np.ndarray, overlap_threshold: float = 0.5,
        mode: str = "union") -> List[int]:
    if len(boxes) == 0:
        return []
    pick = []
    x1, y1, x2, y2, score = [boxes[:, i] for i in range(5)]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    ids = np.argsort(score)
    while len(ids) > 0:
        last = len(ids) - 1
        i = ids[last]
        pick.append(i)
        ix1 = np.maximum(x1[i], x1[ids[:last]])
        iy1 = np.maximum(y1[i], y1[ids[:last]])
        ix2 = np.minimum(x2[i], x2[ids[:last]])
        iy2 = np.minimum(y2[i], y2[ids[:last]])
        w = np.maximum(0.0, ix2 - ix1 + 1.0)
        h = np.maximum(0.0, iy2 - iy1 + 1.0)
        inter = w * h
        if mode == "min":
            overlap = inter / np.minimum(area[i], area[ids[:last]])
        else:
            overlap = inter / (area[i] + area[ids[:last]] - inter)
        ids = np.delete(ids, np.concatenate(
            [[last], np.where(overlap > overlap_threshold)[0]]))
    return pick


def convert_to_square(bboxes: np.ndarray) -> np.ndarray:
    square = np.zeros_like(bboxes)
    x1, y1, x2, y2 = [bboxes[:, i] for i in range(4)]
    h = y2 - y1 + 1.0
    w = x2 - x1 + 1.0
    side = np.maximum(h, w)
    square[:, 0] = x1 + w * 0.5 - side * 0.5
    square[:, 1] = y1 + h * 0.5 - side * 0.5
    square[:, 2] = square[:, 0] + side - 1.0
    square[:, 3] = square[:, 1] + side - 1.0
    square[:, 4:] = bboxes[:, 4:]
    return square


def calibrate_box(bboxes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    x1, y1, x2, y2 = [bboxes[:, i] for i in range(4)]
    w = (x2 - x1 + 1.0)[:, None]
    h = (y2 - y1 + 1.0)[:, None]
    bboxes[:, 0:4] = bboxes[:, 0:4] + np.hstack([w, h, w, h]) * offsets
    return bboxes


def correct_bboxes(bboxes: np.ndarray, width: int, height: int):
    x1, y1, x2, y2 = [bboxes[:, i] for i in range(4)]
    w, h = x2 - x1 + 1.0, y2 - y1 + 1.0
    num = bboxes.shape[0]
    x, y, ex, ey = x1, y1, x2, y2
    dx, dy = np.zeros((num,)), np.zeros((num,))
    edx, edy = w.copy() - 1.0, h.copy() - 1.0

    ind = np.where(ex > width - 1.0)[0]
    edx[ind] = w[ind] + width - 2.0 - ex[ind]
    ex = np.minimum(ex, width - 1.0)
    ind = np.where(ey > height - 1.0)[0]
    edy[ind] = h[ind] + height - 2.0 - ey[ind]
    ey = np.minimum(ey, height - 1.0)
    ind = np.where(x < 0.0)[0]
    dx[ind] = 0.0 - x[ind]
    x = np.maximum(x, 0.0)
    ind = np.where(y < 0.0)[0]
    dy[ind] = 0.0 - y[ind]
    y = np.maximum(y, 0.0)
    return [arr.astype("int32")
            for arr in (dy, edy, dx, edx, y, ey, x, ex, w, h)]


def _preprocess(img: np.ndarray) -> np.ndarray:
    """[h,w,c] uint8/float → normalized [1,c,h,w] (box_utils.py:226-238)."""
    img = img.transpose((2, 0, 1))[None]
    return (img.astype(np.float32) - 127.5) * 0.0078125


def get_image_boxes(bounding_boxes: np.ndarray, image,
                    size: int = 24) -> np.ndarray:
    """Cut out, zero-pad, and resize boxes (box_utils.py:127-159)."""
    import PIL.Image

    num = len(bounding_boxes)
    width, height = image.size
    dy, edy, dx, edx, y, ey, x, ex, w, h = correct_bboxes(
        bounding_boxes, width, height)
    img_arr = np.asarray(image, "uint8")
    out = np.zeros((num, 3, size, size), "float32")
    for i in range(num):
        if h[i] <= 0 or w[i] <= 0:
            continue
        box = np.zeros((h[i], w[i], 3), "uint8")
        box[dy[i]:edy[i] + 1, dx[i]:edx[i] + 1] = \
            img_arr[y[i]:ey[i] + 1, x[i]:ex[i] + 1]
        box = PIL.Image.fromarray(box).resize((size, size),
                                              PIL.Image.BILINEAR)
        out[i] = _preprocess(np.asarray(box, "float32"))[0]
    return out


def _generate_bboxes(probs: np.ndarray, offsets: np.ndarray, scale: float,
                     threshold: float) -> np.ndarray:
    """PNet score map → candidate boxes (first_stage.py:69-123)."""
    stride, cell_size = 2, 12
    inds = np.where(probs > threshold)
    if inds[0].size == 0:
        return np.array([])
    tx1, ty1, tx2, ty2 = [offsets[0, i, inds[0], inds[1]] for i in range(4)]
    score = probs[inds[0], inds[1]]
    return np.vstack([
        np.round((stride * inds[1] + 1.0) / scale),
        np.round((stride * inds[0] + 1.0) / scale),
        np.round((stride * inds[1] + 1.0 + cell_size) / scale),
        np.round((stride * inds[0] + 1.0 + cell_size) / scale),
        score, tx1, ty1, tx2, ty2,
    ]).T


def _run_first_stage(image, pnet_fn, pnet_params, scale: float,
                     threshold: float) -> Optional[np.ndarray]:
    """(first_stage.py:12-66)."""
    import math

    import PIL.Image

    width, height = image.size
    sw, sh = math.ceil(width * scale), math.ceil(height * scale)
    img = image.resize((sw, sh), PIL.Image.BILINEAR)
    x = jnp.asarray(_preprocess(np.asarray(img, "float32")))
    offsets, probs = pnet_fn(pnet_params, x)
    boxes = _generate_bboxes(np.asarray(probs)[0, 1], np.asarray(offsets),
                             scale, threshold)
    if len(boxes) == 0:
        return None
    return boxes[nms(boxes[:, 0:5], overlap_threshold=0.5)]


def detect_faces(params: Dict[str, Params], image,
                 min_face_size: float = 20.0,
                 thresholds=(0.15, 0.25, 0.35),
                 nms_thresholds=(0.7, 0.7, 0.7)):
    """Full 3-stage cascade (mtcnn.py:45-157).  ``params``:
    {'pnet':…, 'rnet':…, 'onet':…}; ``image``: PIL.Image.

    Returns (bounding_boxes [n,5], landmarks [n,10]).

    Runs on the host CPU: the cascade is preprocessing over a dynamic
    image pyramid (a new shape per scale), which would force one TPU
    compilation per level — and the PNet width-axis softmax additionally
    trips an XLA:TPU AOT layout bug on the axon compile service."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return _detect_faces_impl(params, image, min_face_size, thresholds,
                                  nms_thresholds)


def _detect_faces_impl(params, image, min_face_size, thresholds,
                       nms_thresholds):
    pnet = jax.jit(pnet_apply)
    rnet = jax.jit(rnet_apply)
    onet = jax.jit(onet_apply)

    width, height = image.size
    min_length = min(height, width)
    min_detection_size = 12
    factor = 0.707
    scales = []
    m = min_detection_size / min_face_size
    min_length *= m
    fc = 0
    while min_length > min_detection_size:
        scales.append(m * factor ** fc)
        min_length *= factor
        fc += 1

    # Stage 1
    boxes_per_scale = [
        _run_first_stage(image, pnet, params["pnet"], s, thresholds[0])
        for s in scales]
    boxes_per_scale = [b for b in boxes_per_scale if b is not None]
    if not boxes_per_scale:
        return np.zeros((0, 5)), np.zeros((0, 10))
    bounding_boxes = np.vstack(boxes_per_scale)
    keep = nms(bounding_boxes[:, 0:5], nms_thresholds[0])
    bounding_boxes = bounding_boxes[keep]
    bounding_boxes = calibrate_box(bounding_boxes[:, 0:5],
                                   bounding_boxes[:, 5:])
    bounding_boxes = convert_to_square(bounding_boxes)
    bounding_boxes[:, 0:4] = np.round(bounding_boxes[:, 0:4])

    # Stage 2
    img_boxes = get_image_boxes(bounding_boxes, image, size=24)
    if len(img_boxes) == 0:
        return np.zeros((0, 5)), np.zeros((0, 10))
    offsets, probs = rnet(params["rnet"], jnp.asarray(img_boxes))
    offsets, probs = np.asarray(offsets), np.asarray(probs)
    keep = np.where(probs[:, 1] > thresholds[1])[0]
    bounding_boxes = bounding_boxes[keep]
    bounding_boxes[:, 4] = probs[keep, 1]
    offsets = offsets[keep]
    keep = nms(bounding_boxes, nms_thresholds[1])
    bounding_boxes = calibrate_box(bounding_boxes[keep], offsets[keep])
    bounding_boxes = convert_to_square(bounding_boxes)
    bounding_boxes[:, 0:4] = np.round(bounding_boxes[:, 0:4])

    # Stage 3
    img_boxes = get_image_boxes(bounding_boxes, image, size=48)
    if len(img_boxes) == 0:
        return np.zeros((0, 5)), np.zeros((0, 10))
    landmarks, offsets, probs = onet(params["onet"], jnp.asarray(img_boxes))
    landmarks, offsets, probs = (np.asarray(landmarks), np.asarray(offsets),
                                 np.asarray(probs))
    keep = np.where(probs[:, 1] > thresholds[2])[0]
    bounding_boxes = bounding_boxes[keep]
    bounding_boxes[:, 4] = probs[keep, 1]
    offsets, landmarks = offsets[keep], landmarks[keep]

    w = bounding_boxes[:, 2] - bounding_boxes[:, 0] + 1.0
    h = bounding_boxes[:, 3] - bounding_boxes[:, 1] + 1.0
    xmin, ymin = bounding_boxes[:, 0], bounding_boxes[:, 1]
    landmarks[:, 0:5] = xmin[:, None] + w[:, None] * landmarks[:, 0:5]
    landmarks[:, 5:10] = ymin[:, None] + h[:, None] * landmarks[:, 5:10]

    bounding_boxes = calibrate_box(bounding_boxes, offsets)
    keep = nms(bounding_boxes, nms_thresholds[2], mode="min")
    return bounding_boxes[keep], landmarks[keep]


# ----------------------------------------------------------------------------


class MTCNN:
    """Detect + 5-point align to 112x112 (reference mtcnn.py:12-43).

    Weights load from ``weights_dir`` or $GAGAN_MTCNN_DIR ({pnet,rnet,
    onet}.npy); otherwise random-initialized (pipeline tests only)."""

    def __init__(self, weights_dir: Optional[str] = None,
                 key: Optional[jax.Array] = None):
        from gagan_tpu.face import align as align_lib

        weights_dir = weights_dir or os.environ.get("GAGAN_MTCNN_DIR")
        if weights_dir:
            self.params = {
                name: params_from_npy(np.load(
                    os.path.join(weights_dir, f"{name}.npy"),
                    allow_pickle=True)[()])
                for name in ("pnet", "rnet", "onet")
            }
        else:
            key = key if key is not None else jax.random.PRNGKey(0)
            ks = jax.random.split(key, 3)
            self.params = {"pnet": init_pnet(ks[0]),
                           "rnet": init_rnet(ks[1]),
                           "onet": init_onet(ks[2])}
        self.reference = align_lib.get_reference_facial_points(
            default_square=True)

    def detect_faces(self, image, min_face_size: float = 20.0,
                     thresholds=(0.15, 0.25, 0.35),
                     nms_thresholds=(0.7, 0.7, 0.7)):
        return detect_faces(self.params, image, min_face_size, thresholds,
                            nms_thresholds)

    def align(self, img):
        """One face → (112x112 PIL image, 2x3 transform) or (None, None)."""
        import PIL.Image

        from gagan_tpu.face import align as align_lib

        _, landmarks = self.detect_faces(img)
        if len(landmarks) == 0:
            return None, None
        pts = [[landmarks[0][j], landmarks[0][j + 5]] for j in range(5)]
        face, tfm = align_lib.warp_and_crop_face(
            np.array(img), pts, self.reference, crop_size=(112, 112))
        return PIL.Image.fromarray(face), tfm

    def align_multi(self, img, limit: Optional[int] = None,
                    min_face_size: float = 30.0):
        import PIL.Image

        from gagan_tpu.face import align as align_lib

        boxes, landmarks = self.detect_faces(img, min_face_size)
        if limit:
            boxes, landmarks = boxes[:limit], landmarks[:limit]
        faces, tfms = [], []
        for lm in landmarks:
            pts = [[lm[j], lm[j + 5]] for j in range(5)]
            face, tfm = align_lib.warp_and_crop_face(
                np.array(img), pts, self.reference, crop_size=(112, 112))
            faces.append(PIL.Image.fromarray(face))
            tfms.append(tfm)
        return boxes, faces, tfms
