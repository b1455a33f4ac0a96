"""Face alignment: Matlab cp2tform similarity solve + 5-point warp-crop
(ArcFace convention) and the FFHQ 68-landmark quad crop.

Parity targets:
  - ``find_nonreflective_similarity`` / ``get_similarity_transform_cv2`` —
    reference mtcnn_pytorch/src/matlab_cp2tform.py:68-230.  NOTE: the
    reference's findSimilarity (matlab_cp2tform.py:119-157) reflects ``xy``
    IN PLACE (``xyR = xy``), corrupting the norm comparison that picks
    between the reflective and non-reflective fits; we keep the intended
    semantics (compare against the unmutated destination points).
  - ``get_reference_facial_points`` / ``warp_and_crop_face`` —
    mtcnn_pytorch/src/align_trans.py:15-304.
  - ``align_face`` — core/utils/common.py:251-333 (FFHQ alignment), made
    dlib-free: it takes the 68 landmarks as an argument (use
    MTCNN.detect + any landmark model, or precomputed landmarks).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# ArcFace 5-point reference landmarks on a (96, 112) crop
# (align_trans.py:15-23).
REFERENCE_FACIAL_POINTS = np.array([
    [30.29459953, 51.69630051],
    [65.53179932, 51.50139999],
    [48.02519989, 71.73660278],
    [33.54930115, 92.3655014],
    [62.72990036, 92.20410156],
], dtype=np.float32)

DEFAULT_CROP_SIZE = (96, 112)


class FaceWarpException(Exception):
    pass


def get_reference_facial_points(output_size: Optional[Tuple[int, int]] = None,
                                inner_padding_factor: float = 0.0,
                                outer_padding: Tuple[int, int] = (0, 0),
                                default_square: bool = False) -> np.ndarray:
    """5 reference keypoints for a crop layout (align_trans.py:32-150)."""
    pts = REFERENCE_FACIAL_POINTS.copy()
    crop = np.array(DEFAULT_CROP_SIZE, dtype=np.float64)

    if default_square:
        diff = crop.max() - crop
        pts += diff / 2
        crop += diff

    if output_size and tuple(output_size) == tuple(crop.astype(int)):
        return pts
    if inner_padding_factor == 0 and outer_padding == (0, 0):
        if output_size is None:
            return pts
        raise FaceWarpException(
            f"No paddings to do, output_size must be None or {crop}")

    if not 0 <= inner_padding_factor <= 1.0:
        raise FaceWarpException("Not (0 <= inner_padding_factor <= 1.0)")
    if (inner_padding_factor > 0 or max(outer_padding) > 0) \
            and output_size is None:
        output_size = tuple(
            (crop * (1 + inner_padding_factor * 2)).astype(np.int32)
            + np.array(outer_padding) * 2)
    if not (outer_padding[0] < output_size[0]
            and outer_padding[1] < output_size[1]):
        raise FaceWarpException("outer_padding must be smaller than "
                                "output_size")

    # 1) inner padding
    if inner_padding_factor > 0:
        diff = crop * inner_padding_factor * 2
        pts += diff / 2
        crop += np.round(diff).astype(np.int32)

    # 2) uniform scale to (output_size - 2*outer_padding)
    size_bf_outer = np.array(output_size) - np.array(outer_padding) * 2
    if size_bf_outer[0] * crop[1] != size_bf_outer[1] * crop[0]:
        raise FaceWarpException("must have (output_size - outer_padding) "
                                "= some_scale * (crop_size * (1 + "
                                "inner_padding_factor))")
    scale = size_bf_outer[0] / crop[0]
    pts *= scale

    # 3) outer padding
    return (pts + np.array(outer_padding)).astype(np.float32)


def _tformfwd(trans: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Row-vector convention: [x, y, 1] = [u, v, 1] @ trans
    (matlab_cp2tform.py:14-37)."""
    uv1 = np.hstack([uv, np.ones((uv.shape[0], 1))])
    return (uv1 @ trans)[:, :2]


def find_nonreflective_similarity(uv: np.ndarray, xy: np.ndarray):
    """Least-squares similarity [sc, ss, tx, ty]
    (matlab_cp2tform.py:68-116)."""
    m = xy.shape[0]
    x, y = xy[:, 0:1], xy[:, 1:2]
    X = np.vstack([
        np.hstack([x, y, np.ones((m, 1)), np.zeros((m, 1))]),
        np.hstack([y, -x, np.zeros((m, 1)), np.ones((m, 1))]),
    ])
    U = np.vstack([uv[:, 0:1], uv[:, 1:2]])
    if np.linalg.matrix_rank(X) < 4:
        raise FaceWarpException("cp2tform: two unique points required")
    r = np.linalg.lstsq(X, U, rcond=None)[0].ravel()
    sc, ss, tx, ty = r
    tinv = np.array([[sc, -ss, 0], [ss, sc, 0], [tx, ty, 1]])
    t = np.linalg.inv(tinv)
    t[:, 2] = [0, 0, 1]
    return t, tinv


def find_similarity(uv: np.ndarray, xy: np.ndarray):
    """Best of the non-reflective fit and the reflected fit
    (matlab_cp2tform.py:119-157, with the in-place-mutation bug fixed:
    both candidates are scored against the original ``xy``)."""
    trans1, trans1_inv = find_nonreflective_similarity(uv, xy)

    xy_r = xy.copy()
    xy_r[:, 0] *= -1
    trans2r, _ = find_nonreflective_similarity(uv, xy_r)
    reflect_y = np.diag([-1.0, 1.0, 1.0])
    trans2 = trans2r @ reflect_y

    norm1 = np.linalg.norm(_tformfwd(trans1, uv) - xy)
    norm2 = np.linalg.norm(_tformfwd(trans2, uv) - xy)
    if norm1 <= norm2:
        return trans1, trans1_inv
    return trans2, np.linalg.inv(trans2)


def get_similarity_transform(src_pts: np.ndarray, dst_pts: np.ndarray,
                             reflective: bool = True):
    """(matlab_cp2tform.py:159-196)."""
    if reflective:
        return find_similarity(src_pts, dst_pts)
    return find_nonreflective_similarity(src_pts, dst_pts)


def get_similarity_transform_cv2(src_pts: np.ndarray, dst_pts: np.ndarray,
                                 reflective: bool = True) -> np.ndarray:
    """2x3 matrix for cv2.warpAffine (matlab_cp2tform.py:199-257)."""
    trans, _ = get_similarity_transform(src_pts, dst_pts, reflective)
    return trans[:, 0:2].T


def warp_and_crop_face(src_img: np.ndarray, facial_pts,
                       reference_pts=None,
                       crop_size: Tuple[int, int] = (96, 112),
                       align_type: str = "smilarity"):
    """Warp a face to the reference layout (align_trans.py:210-304).
    ``align_type``: 'smilarity' (sic, matches the reference default),
    'cv2_affine' (3-point estimate) or 'affine' (full 3x3 lstsq).

    Returns (cropped uint8 HWC image, the 2x3 transform)."""
    import cv2

    if reference_pts is None:
        if crop_size == (96, 112):
            reference_pts = REFERENCE_FACIAL_POINTS
        else:
            default_square = crop_size[0] == crop_size[1]
            reference_pts = get_reference_facial_points(
                output_size=crop_size, default_square=default_square)

    ref_pts = np.float32(reference_pts)
    src_pts = np.float32(facial_pts)
    if src_pts.shape != ref_pts.shape and src_pts.T.shape == ref_pts.shape:
        src_pts = src_pts.T

    if align_type == "cv2_affine":
        tfm = cv2.getAffineTransform(src_pts[0:3], ref_pts[0:3])
    elif align_type == "affine":
        ones = np.ones((src_pts.shape[0], 1), np.float32)
        a = np.hstack([src_pts, ones])
        b = np.hstack([ref_pts, ones])
        tfm = np.linalg.lstsq(a, b, rcond=None)[0].T[:2]
    else:
        tfm = get_similarity_transform_cv2(src_pts, ref_pts)

    face = cv2.warpAffine(src_img, tfm, (crop_size[0], crop_size[1]))
    return face, tfm


def ffhq_quad(eye_left, eye_right, mouth_left, mouth_right):
    """FFHQ crop quad from eye centers + mouth corners (common.py:258-268).

    The 68-landmark recipe only consumes these four points (eye means and
    outer-mouth corners 48/54), so the quad is computable from any 5-point
    detector (MTCNN ONet's eye points approximate the 6-point eye means).
    Returns (quad [4, 2], qsize)."""
    eye_left = np.asarray(eye_left, np.float64)
    eye_right = np.asarray(eye_right, np.float64)
    eye_avg = (eye_left + eye_right) * 0.5
    eye_to_eye = eye_right - eye_left
    mouth_avg = (np.asarray(mouth_left, np.float64)
                 + np.asarray(mouth_right, np.float64)) * 0.5
    eye_to_mouth = mouth_avg - eye_avg

    x = eye_to_eye - np.flipud(eye_to_mouth) * [-1, 1]
    x /= np.hypot(*x)
    x *= max(np.hypot(*eye_to_eye) * 2.0, np.hypot(*eye_to_mouth) * 1.8)
    y = np.flipud(x) * [-1, 1]
    c = eye_avg + eye_to_mouth * 0.1
    quad = np.stack([c - x - y, c - x + y, c + x + y, c + x - y])
    qsize = np.hypot(*x) * 2
    return quad, qsize


def align_face(img, landmarks: np.ndarray, output_size: int = 1024,
               transform_size: int = 4096, enable_padding: bool = True):
    """FFHQ alignment from 68 landmarks (common.py:251-333).

    ``img``: PIL.Image or uint8 HWC array.  ``landmarks``: [68, 2] (x, y)
    in the dlib 68-point layout (or [5, 2] in the MTCNN order — left eye,
    right eye, nose, left mouth, right mouth — see ``align_face_5p``).
    Unlike the reference this does not run dlib itself — pass landmarks
    from any detector, or use ``align_face_auto`` (in-house MTCNN).
    """
    import PIL.Image
    import scipy.ndimage

    if not hasattr(img, "size"):
        img = PIL.Image.fromarray(np.asarray(img, np.uint8))

    lm = np.asarray(landmarks, np.float64)
    if lm.shape[0] == 5:
        quad, qsize = ffhq_quad(lm[0], lm[1], lm[3], lm[4])
    else:
        eye_left = lm[36:42].mean(axis=0)
        eye_right = lm[42:48].mean(axis=0)
        quad, qsize = ffhq_quad(eye_left, eye_right, lm[48], lm[54])

    lanczos = getattr(PIL.Image, "Resampling", PIL.Image).LANCZOS

    shrink = int(np.floor(qsize / output_size * 0.5))
    if shrink > 1:
        rsize = (int(np.rint(img.size[0] / shrink)),
                 int(np.rint(img.size[1] / shrink)))
        img = img.resize(rsize, lanczos)
        quad /= shrink
        qsize /= shrink

    border = max(int(np.rint(qsize * 0.1)), 3)
    crop = (int(np.floor(quad[:, 0].min())), int(np.floor(quad[:, 1].min())),
            int(np.ceil(quad[:, 0].max())), int(np.ceil(quad[:, 1].max())))
    crop = (max(crop[0] - border, 0), max(crop[1] - border, 0),
            min(crop[2] + border, img.size[0]),
            min(crop[3] + border, img.size[1]))
    if crop[2] - crop[0] < img.size[0] or crop[3] - crop[1] < img.size[1]:
        img = img.crop(crop)
        quad -= crop[0:2]

    pad = (int(np.floor(quad[:, 0].min())), int(np.floor(quad[:, 1].min())),
           int(np.ceil(quad[:, 0].max())), int(np.ceil(quad[:, 1].max())))
    pad = (max(-pad[0] + border, 0), max(-pad[1] + border, 0),
           max(pad[2] - img.size[0] + border, 0),
           max(pad[3] - img.size[1] + border, 0))
    if enable_padding and max(pad) > border - 4:
        pad = np.maximum(pad, int(np.rint(qsize * 0.3)))
        arr = np.pad(np.float32(img),
                     ((pad[1], pad[3]), (pad[0], pad[2]), (0, 0)), "reflect")
        h, w, _ = arr.shape
        yy, xx, _ = np.ogrid[:h, :w, :1]
        mask = np.maximum(
            1.0 - np.minimum(np.float32(xx) / pad[0],
                             np.float32(w - 1 - xx) / pad[2]),
            1.0 - np.minimum(np.float32(yy) / pad[1],
                             np.float32(h - 1 - yy) / pad[3]))
        blur = qsize * 0.02
        arr += (scipy.ndimage.gaussian_filter(arr, [blur, blur, 0]) - arr) \
            * np.clip(mask * 3.0 + 1.0, 0.0, 1.0)
        arr += (np.median(arr, axis=(0, 1)) - arr) * np.clip(mask, 0.0, 1.0)
        img = PIL.Image.fromarray(
            np.uint8(np.clip(np.rint(arr), 0, 255)), "RGB")
        quad += pad[:2]

    img = img.transform((transform_size, transform_size), PIL.Image.QUAD,
                        (quad + 0.5).flatten(), PIL.Image.BILINEAR)
    if output_size < transform_size:
        img = img.resize((output_size, output_size), lanczos)
    return img


def align_face_5p(img, landmarks5: np.ndarray, output_size: int = 1024,
                  transform_size: int = 4096, enable_padding: bool = True):
    """FFHQ alignment from 5-point landmarks (MTCNN order: left eye,
    right eye, nose, left mouth corner, right mouth corner)."""
    return align_face(img, np.asarray(landmarks5, np.float64),
                      output_size=output_size, transform_size=transform_size,
                      enable_padding=enable_padding)


def align_face_auto(img, output_size: int = 1024, transform_size: int = 4096,
                    enable_padding: bool = True, mtcnn=None):
    """End-to-end image -> FFHQ-aligned face with no external landmark file.

    Replaces the reference's dlib 68-point predictor (common.py:251-268)
    with the in-house MTCNN cascade: the highest-confidence detection's
    ONet 5-point landmarks drive the FFHQ quad (the 68-point recipe only
    uses eye centers + mouth corners, which ONet provides).  Real
    behavior needs converted MTCNN weights (GAGAN_MTCNN_DIR); with random
    weights the cascade runs but detections are meaningless.

    Returns the aligned PIL image, or None when no face is detected.
    """
    import PIL.Image

    from gagan_tpu.face.mtcnn import MTCNN

    if not hasattr(img, "size"):
        img = PIL.Image.fromarray(np.asarray(img, np.uint8))
    if mtcnn is None:
        mtcnn = MTCNN()
    boxes, landmarks = mtcnn.detect_faces(img)
    if len(boxes) == 0:
        return None
    best = int(np.argmax(boxes[:, 4]))
    pts = np.stack([landmarks[best][:5], landmarks[best][5:]], axis=1)
    return align_face_5p(img, pts, output_size=output_size,
                         transform_size=transform_size,
                         enable_padding=enable_padding)
