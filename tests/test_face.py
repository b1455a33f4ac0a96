"""MTCNN + alignment parity vs the reference (real pretrained .npy weights
ship inside the reference tree, so net outputs are compared exactly)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.face import align as fa
from gagan_tpu.face import mtcnn as fm

WEIGHTS = ("/root/reference/SimilarDomains/restyle_encoders/mtcnn/"
           "mtcnn_pytorch/src/weights")
CP2TFORM = ("/root/reference/SimilarDomains/restyle_encoders/mtcnn/"
            "mtcnn_pytorch/src/matlab_cp2tform.py")


def _load_ref_get_nets():
    """Import the reference get_nets with a synthetic configs.paths_config
    pointing at the in-tree pretrained weights."""
    cfg_pkg = types.ModuleType("configs")
    cfg_mod = types.ModuleType("configs.paths_config")
    cfg_mod.model_paths = {
        "mtcnn_pnet": f"{WEIGHTS}/pnet.npy",
        "mtcnn_rnet": f"{WEIGHTS}/rnet.npy",
        "mtcnn_onet": f"{WEIGHTS}/onet.npy",
    }
    cfg_pkg.paths_config = cfg_mod
    sys.modules.setdefault("configs", cfg_pkg)
    sys.modules["configs.paths_config"] = cfg_mod
    spec = importlib.util.spec_from_file_location(
        "ref_mtcnn_get_nets",
        "/root/reference/SimilarDomains/restyle_encoders/mtcnn/"
        "mtcnn_pytorch/src/get_nets.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _load_ref_cp2tform():
    spec = importlib.util.spec_from_file_location("ref_cp2tform", CP2TFORM)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _our_params(name):
    w = np.load(f"{WEIGHTS}/{name}.npy", allow_pickle=True)[()]
    return fm.params_from_npy(w)


def test_pnet_parity():
    ref = _load_ref_get_nets()
    net = ref.PNet().cpu().eval()
    x = np.random.RandomState(0).rand(2, 3, 37, 41).astype(np.float32) - 0.5
    with torch.no_grad():
        want_b, want_a = [t.numpy() for t in net(torch.from_numpy(x))]
    got_b, got_a = fm.pnet_apply(_our_params("pnet"), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_b), want_b, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_a), want_a, rtol=1e-4,
                               atol=1e-5)


def test_rnet_onet_parity():
    ref = _load_ref_get_nets()
    rnet, onet = ref.RNet().cpu().eval(), ref.ONet().cpu().eval()
    rng = np.random.RandomState(1)
    x24 = rng.rand(3, 3, 24, 24).astype(np.float32) - 0.5
    x48 = rng.rand(3, 3, 48, 48).astype(np.float32) - 0.5
    with torch.no_grad():
        rb, ra = [t.numpy() for t in rnet(torch.from_numpy(x24))]
        oc, ob, oa = [t.numpy() for t in onet(torch.from_numpy(x48))]
    gb, ga = fm.rnet_apply(_our_params("rnet"), jnp.asarray(x24))
    np.testing.assert_allclose(np.asarray(gb), rb, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), ra, rtol=1e-4, atol=1e-5)
    gc, gb2, ga2 = fm.onet_apply(_our_params("onet"), jnp.asarray(x48))
    np.testing.assert_allclose(np.asarray(gc), oc, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb2), ob, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga2), oa, rtol=1e-4, atol=1e-4)


def test_nonreflective_similarity_parity():
    ref = _load_ref_cp2tform()
    rng = np.random.RandomState(2)
    uv = rng.rand(5, 2).astype(np.float64) * 100
    xy = rng.rand(5, 2).astype(np.float64) * 100
    want_t, want_tinv = ref.findNonreflectiveSimilarity(uv.copy(), xy.copy())
    got_t, got_tinv = fa.find_nonreflective_similarity(uv, xy)
    np.testing.assert_allclose(got_t, want_t, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(got_tinv, want_tinv, rtol=1e-6, atol=1e-8)


def test_similarity_recovers_exact_transforms():
    # Intended findSimilarity semantics (the reference mutates xy in place,
    # matlab_cp2tform.py:131-133; we score against the true target).
    rng = np.random.RandomState(3)
    src = rng.rand(5, 2) * 50
    theta, s, t = 0.3, 1.7, np.array([4.0, -2.0])
    R = np.array([[np.cos(theta), np.sin(theta)],
                  [-np.sin(theta), np.cos(theta)]])
    dst = s * src @ R + t
    trans, _ = fa.get_similarity_transform(src, dst, reflective=True)
    np.testing.assert_allclose(fa._tformfwd(trans, src), dst, atol=1e-8)

    # Reflected target: only the reflective solver can fit it exactly.
    dst_r = dst.copy()
    dst_r[:, 0] *= -1
    trans_r, _ = fa.get_similarity_transform(src, dst_r, reflective=True)
    np.testing.assert_allclose(fa._tformfwd(trans_r, src), dst_r, atol=1e-8)


def test_warp_and_crop_face():
    rng = np.random.RandomState(4)
    img = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
    pts = fa.get_reference_facial_points(default_square=True) + \
        rng.randn(5, 2) * 2
    face, tfm = fa.warp_and_crop_face(img, pts, crop_size=(112, 112))
    assert face.shape == (112, 112, 3) and tfm.shape == (2, 3)
    # Near-identity points → near-identity transform.
    assert abs(tfm[0, 0] - 1) < 0.2 and abs(tfm[1, 1] - 1) < 0.2


def test_reference_facial_points_default_square():
    pts = fa.get_reference_facial_points(default_square=True)
    # (96,112) layout shifted by (8, 0) to a 112x112 square.
    np.testing.assert_allclose(pts[0], fa.REFERENCE_FACIAL_POINTS[0]
                               + [8.0, 0.0], rtol=1e-6)


def test_ffhq_align_face():
    import PIL.Image

    rng = np.random.RandomState(5)
    img = PIL.Image.fromarray((rng.rand(256, 256, 3) * 255).astype(np.uint8))
    # Synthetic plausible landmarks: eyes, nose, mouth of a centered face.
    lm = np.zeros((68, 2))
    lm[36:42] = [100, 110] + rng.randn(6, 2)
    lm[42:48] = [156, 110] + rng.randn(6, 2)
    lm[27:36] = [128, 135] + rng.randn(9, 2)
    lm[48:60] = [128, 165] + rng.randn(12, 2)
    lm[48] = [105, 165]
    lm[54] = [151, 165]
    out = fa.align_face(img, lm, output_size=64, transform_size=256)
    assert out.size == (64, 64)


def test_detect_faces_pipeline_runs():
    import PIL.Image

    det = fm.MTCNN(weights_dir=WEIGHTS)
    rng = np.random.RandomState(6)
    img = PIL.Image.fromarray((rng.rand(96, 96, 3) * 255).astype(np.uint8))
    boxes, landmarks = det.detect_faces(img)
    assert boxes.shape[1] == 5 if len(boxes) else True
    assert landmarks.shape[1] == 10 if len(landmarks) else True
    # align() on a no-face image returns (None, None) or a valid crop.
    face, tfm = det.align(img)
    assert (face is None) == (tfm is None)


def test_align_face_5p_matches_68p():
    # The 5-point path must reproduce the 68-point alignment when the five
    # points are the quantities the 68-point recipe reduces to (eye means +
    # mouth corners, common.py:258-268).
    import PIL.Image

    rng = np.random.RandomState(7)
    img = PIL.Image.fromarray((rng.rand(256, 256, 3) * 255).astype(np.uint8))
    lm = np.zeros((68, 2))
    lm[36:42] = [100, 110] + rng.randn(6, 2)
    lm[42:48] = [156, 110] + rng.randn(6, 2)
    lm[27:36] = [128, 135] + rng.randn(9, 2)
    lm[48:60] = [128, 165] + rng.randn(12, 2)
    lm[48] = [105, 165]
    lm[54] = [151, 165]
    out68 = fa.align_face(img, lm, output_size=64, transform_size=256)

    lm5 = np.stack([lm[36:42].mean(axis=0), lm[42:48].mean(axis=0),
                    lm[27:36].mean(axis=0), lm[48], lm[54]])
    out5 = fa.align_face_5p(img, lm5, output_size=64, transform_size=256)
    np.testing.assert_array_equal(np.asarray(out68), np.asarray(out5))


def test_align_face_auto_from_mtcnn_landmarks():
    # align_face_auto drives the FFHQ quad from the best MTCNN detection's
    # ONet 5-point output (x0..x4, y0..y4 layout) with no landmark file.
    import PIL.Image

    rng = np.random.RandomState(8)
    img = PIL.Image.fromarray((rng.rand(256, 256, 3) * 255).astype(np.uint8))

    class FakeMTCNN:
        def detect_faces(self, image, **kw):
            boxes = np.array([[60, 80, 200, 210, 0.4],
                              [60, 80, 200, 210, 0.99]])
            lms = np.array([[0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                            [100.0, 156, 128, 105, 151,
                             110.0, 110, 135, 165, 165]])
            return boxes, lms

    out = fa.align_face_auto(img, output_size=64, transform_size=256,
                             mtcnn=FakeMTCNN())
    assert out is not None and out.size == (64, 64)

    want = fa.align_face_5p(
        img, np.array([[100, 110], [156, 110], [128, 135],
                       [105, 165], [151, 165]], dtype=np.float64),
        output_size=64, transform_size=256)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))

    class NoFace:
        def detect_faces(self, image, **kw):
            return np.zeros((0, 5)), np.zeros((0, 10))

    assert fa.align_face_auto(img, mtcnn=NoFace()) is None
