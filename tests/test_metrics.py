"""Metrics suite tests: math parity vs reference formulas, machinery, nets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gagan_tpu.metrics import feature_stats as fs
from gagan_tpu.metrics import fid as fid_lib
from gagan_tpu.metrics import inception as inc_lib
from gagan_tpu.metrics import inception_score as is_lib
from gagan_tpu.metrics import kid as kid_lib
from gagan_tpu.metrics import ppl as ppl_lib
from gagan_tpu.metrics import precision_recall as pr_lib
from gagan_tpu.metrics import vgg16 as vgg_lib
from gagan_tpu.metrics.detectors import Detector
from gagan_tpu.models import stylegan2 as sg2


def toy_detector(dim=8):
    # Deterministic projection of downsampled pixels.
    w = np.random.RandomState(0).randn(48, dim).astype(np.float32)

    def fn(images):
        x = images.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, x.shape[:2] + (4, 4), method="bilinear")
        return x.reshape(x.shape[0], -1) @ jnp.asarray(w)

    return Detector("toy", fn, dim)


def test_feature_stats_mean_cov():
    rng = np.random.RandomState(0)
    x = rng.randn(500, 8).astype(np.float32)
    stats = fs.FeatureStats(capture_mean_cov=True, capture_all=True)
    for i in range(0, 500, 64):
        stats.append(x[i:i + 64])
    mean, cov = stats.get_mean_cov()
    np.testing.assert_allclose(mean, x.mean(0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_array_equal(stats.get_all(), x)


def test_frechet_distance_known_value():
    # FID between two gaussians has closed form.
    mu1, mu2 = np.zeros(3), np.ones(3)
    s1 = np.eye(3)
    s2 = 4 * np.eye(3)
    # m = 3; trace(s1 + s2 - 2 sqrt(s1 s2)) = 3*(1 + 4 - 2*2) = 3
    want = 3.0 + 3.0
    got = fid_lib.frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_kid_zero_for_identical():
    rng = np.random.RandomState(1)
    x = rng.randn(200, 16).astype(np.float32)
    kid_same = kid_lib.kid_from_features(x, x.copy(), num_subsets=4,
                                         max_subset_size=100)
    y = x + 5.0
    kid_diff = kid_lib.kid_from_features(x, y, num_subsets=4,
                                         max_subset_size=100)
    # The unbiased MMD estimator has O(1/m) noise; identical distributions
    # must score far below a mean-shifted pair.
    assert abs(kid_same) < 0.05 * kid_diff
    assert kid_diff > 1.0


def test_precision_recall_sanity():
    rng = np.random.RandomState(2)
    real = rng.randn(200, 8).astype(np.float32)
    # gen == subset of real -> precision ~1; disjoint cluster -> low precision
    gen_good = real[:100] + rng.randn(100, 8).astype(np.float32) * 0.01
    p_good, r_good = pr_lib.knn_precision_recall(real, gen_good)
    gen_bad = rng.randn(100, 8).astype(np.float32) + 50.0
    p_bad, _ = pr_lib.knn_precision_recall(real, gen_bad)
    assert p_good > 0.9
    assert p_bad < 0.1


def test_inception_score_bounds():
    rng = np.random.RandomState(3)
    # Uniform probs -> IS = 1; one-hot diverse -> IS = num_classes
    probs = np.full((100, 10), 0.1, dtype=np.float64)
    mean, _ = is_lib.is_from_probs(probs, num_splits=2)
    np.testing.assert_allclose(mean, 1.0, rtol=1e-5)
    onehot = np.eye(10, dtype=np.float64)[rng.randint(0, 10, 100)] * 0.999 + 1e-4
    mean2, _ = is_lib.is_from_probs(onehot, num_splits=2)
    assert mean2 > 5.0


@pytest.mark.slow
def test_inception_v3_shapes():
    params = inc_lib.init_inception_v3(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (2, 3, 64, 64), np.uint8))
    feats = inc_lib.inception_v3_features(params, img)
    assert feats.shape == (2, 2048)
    f, logits, logits_b = inc_lib.inception_v3_features(
        params, img, return_logits=True)
    assert logits.shape == (2, 1008)
    assert bool(jnp.all(jnp.isfinite(f)))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    # pytorch-fid InceptionV3 has ~25.2M parameters (23.9M convs+bn + 2M fc).
    assert 23_000_000 < n_params < 28_000_000, n_params


@pytest.mark.slow
def test_vgg16_shapes():
    params = vgg_lib.init_vgg16(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (2, 3, 64, 64), np.uint8))
    feats = vgg_lib.vgg16_features(params, img)
    assert feats.shape == (2, 4096)
    lp = vgg_lib.vgg16_lpips(params, jnp.asarray(
        np.random.RandomState(1).randint(0, 255, (2, 3, 64, 64), np.uint8)))
    assert lp.ndim == 2 and lp.shape[0] == 2
    # identical images -> zero LPIPS distance
    a = vgg_lib.vgg16_lpips(params, img)
    d = jnp.sum(jnp.square(a[0] - a[1]))
    d_same = jnp.sum(jnp.square(a[0] - a[0]))
    assert float(d_same) == 0.0
    assert float(d) > 0.0


@pytest.fixture(scope="module")
def tiny_gen_and_data(tmp_path_factory):
    import PIL.Image

    from gagan_tpu.data import ImageFolderDataset

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(24):
        PIL.Image.fromarray(
            rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
                d / f"i{i:03d}.png")
    dataset = ImageFolderDataset(str(d))
    g_cfg = sg2.GeneratorConfig(
        z_dim=16, w_dim=16, img_resolution=16, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=1),
        synthesis=sg2.SynthesisConfig(channel_base=256, channel_max=16))
    params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    return g_cfg, params, dataset


def test_fid_machinery_end_to_end(tiny_gen_and_data, tmp_path):
    g_cfg, params, dataset = tiny_gen_and_data
    opts = fs.MetricOptions(
        g_params=params, g_cfg=g_cfg, dataset=dataset,
        detectors={"toy": toy_detector()}, batch_size=8,
        cache_dir=str(tmp_path / "cache"))
    value = fid_lib.compute_fid(opts, max_real=24, num_gen=16,
                                detector_name="toy")
    assert np.isfinite(value) and value >= 0
    # Dataset stats got cached; a second run reuses them.
    import os

    cache_files = os.listdir(tmp_path / "cache")
    assert len(cache_files) == 1
    value2 = fid_lib.compute_fid(opts, max_real=24, num_gen=16,
                                 detector_name="toy")
    np.testing.assert_allclose(value, value2, rtol=1e-3)


def test_ppl_machinery(tiny_gen_and_data):
    g_cfg, params, dataset = tiny_gen_and_data
    opts = fs.MetricOptions(
        g_params=params, g_cfg=g_cfg, dataset=dataset,
        detectors={"toy_lpips": toy_detector()}, batch_size=8)
    value = ppl_lib.compute_ppl(opts, num_samples=16, space="w",
                                sampling="end", crop=False,
                                detector_name="toy_lpips")
    assert np.isfinite(value) and value >= 0


def test_calc_metric_registry(tiny_gen_and_data, tmp_path):
    from gagan_tpu.metrics import calc_metric, is_valid_metric

    assert is_valid_metric("fid50k_full")
    assert is_valid_metric("fid3k")      # parametric family
    assert is_valid_metric("kid5k")      # registered (ref metric_main.py:146)
    assert is_valid_metric("kid3k")      # parametric family
    assert is_valid_metric("ppl2_wend")
    assert not is_valid_metric("nope")
    assert not is_valid_metric("pr3k")

    g_cfg, params, dataset = tiny_gen_and_data
    result = calc_metric(
        "fid1k", g_params=params, g_cfg=g_cfg, dataset=dataset,
        detectors={"inception": toy_detector()}, batch_size=8)
    assert "fid1k" in result["results"]
    assert np.isfinite(result["results"]["fid1k"])
    result = calc_metric(
        "kid1k", g_params=params, g_cfg=g_cfg, dataset=dataset,
        detectors={"inception": toy_detector()}, batch_size=8)
    assert np.isfinite(result["results"]["kid1k"])
