"""pSp/e4e encoder parity vs the reference torch implementation (random
weights, converted), plus wrapper behavior."""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.inversion import encoders as enc
from gagan_tpu.utils import checkpoint as ckpt_lib

from . import oracle  # noqa: F401  (adds reference paths)


@pytest.fixture(scope="module")
def ref_pair():
    import sys

    sys.path.insert(0, "/root/reference/SimilarDomains")
    from restyle_encoders.encoders import psp_encoders

    opts = types.SimpleNamespace(stylegan_size=256)
    torch.manual_seed(0)
    psp = psp_encoders.GradualStyleEncoder(50, "ir_se", opts).eval()
    e4e = psp_encoders.Encoder4Editing(50, "ir_se", opts).eval()
    # Share weights: load psp weights into e4e where names coincide.
    e4e.load_state_dict(psp.state_dict(), strict=False)

    cfg = enc.EncoderConfig(stylegan_size=256)
    params = ckpt_lib.flat_to_tree(
        {k: v.detach().numpy() for k, v in psp.state_dict().items()
         if "num_batches_tracked" not in k})
    return psp, e4e, cfg, params


def test_backbone_taps(ref_pair):
    psp, _, cfg, params = ref_pair
    x = np.random.RandomState(0).randn(1, 3, 256, 256).astype(np.float32)
    feats = enc.backbone_features(params, jnp.asarray(x))
    assert feats["c1"].shape == (1, 128, 64, 64)
    assert feats["c2"].shape == (1, 256, 32, 32)
    assert feats["c3"].shape == (1, 512, 16, 16)


@pytest.mark.slow
def test_psp_parity(ref_pair):
    # Slow tier: pSp and e4e share the backbone+taps (covered in core by
    # test_backbone_taps) and differ only in the style-head arrangement;
    # e4e (the encoder the difa_w path ships with) keeps core parity.
    psp, _, cfg, params = ref_pair
    x = np.random.RandomState(1).randn(1, 3, 256, 256).astype(np.float32)
    with torch.no_grad():
        want = psp(torch.from_numpy(x)).numpy()
    got = np.asarray(enc.psp_encode(cfg, params, jnp.asarray(x)))
    assert got.shape == want.shape == (1, cfg.style_count, 512)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_e4e_parity(ref_pair):
    _, e4e, cfg, params = ref_pair
    x = np.random.RandomState(2).randn(1, 3, 256, 256).astype(np.float32)
    with torch.no_grad():
        want = e4e(torch.from_numpy(x)).numpy()
    got = np.asarray(enc.e4e_encode(cfg, params, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_wrapper_latent_avg(ref_pair):
    _, _, cfg, params = ref_pair
    x = jnp.asarray(np.random.RandomState(3).randn(1, 3, 64, 64)
                    .astype(np.float32))
    avg = jnp.ones((cfg.style_count, 512))
    ws = enc.encode_image_to_wplus(cfg, params, x, latent_avg=avg)
    ws0 = enc.encode_image_to_wplus(cfg, params, x)
    np.testing.assert_allclose(np.asarray(ws - ws0), 1.0, rtol=1e-4)


def test_e4e_latent_discriminator_parity():
    # Oracle: reference e4e_modules/discriminator.py (plain torch MLP).
    import importlib.util

    import torch

    from gagan_tpu.inversion import e4e_training as e4e

    spec = importlib.util.spec_from_file_location(
        "ref_e4e_disc",
        "/root/reference/SimilarDomains/restyle_encoders/e4e_modules/"
        "discriminator.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    torch.manual_seed(0)
    net = ref.LatentCodesDiscriminator(style_dim=512, n_mlp=4).eval()
    params = {}
    for name, tensor in net.state_dict().items():
        layer = ".".join(name.split(".")[:2])
        params.setdefault(layer, {})[name.split(".")[-1]] = jnp.asarray(
            tensor.numpy())
    w = np.random.RandomState(1).randn(3, 512).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(w)).numpy()
    got = np.asarray(e4e.latent_discriminator_apply(params, jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # Losses are finite and R1 is zero for a constant discriminator.
    real = jnp.asarray(w)
    fake = jnp.asarray(w + 1.0)
    rp = e4e.latent_discriminator_apply(params, real)
    fp = e4e.latent_discriminator_apply(params, fake)
    assert np.isfinite(float(e4e.d_logistic_loss(rp, fp)))
    assert np.isfinite(float(e4e.g_nonsaturating_loss(fp)))
    assert float(e4e.d_r1_loss(params, real)) > 0


def test_e4e_latent_pool():
    from gagan_tpu.inversion.e4e_training import LatentCodesPool

    pool = LatentCodesPool(pool_size=4, seed=0)
    rng = np.random.RandomState(2)
    first = rng.randn(4, 512).astype(np.float32)
    out = pool.query(first)
    np.testing.assert_array_equal(out, first)  # fills the buffer verbatim
    # Subsequent queries mix current and replayed codes.
    second = rng.randn(8, 512).astype(np.float32)
    out2 = pool.query(second)
    assert out2.shape == (8, 512)
    replayed = sum(
        1 for i in range(8)
        if not any(np.array_equal(out2[i], second[j]) for j in range(8)))
    assert replayed > 0
    # W+ input: one random layer picked per sample.
    wplus = rng.randn(2, 18, 512).astype(np.float32)
    out3 = pool.query(wplus)
    assert out3.shape == (2, 512)
    # pool_size=0 passes through.
    assert LatentCodesPool(0).query(second).shape == second.shape
