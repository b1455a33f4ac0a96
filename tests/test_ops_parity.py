"""Bit-parity of gagan_tpu.ops against the reference pure-PyTorch fallbacks."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gagan_tpu import ops

from . import oracle

ref_upfirdn2d, ref_bias_act, ref_conv2d_resample = oracle.ref_ops()


def t2n(t):
    return t.detach().cpu().numpy()


@pytest.mark.parametrize("up,down,padding", [
    (1, 1, 0),
    (1, 1, 2),
    (2, 1, 1),
    (1, 2, 1),
    (2, 1, (2, 1)),
    (1, 1, (1, 2, 3, 4)),
    (2, 2, (1, 1, 1, 1)),
    (1, 1, (-1, -1, -1, -1)),
    (2, 1, (-1, 2, 0, -2)),
    (4, 1, 2),
    (1, 4, 2),
])
@pytest.mark.parametrize("sep", [True, False])
def test_upfirdn2d_parity(up, down, padding, sep):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 12, 12).astype(np.float32)
    taps = np.asarray([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    f_t = ref_upfirdn2d.setup_filter(taps if sep else np.outer(taps, taps))
    f_j = ops.setup_filter(taps if sep else np.outer(taps, taps))
    assert f_t.ndim == f_j.ndim

    want = t2n(ref_upfirdn2d._upfirdn2d_ref(
        torch.from_numpy(x), f_t, up=up, down=down, padding=padding, gain=1.5))
    got = np.asarray(ops.upfirdn2d(jnp.asarray(x), f_j, up=up, down=down,
                                   padding=padding, gain=1.5))
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("flip_filter", [False, True])
def test_upfirdn2d_flip_filter(flip_filter):
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 9, 9).astype(np.float32)
    f = np.asarray([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    f_t = ref_upfirdn2d.setup_filter(f)
    f_j = ops.setup_filter(f)
    want = t2n(ref_upfirdn2d._upfirdn2d_ref(
        torch.from_numpy(x), f_t, up=2, padding=1, flip_filter=flip_filter))
    got = np.asarray(ops.upfirdn2d(jnp.asarray(x), f_j, up=2, padding=1,
                                   flip_filter=flip_filter))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_up_down_sample2d_parity():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    f_t = ref_upfirdn2d.setup_filter([1, 3, 3, 1])
    f_j = ops.setup_filter([1, 3, 3, 1])
    want = t2n(ref_upfirdn2d.upsample2d(torch.from_numpy(x), f_t, impl="ref"))
    got = np.asarray(ops.upsample2d(jnp.asarray(x), f_j))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    want = t2n(ref_upfirdn2d.downsample2d(torch.from_numpy(x), f_t, impl="ref"))
    got = np.asarray(ops.downsample2d(jnp.asarray(x), f_j))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("act", sorted(ops.activation_funcs))
@pytest.mark.parametrize("gain,clamp", [(None, None), (0.5, None), (None, 0.4), (2.0, 1.0)])
def test_bias_act_parity(act, gain, clamp):
    rng = np.random.RandomState(3)
    x = rng.randn(4, 8, 5, 5).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    want = t2n(ref_bias_act._bias_act_ref(
        torch.from_numpy(x), torch.from_numpy(b), act=act, gain=gain, clamp=clamp))
    got = np.asarray(ops.bias_act(jnp.asarray(x), jnp.asarray(b), act=act,
                                  gain=gain, clamp=clamp))
    # XLA CPU's vectorized transcendentals (exp/log1p/tanh) differ from libm
    # by ~1e-4 relative; piecewise-linear activations must match tightly.
    tol = 1e-5 if act in ("linear", "relu", "lrelu") else 5e-4
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_bias_act_dim():
    rng = np.random.RandomState(4)
    x = rng.randn(4, 6).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    want = t2n(ref_bias_act._bias_act_ref(
        torch.from_numpy(x), torch.from_numpy(b), dim=1, act="lrelu"))
    got = np.asarray(ops.bias_act(jnp.asarray(x), jnp.asarray(b), dim=1, act="lrelu"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kernel,up,down,padding,flip_weight", [
    (3, 1, 1, 1, True),
    (3, 2, 1, 1, False),   # synthesis up-conv configuration
    (3, 1, 2, 1, True),    # discriminator down-conv configuration
    (1, 1, 1, 0, True),    # torgb
    (1, 1, 2, 0, True),    # discriminator 1x1 skip with down
    (1, 2, 1, 0, False),   # 1x1 with up
    (4, 2, 1, 0, False),
    (3, 2, 2, 1, False),
    (3, 4, 1, 1, False),
])
def test_conv2d_resample_parity(kernel, up, down, padding, flip_weight):
    rng = np.random.RandomState(5)
    x = rng.randn(2, 5, 16, 16).astype(np.float32)
    w = rng.randn(7, 5, kernel, kernel).astype(np.float32)
    f_t = ref_upfirdn2d.setup_filter([1, 3, 3, 1])
    f_j = ops.setup_filter([1, 3, 3, 1])
    want = t2n(ref_conv2d_resample.conv2d_resample(
        torch.from_numpy(x), torch.from_numpy(w), f=f_t, up=up, down=down,
        padding=padding, flip_weight=flip_weight))
    got = np.asarray(ops.conv2d_resample(
        jnp.asarray(x), jnp.asarray(w), f=f_j, up=up, down=down,
        padding=padding, flip_weight=flip_weight))
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv2d_resample_groups():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 6, 10, 10).astype(np.float32)
    w = rng.randn(8, 3, 3, 3).astype(np.float32)  # 2 groups
    want = t2n(ref_conv2d_resample.conv2d_resample(
        torch.from_numpy(x), torch.from_numpy(w), padding=1, groups=2))
    got = np.asarray(ops.conv2d_resample(jnp.asarray(x), jnp.asarray(w),
                                         padding=1, groups=2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("demodulate,up,noise", [
    (True, 1, False),
    (True, 1, True),
    (False, 1, False),
    (True, 2, True),
])
def test_modulated_conv2d_parity(demodulate, up, noise):
    # Oracle: the reference NVlabs modulated_conv2d in its non-fused branch
    # (networks.py:641-653), which the fused grouped path equals exactly.
    networks = oracle.ref_networks()
    rng = np.random.RandomState(7)
    n, ci, co, k, res = 2, 6, 9, 3, 8
    x = rng.randn(n, ci, res, res).astype(np.float32)
    w = rng.randn(co, ci, k, k).astype(np.float32)
    s = rng.randn(n, ci).astype(np.float32)
    nz = rng.randn(n, co, res * up, res * up).astype(np.float32) if noise else None
    f_t = ref_upfirdn2d.setup_filter([1, 3, 3, 1])
    f_j = ops.setup_filter([1, 3, 3, 1])

    want = t2n(networks.modulated_conv2d(
        x=torch.from_numpy(x), weight=torch.from_numpy(w),
        styles=torch.from_numpy(s),
        noise=torch.from_numpy(nz) if noise else None,
        up=up, padding=k // 2, resample_filter=f_t if up > 1 else None,
        demodulate=demodulate, flip_weight=(up == 1), fused_modconv=False))
    got = np.asarray(ops.modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
        noise=jnp.asarray(nz) if noise else None,
        up=up, padding=k // 2, resample_filter=f_j if up > 1 else None,
        demodulate=demodulate, flip_weight=(up == 1)))
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_modulated_conv2d_fused_equivalence():
    # The reference's fused grouped-conv path must agree with our einsum form.
    networks = oracle.ref_networks()
    rng = np.random.RandomState(8)
    n, ci, co, k, res = 3, 4, 5, 3, 8
    x = rng.randn(n, ci, res, res).astype(np.float32)
    w = rng.randn(co, ci, k, k).astype(np.float32)
    s = rng.randn(n, ci).astype(np.float32)
    want = t2n(networks.modulated_conv2d(
        x=torch.from_numpy(x), weight=torch.from_numpy(w),
        styles=torch.from_numpy(s), padding=1, fused_modconv=True))
    got = np.asarray(ops.modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), padding=1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_packed_conv2x2_parity():
    # Minimal-FLOP packed stride-1 3x3: the pad-(1,1) 2x2-window kernel with
    # per-cell output slices must reproduce pack(conv2d(x, w, pad 1))
    # (fp-exact up to reassociation — the window summation order differs).
    import jax

    from gagan_tpu.ops import packed as pk

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 5, 16, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 5, 3, 3).astype(np.float32))
    ref = pk.pack(jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW")))
    got = pk.conv_packed_3x3_cells(pk.pack(x), pk.build_packed_conv2x2(w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and it matches the dense 3x3 packed form
    old = pk.conv_packed(pk.pack(x), pk.build_packed_conv3x3(w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(old),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pallas_fused_modconv_level_parity():
    # Slow tier: the Pallas level is default-OFF (a recorded measured dead
    # end, IMPLEMENTATION_STATUS.md); the shipping XLA modconv keeps its
    # reference parity tests in core.
    """The Pallas fused level (ops/pallas_modconv.py) reproduces the XLA
    path (modulated_conv2d + noise + bias_act) and all five gradients —
    run through the Pallas TPU interpreter on CPU."""
    import jax

    from gagan_tpu.ops import pallas_modconv as pmc
    from gagan_tpu.ops.bias_act import bias_act
    from gagan_tpu.ops.modulated_conv2d import modulated_conv2d

    rng = np.random.RandomState(3)
    n, c, h, w_res = 2, 128, 8, 128
    x = jnp.asarray(rng.randn(n, c, h, w_res).astype(np.float32))
    w = jnp.asarray(rng.randn(c, c, 3, 3).astype(np.float32) * 0.05)
    s = jnp.asarray(rng.randn(n, c).astype(np.float32) * 0.3 + 1.0)
    b = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    nz = jnp.asarray(rng.randn(n, 1, h, w_res).astype(np.float32) * 0.05)

    assert pmc.supported_shape(x.shape, w.shape)
    assert not pmc.supported_shape((2, 100, 8, 128), w.shape)   # channel tile
    assert not pmc.supported_shape((2, 128, 8, 64), w.shape)    # narrow W

    got = pmc.fused_modconv_level(x, w, s, b, noise=nz)
    ref = bias_act(modulated_conv2d(x, w, s, padding=1) + nz, b,
                   act="lrelu", clamp=256.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    def loss_p(x_, w_, s_, b_, nz_):
        return jnp.sum(jnp.sin(
            pmc.fused_modconv_level(x_, w_, s_, b_, noise=nz_)))

    def loss_r(x_, w_, s_, b_, nz_):
        y = modulated_conv2d(x_, w_, s_, padding=1) + nz_
        return jnp.sum(jnp.sin(bias_act(y, b_, act="lrelu", clamp=256.0)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(x, w, s, b, nz)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, w, s, b, nz)
    for a, c_ in zip(gp, gr):
        m = float(jnp.max(jnp.abs(c_))) + 1e-9
        np.testing.assert_allclose(np.asarray(a), np.asarray(c_),
                                   rtol=1e-3, atol=1e-3 * m)


@pytest.mark.slow
def test_pallas_level_flag_in_synthesis():
    """SynthesisConfig.pallas_level routes eligible levels through the
    fused kernel with outputs matching the XLA path; ineligible shapes
    (small W, odd channels) silently keep the XLA path.  Slow: a 128-res
    synthesis through the Pallas interpreter (~80 s on CPU)."""
    import jax

    from gagan_tpu.models import stylegan2 as sg2

    # W=128 blocks at >=128 channels so at least one level is eligible.
    cfg = sg2.SynthesisConfig(w_dim=64, img_resolution=128, channel_base=16384,
                              channel_max=128, num_fp16_res=0, conv_clamp=256)
    cfg_p = sg2.SynthesisConfig(**{**cfg.__dict__, "pallas_level": True})
    key = jax.random.PRNGKey(0)
    params = sg2.init_synthesis(key, cfg)
    ws = jax.random.normal(jax.random.PRNGKey(1),
                           (2, cfg.num_ws, cfg.w_dim))
    ref = sg2.synthesis_apply(cfg, params, ws, noise_mode="const")
    got = sg2.synthesis_apply(cfg_p, params, ws, noise_mode="const")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # Gradient route (first-order) agrees too.
    def loss(fn_cfg, p):
        img = sg2.synthesis_apply(fn_cfg, p, ws, noise_mode="const")
        return jnp.mean(jnp.square(img.astype(jnp.float32)))

    gr = jax.grad(lambda p: loss(cfg, p))(params)
    gp = jax.grad(lambda p: loss(cfg_p, p))(params)
    flat_r = jax.tree_util.tree_leaves(gr)
    flat_p = jax.tree_util.tree_leaves(gp)
    for a, b in zip(flat_p, flat_r):
        m = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3 * m)


@pytest.mark.parametrize("shape,out_hw,method", [
    ((2, 3, 64, 96), (20, 32), "bicubic"),     # downscale, antialias active
    ((2, 3, 33, 47), (128, 100), "bilinear"),  # upscale
    ((1, 3, 1024, 1024), (224, 224), "bicubic"),  # the CLIP hot shape
    ((2, 3, 64, 64), (64, 32), "bicubic"),     # one dim unchanged
])
def test_resize2d_matches_jax_image_resize(shape, out_hw, method):
    # ops.resize: constant-weight matmul resize == jax.image.resize
    # (jax/_src/image/scale.py compute_weight_mat port).
    import jax

    from gagan_tpu.ops import resize as rz

    x = jax.random.normal(jax.random.PRNGKey(7), shape, jnp.float32)
    want = jax.image.resize(x, shape[:2] + out_hw, method)
    got = rz.resize2d(x, out_hw, method=method, precision="highest")
    # atol 1e-4: fp64-built weights vs jax's fp32 in-graph weights differ at
    # ~1e-7/tap, accumulated over up-to-1024-tap dots.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_resize2d_grad_is_transposed_matmul():
    import jax

    from gagan_tpu.ops import resize as rz

    x = jax.random.normal(jax.random.PRNGKey(8), (1, 2, 16, 16), jnp.float32)

    def f(x):
        y = rz.resize2d(x, (7, 7), precision="highest")
        return jnp.sum(y * y)

    def f_ref(x):
        y = jax.image.resize(x, (1, 2, 7, 7), "bicubic")
        return jnp.sum(y * y)

    ga = jax.grad(f)(x)
    gb = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-5, atol=1e-6)
