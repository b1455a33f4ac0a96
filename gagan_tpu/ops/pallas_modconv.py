"""Pallas fused modulated-conv synthesis level for TPU.

One kernel computes the whole StyleGAN2 SynthesisLayer hot path for the
stride-1 3x3 case (reference `DissimilarDomains/training/networks.py:592-668`
modulated_conv2d + noise + bias_act, `networks.py:848-922`):

    y = act( dcoef_{n,o} * conv3x3( styles_{n,i} * x, W ) + noise + bias )

entirely in VMEM, with x read ONCE from HBM and y written ONCE.  The XLA
path (ops/modulated_conv2d.py) materializes the pre-scaled input because
convolution operands cannot take fused producers; the backward additionally
re-reads the saved pre-scaled copy.  This kernel removes those passes — the
headroom at the HBM-bound high-res levels (IMPLEMENTATION_STATUS.md
"Training-throughput plan" item 1).

Kernel geometry (all Mosaic-friendly):
* images travel as [N, C, H*W] (a free bitcast of NCHW); every in-kernel
  tensor is 2D with the row-tile of H*W on the lane axis, C on sublanes;
* the per-sample modulation/demodulation folds INTO THE WEIGHT TAPS:
  (d_o * W_oi * s_i) @ x == d * conv(s*x, W) — computed once per grid step
  on [C_out_t, C_in] tiles, so the inner loop is 9 static-slice matmuls;
* per-sample rows (styles / dcoefs) arrive via BlockSpec index maps
  ((n, cot) -> their row), never via dynamic lane indexing;
* weights are passed tap-major [9, C_out, C_in] (minor dims MXU-tiled;
  the natural OIHW layout would pad (3,3) minor tiles to (8,128));
* the x row-window (with one halo row each side) is double-buffered by
  manual DMA; column wrap-around is masked, row edges are zero-filled.

Scope (asserted by `supported_shape`): kernel 3x3, stride 1, no
up/downsampling, W a multiple of 128 and channels multiples of the MXU
tile — i.e. the unpacked mid-res levels and the packed-tail convs
(ops/packed.py packs res>=512 onto exactly such shapes).  Other shapes
keep the XLA path.

Differentiation: `fused_modconv3x3` carries a custom VJP whose backward is
composed XLA (conv_transpose for dx, a batch-contracting conv for dW,
einsum reductions for dstyles/ddcoefs/dbias/dnoise), recomputing the
pre-demod conv output u instead of storing it.  The custom VJP is
first-order only — the training step keeps the XLA path for the
double-grad reg phases (PL / R1) via the reg-phase config override
(train_step.make_phase_steps reg_g_cfg/reg_d_cfg).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.2


def _row_tile(h: int, w: int) -> int:
    """Rows per inner tile: aim for ~2048-lane matmul operands."""
    return max(1, min(h // 2, 2048 // w))


def supported_shape(x_shape, w_shape, up: int = 1, down: int = 1) -> bool:
    """Whether the fused kernel covers this level (else use the XLA path)."""
    n, c_in, h, w = x_shape
    c_out, c_in2, kh, kw = w_shape
    th = _row_tile(h, w)
    return (
        up == 1 and down == 1 and kh == 3 and kw == 3 and c_in == c_in2
        and w >= 128 and w % 128 == 0
        and c_in % 128 == 0 and c_out % 128 == 0
        and h % th == 0 and h // th >= 2
    )


def _kernel(styles_ref, dcoefs_ref, bias_ref, w_ref, x_hbm, noise_hbm,
            out_hbm, xwin, nwin, ybuf, xsem, nsem, ysem, *,
            TH: int, W: int, H: int, C_in: int, CO_T: int,
            act_gain: float, act_slope: float, clamp: Optional[float],
            has_noise: bool, out_dtype):
    n = pl.program_id(0)
    cot = pl.program_id(1)
    RT = H // TH
    THW = TH * W
    WIN = (TH + 2) * W
    PAD = 128          # leading zero lanes: tap slices start at PAD-1 >= 0

    def _for_each_x_copy(rt, slot, op):
        # Window = flat lanes [(rt*TH - 1) * W, (rt*TH + TH + 1) * W)
        # clipped to the image; edge rows are zeroed after the wait.  Three
        # static-size variants (the wait must mirror the start's bytes);
        # descriptors are built inside the taken branch only.
        first = rt == 0
        last = rt == RT - 1
        inner = jnp.logical_and(jnp.logical_not(first), jnp.logical_not(last))
        variants = [
            (inner, lambda: pltpu.make_async_copy(
                x_hbm.at[n, :, pl.ds((rt * TH - 1) * W, WIN)],
                xwin.at[slot, :, PAD:PAD + WIN], xsem.at[slot])),
            (first, lambda: pltpu.make_async_copy(
                x_hbm.at[n, :, pl.ds(0, WIN - W)],
                xwin.at[slot, :, PAD + W:PAD + WIN], xsem.at[slot])),
            (last, lambda: pltpu.make_async_copy(
                x_hbm.at[n, :, pl.ds((rt * TH - 1) * W, WIN - W)],
                xwin.at[slot, :, PAD:PAD + WIN - W], xsem.at[slot])),
        ]
        for cond, make in variants:
            @pl.when(cond)
            def _(make=make):
                op(make())

    def start_x(rt, slot):
        _for_each_x_copy(rt, slot, lambda dma: dma.start())
        if has_noise:
            pltpu.make_async_copy(noise_hbm.at[n, rt],
                                  nwin.at[slot, 0], nsem.at[slot]).start()

    def wait_x(rt, slot):
        _for_each_x_copy(rt, slot, lambda dma: dma.wait())
        if has_noise:
            pltpu.make_async_copy(noise_hbm.at[n, rt],
                                  nwin.at[slot, 0], nsem.at[slot]).wait()

    def y_dma(rt, slot):
        return pltpu.make_async_copy(
            ybuf.at[slot],
            out_hbm.at[n, pl.ds(cot * CO_T, CO_T), pl.ds(rt * THW, THW)],
            ysem.at[slot])

    # Zero the pad lanes once (taps (0,0) / (2,2) read one lane past
    # the window; the values are masked but must not be NaN garbage).
    for sl in (0, 1):
        xwin[sl, :, 0:PAD] = jnp.zeros((C_in, PAD), xwin.dtype)
        xwin[sl, :, PAD + WIN:] = jnp.zeros((C_in, PAD), xwin.dtype)
    start_x(0, 0)

    # Fold modulation + demodulation into the 9 weight taps, once per
    # (n, cot) grid step: (d_o W_oi s_i) @ x == d * conv(s * x, W).
    s_row = styles_ref[0]                       # [1, C_in]   (this sample)
    d_col = dcoefs_ref[0]                       # [CO_T, 1]   (this tile)
    b_col = bias_ref[:, :]                      # [CO_T, 1]
    taps = [
        (w_ref[t] * s_row * d_col).astype(xwin.dtype)   # [CO_T, C_in]
        for t in range(9)
    ]

    # Wrap masks for the column taps on the flattened lane axis (dx=0
    # reads col w-1: invalid at w=0; dx=2 reads col w+1: invalid at W-1).
    col = jax.lax.broadcasted_iota(jnp.int32, (1, THW), 1) % W
    mask_l = col != 0
    mask_r = col != W - 1

    def body(rt, _):
        slot = rt % 2

        @pl.when(rt + 1 < RT)
        def _():
            start_x(rt + 1, (rt + 1) % 2)

        wait_x(rt, slot)

        @pl.when(rt == 0)
        def _():
            xwin[slot, :, PAD:PAD + W] = jnp.zeros((C_in, W), xwin.dtype)

        @pl.when(rt == RT - 1)
        def _():
            xwin[slot, :, PAD + WIN - W:PAD + WIN] = jnp.zeros(
                (C_in, W), xwin.dtype)

        xw = xwin[slot]                                 # [C_in, PAD + WIN]
        acc = jnp.zeros((CO_T, THW), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                # Static (unaligned for dx != 1) lane slice selecting
                # input position (h + dy - 1, w + dx - 1); cross-row
                # bleed-through at the dx edges is masked.
                start = PAD + dy * W + dx - 1
                tap_x = xw[:, start:start + THW]              # [C_in, THW]
                if dx == 0:
                    tap_x = jnp.where(mask_l, tap_x, 0.0)
                elif dx == 2:
                    tap_x = jnp.where(mask_r, tap_x, 0.0)
                acc = acc + jax.lax.dot_general(
                    taps[dy * 3 + dx], tap_x,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        y = acc
        if has_noise:
            y = y + nwin[slot]
        y = y + b_col
        y = act_gain * (jnp.maximum(y, 0.0) + act_slope * jnp.minimum(y, 0.0))
        if clamp is not None:
            y = jnp.clip(y, -clamp, clamp)

        @pl.when(rt >= 2)
        def _():
            y_dma(rt - 2, slot).wait()

        ybuf[slot] = y.astype(out_dtype)
        y_dma(rt, slot).start()
        return 0

    jax.lax.fori_loop(0, RT, body, 0)
    y_dma(RT - 2, (RT - 2) % 2).wait()
    y_dma(RT - 1, (RT - 1) % 2).wait()


def _fused_forward(x, w, styles, dcoefs, noise, bias, act_gain, act_slope,
                   clamp):
    N, C_in, H, W = x.shape
    C_out = w.shape[0]
    TH = _row_tile(H, W)
    RT = H // TH
    CO_T = min(C_out, 128 if C_in >= 256 else 256)
    assert C_out % CO_T == 0
    has_noise = noise is not None
    if has_noise:
        noise_flat = noise.astype(jnp.float32).reshape(N, RT, TH * W)
    else:
        noise_flat = jnp.zeros((N, 1, 1), jnp.float32)  # placeholder operand

    kernel = functools.partial(
        _kernel, TH=TH, W=W, H=H, C_in=C_in, CO_T=CO_T,
        act_gain=float(act_gain), act_slope=float(act_slope),
        clamp=None if clamp is None else float(clamp),
        has_noise=has_noise, out_dtype=x.dtype)

    # Tap-major weights: [9, C_out, C_in] so the VMEM minor dims are the
    # MXU-tiled channel tile (OIHW's (3, 3) minor dims would pad to
    # (8, 128) tiles — a ~340x VMEM blowup).
    w_taps = jnp.transpose(w.astype(jnp.float32), (2, 3, 0, 1)).reshape(
        9, C_out, C_in)

    flops = 2 * N * C_out * C_in * 9 * H * W
    bytesrw = (x.size * x.dtype.itemsize + N * C_out * H * W * x.dtype.itemsize
               + w.size * 4)
    out = pl.pallas_call(
        kernel,
        grid=(N, C_out // CO_T),
        in_specs=[
            # Block last-two dims must be (divisible by (8, 128)) or
            # equal to the array dims — hence the singleton middle axis.
            pl.BlockSpec((1, 1, C_in), lambda n, c: (n, 0, 0),
                         memory_space=pltpu.VMEM),       # styles row
            pl.BlockSpec((1, CO_T, 1), lambda n, c: (n, c, 0),
                         memory_space=pltpu.VMEM),       # dcoefs column
            pl.BlockSpec((CO_T, 1), lambda n, c: (c, 0),
                         memory_space=pltpu.VMEM),       # bias column
            pl.BlockSpec((9, CO_T, C_in), lambda n, c: (0, c, 0),
                         memory_space=pltpu.VMEM),       # weight taps
            pl.BlockSpec(memory_space=pltpu.ANY),        # x (manual DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),        # noise (manual DMA)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # y (manual DMA)
        out_shape=jax.ShapeDtypeStruct((N, C_out, H * W), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, C_in, 128 + (TH + 2) * W + 128),
                       x.dtype),                            # x windows
            pltpu.VMEM((2, 1, TH * W), jnp.float32),        # noise windows
            pltpu.VMEM((2, CO_T, TH * W), x.dtype),         # y staging
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytesrw,
                                      transcendentals=0),
        # CPU (tests): run the TPU kernel under the Pallas interpreter.
        interpret=jax.default_backend() == "cpu",
    )(styles.astype(jnp.float32)[:, None, :],
      dcoefs.astype(jnp.float32)[:, :, None],
      bias.astype(jnp.float32)[:, None], w_taps,
      x.reshape(N, C_in, H * W), noise_flat)
    return out.reshape(N, C_out, H, W)


# ----------------------------------------------------------------------------
# custom-VJP wrapper (first-order; reg phases keep the XLA path)


def _act_grad(ypre, act_gain, act_slope, clamp):
    """d act(ypre) / d ypre for the clamped scaled leaky-ReLU."""
    slope = jnp.where(ypre >= 0, act_gain, act_gain * act_slope)
    if clamp is not None:
        a = act_gain * (jnp.maximum(ypre, 0) + act_slope * jnp.minimum(ypre, 0))
        slope = jnp.where(jnp.abs(a) < clamp, slope, 0.0)
    return slope


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_modconv3x3(x, w, styles, dcoefs, noise, bias,
                     act_gain=float(np.sqrt(2.0)), act_slope=LRELU_SLOPE,
                     clamp: Optional[float] = 256.0):
    """act(dcoef * conv3x3(styles * x, w) + noise + bias), fused on TPU.

    x [N,C_in,H,W]; w [C_out,C_in,3,3]; styles [N,C_in]; dcoefs [N,C_out]
    (pass ones for demodulate=False); noise [N,1,H,W] already scaled by
    noise_strength, or None; bias [C_out].
    """
    return _fused_forward(x, w, styles, dcoefs, noise, bias, act_gain,
                          act_slope, clamp)


def _fwd(x, w, styles, dcoefs, noise, bias, act_gain, act_slope, clamp):
    y = _fused_forward(x, w, styles, dcoefs, noise, bias, act_gain,
                       act_slope, clamp)
    return y, (x, w, styles, dcoefs, noise, bias)


def _bwd(act_gain, act_slope, clamp, res, g):
    x, w, styles, dcoefs, noise, bias = res
    f32 = jnp.float32
    # Recompute the pre-demod conv output u (remat: flops for bytes — these
    # levels are HBM-bound).
    sx = x * styles.astype(x.dtype)[:, :, None, None]
    u = _xla_conv(sx, w)
    ypre = u.astype(f32) * dcoefs[:, :, None, None]
    if noise is not None:
        ypre = ypre + noise
    ypre = ypre + bias.astype(f32)[None, :, None, None]
    gpre = g.astype(f32) * _act_grad(ypre, act_gain, act_slope, clamp)

    dbias = jnp.sum(gpre, axis=(0, 2, 3))
    dnoise = (jnp.sum(gpre, axis=1, keepdims=True)
              if noise is not None else None)
    ddcoefs = jnp.einsum("nohw,nohw->no", gpre, u.astype(f32))
    du = (gpre * dcoefs[:, :, None, None]).astype(x.dtype)

    # dx through the conv: conv_transpose == conv with spatially flipped,
    # in/out-swapped weights (stride 1, pad 1).
    w_t = jnp.flip(jnp.swapaxes(w, 0, 1), axis=(2, 3))
    dsx = _xla_conv(du, w_t)
    dx = dsx * styles.astype(x.dtype)[:, :, None, None]
    dstyles = jnp.einsum("nihw,nihw->ni", dsx.astype(f32), x.astype(f32))

    # dW[o,i,ky,kx] = sum_{n,h,w} sx[n,i,h+ky-1,w+kx-1] * du[n,o,h,w]:
    # a conv contracting the batch dim — lhs batch role goes to C_in,
    # lhs feature role to n (contracted with du's n), window = du's HxW.
    dw_t = jax.lax.conv_general_dilated(
        sx.astype(f32), du.astype(f32), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("CNHW", "IOHW", "NCHW"))    # -> [C_in, C_out, 3, 3]
    dw = jnp.swapaxes(dw_t, 0, 1)

    return (dx, dw.astype(w.dtype), dstyles.astype(styles.dtype),
            ddcoefs.astype(dcoefs.dtype), dnoise, dbias.astype(bias.dtype))


fused_modconv3x3.defvjp(_fwd, _bwd)


def fused_modconv_level(x, w, styles, bias, noise=None, demodulate=True,
                        act_gain=float(np.sqrt(2.0)), act_slope=LRELU_SLOPE,
                        clamp: Optional[float] = 256.0):
    """Full synthesis-level forward via the fused kernel.

    Computes the demodulation coefficients in XLA (tiny [N,C]x[O,I]
    einsum; keeping it outside the custom op lets autodiff carry the
    dcoef->styles/weight chain rule exactly) and dispatches the fused
    Pallas kernel for everything x-sized.
    """
    if demodulate:
        w32 = w.astype(jnp.float32)
        s32 = styles.astype(jnp.float32)
        wsq = jnp.sum(jnp.square(w32), axis=(2, 3))
        dcoefs = jax.lax.rsqrt(
            jnp.einsum("ni,oi->no", jnp.square(s32), wsq) + 1e-8)
    else:
        dcoefs = jnp.ones((x.shape[0], w.shape[0]), jnp.float32)
    return fused_modconv3x3(x, w, styles, dcoefs, noise, bias,
                            act_gain, act_slope, clamp)
