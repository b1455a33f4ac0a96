"""Style-modulated convolution (the StyleGAN2 core op), TPU-first.

The reference implements this twice — NVlabs `modulated_conv2d`
(`DissimilarDomains/training/networks.py:592-668`) with a per-sample grouped
convolution, and rosinality `ModulatedConv2d`
(`SimilarDomains/gan_models/StyleGAN2/model.py:176`) with the same trick.  On
TPU the grouped per-sample weights defeat MXU tiling, so this implementation
always uses the mathematically identical pre/post scaling form (the
reference's own `fused_modconv=False` path, `networks.py:641-653`):

    y = dcoef_n,o * conv(x * style_n,i, w)           (demodulated)
    dcoef_n,o = rsqrt( sum_i style_n,i^2 * ||w_o,i||^2 + 1e-8 )

which keeps one large batched convolution on the MXU and two cheap einsum
scalings that XLA fuses into neighbouring elementwise work.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .conv2d_resample import conv2d_resample


def modulated_conv2d(
    x: jax.Array,              # [N, C_in, H, W]
    weight: jax.Array,         # [C_out, C_in, kh, kw]
    styles: jax.Array,         # [N, C_in]
    noise: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: Optional[jax.Array] = None,
    demodulate: bool = True,
    flip_weight: bool = True,
    input_prenorm: bool = False,
) -> jax.Array:
    """Modulate, convolve, demodulate, and optionally add noise.

    ``input_prenorm`` reproduces the reference fp16 overflow guard
    (`networks.py:622-627`): normalize the weight per output channel by its
    inf-norm and the styles per sample by their inf-norm.  On TPU bfloat16
    shares float32's exponent range so this defaults to off; enable it for
    bit-parity tests against fp16 reference runs.
    """
    batch_size = x.shape[0]
    out_channels, in_channels, kh, kw = weight.shape
    assert styles.shape == (batch_size, in_channels)

    if input_prenorm and demodulate:
        norm = jnp.max(jnp.abs(weight), axis=(1, 2, 3), keepdims=True)
        weight = weight * (1.0 / jnp.sqrt(in_channels * kh * kw) / norm)
        styles = styles / jnp.max(jnp.abs(styles), axis=1, keepdims=True)

    dcoefs = None
    if demodulate:
        # sum_{i,a,b} (w[o,i,a,b] * s[n,i])^2 = sum_i s^2[n,i] * wsq[o,i]
        w32 = weight.astype(jnp.float32)
        s32 = styles.astype(jnp.float32)
        wsq = jnp.sum(jnp.square(w32), axis=(2, 3))                 # [O, I]
        dcoefs = jax.lax.rsqrt(
            jnp.einsum("ni,oi->no", jnp.square(s32), wsq) + 1e-8
        )                                                            # [N, O]

    x = x * styles.astype(x.dtype)[:, :, None, None]
    x = conv2d_resample(
        x, weight.astype(x.dtype), f=resample_filter,
        up=up, down=down, padding=padding, flip_weight=flip_weight,
    )

    if demodulate and noise is not None:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None] + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
