"""2D convolution with optional up/downsampling and FIR (anti-aliasing) filtering.

TPU-native re-expression of the reference dispatcher
(`DissimilarDomains/torch_utils/ops/conv2d_resample.py:59`).  The semantics are
the docstring chain: zero-insert upsample -> pad -> FIR filter -> (cross-)
correlate with the weight -> downsample.  Instead of the reference's
conv/conv_transpose fast paths, everything lowers onto
`lax.conv_general_dilated` so XLA can tile the main convolution onto the MXU:

* ``up > 1``   : input-dilated convolution with the weight on the *small*
                 input (the transposed-conv trick, `conv2d_resample.py:124-142`)
                 followed by the residual upfirdn2d.
* ``down > 1`` : FIR pre-filter then a strided convolution
                 (`conv2d_resample.py:118-122`).
* otherwise    : plain padded convolution.

No grouped per-sample convolution path exists here on purpose: modulated conv
uses the einsum formulation instead (see ops/modulated_conv2d.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from . import upfirdn2d as _updown


def _conv2d(
    x: jax.Array,
    w: jax.Array,  # [out, in, kh, kw]
    *,
    stride=(1, 1),
    padding=((0, 0), (0, 0)),
    lhs_dilation=(1, 1),
    groups: int = 1,
    flip_weight: bool = True,
) -> jax.Array:
    """Correlation (flip_weight=True) or convolution (False) over NCHW input."""
    if not flip_weight:
        w = jnp.flip(w, axis=(2, 3))
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        lhs_dilation=lhs_dilation,
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def conv2d_resample(
    x: jax.Array,
    w: jax.Array,
    f: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding: Union[int, Sequence[int]] = 0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
) -> jax.Array:
    """2D convolution of NCHW ``x`` with OIHW ``w`` and optional resampling.

    ``padding`` is w.r.t. the upsampled image; ``flip_weight`` True means
    correlation (as torch.conv2d), False true convolution.  ``f`` must come
    from :func:`gagan_tpu.ops.upfirdn2d.setup_filter`.
    """
    assert x.ndim == 4 and w.ndim == 4
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    out_channels, in_channels_per_group, kh, kw = w.shape
    fw, fh = _updown.filter_size(f)
    px0, px1, py0, py1 = _updown.parse_padding(padding)

    # Padding adjustment for resampling (reference conv2d_resample.py:94-104).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # 1x1 kernel + downsampling only: downsample first, then convolve.
    if kw == 1 and kh == 1 and down > 1 and up == 1:
        x = _updown.upfirdn2d(x, f, down=down, padding=[px0, px1, py0, py1],
                              flip_filter=flip_filter)
        return _conv2d(x, w, groups=groups, flip_weight=flip_weight)

    # 1x1 kernel + upsampling only: convolve first, then upsample.
    if kw == 1 and kh == 1 and up > 1 and down == 1:
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        return _updown.upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1],
                                 gain=up ** 2, flip_filter=flip_filter)

    # Downsampling only: FIR pre-filter, then strided convolution.
    if down > 1 and up == 1:
        x = _updown.upfirdn2d(x, f, padding=[px0, px1, py0, py1],
                              flip_filter=flip_filter)
        return _conv2d(x, w, stride=(down, down), groups=groups,
                       flip_weight=flip_weight)

    # Upsampling: input-dilated convolution on the small input, then the
    # residual FIR/padding.  The FIR commutes with the weight convolution
    # (both are LTI), which is what makes this reordering exact
    # (reference conv2d_resample.py:124-142).
    if up > 1:
        px0 -= kw - 1
        px1 -= kw - up
        py0 -= kh - 1
        py1 -= kh - up
        pxt = max(min(-px0, -px1), 0)
        pyt = max(min(-py0, -py1), 0)
        # The reference's conv_transpose2d(x, w.T, stride=up, padding=p) is,
        # as a lax op, an input-dilated conv with padding (k - 1 - p); torch's
        # in/out weight transpose and the transpose-conv's implicit spatial
        # flip cancel, leaving the same flip convention as the plain path.
        x = _conv2d(
            x, w,
            lhs_dilation=(up, up),
            padding=((kh - 1 - pyt, kh - 1 - pyt), (kw - 1 - pxt, kw - 1 - pxt)),
            groups=groups,
            flip_weight=flip_weight,
        )
        x = _updown.upfirdn2d(x, f, padding=[px0 + pxt, px1 + pxt,
                                             py0 + pyt, py1 + pyt],
                              gain=up ** 2, flip_filter=flip_filter)
        if down > 1:
            x = _updown.upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    # Plain convolution with symmetric non-negative padding.
    if up == 1 and down == 1:
        if px0 == px1 and py0 == py1 and px0 >= 0 and py0 >= 0:
            return _conv2d(x, w, padding=((py0, py0), (px0, px0)),
                           groups=groups, flip_weight=flip_weight)

    # Generic fallback.
    x = _updown.upfirdn2d(x, f if up > 1 else None, up=up,
                          padding=[px0, px1, py0, py1], gain=up ** 2,
                          flip_filter=flip_filter)
    x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = _updown.upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
