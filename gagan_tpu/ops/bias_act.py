"""Fused bias + activation + gain + clamp.

TPU-native equivalent of the reference CUDA op
(`DissimilarDomains/torch_utils/ops/bias_act.py:88`, kernels `bias_act.cu`) and
the rosinality `fused_leaky_relu`
(`SimilarDomains/gan_models/StyleGAN2/op/fused_act.py:85`).  On TPU the whole
chain is elementwise VPU work that XLA fuses into the preceding convolution,
so no hand-written kernel is needed; this module fixes the exact semantics
(activation registry, default gains, clamping) to match `_bias_act_ref`
(`bias_act.py:128-157`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ActivationSpec:
    func: Callable[..., jax.Array]
    def_alpha: float = 0.0
    def_gain: float = 1.0


# Registry mirrors reference `activation_funcs` (`bias_act.py:23-60`).
activation_funcs = {
    "linear": ActivationSpec(func=lambda x, **_: x, def_alpha=0, def_gain=1),
    "relu": ActivationSpec(
        func=lambda x, **_: jax.nn.relu(x), def_alpha=0, def_gain=float(np.sqrt(2))
    ),
    "lrelu": ActivationSpec(
        func=lambda x, alpha, **_: jnp.where(x >= 0, x, x * alpha),
        def_alpha=0.2,
        def_gain=float(np.sqrt(2)),
    ),
    "tanh": ActivationSpec(func=lambda x, **_: jnp.tanh(x), def_alpha=0, def_gain=1),
    "sigmoid": ActivationSpec(
        func=lambda x, **_: jax.nn.sigmoid(x), def_alpha=0, def_gain=1
    ),
    "elu": ActivationSpec(func=lambda x, **_: jax.nn.elu(x), def_alpha=0, def_gain=1),
    "selu": ActivationSpec(func=lambda x, **_: jax.nn.selu(x), def_alpha=0, def_gain=1),
    # log1p(exp(x)) with the x>20 linear tail, matching torch's formulation
    # bit-for-bit (jax.nn.softplus uses logaddexp, which differs by ~1e-4 in f32).
    "softplus": ActivationSpec(
        func=lambda x, **_: jnp.where(
            x > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0)))
        ),
        def_alpha=0,
        def_gain=1,
    ),
    "swish": ActivationSpec(
        func=lambda x, **_: jax.nn.sigmoid(x) * x,
        def_alpha=0,
        def_gain=float(np.sqrt(2)),
    ),
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    dim: int = 1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """Add per-channel bias, apply activation, scale by gain, clamp.

    ``dim`` selects the axis of ``x`` that ``b`` broadcasts over (the channel
    axis).  ``gain`` defaults to the activation's variance-preserving gain
    (e.g. sqrt(2) for lrelu).  ``clamp`` bounds the output to [-clamp, clamp].
    """
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)

    if b is not None:
        assert b.ndim == 1 and 0 <= dim < x.ndim
        x = x + jnp.reshape(b.astype(x.dtype), [-1 if i == dim else 1 for i in range(x.ndim)])

    x = spec.func(x, alpha=alpha)
    if gain != 1:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        assert clamp >= 0
        x = jnp.clip(x, -clamp, clamp)
    return x
