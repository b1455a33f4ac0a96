"""StyleFlow: conditional continuous normalizing flow over W+ latents.

Port of `SimilarDomains/editing/styleflow/` (identical copy in
DissimilarDomains): ConcatSquash ODE net (`diffeq_layers.py:73-88`), the
conditional ODE function (`odefunc.py:104-141`), the CNF/SequentialFlow
integration chain with MovingBatchNorm (`cnf.py:9-100`, `flow.py:43-77`) and
the attribute editor (`editor.py:9-93`).

TPU-native solver: torchdiffeq's adaptive dopri5 + adjoint becomes a
fixed-grid RK4 under `lax.scan` — static step count, fully jittable, and for
inference-time editing (no log-det needed) the divergence term is dropped.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class StyleFlowConfig:
    input_dim: int = 512
    hidden_dims: Tuple[int, ...] = (512, 512, 512, 512, 512)
    context_dim: int = 17              # 9 lighting + 8 attributes
    num_blocks: int = 1
    rk4_steps: int = 40


def _concat_squash(p: Params, context: jax.Array, x: jax.Array) -> jax.Array:
    """(diffeq_layers.py:73-88): layer(x) * sigmoid(gate(ctx)) + bias(ctx)."""
    gate = jax.nn.sigmoid(context @ p["_hyper_gate"]["weight"].T
                          + p["_hyper_gate"]["bias"])
    bias = context @ p["_hyper_bias"]["weight"].T
    y = x @ p["_layer"]["weight"].T + p["_layer"]["bias"]
    if x.ndim == 3:
        gate = gate[:, None]
        bias = bias[:, None]
    return y * gate + bias


def _odenet(p: Params, cfg: StyleFlowConfig, t, context, x):
    """ODEnet with tanh nonlinearities (odefunc.py:60-101)."""
    tc = jnp.concatenate(
        [jnp.full((x.shape[0], 1), t), context.reshape(x.shape[0], -1)],
        axis=1)
    dx = x
    n_layers = len(cfg.hidden_dims) + 1
    for i in range(n_layers):
        dx = _concat_squash(p["layers"][str(i)], tc, dx)
        if i < n_layers - 1:
            dx = jnp.tanh(dx)
    return dx


def _moving_bn(p: Params, x: jax.Array, reverse: bool,
               eps: float = 1e-4) -> jax.Array:
    """MovingBatchNorm1d at inference (normalization.py): running stats."""
    mean = p["running_mean"]
    var = p["running_var"]
    if not reverse:
        return (x - mean) * jax.lax.rsqrt(var + eps)
    return x * jnp.sqrt(var + eps) + mean


def _cnf_integrate(p: Params, cfg: StyleFlowConfig, x, context,
                   reverse: bool) -> jax.Array:
    """Fixed-grid RK4 over t in [0, sqrt_end_time^2] (cnf.py:57-100)."""
    T = jnp.square(p["sqrt_end_time"]).reshape(())
    h = T / cfg.rk4_steps * (1.0 if not reverse else -1.0)
    t0 = jnp.where(reverse, T, 0.0)

    def f(t, y):
        return _odenet(p["odefunc"]["diffeq"], cfg, t, context, y)

    def rk4_step(carry, i):
        y, t = carry
        k1 = f(t, y)
        k2 = f(t + h / 2, y + h / 2 * k1)
        k3 = f(t + h / 2, y + h / 2 * k2)
        k4 = f(t + h, y + h * k3)
        y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        return (y, t + h), None

    (y, _), _ = jax.lax.scan(rk4_step, (x, t0), jnp.arange(cfg.rk4_steps))
    return y


def flow_apply(params: Params, cfg: StyleFlowConfig, x: jax.Array,
               context: jax.Array, reverse: bool = False) -> jax.Array:
    """SequentialFlow forward (cnf.py:16-31): bn / cnf / bn chain, reversed
    order and directions when ``reverse``."""
    chain: List[Tuple[str, str]] = [("bn", "0")]
    for b in range(cfg.num_blocks):
        chain.append(("cnf", str(b)))
        chain.append(("bn", str(b + 1)))
    if reverse:
        chain = chain[::-1]
    for kind, idx in chain:
        if kind == "bn":
            x = _moving_bn(params["bn"][idx], x, reverse)
        else:
            x = _cnf_integrate(params["cnf"][idx], cfg, x, context, reverse)
    return x


def init_styleflow(key, cfg: StyleFlowConfig) -> Params:
    def lin(k, n_in, n_out, bias=True):
        p = {"weight": jax.random.normal(k, (n_out, n_in)) * 0.01}
        if bias:
            p["bias"] = jnp.zeros((n_out,))
        return p

    dims = (cfg.input_dim,) + cfg.hidden_dims + (cfg.input_dim,)
    cnf_blocks = {}
    for b in range(cfg.num_blocks):
        layers = {}
        for i in range(len(dims) - 1):
            k = jax.random.fold_in(key, b * 100 + i)
            layers[str(i)] = {
                "_layer": lin(jax.random.fold_in(k, 0), dims[i], dims[i + 1]),
                "_hyper_bias": lin(jax.random.fold_in(k, 1),
                                   1 + cfg.context_dim, dims[i + 1],
                                   bias=False),
                "_hyper_gate": lin(jax.random.fold_in(k, 2),
                                   1 + cfg.context_dim, dims[i + 1]),
            }
        cnf_blocks[str(b)] = {
            "odefunc": {"diffeq": {"layers": layers}},
            "sqrt_end_time": jnp.ones(()),
        }
    bns = {str(i): {"running_mean": jnp.zeros((cfg.input_dim,)),
                    "running_var": jnp.ones((cfg.input_dim,))}
           for i in range(cfg.num_blocks + 1)}
    return {"cnf": cnf_blocks, "bn": bns}


# ----------------------------------------------------------------------------
# Attribute editor (editor.py:9-93).

ATTR_ORDER = ["Gender", "Glasses", "Yaw", "Pitch", "Baldness", "Beard",
              "Age", "Expression"]
LIGHTING_ORDER = ["Left->Right", "Right->Left", "Down->Up", "Up->Down",
                  "No light", "Front light"]
ATTR_DEGREE = [1.5, 2.5, 1.0, 1.0, 2.0, 1.7, 0.93, 1.0]
MIN_VAL = {"Gender": 0, "Glasses": 0, "Yaw": -20, "Pitch": -20,
           "Baldness": 0, "Beard": 0.0, "Age": 0, "Expression": 0}
MAX_VAL = {"Gender": 1, "Glasses": 1, "Yaw": 20, "Pitch": 20,
           "Baldness": 1, "Beard": 1, "Age": 65, "Expression": 1}

# Per-attribute w-layer preservation masks (editor.py:73-93): (start, end)
# ranges of layers RETAINED from the original w.
_PRESERVE = {
    0: [(8, None)],
    1: [(0, 2), (4, None)],
    2: [(4, None)],
    3: [(4, None)],
    4: [(6, None)],
    5: [(0, 5), (10, None)],
    6: [(0, 4), (8, None)],
    7: [(0, 4), (6, None)],
}


class StyleFlowEditor:
    """Edit attributes of a W+ latent via the CNF (editor.py:60-93)."""

    def __init__(self, params: Params, cfg: StyleFlowConfig,
                 num_ws: int = 18):
        self.params = params
        self.cfg = cfg
        self.num_ws = num_ws
        self._fwd = jax.jit(lambda x, c: flow_apply(params, cfg, x, c,
                                                    reverse=False))
        self._rev = jax.jit(lambda x, c: flow_apply(params, cfg, x, c,
                                                    reverse=True))

    def edit(self, w_plus: jax.Array, attributes: np.ndarray,
             lighting: np.ndarray, attr_idx: int,
             edit_power: float) -> jax.Array:
        """w_plus [1, num_ws, 512]; attributes [8]; lighting [9]."""
        context = jnp.concatenate(
            [jnp.asarray(lighting, jnp.float32).reshape(1, -1),
             jnp.asarray(attributes, jnp.float32).reshape(1, -1)], axis=1)
        z = self._fwd(w_plus.reshape(1 * self.num_ws, -1)
                      if w_plus.ndim == 3 else w_plus,
                      jnp.tile(context, (self.num_ws, 1)))

        name = ATTR_ORDER[attr_idx]
        real_value = (edit_power * (MAX_VAL[name] - MIN_VAL[name])
                      + MIN_VAL[name])
        change = real_value - float(attributes[attr_idx])
        attr_final = ATTR_DEGREE[attr_idx] * change + float(
            attributes[attr_idx])
        new_attrs = np.asarray(attributes, np.float32).copy()
        new_attrs[attr_idx] = attr_final
        new_context = jnp.concatenate(
            [jnp.asarray(lighting, jnp.float32).reshape(1, -1),
             jnp.asarray(new_attrs).reshape(1, -1)], axis=1)

        edited = self._rev(z, jnp.tile(new_context, (self.num_ws, 1)))
        edited = edited.reshape(1, self.num_ws, -1)
        orig = w_plus.reshape(1, self.num_ws, -1)
        for start, end in _PRESERVE[attr_idx]:
            end = self.num_ws if end is None else end
            edited = edited.at[:, start:end].set(orig[:, start:end])
        return edited
