"""StyleFlow: conditional continuous normalizing flow over W+ latents.

Port of `SimilarDomains/editing/styleflow/` (identical copy in
DissimilarDomains): ConcatSquash ODE net (`diffeq_layers.py:73-88`), the
conditional ODE function (`odefunc.py:104-141`), the CNF/SequentialFlow
integration chain with MovingBatchNorm (`cnf.py:9-100`, `flow.py:43-77`) and
the attribute editor (`editor.py:9-93`).

TPU-native solvers: the reference integrates with torchdiffeq's adaptive
dopri5 (atol=rtol=1e-5, `cnf.py:34-36`).  The default here is an embedded
Dormand-Prince RK45 with PI step control under `lax.while_loop` — jittable,
matching the reference's solver family and tolerances; `solver="rk4"` keeps
the fixed-grid `lax.scan` path (reverse-differentiable, static cost).  For
inference-time editing (no log-det needed) the divergence state is dropped —
it never feeds back into dy/dt (`odefunc.py:128-133`).
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
    # "dopri5": adaptive RK45, reference solver family/tolerances
    # (cnf.py:34-36); "rk4": fixed-grid scan (differentiable, static cost).
    solver: str = "dopri5"
    rk4_steps: int = 40
    atol: float = 1e-5
    rtol: float = 1e-5
    max_steps: int = 1000              # adaptive-solver iteration bound


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
    """MovingBatchNorm1d at inference (normalization.py:78-104): running
    stats plus the affine transform y*exp(weight)+bias (the reference builds
    with affine=True; trained checkpoints carry nonzero weight/bias)."""
    mean = p["running_mean"]
    var = p["running_var"]
    weight = p.get("weight")
    bias = p.get("bias")
    if not reverse:
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        if weight is not None:
            y = y * jnp.exp(weight) + bias
        return y
    if weight is not None:
        x = (x - bias) * jnp.exp(-weight)
    return x * jnp.sqrt(var + eps) + mean


# Dormand-Prince 5(4) tableau (the dopri5 method torchdiffeq implements).
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40)


def _dopri5(f, y0: jax.Array, t0, t1, rtol: float, atol: float,
            max_steps: int) -> jax.Array:
    """Adaptive RK45 with PI-free standard step control (safety 0.9,
    growth clamp [0.2, 10], order-5 exponent) — the controller family
    torchdiffeq's dopri5 uses.  Integrates y' = f(t, y) from t0 to t1
    (either direction) under lax.while_loop; the last step clamps onto t1.
    """

    def err_norm(err, y_a, y_b):
        scale = atol + rtol * jnp.maximum(jnp.abs(y_a), jnp.abs(y_b))
        return jnp.sqrt(jnp.mean(jnp.square(err / scale)))

    direction = jnp.sign(t1 - t0)
    span = jnp.abs(t1 - t0)

    # Hairer-style initial step selection (torchdiffeq _select_initial_step).
    f0 = f(t0, y0)
    scale = atol + rtol * jnp.abs(y0)
    d0 = jnp.sqrt(jnp.mean(jnp.square(y0 / scale)))
    d1 = jnp.sqrt(jnp.mean(jnp.square(f0 / scale)))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * direction * f0
    f1 = f(t0 + h0 * direction, y1)
    d2 = jnp.sqrt(jnp.mean(jnp.square((f1 - f0) / scale))) / h0
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(dmax <= 1e-15, jnp.maximum(1e-6, h0 * 1e-3),
                   (0.01 / dmax) ** 0.2)
    h_init = jnp.minimum(jnp.minimum(100 * h0, h1), span)

    def cond(state):
        t, y, h, steps = state
        return (jnp.abs(t - t0) < span) & (steps < max_steps)

    def body(state):
        t, y, h, steps = state
        # Clamp the step onto the endpoint.
        h = jnp.minimum(h, span - jnp.abs(t - t0))
        hs = h * direction

        ks = []
        for i in range(7):
            yi = y
            for j, a in enumerate(_DP_A[i]):
                if a != 0.0:
                    yi = yi + hs * a * ks[j]
            ks.append(f(t + _DP_C[i] * hs, yi))

        y5 = y
        for b, k in zip(_DP_B5, ks):
            if b != 0.0:
                y5 = y5 + hs * b * k
        y4 = y
        for b, k in zip(_DP_B4, ks):
            if b != 0.0:
                y4 = y4 + hs * b * k

        err = err_norm(y5 - y4, y, y5)
        accept = err <= 1.0
        factor = jnp.clip(0.9 * (jnp.maximum(err, 1e-10)) ** -0.2, 0.2, 10.0)
        h_next = jnp.maximum(h * factor, 1e-8)
        t = jnp.where(accept, t + hs, t)
        y = jnp.where(accept, y5, y)
        return t, y, h_next, steps + 1

    _, y, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(t0, y0.dtype), y0, h_init,
                     jnp.asarray(0, jnp.int32)))
    return y


def _cnf_integrate(p: Params, cfg: StyleFlowConfig, x, context,
                   reverse: bool) -> jax.Array:
    """Integrate over t in [0, sqrt_end_time^2] (cnf.py:57-100), flipped
    when ``reverse``; solver per StyleFlowConfig.solver."""
    T = jnp.square(p["sqrt_end_time"]).reshape(())

    def f(t, y):
        return _odenet(p["odefunc"]["diffeq"], cfg, t, context, y)

    if cfg.solver == "dopri5":
        t0 = jnp.where(reverse, T, 0.0)
        t1 = jnp.where(reverse, 0.0, T)
        return _dopri5(f, x, t0, t1, cfg.rtol, cfg.atol, cfg.max_steps)

    h = T / cfg.rk4_steps * (1.0 if not reverse else -1.0)
    t0 = jnp.where(reverse, T, 0.0)

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
                    "running_var": jnp.ones((cfg.input_dim,)),
                    # affine=True with zero init (normalization.py:36-38).
                    "weight": jnp.zeros((cfg.input_dim,)),
                    "bias": jnp.zeros((cfg.input_dim,))}
           for i in range(cfg.num_blocks + 1)}
    return {"cnf": cnf_blocks, "bn": bns}


def torch_state_to_tree(state_dict, cfg: StyleFlowConfig) -> Params:
    """Convert a reference StyleFlow torch state_dict (the SequentialFlow
    built by `flow.py:43-77`: chain = [bn0, cnf0, bn1, cnf1, ...]) to this
    module's pytree layout.  Accepts tensors or ndarrays."""
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)())
          for k, v in state_dict.items()}
    n_layers = len(cfg.hidden_dims) + 1

    def bn_tree(chain_idx):
        prefix = f"chain.{chain_idx}."
        out = {"running_mean": sd[prefix + "running_mean"],
               "running_var": sd[prefix + "running_var"]}
        if prefix + "weight" in sd:
            out["weight"] = sd[prefix + "weight"]
            out["bias"] = sd[prefix + "bias"]
        return out

    def cnf_tree(chain_idx):
        prefix = f"chain.{chain_idx}."
        layers = {}
        for i in range(n_layers):
            lp = prefix + f"odefunc.diffeq.layers.{i}."
            layers[str(i)] = {
                "_layer": {"weight": sd[lp + "_layer.weight"],
                           "bias": sd[lp + "_layer.bias"]},
                "_hyper_bias": {"weight": sd[lp + "_hyper_bias.weight"]},
                "_hyper_gate": {"weight": sd[lp + "_hyper_gate.weight"],
                                "bias": sd[lp + "_hyper_gate.bias"]},
            }
        return {"odefunc": {"diffeq": {"layers": layers}},
                "sqrt_end_time": sd[prefix + "sqrt_end_time"].reshape(())}

    # flow.py:66-73: chain starts with one bn, then alternates cnf, bn.
    cnf_blocks = {str(b): cnf_tree(2 * b + 1) for b in range(cfg.num_blocks)}
    bns = {"0": bn_tree(0)}
    for b in range(cfg.num_blocks):
        bns[str(b + 1)] = bn_tree(2 * b + 2)
    return jax.tree.map(jnp.asarray, {"cnf": cnf_blocks, "bn": bns})


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
