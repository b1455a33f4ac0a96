"""Text-conditioned hypernetwork mappers producing per-conv offsets.

Port of the SimilarDomains mapper registry (`core/mappers.py:8-314`): an MLP
backbone (shared or per-level coarse/medium/fine) over a CLIP text embedding,
with per-conv heads emitting channel-wise multiplicative offsets
{'in': [B, c_in], 'out': [B, c_out]}.  Offsets apply through the model hooks:
'in' scales the styles (equivalent to the reference's post-demodulation c_in
weight patch) and 'out' scales the conv output activations (the c_out patch)
— both MXU-friendly activation scalings instead of per-sample weight tensors.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gagan_tpu.models.stylegan2 import SynthesisConfig

Params = Dict[str, Any]

# Reference level split over the 17 convs of a 1024 generator
# (core/mappers.py:153-157); generalized by fraction for other depths.
LEVEL_SPLITS = {"coarse": (0, 5), "medium": (5, 9), "fine": (9, None)}


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    mapper_type: str = "residual_channelwise_sep"
    # base_channelwise_sep | residual_channelwise_sep | residual_channelin
    # | levelsheads_channelwise_sep
    backbone_type: str = "shared"        # shared | levels
    input_dimension: int = 512
    width: int = 512
    backbone_depth: int = 2
    head_depth: int = 2
    activation: str = "relu"
    no_coarse: bool = False
    no_medium: bool = False
    no_fine: bool = False


def _act(name: str, x):
    if name == "relu":
        return jax.nn.relu(x)
    if name == "lrelu":
        return jnp.where(x >= 0, x, 0.2 * x)
    if name == "id":
        return x
    raise ValueError(name)


def _init_linear(key, n_in, n_out):
    # xavier_uniform * 0.01, zero bias (initialize_linear_layer, mappers.py:12-15)
    limit = float(np.sqrt(6 / (n_in + n_out)))
    w = jax.random.uniform(key, (n_out, n_in), minval=-limit,
                           maxval=limit) * 0.01
    return {"weight": w, "bias": jnp.zeros((n_out,))}


def _init_bn(n):
    return {"weight": jnp.ones((n,)), "bias": jnp.zeros((n,)),
            "running_mean": jnp.zeros((n,)), "running_var": jnp.ones((n,))}


def _bn_apply(p, x, train: bool, eps: float = 1e-5):
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
    else:
        mean, var = p["running_mean"], p["running_var"]
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return x * p["weight"] + p["bias"]


def _linear(p, x):
    return x @ p["weight"].T + p["bias"]


# BNLinRelu: bn(act(lin(x))) (mappers.py:52-60).
def _init_bnlinrelu(key, n_in, n_out):
    return {"lin": _init_linear(key, n_in, n_out), "bn": _init_bn(n_out)}


def _bnlinrelu(p, x, activation, train):
    return _bn_apply(p["bn"], _act(activation, _linear(p["lin"], x)), train)


# DummyResBlock (mappers.py:63-84).
def _init_resblock(key, features, inner=512):
    k1, k2 = jax.random.split(key)
    return {
        "lin1": _init_linear(k1, features, inner), "bn1": _init_bn(inner),
        "lin2": _init_linear(k2, inner, features), "bn2": _init_bn(features),
    }


def _resblock(p, x, activation, train):
    h = _bn_apply(p["bn1"], _linear(p["lin1"], x), train)
    h = _act(activation, h)
    h = _bn_apply(p["bn2"], _linear(p["lin2"], h), train)
    return _act(activation, h + x)


def _init_backbone(key, cfg: MapperConfig):
    ks = jax.random.split(key, cfg.backbone_depth)
    p = {"stem": _init_bnlinrelu(ks[0], cfg.input_dimension, cfg.width)}
    for i in range(cfg.backbone_depth - 1):
        p[f"res{i}"] = _init_resblock(ks[i + 1], cfg.width)
    return p


def _backbone(p, cfg: MapperConfig, x, train):
    x = _bnlinrelu(p["stem"], x, cfg.activation, train)
    for i in range(cfg.backbone_depth - 1):
        x = _resblock(p[f"res{i}"], x, cfg.activation, train)
    return x


def _init_head(key, cfg: MapperConfig, c_dim: int, residual: bool):
    ks = jax.random.split(key, cfg.head_depth)
    p = {}
    for i in range(cfg.head_depth - 1):
        p[f"h{i}"] = (_init_resblock(ks[i], cfg.width) if residual
                      else _init_bnlinrelu(ks[i], cfg.width, cfg.width))
    p["out"] = _init_linear(ks[-1], cfg.width, c_dim)
    return p


def _head(p, cfg: MapperConfig, x, residual: bool, train):
    for i in range(cfg.head_depth - 1):
        x = (_resblock(p[f"h{i}"], x, cfg.activation, train) if residual
             else _bnlinrelu(p[f"h{i}"], x, cfg.activation, train))
    return _linear(p["out"], x)


def conv_dimensions(syn_cfg: SynthesisConfig) -> List[Tuple[int, int]]:
    """(c_in, c_out) per synthesis conv, skipping torgb (matching the
    reference's get_stylegan_conv_dimensions, common.py:200)."""
    dims = []
    for res in syn_cfg.block_resolutions:
        if res > 4:
            dims.append((syn_cfg.channels(res // 2), syn_cfg.channels(res)))
        dims.append((syn_cfg.channels(res), syn_cfg.channels(res)))
    return dims


def _level_of(idx: int) -> str:
    for level, (lo, hi) in LEVEL_SPLITS.items():
        if idx >= lo and (hi is None or idx < hi):
            return level
    return "fine"


def init_mapper(key, cfg: MapperConfig, syn_cfg: SynthesisConfig) -> Params:
    dims = conv_dimensions(syn_cfg)
    residual = cfg.mapper_type.startswith("residual") or \
        cfg.mapper_type.startswith("levelsheads")
    in_only = cfg.mapper_type == "residual_channelin"
    p: Params = {}
    if cfg.backbone_type == "levels":
        p["backbone"] = {lvl: _init_backbone(jax.random.fold_in(key, i), cfg)
                         for i, lvl in enumerate(("coarse", "medium", "fine"))}
    else:
        p["backbone"] = _init_backbone(key, cfg)
    heads: Params = {}
    for idx, (c_in, c_out) in enumerate(dims):
        hk = jax.random.fold_in(key, 100 + idx)
        entry = {"in": _init_head(jax.random.fold_in(hk, 0), cfg, c_in,
                                  residual)}
        if not in_only:
            entry["out"] = _init_head(jax.random.fold_in(hk, 1), cfg, c_out,
                                      residual)
        heads[f"conv_{idx}"] = entry
    p["heads"] = heads
    return p


def mapper_apply(params: Params, cfg: MapperConfig,
                 syn_cfg: SynthesisConfig, emb: jax.Array,
                 train: bool = True) -> Dict[str, Dict[str, jax.Array]]:
    """emb [B, input_dim] -> {conv_i: {'in': [B, c_in], 'out': [B, c_out]}}."""
    residual = cfg.mapper_type.startswith("residual") or \
        cfg.mapper_type.startswith("levelsheads")
    if cfg.backbone_type == "levels":
        feats = {lvl: _backbone(params["backbone"][lvl], cfg, emb, train)
                 for lvl in ("coarse", "medium", "fine")}
    else:
        shared = _backbone(params["backbone"], cfg, emb, train)
        feats = {lvl: shared for lvl in ("coarse", "medium", "fine")}

    out = {}
    skip = {"coarse": cfg.no_coarse, "medium": cfg.no_medium,
            "fine": cfg.no_fine}
    for name, head in params["heads"].items():
        idx = int(name.split("_")[1])
        lvl = _level_of(idx)
        entry = {}
        for kind, hp in head.items():
            val = _head(hp, cfg, feats[lvl], residual, train)
            if skip[lvl]:
                val = jnp.zeros_like(val)
            entry[kind] = val
        out[name] = entry
    return out


def mapper_hooks(syn_cfg: SynthesisConfig,
                 mapper_out: Dict[str, Dict[str, jax.Array]]):
    """Per-conv multiplicative offsets -> LayerHooks.

    'in' applies on styles (s * (1 + in)); 'out' on the conv output
    (y * (1 + out)) — the reference's csep_mult patch semantics
    (stylegan_patches.py:149-215)."""
    names = [n for n in syn_cfg.layer_names() if not n.endswith("torgb")]
    hooks: Dict[str, Dict[str, Any]] = {}
    for idx, lname in enumerate(names):
        entry = mapper_out.get(f"conv_{idx}")
        if entry is None:
            continue
        h = {}
        if "in" in entry:
            h["style"] = (lambda s, o=entry["in"]:
                          s * (1.0 + o.astype(s.dtype)))
        if "out" in entry:
            h["post"] = (lambda y, o=entry["out"]:
                         y * (1.0 + o.astype(y.dtype)[:, :, None, None]))
        hooks[lname] = h
    return hooks
