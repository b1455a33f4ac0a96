"""Offset parameterizations: StyleSpace(+), Affine+, AffineLight+, and the
full weight-offset grammar — as pure pytree transforms.

This single system replaces the reference's three mechanisms:
  * NVlabs in-place registration (`DissimilarDomains/training/networks.py`:
    `register_domain_modulation:140`, `register_weights_domain_modulation:219`
    = Affine+, `register_affine_weights_domain_modulation:163` = AffineLight+)
    with forward application `w_to_s:474` / `weight_to_weight:535`;
  * the SimilarDomains patch registries (`core/stylegan_patches.py:7-9`) and
    offset heads (`core/parametrizations.py:8`);
  * the grammar strings of `train.py --domain-modulation-parametrization`
    (`networks.py:25-53`).

Offsets live in their *own* pytree, separate from the frozen generator
parameters; the training step differentiates w.r.t. the offsets only (the
TPU-native replacement for the reference's `set_requires_grad` name filters,
`training_loop.py:56-98`).  `make_hooks` turns (spec, offsets) into the
per-layer transform hooks consumed by `gagan_tpu.models.stylegan2`.

Grammar reference (networks.py:25-53):
  style offsets   : multiplicative | additive | multiplicative_w_space
                    | additive_w_space
  weight offsets  : in | out | spatial | in_spatial | out_spatial | out_in
                    | out+in | out_in_<k> | out_in_<k>_dual | out_in_<k>_<t>
                    | out_in_<k>_<t>_train_in | out_in_<k>_<t>_train_out
                    (each optionally suffixed `_additive`)
  affine offsets  : affine_out_in_<k>_<t>[_additive]         (AffineLight+)
The reference's published configs use `out_in_additive` (= Affine+) and
`affine_out_in_<k>_<t>_additive` (= AffineLight+), cf.
DissimilarDomains/README.md:149-212.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from gagan_tpu.models.stylegan2 import SynthesisConfig

Params = Dict[str, Any]

_BASE_KINDS = ("in", "out", "spatial", "in_spatial", "out_spatial", "out_in")

_PLUS = re.compile(r"^out\+in(_additive)?$")
_SINGLE = re.compile(r"^out_in_([0-9]+)(_additive)?$")
_DUAL = re.compile(r"^out_in_([0-9]+)_dual(_additive)?$")
_TRAIN = re.compile(r"^out_in_([0-9]+)_([0-9]+)(_additive)?$")
_TRAIN_IN = re.compile(r"^out_in_([0-9]+)_([0-9]+)_train_in(_additive)?$")
_TRAIN_OUT = re.compile(r"^out_in_([0-9]+)_([0-9]+)_train_out(_additive)?$")
_AFFINE = re.compile(r"^affine_out_in_([0-9]+)_([0-9]+)(_additive)?$")


@dataclasses.dataclass(frozen=True)
class WeightOffsetDesc:
    """Parsed weight-offset parametrization."""

    kind: str                   # 'base' | 'plus' | 'lowrank'
    additive: bool
    base_kind: Optional[str] = None          # for kind == 'base'
    rank: int = 0                            # for 'lowrank'
    terms: int = 1
    train_in: bool = True                    # which factors are trainable
    train_out: bool = True
    random_in: bool = False                  # which factors init ~ N(0,1)
    random_out: bool = False
    dual: bool = False
    normalize_terms: bool = True             # divide the sum by #terms
    affine: bool = False                     # applies to the style-affine FC


def parse_weight_parametrization(name: str) -> WeightOffsetDesc:
    base = name[: -len("_additive")] if name.endswith("_additive") else name
    additive = name.endswith("_additive")
    if base in _BASE_KINDS:
        return WeightOffsetDesc(kind="base", additive=additive, base_kind=base)
    if _PLUS.match(name):
        return WeightOffsetDesc(kind="plus", additive=additive)
    m = _AFFINE.match(name)
    if m:
        # AffineLight+: both factors trainable, in ~ N(0,1) row-normalized,
        # out zeros; the reference does NOT divide by #terms here
        # (weight_to_weight networks.py:550-556 — the tuple branch is dead code).
        return WeightOffsetDesc(
            kind="lowrank", additive=additive, rank=int(m.group(1)),
            terms=int(m.group(2)), random_in=True, normalize_terms=False,
            affine=True)
    m = _DUAL.match(name)
    if m:
        return WeightOffsetDesc(
            kind="lowrank", additive=additive, rank=int(m.group(1)), terms=2,
            dual=True)
    m = _TRAIN_IN.match(name)
    if m:
        return WeightOffsetDesc(
            kind="lowrank", additive=additive, rank=int(m.group(1)),
            terms=int(m.group(2)), train_out=False, random_out=True)
    m = _TRAIN_OUT.match(name)
    if m:
        return WeightOffsetDesc(
            kind="lowrank", additive=additive, rank=int(m.group(1)),
            terms=int(m.group(2)), train_in=False, random_in=True)
    m = _TRAIN.match(name)
    if m:
        return WeightOffsetDesc(
            kind="lowrank", additive=additive, rank=int(m.group(1)),
            terms=int(m.group(2)), random_in=True)
    m = _SINGLE.match(name)
    if m:
        return WeightOffsetDesc(
            kind="lowrank", additive=additive, rank=int(m.group(1)), terms=1)
    raise ValueError(f"Unknown weight parametrization: {name}")


_STYLE_KINDS = (
    "multiplicative",
    "additive",
    "multiplicative_w_space",
    "additive_w_space",
)

# SimilarDomains patch_key names (core/parametrizations.py registry) →
# the unified DissimilarDomains grammar this module speaks.
_PATCH_KEY_ALIASES = {
    "s_delta": "additive",
    "s_mod": "multiplicative",
    "w_delta": "additive_w_space",
    "w_mod": "multiplicative_w_space",
    "cin_mult": "in",
    "cout_mult": "out",
    "cfull_mult": "out_in",
}


@dataclasses.dataclass(frozen=True)
class OffsetsSpec:
    """Static description of which offsets exist and how they apply.

    ``style`` / ``weights`` / ``affine_weights`` correspond to the comma-
    separated `--domain-modulation-parametrization` grammar split by
    `split_parameterization` (networks.py:87-137).  ``weight_parts`` gates
    which layers receive weight offsets, mirroring the
    synt_weights_offset / tRGB_weights_offset[.b<res>] requires-grad parts
    (networks.py:452-468).
    """

    style: Optional[str] = None
    weights: Optional[str] = None
    affine_weights: Optional[str] = None
    weight_parts: Tuple[str, ...] = ("all",)

    def __post_init__(self):
        if self.style is not None:
            assert self.style in _STYLE_KINDS, self.style
        if self.weights is not None:
            parse_weight_parametrization(self.weights)
        if self.affine_weights is not None:
            d = parse_weight_parametrization(self.affine_weights)
            assert d.affine, self.affine_weights

    @classmethod
    def from_string(cls, parametrization: str,
                    weight_parts: Tuple[str, ...] = ("all",)) -> "OffsetsSpec":
        """Parse the comma-separated CLI grammar (split_parameterization)."""
        style = weights = affine = None
        for part in parametrization.split(","):
            part = _PATCH_KEY_ALIASES.get(part.strip(), part.strip())
            if not part:
                continue
            if part in _STYLE_KINDS:
                assert style is None, "at most one style parametrization"
                style = part
            elif part.startswith("affine_"):
                assert affine is None, "at most one affine parametrization"
                affine = part
            else:
                assert weights is None, "at most one weights parametrization"
                weights = part
        return cls(style=style, weights=weights, affine_weights=affine,
                   weight_parts=weight_parts)

    @property
    def per_sample_only(self) -> bool:
        """True when every hook this spec produces acts on PER-SAMPLE
        tensors (styles / w vectors), never on shared conv weights — the
        condition under which a frozen and an offsets forward can share one
        batched synthesis pass via ``make_hooks(batch_select=...)``."""
        return self.weights is None and self.affine_weights is None

    def layer_has_weight_offsets(self, layer_name: str) -> bool:
        if self.weights is None:
            return False
        res = layer_name.split(".")[0].lstrip("b")
        is_rgb = layer_name.endswith("torgb")
        part = "tRGB_weights_offset" if is_rgb else "synt_weights_offset"
        return (
            "all" in self.weight_parts
            or part in self.weight_parts
            or f"{part}.b{res}" in self.weight_parts
        )


# ----------------------------------------------------------------------------
# Initialization


def _normalize_factor(x: jax.Array, axis: int) -> jax.Array:
    """Row/col normalization applied at init (networks.py:398-410): zero
    tensors stay zero, random ones get unit rows (axis=1) / cols (axis=0)."""
    total = jnp.linalg.norm(x)
    normed = x / jnp.linalg.norm(x, axis=axis, keepdims=True)
    return jnp.where(total > 1e-6, normed, x)


def _init_lowrank(key, desc: WeightOffsetDesc, out_dim: int, in_dim: int) -> Params:
    p: Params = {}
    for idx in range(desc.terms):
        k_in = jax.random.fold_in(key, 2 * idx)
        k_out = jax.random.fold_in(key, 2 * idx + 1)
        if desc.dual:
            # WO = A1 @ B1 + A2 @ B2; B1 (in_0) random buffer, B2 (in_1)
            # trainable zeros; A1 (out_0) trainable zeros, A2 (out_1) random
            # buffer (networks.py:279-304).
            random_in = idx == 0
            random_out = idx == 1
        else:
            random_in, random_out = desc.random_in, desc.random_out
        f_in = (jax.random.normal(k_in, (desc.rank, in_dim)) if random_in
                else jnp.zeros((desc.rank, in_dim)))
        f_out = (jax.random.normal(k_out, (out_dim, desc.rank)) if random_out
                 else jnp.zeros((out_dim, desc.rank)))
        p[f"weights_offset_in_{idx}"] = _normalize_factor(f_in, axis=1)
        p[f"weights_offset_out_{idx}"] = _normalize_factor(f_out, axis=0)
    return p


def _weight_offset_params(key, desc: WeightOffsetDesc, out_ch: int, in_ch: int,
                          kh: int, kw: int) -> Params:
    if desc.kind == "base":
        shape = {
            "in": (1, in_ch, 1, 1),
            "out": (out_ch, 1, 1, 1),
            "spatial": (1, 1, kh, kw),
            "in_spatial": (1, in_ch, kh, kw),
            "out_spatial": (out_ch, 1, kh, kw),
            "out_in": (out_ch, in_ch, 1, 1),
        }[desc.base_kind]
        return {"weights_offset": jnp.zeros(shape)}
    if desc.kind == "plus":
        return {
            "weights_offset_in_0": jnp.zeros((1, in_ch)),
            "weights_offset_out_0": jnp.zeros((out_ch, 1)),
        }
    return _init_lowrank(key, desc, out_ch, in_ch)


def init_offsets(key, cfg: SynthesisConfig, spec: OffsetsSpec) -> Params:
    """Create the offsets pytree for every synthesis layer covered by ``spec``."""
    offsets: Params = {}
    names = cfg.layer_names()
    in_channels = cfg.layer_in_channels()
    for i, (name, in_ch) in enumerate(zip(names, in_channels)):
        lkey = jax.random.fold_in(key, i)
        layer: Params = {}
        if spec.style is not None:
            dim = cfg.w_dim if spec.style.endswith("w_space") else in_ch
            layer["offset"] = jnp.zeros((1, dim))
        if spec.layer_has_weight_offsets(name):
            desc = parse_weight_parametrization(spec.weights)
            res = int(name.split(".")[0].lstrip("b"))
            is_rgb = name.endswith("torgb")
            out_ch = cfg.img_channels if is_rgb else cfg.channels(res)
            k = 1 if is_rgb else 3
            layer.update(_weight_offset_params(
                jax.random.fold_in(lkey, 1), desc, out_ch, in_ch, k, k))
        if spec.affine_weights is not None:
            desc = parse_weight_parametrization(spec.affine_weights)
            affine = _init_lowrank(jax.random.fold_in(lkey, 2), desc,
                                   out_dim=in_ch, in_dim=cfg.w_dim)
            layer["affine"] = affine
        if layer:
            offsets[name] = layer
    return offsets


def trainable_mask(spec: OffsetsSpec, offsets: Params) -> Params:
    """True for trainable leaves, False for the frozen random buffers of the
    dual / train_in / train_out families."""
    w_desc = parse_weight_parametrization(spec.weights) if spec.weights else None

    def leaf_mask(path: Tuple[str, ...]) -> bool:
        name = path[-1]
        in_affine = "affine" in path
        if in_affine:
            return True  # AffineLight+ trains both factors
        if w_desc is None or w_desc.kind != "lowrank":
            return True
        idx = int(name.rsplit("_", 1)[1]) if name[-1].isdigit() else 0
        if name.startswith("weights_offset_in"):
            if w_desc.dual:
                return idx == 1
            return w_desc.train_in
        if name.startswith("weights_offset_out"):
            if w_desc.dual:
                return idx == 0
            return w_desc.train_out
        return True

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return leaf_mask(path)

    return walk(offsets, ())


# ----------------------------------------------------------------------------
# Application


def _compose_weight_offset(desc: WeightOffsetDesc, layer: Params) -> jax.Array:
    if desc.kind == "base":
        return layer["weights_offset"]
    if desc.kind == "plus":
        wo = layer["weights_offset_out_0"] + layer["weights_offset_in_0"]
        return wo[:, :, None, None]
    terms = [
        jnp.matmul(layer[f"weights_offset_out_{i}"],
                   layer[f"weights_offset_in_{i}"],
                   precision=jax.lax.Precision.HIGHEST)
        for i in range(desc.terms)
    ]
    wo = sum(terms)
    if desc.normalize_terms:
        wo = wo / desc.terms
    if not desc.affine:
        wo = wo[:, :, None, None]
    return wo


def make_hooks(spec: OffsetsSpec, offsets: Params,
               batch_select=None) -> Dict[str, Dict[str, Any]]:
    """Build the LayerHooks consumed by stylegan2.synthesis_apply.

    Application semantics follow `w_to_s` (networks.py:490-527) and
    `weight_to_weight` (networks.py:535-579):
      style mult : s * (1 + offset)        style add : s + offset
      weight mult: (1 + WO) * w            weight add: w + WO

    ``batch_select`` (an [N] bool/float array) gates per-sample hooks so
    only selected samples receive the offsets — the mechanism behind the
    joint frozen+trainable synthesis pass (adaptation.py): styles and w
    vectors are per-sample, so `where(select, hooked, raw)` is exact.
    Requires ``spec.per_sample_only`` (weight offsets are batch-shared).
    """
    hooks: Dict[str, Dict[str, Any]] = {}
    w_desc = parse_weight_parametrization(spec.weights) if spec.weights else None
    a_desc = (parse_weight_parametrization(spec.affine_weights)
              if spec.affine_weights else None)
    if batch_select is not None:
        assert spec.per_sample_only, (
            "batch_select requires a per-sample-only (style/w-space) spec; "
            "weight offsets apply to batch-shared conv weights")

    def gate(fn):
        if batch_select is None:
            return fn
        return lambda s, f=fn: jnp.where(
            batch_select.astype(jnp.bool_)[:, None], f(s), s)

    for name, layer in offsets.items():
        h: Dict[str, Any] = {}
        if spec.style is not None and "offset" in layer:
            off = layer["offset"]
            if spec.style == "multiplicative":
                h["style"] = gate(lambda s, o=off: (1.0 + o.astype(s.dtype)) * s)
            elif spec.style == "additive":
                h["style"] = gate(lambda s, o=off: s + o.astype(s.dtype))
            elif spec.style == "multiplicative_w_space":
                h["w"] = gate(lambda w, o=off: (1.0 + o.astype(w.dtype)) * w)
            elif spec.style == "additive_w_space":
                h["w"] = gate(lambda w, o=off: w + o.astype(w.dtype))
        if w_desc is not None and any(k.startswith("weights_offset") for k in layer):
            wo = _compose_weight_offset(w_desc, layer)
            if w_desc.additive:
                h["weight"] = lambda w, o=wo: w + o.astype(w.dtype)
            else:
                h["weight"] = lambda w, o=wo: (1.0 + o.astype(w.dtype)) * w
        if a_desc is not None and "affine" in layer:
            awo = _compose_weight_offset(a_desc, layer["affine"])
            h["affine_weight"] = (awo, "additive" if a_desc.additive else "mult")
        if h:
            hooks[name] = h
    return hooks
