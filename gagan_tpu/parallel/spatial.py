"""Spatial (height) sharding of high-resolution synthesis.

Beyond-reference, TPU-native option (SURVEY.md §5.7 names it as the
natural extra scaling axis): the reference scales only by data
parallelism, but at 1024² the activation maps — not the batch — dominate
memory.  Sharding the H axis of the ≥``min_res`` feature maps across the
mesh lets XLA's SPMD partitioner insert halo exchanges
(collective-permutes) for the 3×3 convs and FIR resamplers, so one image
can span all chips.

Implementation: numeric-identity `with_sharding_constraint` hooks on the
per-layer 'post' slot of `synthesis_apply` — no model changes; composes
with offsets hooks via ``merge_hooks``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gagan_tpu.models import stylegan2 as sg2


def spatial_sharding_hooks(cfg: sg2.SynthesisConfig, mesh: Mesh,
                           axis: str = "data",
                           min_res: int = 256,
                           min_rows: int = 2) -> sg2.LayerHooks:
    """LayerHooks pinning conv activations at res >= min_res to an H-sharded
    layout [N, C, H/devices, W].

    ``min_rows`` floors the shard to >= that many rows per device: the VJP
    of the up=2 dilated conv is a stride-2 conv, and XLA SPMD miscompiles
    strided convs whose H shard is smaller than the stride (see
    d_spatial_constraint) — so levels below min_rows*devices stay
    unconstrained (replicated)."""
    sharding = NamedSharding(mesh, P(None, None, axis, None))

    def constrain(x):
        return jax.lax.with_sharding_constraint(x, sharding)

    hooks: sg2.LayerHooks = {}
    n_dev = mesh.devices.size
    for res in cfg.block_resolutions:
        if res < min_res or res < min_rows * n_dev:
            continue
        layers = (["conv0", "conv1"] if res > 4 else ["conv1"])
        for layer in layers:
            hooks[f"b{res}.{layer}"] = {"post": constrain}
    return hooks


def merge_hooks(base: Optional[sg2.LayerHooks],
                extra: sg2.LayerHooks) -> sg2.LayerHooks:
    """Compose two hook trees; where both define the same slot, ``base``
    runs first and ``extra`` wraps its result."""
    if not base:
        return extra
    merged: sg2.LayerHooks = {k: dict(v) for k, v in base.items()}
    for lname, slots in extra.items():
        dst = merged.setdefault(lname, {})
        for kind, fn in slots.items():
            if kind in dst:
                prev = dst[kind]
                dst[kind] = (lambda v, p=prev, f=fn: f(p(v)))
            else:
                dst[kind] = fn
    return merged


def d_spatial_constraint(mesh: Mesh, axis: str = "data",
                         min_rows: int = 2):
    """Per-block activation constraint for the discriminator side.

    Returns ``f(x) -> x`` that pins activations H-sharded while every
    device holds at least ``min_rows`` rows, and REPLICATED below.  The
    explicit replication floor matters for correctness, not just speed:
    XLA's SPMD partitioner miscompiles a stride-2 convolution whose H
    shard is smaller than the stride (measured: max-abs error 5.5 on a
    plain strided conv at 1 row/device, exact at >= 2 — see
    tests/test_train_step.py::test_spatial_sharded_full_train_step), so
    the sharding must not be allowed to propagate into the small-res
    blocks.
    """
    n_dev = mesh.devices.size
    sharded = NamedSharding(mesh, P(None, None, axis, None))
    replicated = NamedSharding(mesh, P(None, None, None, None))

    def f(x):
        if x.ndim != 4:
            return x
        want = sharded if x.shape[2] >= min_rows * n_dev else replicated
        return jax.lax.with_sharding_constraint(x, want)

    return f


def spatial_synthesis_fn(g_cfg: sg2.GeneratorConfig, mesh: Mesh,
                         axis: str = "data", min_res: int = 256,
                         base_hooks: Optional[sg2.LayerHooks] = None):
    """jitted ``fn(params, ws) -> img`` with H-sharded high-res activations
    (replicated params, replicated ws; output image H-sharded)."""
    hooks = merge_hooks(base_hooks,
                        spatial_sharding_hooks(g_cfg.synthesis, mesh, axis,
                                               min_res))

    def fn(params, ws):
        return sg2.synthesis_apply(g_cfg.synthesis, params["synthesis"], ws,
                                   noise_mode="const", hooks=hooks)

    return jax.jit(fn)
