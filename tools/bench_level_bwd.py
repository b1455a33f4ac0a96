"""Decompose the modconv level's BACKWARD-chain overhead (VERDICT r3 #2).

`tools/bench_modconv.py` established that on v5e the level FORWARD is
already fully fused by XLA (full level fwd == bare conv fwd), and that the
remaining per-level headroom is in the backward: full level fwd+bwd runs
+0.7-1.2 ms over the bare conv's fwd+bwd at every shipping shape.  This
tool answers WHERE that overhead lives and whether a residual-policy
restructure removes it.

The candidate mechanism: under `jax.grad`, partial-eval saves as residuals
every primal intermediate the transposed ops need — for the level chain
that is the pre-scaled input `x*s` (conv transpose operand), and the
pre-activation (lrelu/clamp mask source).  Each is a full feature map of
extra HBM write+read that the bare conv does not pay.  The fix under test
keeps the math EXACT and needs no custom VJP: `jax.checkpoint` with
`save_only_these_names("conv_out")` around the level, so the backward
recomputes the cheap elementwise chains (pre-scale; demod+noise+bias+act)
from the level input and the one saved conv output, and the pre-scale
multiply re-fuses into the conv's transpose.

Variants (fwd+bwd wrt x, w, s through a chain of R reps, residuals held
like a real net — NOT remat'd, unlike bench_modconv's bwd scan):
  conv        : bare 3x3 conv
  conv+act    : conv + bias_act (isolates the activation-mask residual)
  level       : full modconv level (pre-scale + conv + demod + noise + act)
  level@name  : full level, checkpoint policy save_only conv_out
  level@remat : full level, plain jax.checkpoint (recompute-everything)

Usage:  python tools/bench_level_bwd.py [--batch 8] [--repeat 12]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

# Persist compiled executables across runs — the axon-tunnel compile
# service takes 180-1200 s per program (bench.py:97-104).  TPU-only: the
# XLA:CPU cache embeds the build host's CPU features and this VM migrates.
if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_gagan_bench"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, n=6):
    out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        times.append(time.perf_counter() - t0)
    times = sorted(times)[: max(1, n - 2)]
    return sum(times) / len(times)


# Unpacked mid-res conv1 shapes of the 1024² config-f G (channel_base
# 32768): res 32/64 fp32 C=512, res 128 bf16 C=256, res 256 bf16 C=128.
SHAPES = [
    (32, 512, jnp.float32),
    (64, 512, jnp.float32),
    (128, 256, jnp.bfloat16),
    (256, 128, jnp.bfloat16),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--repeat", type=int, default=12,
                    help="chained level reps per timed dispatch")
    args = ap.parse_args()

    # The axon tunnel transiently refuses/fails right after a previous
    # client exits — reuse the bench's retrying init.
    from bench import ensure_backend

    ensure_backend()

    from gagan_tpu.ops.bias_act import bias_act
    from gagan_tpu.ops.modulated_conv2d import modulated_conv2d

    N, R = args.batch, args.repeat

    null = jax.jit(lambda s: s + 1.0)
    t_null = timed(lambda: null(jnp.float32(0.0)), n=args.n)
    print(f"dispatch overhead {t_null * 1000:.1f} ms", flush=True)

    for res, C, dtype in SHAPES:
        dname = "bf16" if dtype == jnp.bfloat16 else "fp32"
        print(f"[{N}x{C}x{res}x{res} {dname}]", flush=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (N, C, res, res), dtype)
        w = jax.random.normal(jax.random.PRNGKey(1), (C, C, 3, 3),
                              jnp.float32) * 0.05
        s = jax.random.normal(jax.random.PRNGKey(2), (N, C),
                              jnp.float32) * 0.1 + 1.0
        b = jnp.zeros((C,), jnp.float32)
        noise = jax.random.normal(jax.random.PRNGKey(3),
                                  (N, 1, res, res), jnp.float32) * 0.1

        def conv_only(x_, w_, s_):
            return jax.lax.conv_general_dilated(
                x_, w_.astype(x_.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        def conv_act(x_, w_, s_):
            return bias_act(conv_only(x_, w_, s_), b.astype(x_.dtype),
                            act="lrelu", clamp=256.0)

        def level(x_, w_, s_, tag=False):
            y = modulated_conv2d(x_, w_, s_, padding=1)
            if tag:
                y = checkpoint_name(y, "conv_out")
            y = y + noise.astype(y.dtype)
            return bias_act(y, b.astype(y.dtype), act="lrelu", clamp=256.0)

        policy = jax.checkpoint_policies.save_only_these_names("conv_out")
        variants = {
            "conv": conv_only,
            "conv+act": conv_act,
            "level": level,
            "level@name": jax.checkpoint(
                functools.partial(level, tag=True), policy=policy),
            "level@remat": jax.checkpoint(level),
        }

        for name, fn in variants.items():
            def run_bwd(x_, w_, s_, fn=fn):
                def loss(xx, ww, ss):
                    c = xx
                    for _ in range(R):
                        c = fn(c, ww, ss).astype(xx.dtype)
                    return jnp.sum(c.astype(jnp.float32))

                return jax.grad(loss, argnums=(0, 1, 2))(x_, w_, s_)

            try:
                t = timed(jax.jit(run_bwd), x, w, s, n=args.n)
                print(f"  {name:14s} fwd+bwd {(t - t_null) / R * 1000:9.3f}"
                      f" ms/level", flush=True)
            except Exception as e:
                print(f"  {name} failed: {type(e).__name__}: {e}",
                      flush=True)

        bs = 4 if dtype == jnp.float32 else 2
        fmap = N * C * res * res * bs
        print(f"  feature map {fmap / 1e6:.1f} MB "
              f"(one extra residual write+read = "
              f"{fmap * 2 / 819e9 * 1e3:.3f} ms @819GB/s)", flush=True)


if __name__ == "__main__":
    main()
