"""Microbenchmark of the modulated-conv level at the hot 1024-training
shapes: where do the bytes/flops go, and how much does fusing the style
pre-scale into the conv (the Pallas fused-modconv plan,
IMPLEMENTATION_STATUS.md "Training-throughput plan" item 1) stand to save?

For each unpacked mid-res level shape this times, fwd and fwd+bwd:
  full   : modulated_conv2d (pre-scale + conv + demod post-scale) + bias_act
  conv   : the bare 3x3 convolution
and, when --pallas is set, the Pallas fused kernel vs the XLA path.
Ops run R times per dispatch inside a lax.scan (the tunnel's ~30 ms
dispatch would swamp sub-ms levels); fwd+bwd bodies are remat'd so the
scan doesn't hold R residual sets (adds one fwd recompute per rep —
identical across variants, so relative comparisons hold).

Usage:  python tools/bench_modconv.py [--batch 8] [--pallas]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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


# The unpacked mid-res conv1 shapes of the 1024² config-f G (channel_base
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
    ap.add_argument("--repeat", type=int, default=48,
                    help="fwd ops per timed dispatch")
    ap.add_argument("--repeat-bwd", type=int, default=16,
                    help="fwd+bwd ops per timed dispatch (remat'd scan)")
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    from gagan_tpu.ops.bias_act import bias_act
    from gagan_tpu.ops.modulated_conv2d import modulated_conv2d

    N, RF, RB = args.batch, args.repeat, args.repeat_bwd

    null = jax.jit(lambda s: s + 1.0)
    t_null = timed(lambda: null(jnp.float32(0.0)), n=args.n)
    print(f"dispatch overhead {t_null * 1000:.1f} ms", flush=True)

    def per_rep(label, t, reps):
        print(f"  {label:32s} {(t - t_null) / reps * 1000:9.3f} ms/op",
              flush=True)

    for res, C, dtype in SHAPES:
        dname = "bf16" if dtype == jnp.bfloat16 else "fp32"
        print(f"[{N}x{C}x{res}x{res} {dname}]", flush=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (N, C, res, res), dtype)
        w = jax.random.normal(jax.random.PRNGKey(1), (C, C, 3, 3),
                              jnp.float32) * 0.05
        s = jax.random.normal(jax.random.PRNGKey(2), (N, C),
                              jnp.float32) * 0.1 + 1.0
        b = jnp.zeros((C,), jnp.float32)

        variants = {
            "full level": lambda x_, w_, s_: bias_act(
                modulated_conv2d(x_, w_, s_, padding=1), b.astype(x_.dtype),
                act="lrelu", clamp=256.0),
            "bare conv": lambda x_, w_, s_: jax.lax.conv_general_dilated(
                x_, w_.astype(x_.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW")),
        }
        if args.pallas:
            from gagan_tpu.ops import pallas_modconv as pmc

            if pmc.supported_shape(x.shape, w.shape):
                variants["pallas fused"] = (
                    lambda x_, w_, s_: pmc.fused_modconv_level(x_, w_, s_, b))
            else:
                print("  (pallas: shape unsupported)", flush=True)

        for name, fn in variants.items():
            def run_fwd(x_, fn=fn):
                def body(c, _):
                    return fn(c, w, s).astype(c.dtype), None
                out, _ = jax.lax.scan(body, x_, None, length=RF)
                return out

            t = timed(jax.jit(run_fwd), x, n=args.n)
            per_rep(f"{name} fwd", t, RF)

        for name, fn in variants.items():
            def run_bwd(x_, w_, s_, fn=fn):
                def loss(xx, ww, ss):
                    # chain RB reps with remat so residuals don't accumulate
                    c = xx
                    for _ in range(RB):
                        c = jax.checkpoint(
                            lambda cc: fn(cc, ww, ss).astype(cc.dtype))(c)
                    return jnp.sum(c.astype(jnp.float32))

                return jax.grad(loss, argnums=(0, 1, 2))(x_, w_, s_)

            try:
                t = timed(jax.jit(run_bwd), x, w, s, n=max(2, args.n - 2))
                per_rep(f"{name} fwd+bwd(+remat)", t, RB)
            except Exception as e:
                print(f"  {name} fwd+bwd failed: {type(e).__name__}",
                      flush=True)

        bs = 4 if dtype == jnp.float32 else 2
        xbytes = N * C * res * res * bs
        flops = 2 * N * C * C * 9 * res * res
        print(f"  x bytes/pass {xbytes / 1e6:.1f} MB   conv "
              f"{flops / 1e9:.1f} GF  (HBM roofline {xbytes * 2 / 819e9 * 1e3:.3f} "
              f"ms/pass @819GB/s)", flush=True)


if __name__ == "__main__":
    main()
