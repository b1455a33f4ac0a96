"""Microbenchmark of the modulated-conv level at the hot 1024-training
shapes: where do the bytes/flops go, and how much does fusing the style
pre-scale into the conv (the Pallas fused-modconv plan,
IMPLEMENTATION_STATUS.md "Training-throughput plan" item 1) stand to save?

For each unpacked mid-res level shape this times, fwd and fwd+bwd:
  full   : modulated_conv2d (pre-scale + conv + demod post-scale) + bias_act
  conv   : the bare 3x3 convolution
  prescale: the x * styles elementwise pass alone
and, when --pallas is set, the Pallas fused kernel vs the XLA path.

Usage:  python tools/bench_modconv.py [--batch 8] [--pallas]
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
import numpy as np


def timeit(fn, *args, n=8, label=""):
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        times.append(time.perf_counter() - t0)
    times = sorted(times)[: max(1, n - 2)]
    dt = sum(times) / len(times)
    print(f"  {label:34s} {dt * 1000:9.2f} ms", flush=True)
    return dt


# The unpacked mid-res conv1 shapes of the 1024² config-f G (channel_base
# 32768): res 32/64 fp32 C=512, res 128 bf16 C=256, res 256 bf16 C=128.
SHAPES = [
    # (res, C, dtype)
    (32, 512, jnp.float32),
    (64, 512, jnp.float32),
    (128, 256, jnp.bfloat16),
    (256, 128, jnp.bfloat16),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=16,
                    help="ops per timed dispatch (amortize dispatch latency)")
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    from gagan_tpu.ops.bias_act import bias_act
    from gagan_tpu.ops.modulated_conv2d import modulated_conv2d

    N, R = args.batch, args.repeat

    for res, C, dtype in SHAPES:
        dname = "bf16" if dtype == jnp.bfloat16 else "fp32"
        print(f"[{N}x{C}x{res}x{res} {dname}] (x{R} per dispatch)",
              flush=True)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (N, C, res, res), dtype)
        w = jax.random.normal(jax.random.PRNGKey(1), (C, C, 3, 3),
                              jnp.float32) * 0.05
        s = jax.random.normal(jax.random.PRNGKey(2), (N, C),
                              jnp.float32) * 0.1 + 1.0
        b = jnp.zeros((C,), jnp.float32)

        def level(x_, w_, s_):
            y = modulated_conv2d(x_, w_, s_, padding=1)
            return bias_act(y, b.astype(y.dtype), act="lrelu", clamp=256.0)

        def rep(fn, *ops):
            def body(x_, _):
                return fn(x_, *ops).astype(x_.dtype), None

            def run(x_):
                out, _ = jax.lax.scan(body, x_, None, length=R)
                return out
            return jax.jit(run)

        full = rep(level, w, s)
        timeit(lambda: full(x), n=args.n, label="full level fwd")

        conv = rep(lambda x_, w_: jax.lax.conv_general_dilated(
            x_, w_.astype(x_.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW")), w)
        timeit(lambda: conv(x), n=args.n, label="bare conv fwd")

        pre = rep(lambda x_, s_: x_ * s_.astype(x_.dtype)[:, :, None, None], s)
        timeit(lambda: pre(x), n=args.n, label="pre-scale alone")

        # fwd+bwd of the full level w.r.t. (x, w, s).
        def loss(x_, w_, s_):
            def body(c, _):
                return level(c, w_, s_).astype(c.dtype), None
            out, _ = jax.lax.scan(body, x_, None, length=R)
            return jnp.sum(out.astype(jnp.float32))

        gfull = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        timeit(lambda: gfull(x, w, s), n=args.n, label="full level fwd+bwd")

        def closs(x_, w_):
            def body(c, _):
                y = jax.lax.conv_general_dilated(
                    c, w_.astype(c.dtype), (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NCHW", "OIHW", "NCHW"))
                return y.astype(c.dtype), None
            out, _ = jax.lax.scan(body, x_, None, length=R)
            return jnp.sum(out.astype(jnp.float32))

        gconv = jax.jit(jax.grad(closs, argnums=(0, 1)))
        timeit(lambda: gconv(x, w), n=args.n, label="bare conv fwd+bwd")

        if args.pallas:
            from gagan_tpu.ops import pallas_modconv as pmc

            plevel = rep(lambda x_, w_, s_: pmc.fused_modconv_level(
                x_, w_, s_, b), w, s)
            timeit(lambda: plevel(x), n=args.n, label="pallas fused fwd")

            def ploss(x_, w_, s_):
                def body(c, _):
                    return pmc.fused_modconv_level(
                        c, w_, s_, b).astype(c.dtype), None
                out, _ = jax.lax.scan(body, x_, None, length=R)
                return jnp.sum(out.astype(jnp.float32))

            gp = jax.jit(jax.grad(ploss, argnums=(0, 1, 2)))
            timeit(lambda: gp(x, w, s), n=args.n,
                   label="pallas fused fwd+bwd")

        # Roofline context: bytes for one fwd pass (x + y + w reads/writes).
        bs = np.dtype(np.float32).itemsize if dtype == jnp.float32 else 2
        xbytes = N * C * res * res * bs
        flops = 2 * N * C * C * 9 * res * res
        print(f"  x bytes/pass {xbytes / 1e6:.1f} MB   conv "
              f"{flops / 1e9:.1f} GF  (arith int "
              f"{flops / (3 * xbytes):.0f} flop/B)", flush=True)


if __name__ == "__main__":
    main()
