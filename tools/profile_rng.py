"""Measure PRNG generation cost at training shapes (threefry vs rbg).

The G forward draws per-layer noise ([N,1,res,res] per conv) plus mixing z;
if threefry dominates, the train step should use the rbg implementation.

    python tools/profile_rng.py --res 1024 --batch 16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=4, label=""):
    out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        times.append(time.perf_counter() - t0)
    times = sorted(times)[: max(1, n - 1)]
    dt = sum(times) / len(times)
    print(f"{label:40s} {dt * 1000:9.1f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=4)
    args = ap.parse_args()

    null = jax.jit(lambda s: s + 1.0)
    timeit(lambda: null(jnp.float32(0.0)), n=args.n, label="null jit call")

    res, batch = args.res, args.batch
    resolutions = [2 ** i for i in range(2, res.bit_length())]

    def g_noise(key):
        total = jnp.float32(0.0)
        for r in resolutions:
            n_convs = 1 if r == 4 else 2
            for i in range(n_convs):
                k = jax.random.fold_in(key, r * 8 + i)
                total += jnp.sum(jax.random.normal(
                    k, (batch, 1, r, r), dtype=jnp.float32))
        return total

    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)
        jf = jax.jit(g_noise)
        timeit(lambda: jf(key), n=args.n, label=f"G per-layer noise [{impl}]")
        big = jax.jit(lambda k: jnp.sum(jax.random.normal(
            k, (batch, 3, res, res))))
        timeit(lambda: big(key), n=args.n, label=f"one {batch}x3x{res}^2 draw "
               f"[{impl}]")


if __name__ == "__main__":
    main()
