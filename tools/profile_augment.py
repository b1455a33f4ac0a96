"""Dissect the ADA augment pipe cost on the current backend.

Times each sub-pipe (blit / geom / color) plus the raw warp and its two
internal stages (two-hot shift, scale matmul), fwd and fwd+bwd, at the
training shapes.  Subtract the reported null-call overhead from every row.

    python tools/profile_augment.py --res 1024 --batch 16
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
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from gagan_tpu.train import augment as aug_lib
    from gagan_tpu.train import warp as warp_lib

    res, batch = args.res, args.batch
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, res, res))
    p = jnp.float32(0.5)

    null = jax.jit(lambda s: s + 1.0)
    timeit(lambda: null(jnp.float32(0.0)), n=args.n, label="null jit call")

    for spec in ("blit", "geom", "color", "bgc"):
        cfg = aug_lib.make_config(spec, compute_dtype=args.dtype)
        fn = aug_lib.make_augment_fn(cfg)
        jfn = jax.jit(lambda im, k, fn=fn: fn(im, p, k))
        timeit(lambda: jfn(img, key), n=args.n, label=f"aug[{spec}] fwd")
        jb = jax.jit(jax.grad(
            lambda im, k, fn=fn: jnp.mean(fn(im, p, k).astype(jnp.float32))))
        timeit(lambda: jb(img, key), n=args.n, label=f"aug[{spec}] fwd+bwd")

    # Raw warp with a fixed small rotation+scale per sample.
    import numpy as np

    rng = np.random.RandomState(0)
    angles = rng.uniform(-0.3, 0.3, batch).astype(np.float32)
    scales = rng.uniform(0.8, 1.25, batch).astype(np.float32)
    cos, sin = np.cos(angles) * scales, np.sin(angles) * scales
    theta = np.zeros((batch, 2, 3), np.float32)
    theta[:, 0, 0], theta[:, 0, 1] = cos, -sin
    theta[:, 1, 0], theta[:, 1, 1] = sin, cos
    theta = jnp.asarray(theta)
    imgb = img.astype(jnp.bfloat16)

    warp = jax.jit(lambda x, t: warp_lib.affine_warp(x, t, res, res,
                                                     antialias=True))
    timeit(lambda: warp(imgb, theta), n=args.n, label="affine_warp fwd")
    warp_b = jax.jit(jax.grad(lambda x, t: jnp.mean(
        warp_lib.affine_warp(x, t, res, res, antialias=True).astype(
            jnp.float32))))
    timeit(lambda: warp_b(imgb, theta), n=args.n, label="affine_warp fwd+bwd")

    # Stage 1: two-hot shift alone at pass-1 shapes.
    shifts = jnp.asarray(rng.uniform(0, 40, (batch, res)).astype(np.float32))
    pad = jnp.pad(imgb, ((0, 0), (0, 0), (0, 0), (res + 1, res + 60)))
    sh = jax.jit(lambda x, s: warp_lib._two_hot_shift(x, s, 2 * res + 10))
    timeit(lambda: sh(pad, shifts), n=args.n, label="two_hot_shift (1 pass)")

    # Stage 2: scale matmul alone.
    win = sh(pad, shifts)
    sc = jax.jit(lambda x: warp_lib._scale_matmul(
        x, jnp.asarray(scales), jnp.zeros(batch), res, antialias=True))
    timeit(lambda: sc(win), n=args.n, label="scale_matmul (1 pass)")


if __name__ == "__main__":
    main()
