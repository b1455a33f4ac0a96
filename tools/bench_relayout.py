"""Measure the packed-tail boundary relayouts and a relayout-free torgb
(VERDICT r3 #2, lever 2).

Round 3 recorded "pack/unpack boundary relayouts cost ~3.5-4 ms each"
(IMPLEMENTATION_STATUS.md, packed-tail measurements).  At packed depth 1
(the shipping config) the img-level relayouts in the b1024 block are:

  fwd: fir_upsample_packed(img512) -> packed skip add -> final pk.unpack
  bwd: the VJPs (pack of the [N,3,1024,1024] cotangent).

This tool times each relayout op and its VJP against the HBM roofline,
then benchmarks the relayout-FREE reformulation: the packed torgb 1x1
(block-diagonal over cells) composed with depth-to-space is EXACTLY a
stride-2 transposed convolution from the packed feature map straight to
the unpacked [N,3,1024,1024] image —

  y[n, c, 2h'+i, 2w'+j] = sum_ci w[c,ci] * h[n, cell(i,j)*C+ci, h', w']
  == conv_general_dilated(h, K, lhs_dilation=2), K[c, cell*C+ci, 1-i, 1-j]

— so the skip path becomes a standard 3-channel FIR upsample + add and no
pack/unpack op exists anywhere in the tail.  Parity is asserted before
timing.

Usage:  python tools/bench_relayout.py [--batch 8]
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


def build_torgb_transposed(w: jax.Array) -> jax.Array:
    """[img_ch, C] packed-cell torgb weight -> [img_ch, 4C, 2, 2] transposed
    -conv kernel K with K[c, cell(i,j)*C+ci, 1-i, 1-j] = w[c, ci]."""
    img_ch, c = w.shape
    k = jnp.zeros((img_ch, 4 * c, 2, 2), w.dtype)
    for i in range(2):
        for j in range(2):
            cell = i * 2 + j
            k = k.at[:, cell * c:(cell + 1) * c, 1 - i, 1 - j].set(w)
    return k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--repeat", type=int, default=24)
    args = ap.parse_args()

    # The axon tunnel transiently refuses/fails right after a previous
    # client exits — reuse the bench's retrying init.
    from bench import ensure_backend

    ensure_backend()

    from gagan_tpu.ops import packed as pk

    N, R = args.batch, args.repeat
    C = 32                        # b1024 unpacked channels (cbase 32768)

    null = jax.jit(lambda s: s + 1.0)
    t_null = timed(lambda: null(jnp.float32(0.0)), n=args.n)
    print(f"dispatch overhead {t_null * 1000:.1f} ms", flush=True)

    def rep(label, t, reps=R):
        print(f"  {label:40s} {(t - t_null) / reps * 1000:9.3f} ms/op",
              flush=True)

    # ---- raw relayout ops + VJPs --------------------------------------
    for shape, dtype, tag in (
            ((N, 12, 512, 512), jnp.float32, "img packed f32"),
            ((N, 4 * C, 512, 512), jnp.bfloat16, "feat packed bf16")):
        x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype)
        xu = pk.unpack(x)
        print(f"[{tag} {list(shape)}]", flush=True)

        def scan_op(fn):
            def run(v):
                def body(c, _):
                    # unpack+pack round trip keeps carry shape static;
                    # XLA cannot elide it (pack(unpack(x)) == x is an
                    # algebraic identity it does not simplify on TPU --
                    # verified by the measured nonzero cost).
                    return fn(c), None
                out, _ = jax.lax.scan(body, v, None, length=R)
                return out
            return jax.jit(run)

        t = timed(scan_op(lambda c: pk.pack(pk.unpack(c))), x, n=args.n)
        rep("unpack+pack round trip", t)
        gb = jax.jit(jax.grad(
            lambda v: jnp.sum(scan_op(
                lambda c: pk.pack(pk.unpack(c)))(v).astype(jnp.float32))))
        t = timed(gb, x, n=args.n)
        rep("round trip fwd+bwd", t, 2 * R)
        bs = 4 if dtype == jnp.float32 else 2
        nbytes = int(np.prod(shape)) * bs
        print(f"  ({nbytes / 1e6:.0f} MB; one relayout roofline "
              f"{nbytes * 2 / 819e9 * 1e3:.3f} ms @819GB/s)", flush=True)

    # ---- torgb: packed 1x1 + unpack  vs  fused transposed conv --------
    print(f"[torgb boundary: h=[{N},{4*C},512,512]bf16 -> "
          f"img [{N},3,1024,1024]]", flush=True)
    h = jax.random.normal(jax.random.PRNGKey(1), (N, 4 * C, 512, 512),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(2), (3, C), jnp.float32) * 0.1
    img512 = jax.random.normal(jax.random.PRNGKey(3), (N, 3, 512, 512),
                               jnp.float32)
    taps = jnp.asarray([1.0, 3.0, 3.0, 1.0]) / 8.0

    def torgb_packed(h_, w_, img_):
        wrgb = jnp.zeros((12, 4 * C, 1, 1), h_.dtype)
        for cell in range(4):
            wrgb = wrgb.at[cell * 3:(cell + 1) * 3,
                           cell * C:(cell + 1) * C, 0, 0].set(
                               w_.astype(h_.dtype))
        y = pk.conv_packed(h_, wrgb)
        img_up = pk.fir_upsample_packed(img_, taps)
        return pk.unpack(img_up + y.astype(jnp.float32))

    def torgb_fused(h_, w_, img_):
        k = build_torgb_transposed(w_).astype(h_.dtype)
        y = jax.lax.conv_general_dilated(
            h_, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        from gagan_tpu.ops.upfirdn2d import upsample2d
        img_up = upsample2d(img_, taps)
        return img_up + y.astype(jnp.float32)

    a = torgb_packed(h, w, img512)
    b = torgb_fused(h, w, img512)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"  parity max|a-b| = {err:.3e}", flush=True)
    assert err < 2e-2, "fused torgb mismatch"

    for name, fn in (("packed1x1+unpack", torgb_packed),
                     ("fused transposed-conv", torgb_fused)):
        def run_fwd(h_, w_, img_, fn=fn):
            def body(c, _):
                out = fn(h_, w_, c[:, :, :512, :512])
                return out, None
            out, _ = jax.lax.scan(body, jnp.zeros(
                (N, 3, 1024, 1024), jnp.float32), None, length=R)
            return out
        t = timed(jax.jit(run_fwd), h, w, img512, n=args.n)
        rep(f"{name} fwd", t)

        def run_bwd(h_, w_, img_, fn=fn):
            def loss(hh, ww):
                def body(c, _):
                    out = fn(hh, ww, c[:, :, :512, :512])
                    return out, None
                out, _ = jax.lax.scan(
                    body, jnp.zeros((N, 3, 1024, 1024), jnp.float32),
                    None, length=max(1, R // 4))
                return jnp.sum(out.astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1))(h_, w_)
        t = timed(jax.jit(run_bwd), h, w, img512, n=args.n)
        rep(f"{name} fwd+bwd", t, max(1, R // 4))


if __name__ == "__main__":
    main()
