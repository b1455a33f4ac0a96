"""Component-level timing of the 1024 ADA training step on the current
backend: per-phase costs and the building blocks inside them (G fwd, D fwd,
augment, optimizer+EMA), to target optimization work.

Usage:
    python tools/profile_train.py --res 1024 --batch 16
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


def timeit(fn, *args, n=4, label=""):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready()
                 if hasattr(x, "block_until_ready") else x, out)
    # axon tunnel: fetch a scalar to force full sync.
    leaf = jax.tree.leaves(out)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        times.append(time.perf_counter() - t0)
    times = sorted(times)[: max(1, n - 1)]
    dt = sum(times) / len(times)
    print(f"{label:38s} {dt * 1000:9.1f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--fp16-res", type=int, default=4)
    ap.add_argument("--no-packed", action="store_true")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--mode", choices=["blocks", "phases", "all"],
                    default="all",
                    help="blocks: components only; phases: phase steps only")
    args = ap.parse_args()

    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.train import augment as aug_lib
    from gagan_tpu.train import gan_loss, train_step as ts

    res, batch = args.res, args.batch
    g_cfg = sg2.GeneratorConfig(
        img_resolution=res,
        mapping=sg2.MappingConfig(num_layers=8),
        synthesis=sg2.SynthesisConfig(
            channel_base=32768, channel_max=512,
            num_fp16_res=args.fp16_res, conv_clamp=256,
            packed_last_block=not args.no_packed and res >= 64))
    d_cfg = sg2.DiscriminatorConfig(
        img_resolution=res, channel_base=32768, channel_max=512,
        num_fp16_res=args.fp16_res, conv_clamp=256,
        mbstd_group_size=min(batch, 4),
        packed_first_block=not args.no_packed and res >= 64)
    cfg = ts.TrainConfig(
        batch_size=batch,
        loss=gan_loss.GANLossConfig(r1_gamma=0.0002 * res * res / batch),
        ada_target=0.6)

    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(1), d_cfg)
    g_tx, d_tx, _, _ = ts.build_optimizers(cfg, g_params, d_params)
    state = ts.init_train_state(cfg, g_params, d_params, g_tx, d_tx)
    augment_fn = aug_lib.make_augment_fn(aug_lib.make_config(
        "bgc", compute_dtype="bfloat16" if res >= 256 else None))

    key = jax.random.PRNGKey(2)
    real = jax.random.normal(jax.random.PRNGKey(3), (batch, 3, res, res))
    z = jax.random.normal(jax.random.PRNGKey(4), (batch, 512))
    ws = jnp.tile(jax.random.normal(jax.random.PRNGKey(5), (batch, 1, 512)),
                  (1, g_cfg.num_ws, 1))

    n = args.n
    print(f"res={res} batch={batch} fp16_res={args.fp16_res} "
          f"packed={not args.no_packed}", flush=True)

    # Per-call dispatch overhead through the backend/tunnel: a trivial jit.
    null = jax.jit(lambda s: s + 1.0)
    timeit(lambda: null(jnp.float32(0.0)), n=n, label="null jit call")

    if args.mode in ("blocks", "all"):
        profile_blocks(args, n, g_cfg, d_cfg, g_params, d_params, augment_fn,
                       g_tx, cfg, state, key, z, ws)
    if args.mode in ("phases", "all"):
        profile_phases(args, n, cfg, g_cfg, d_cfg, g_tx, d_tx, augment_fn,
                       state, key, real, z, batch)


def profile_blocks(args, n, g_cfg, d_cfg, g_params, d_params, augment_fn,
                   g_tx, cfg, state, key, z, ws):
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.train import train_step as ts

    # --- building blocks ---
    synth = jax.jit(functools.partial(
        sg2.synthesis_apply, g_cfg.synthesis, noise_mode="const"))
    t_gfwd = timeit(lambda: synth(g_params["synthesis"], ws), n=n,
                    label="G synthesis fwd")

    mapping = jax.jit(functools.partial(sg2.mapping_apply, g_cfg.mapping))
    timeit(lambda: mapping(g_params["mapping"], z, None), n=n,
           label="G mapping fwd")

    img0 = synth(g_params["synthesis"], ws)
    dfwd = jax.jit(functools.partial(sg2.discriminator_apply, d_cfg))
    t_dfwd = timeit(lambda: dfwd(d_params, img0, None), n=n, label="D fwd")

    aug_j = jax.jit(lambda im, k: augment_fn(im, jnp.float32(0.5), k))
    t_aug = timeit(lambda: aug_j(img0, key), n=n, label="augment (p=0.5)")

    # G fwd+bwd (synthesis only, dummy scalar loss)
    gb = jax.jit(jax.grad(lambda p: jnp.mean(
        synth.__wrapped__(p, ws).astype(jnp.float32))))
    t_gbwd = timeit(lambda: gb(g_params["synthesis"]), n=n,
                    label="G synthesis fwd+bwd")

    db = jax.jit(jax.grad(lambda p: jnp.mean(
        sg2.discriminator_apply(d_cfg, p, img0, None))))
    t_dbwd = timeit(lambda: db(d_params), n=n, label="D fwd+bwd")

    # optimizer + EMA alone
    gz = jax.tree.map(jnp.zeros_like, g_params)

    @jax.jit
    def opt_ema(st):
        upd, gs = g_tx.update(gz, st.g_opt_state, st.g_params)
        gp = jax.tree.map(lambda a, b: a + b, st.g_params, upd)
        ema = ts.ema_update(gp, st.g_ema, st.cur_nimg, cfg)
        return st.replace(g_params=gp, g_opt_state=gs, g_ema=ema)

    timeit(lambda: opt_ema(state), n=n, label="G adam + EMA")


def profile_phases(args, n, cfg, g_cfg, d_cfg, g_tx, d_tx, augment_fn,
                   state, key, real, z, batch):
    from gagan_tpu.train import train_step as ts

    # --- full phases ---
    g_main, g_reg, d_main, d_reg, _gd = ts.make_phase_steps(
        cfg, g_cfg, d_cfg, g_tx, d_tx, augment_fn)
    t_gm = timeit(jax.jit(g_main), state, z, None, key, n=n,
                  label="Gmain phase")
    t_dm = timeit(jax.jit(d_main), state, real, None, z, None, key, n=n,
                  label="Dmain phase")
    t_gr = timeit(jax.jit(g_reg), state, z, None, key, n=n,
                  label="Greg (PL) phase")
    try:
        t_dr = timeit(jax.jit(d_reg), state, real, None, key, n=n,
                      label="Dreg (R1) phase")
    except Exception as e:  # OOM at full batch without remat
        print(f"Dreg (R1) phase failed: {type(e).__name__}", flush=True)
        t_dr = float("nan")

    amort = t_gm + t_dm + t_gr / 4 + t_dr / 16
    print(f"\nsum of parts (amortized 16-batch): {amort:.3f} s/step  "
          f"-> {amort * 1000 / batch:.1f} sec/kimg", flush=True)


if __name__ == "__main__":
    main()
