"""Training-step throughput benchmark (sec/kimg) on the current backend.

Measures the fused ADA training step (Gmain+Greg+Dmain+Dreg+EMA) at a given
resolution/batch, with or without the ADA augmentation pipe — the setup the
reference's inherited tables report (BASELINE.md: V100 1-GPU 256² = 21.6-24.2
sec/kimg, 1024² = 154.3-161.6 sec/kimg with `--cfg=auto --aug=ada`).

Usage:
    python tools/bench_train.py --res 1024 --batch 4 --aug
    python tools/bench_train.py --res 256 --batch 32 --steps 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(res: int, batch: int, aug: bool, fmaps: float, remat: bool,
          packed: bool, accum: int = 1, reg_accum: int = 1,
          g_reg_accum: int = None, d_reg_accum: int = None,
          reg_remat: bool = False, packed_blocks: int = 1,
          fp16_res: int = 4, reuse_fakes: bool = False,
          packed_head_blocks: int = 1, remat_min_res: int = None,
          accum_scan: bool = True, reg_remat_selective: bool = False,
          d_fp16_res: int = None, fused_torgb: bool = True,
          parametrization: str = None, g_parts: tuple = ("all",),
          g_lr: float = None):
    """Build the fused-step variants + state.

    With ``parametrization``/``g_parts`` set this reproduces the
    DissimilarDomains few-shot adaptation protocol (reference
    `DissimilarDomains/README.md:149-212` run 05, Affine+): offsets
    parameterization trained jointly, G trainable parts restricted to the
    affine/weights-offset grammar, full D, ADA — i.e. BASELINE.md config 4.
    """
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.train import augment as aug_lib
    from gagan_tpu.train import gan_loss, train_step as ts

    g_cfg = sg2.GeneratorConfig(
        img_resolution=res,
        mapping=sg2.MappingConfig(num_layers=8),
        synthesis=sg2.SynthesisConfig(
            channel_base=int(fmaps * 32768), channel_max=512,
            num_fp16_res=fp16_res, conv_clamp=256,
            packed_last_block=packed and res >= 64,
            packed_tail_blocks=packed_blocks,
            packed_fused_torgb=fused_torgb,
            remat=remat, remat_min_res=remat_min_res))
    d_cfg = sg2.DiscriminatorConfig(
        img_resolution=res, channel_base=int(fmaps * 32768), channel_max=512,
        num_fp16_res=d_fp16_res if d_fp16_res is not None else fp16_res,
        conv_clamp=256,
        mbstd_group_size=min(batch, 4),
        packed_first_block=packed and res >= 64,
        packed_head_blocks=packed_head_blocks, remat=remat,
        remat_min_res=remat_min_res)
    cfg = ts.TrainConfig(
        batch_size=batch,
        loss=gan_loss.GANLossConfig(r1_gamma=0.0002 * res * res / batch),
        ada_target=0.6 if aug else None,
        accum_rounds=accum, reg_accum_rounds=reg_accum,
        g_reg_accum_rounds=g_reg_accum, d_reg_accum_rounds=d_reg_accum,
        simultaneous_main=reuse_fakes, accum_scan=accum_scan,
        g_requires_grad_parts=tuple(g_parts))
    if g_lr is not None:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, g_lr=g_lr)

    # reg_remat: the hot variants (no d_reg, i.e. 15 of 16 batches) run
    # un-remat'd; the variant containing R1 — whose double-backward peaks
    # ~250M above the 16G chip even at live batch 4 when the rest of the
    # fused program is un-remat'd — uses fully remat'd model configs.
    both_g_cfg, both_d_cfg = g_cfg, d_cfg
    if reg_remat and not remat:
        import dataclasses as _dc
        both_g_cfg = _dc.replace(
            g_cfg, synthesis=_dc.replace(g_cfg.synthesis, remat=True))
        both_d_cfg = _dc.replace(d_cfg, remat=True)

    augment_fn = None
    if aug:
        augment_fn = aug_lib.make_augment_fn(aug_lib.make_config(
            "bgc", compute_dtype="bfloat16" if res >= 256 else None))

    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(1), d_cfg)
    g_tx, d_tx, _, _ = ts.build_optimizers(cfg, g_params, d_params)
    state = ts.init_train_state(cfg, g_params, d_params, g_tx, d_tx)

    # Offsets parameterization (the few-shot adaptation protocol): mirrors
    # train/loop.py:108-141 so the bench measures exactly the step the CLI
    # schedules under --use-domain-modulation.
    offsets_spec = offsets_tx = None
    if parametrization:
        import optax

        from gagan_tpu.params import offsets as offs_lib
        from gagan_tpu.train import masks as masks_lib

        offsets_spec = offs_lib.OffsetsSpec.from_string(
            parametrization, weight_parts=tuple(g_parts))
        offs = offs_lib.init_offsets(jax.random.PRNGKey(5), g_cfg.synthesis,
                                     offsets_spec)
        o_mask = jax.tree.map(
            lambda a, b: a and b,
            offs_lib.trainable_mask(offsets_spec, offs),
            masks_lib.offsets_mask(offs, tuple(g_parts)))
        offsets_tx = optax.multi_transform(
            {"train": optax.adam(cfg.g_lr, b1=cfg.adam_beta1,
                                 b2=cfg.adam_beta2, eps=cfg.adam_eps),
             "freeze": optax.set_to_zero()},
            jax.tree.map(lambda m: "train" if m else "freeze", o_mask))
        state = state.replace(
            offsets=offs, offsets_ema=jax.tree.map(jnp.copy, offs),
            offsets_opt_state=offsets_tx.init(offs))
    # The three variants the training loop actually schedules per 16 batches
    # (Greg every 4, Dreg every 16): 12x (no reg), 3x (+Greg), 1x (both).
    steps = {}
    for name, (do_g, do_d) in {"none": (False, False), "greg": (True, False),
                               "both": (True, True)}.items():
        if reg_remat_selective and do_d:
            # Main + Greg phases keep the fast un-remat'd configs; only the
            # d_reg (R1) phase inside the step runs the remat'd D.  The
            # program peak is the max over the sequential phases, so this
            # fits whenever both the 'none' step and the remat'd R1 fit.
            steps[name] = jax.jit(
                ts.make_fused_step(cfg, g_cfg, d_cfg, g_tx, d_tx,
                                   augment_fn=augment_fn,
                                   do_g_reg=do_g, do_d_reg=do_d,
                                   offsets_spec=offsets_spec,
                                   offsets_tx=offsets_tx,
                                   reg_d_cfg=both_d_cfg),
                donate_argnums=(0,))
            continue
        v_g, v_d = (both_g_cfg, both_d_cfg) if do_d else (g_cfg, d_cfg)
        steps[name] = jax.jit(
            ts.make_fused_step(cfg, v_g, v_d, g_tx, d_tx,
                               augment_fn=augment_fn,
                               do_g_reg=do_g, do_d_reg=do_d,
                               offsets_spec=offsets_spec,
                               offsets_tx=offsets_tx),
            donate_argnums=(0,))
    return steps, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--aug", action="store_true")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--fmaps", type=float, default=1.0)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--no-packed", action="store_true")
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--reg-accum", type=int, default=None)
    ap.add_argument("--g-reg-accum", type=int, default=None)
    ap.add_argument("--d-reg-accum", type=int, default=None)
    ap.add_argument("--reg-remat", action="store_true",
                    help="remat only the R1 phase (use with --no-remat)")
    ap.add_argument("--reg-remat-selective", action="store_true",
                    help="with --reg-remat: inside the 'both' step keep the "
                         "main/Greg phases un-remat'd and remat only d_reg")
    ap.add_argument("--packed-blocks", type=int, default=1)
    ap.add_argument("--packed-head-blocks", type=int, default=1,
                    help="leading D blocks on the packed grid")
    ap.add_argument("--fp16-res", type=int, default=4,
                    help="bf16 for the N highest resolutions (9 = all)")
    ap.add_argument("--d-fp16-res", type=int, default=None,
                    help="override --fp16-res for the discriminator only")
    ap.add_argument("--remat-min-res", type=int, default=None,
                    help="remat only blocks at res >= this (with --no-remat)")
    ap.add_argument("--no-accum-scan", action="store_true",
                    help="unroll accumulation rounds instead of lax.scan")
    ap.add_argument("--simultaneous", action="store_true",
                    help="shared-forward simultaneous Gmain+Dmain update")
    ap.add_argument("--variants", default="none,greg,both",
                    help="comma subset of none,greg,both — measure fewer "
                         "step variants (skips their compiles; amortized "
                         "sec/kimg is only printed for the full set)")
    ap.add_argument("--rng-impl", default=None,
                    choices=["threefry2x32", "rbg"],
                    help="jax_default_prng_impl for the step's in-jit draws "
                         "(noise layers + augment); rbg is cheaper on TPU")
    ap.add_argument("--parametrization", default=None,
                    help="offsets parametrization grammar (e.g. "
                         "out_in_additive) — turns on the few-shot "
                         "adaptation protocol step")
    ap.add_argument("--g-parts", default="all",
                    help="comma G trainable parts (with --parametrization: "
                         "e.g. synt_affine,tRGB_affine,"
                         "synt_weights_offset.b64,tRGB_weights_offset.b64)")
    ap.add_argument("--glrate", type=float, default=None,
                    help="G learning rate override (protocol 05 uses 0.02)")
    ap.add_argument("--no-fused-torgb", action="store_true",
                    help="use the packed-1x1+unpack tail boundary instead "
                         "of the relayout-free transposed-conv torgb")
    ap.add_argument("--flops", action="store_true",
                    help="report XLA cost-analysis FLOPs per variant and "
                         "achieved TFLOP/s (MFU vs the v5e 197 TF/s bf16 "
                         "peak)")
    args = ap.parse_args()

    # TPU-only: XLA:CPU cache entries embed the build host's CPU features
    # and this VM migrates between hosts — loading a stale entry can SIGILL.
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_gagan_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    steps, state = build(args.res, args.batch, args.aug, args.fmaps,
                         remat=not args.no_remat, packed=not args.no_packed,
                         accum=args.accum,
                         reg_accum=args.reg_accum or args.accum,
                         g_reg_accum=args.g_reg_accum,
                         d_reg_accum=args.d_reg_accum,
                         reg_remat=args.reg_remat,
                         packed_blocks=args.packed_blocks,
                         fp16_res=args.fp16_res,
                         reuse_fakes=args.simultaneous,
                         packed_head_blocks=args.packed_head_blocks,
                         remat_min_res=args.remat_min_res,
                         accum_scan=not args.no_accum_scan,
                         reg_remat_selective=args.reg_remat_selective,
                         d_fp16_res=args.d_fp16_res,
                         fused_torgb=not args.no_fused_torgb,
                         parametrization=args.parametrization,
                         g_parts=tuple(args.g_parts.split(",")),
                         g_lr=args.glrate)

    if args.rng_impl:
        jax.config.update("jax_default_prng_impl", args.rng_impl)
    key = jax.random.PRNGKey(2)
    real = jax.random.normal(jax.random.PRNGKey(3),
                             (args.batch, 3, args.res, args.res))
    z = jax.random.normal(jax.random.PRNGKey(4), (args.batch, 512))

    wanted = [v for v in args.variants.split(",") if v]
    per_step = {}
    flops = {}
    for name, step in steps.items():
        if name not in wanted:
            continue
        if args.flops:
            # XLA cost analysis counts every f32/bf16 multiply-add as 2
            # flops — machine-independent, so MFU = flops / (dt * peak).
            # Analyzed on the UNOPTIMIZED lowering (client-side, no extra
            # device compile — the axon remote-compile service does not
            # read the persistent cache, so lower().compile() would double
            # every compile); pre-CSE flops slightly overestimate.
            cost = step.lower(state, real, None, z, None, key).cost_analysis()
            if cost is None:
                # Some backends (axon remote compile) expose no client-side
                # cost analysis for unoptimized lowerings.
                print(f"[{name}] cost analysis unavailable on this backend",
                      flush=True)
            else:
                flops[name] = float(cost.get("flops", 0.0))
                print(f"[{name}] cost-analysis flops: "
                      f"{flops[name] / 1e12:.2f} TF/step", flush=True)
        t0 = time.perf_counter()
        state, metrics = step(state, real, None, z, None, key)
        # Force device->host sync (axon tunnel: block_until_ready alone can
        # return early; fetch a scalar instead).
        float(metrics["Loss/G/loss"])
        print(f"[{name}] compile+first step: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

        times = []
        for _ in range(args.steps):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            state, metrics = step(state, real, None, z, None, sub)
            float(metrics["Loss/G/loss"])
            times.append(time.perf_counter() - t0)
        times = sorted(times)[: max(1, len(times) - 1)]  # drop slowest
        per_step[name] = sum(times) / len(times)
        line = f"[{name}] sec/step: {per_step[name]:.3f}"
        if name in flops and per_step[name] > 0:
            tfs = flops[name] / per_step[name] / 1e12
            line += f"   {tfs:.1f} TF/s ({100 * tfs / 197.0:.1f}% v5e peak)"
        print(line, flush=True)

    print(f"res={args.res} batch={args.batch} aug={args.aug} "
          f"fmaps={args.fmaps}")
    if set(per_step) >= {"none", "greg", "both"}:
        # Amortized over the loop's 16-batch schedule.
        amortized = (12 * per_step["none"] + 3 * per_step["greg"]
                     + 1 * per_step["both"]) / 16
        sec_per_kimg = amortized * 1000.0 / args.batch
        print(f"amortized sec/step: {amortized:.3f}   sec/kimg: "
              f"{sec_per_kimg:.1f}   imgs/sec: {args.batch / amortized:.1f}")


if __name__ == "__main__":
    main()
