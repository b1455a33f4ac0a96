"""Adversarial (few-shot ADA) training CLI.

Mirrors `DissimilarDomains/train.py` (`setup_training_loop_kwargs:62`,
cfg presets `train.py:219-236`, augpipe specs `train.py:357-370`) with the
StyleDomain extensions: `--use-domain-modulation`,
`--domain-modulation-parametrization` (Affine+/AffineLight+/StyleSpace+
grammar), `--generator-requires-grad-parts`, `--freezed` (Freeze-D),
`--glrate/--dlrate`.  No per-GPU process spawn: one SPMD program over the
device mesh replaces it (gagan_tpu.parallel).
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

import click


CFG_SPECS = {
    # Mirrors train.py:219-228; ref_gpus becomes the mesh size.
    "auto": dict(kimg=25000, mb=-1, mbstd=-1, lrate=-1, gamma=-1, ema=-1,
                 ramp=0.05, map=2, fmaps=-1),
    "stylegan2": dict(kimg=25000, mb=32, mbstd=4, lrate=0.002, gamma=10,
                      ema=10, ramp=None, map=8, fmaps=1),
    "paper256": dict(kimg=25000, mb=64, mbstd=8, lrate=0.0025, gamma=1,
                     ema=20, ramp=None, map=8, fmaps=0.5),
    "paper512": dict(kimg=25000, mb=64, mbstd=8, lrate=0.0025, gamma=0.5,
                     ema=20, ramp=None, map=8, fmaps=1),
    "paper1024": dict(kimg=25000, mb=32, mbstd=4, lrate=0.002, gamma=2,
                      ema=10, ramp=None, map=8, fmaps=1),
    "cifar": dict(kimg=100000, mb=64, mbstd=32, lrate=0.0025, gamma=0.01,
                  ema=500, ramp=0.05, map=2, fmaps=1),
}


@click.command()
@click.option("--outdir", required=True, metavar="DIR")
@click.option("--data", required=True, help="Training dataset (dir or zip)")
@click.option("--gpus", "n_devices", type=int, default=None,
              help="Number of mesh devices (default: all)")
@click.option("--cfg", type=click.Choice(list(CFG_SPECS)), default="auto",
              show_default=True)
@click.option("--kimg", type=int, default=None)
@click.option("--batch", type=int, default=None)
@click.option("--batch-gpu", type=int, default=None,
              help="Per-device samples held live at once; smaller than "
                   "batch/devices turns on gradient accumulation "
                   "(reference train.py:300-306 batch_gpu rounds)")
@click.option("--gamma", type=float, default=None, help="R1 gamma override")
@click.option("--cond", is_flag=True, help="Train conditional model")
@click.option("--mirror", is_flag=True, help="Enable dataset x-flips")
@click.option("--subset", type=int, default=None,
              help="Use only N images (few-shot)")
@click.option("--aug", type=click.Choice(["noaug", "ada", "fixed"]),
              default="ada", show_default=True)
@click.option("--p", "aug_p", type=float, default=None,
              help="Probability for --aug=fixed")
@click.option("--target", type=float, default=0.6, show_default=True)
@click.option("--augpipe", default="bgc", show_default=True)
@click.option("--aug-dtype", type=click.Choice(["auto", "float32",
                                                "bfloat16"]),
              default="auto", show_default=True,
              help="Augment-pipe compute dtype; 'auto' picks bfloat16 at "
                   "res>=256 (HBM-bound), float32 below.  Use float32 for "
                   "reference-parity runs (R1 differentiates through the "
                   "pipe, so bf16 is a numerics deviation).")
@click.option("--resume", default=None, help="Snapshot .npz to resume from")
@click.option("--freezed", type=int, default=0, help="Freeze-D layers")
@click.option("--lrate", type=float, default=None)
@click.option("--glrate", type=float, default=None)
@click.option("--dlrate", type=float, default=None)
@click.option("--use-domain-modulation", is_flag=True)
@click.option("--domain-modulation-parametrization", default=None,
              help="e.g. 'out_in_additive' (Affine+), "
                   "'affine_out_in_5_1_additive' (AffineLight+)")
@click.option("--generator-requires-grad-parts", default="all",
              help="Comma-separated parts grammar")
@click.option("--snap", type=int, default=50, show_default=True,
              help="Snapshot interval in ticks")
@click.option("--seed", type=int, default=0, show_default=True)
@click.option("--phase-schedule",
              type=click.Choice(["simultaneous", "alternating"]),
              default="simultaneous", show_default=True,
              help="'simultaneous' runs Gmain+Dmain as one update over a "
                   "shared forward (~20% faster at 1024; D sees pre-update-"
                   "G fakes and shares the fake sample/augment draw with "
                   "G).  'alternating' keeps the reference phase order.")
@click.option("--packed-tail-blocks", type=int, default=1, show_default=True,
              help="Trailing G synthesis blocks on the space-to-depth "
                   "packed grid (res>=64; 0 disables packing)")
@click.option("--packed-head-blocks", type=int, default=1, show_default=True,
              help="Leading D blocks on the packed grid (res>=64; "
                   "0 disables packing)")
@click.option("--ga-threshold", type=float, default=None,
              help="GA-GAN in-training refinement: fakes whose "
                   "|D(real)-D(fake)| < threshold are replaced by GA "
                   "offspring before the D step (reference "
                   "training_loop.py:199 threshold kwarg; default off)")
@click.option("--ga-mutation-rate", type=float, default=0.1,
              show_default=True,
              help="GA offspring mutation rate (with --ga-threshold)")
@click.option("--spatial-shard-min-res", type=int, default=None,
              help="Shard the H axis of >=RES synthesis activations over "
                   "the mesh (beyond-reference scaling axis: one image "
                   "spans all chips via XLA halo exchanges; needs >1 "
                   "device; disables the packed tail on sharded levels)")
@click.option("--dry-run", is_flag=True)
def main(outdir, data, n_devices, cfg, kimg, batch, batch_gpu, gamma, cond,
         mirror,
         subset, aug, aug_p, target, augpipe, aug_dtype, resume, freezed,
         lrate, glrate,
         dlrate, use_domain_modulation, domain_modulation_parametrization,
         generator_requires_grad_parts, snap, seed, phase_schedule,
         packed_tail_blocks, packed_head_blocks, ga_threshold,
         ga_mutation_rate, spatial_shard_min_res, dry_run):
    """Train a StyleGAN2 (optionally domain-adapted) model on TPU."""
    import jax

    from gagan_tpu.data import ImageFolderDataset
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.train import augment as aug_lib
    from gagan_tpu.train import gan_loss, loop as loop_lib, train_step as ts

    # Prefer the C++ batch decoder for PNG zips (the dataset_tool's output
    # format) — GIL-free libpng threads keep decode off the dispatch path.
    dataset = None
    if data.endswith(".zip"):
        from gagan_tpu.data import native_loader as nl

        if nl.native_available():
            try:
                dataset = nl.NativeZipDataset(
                    data, use_labels=cond, xflip=mirror, max_size=subset,
                    random_seed=seed)
            except IOError:
                dataset = None   # e.g. non-PNG content; fall back
    if dataset is None:
        dataset = ImageFolderDataset(
            data, use_labels=cond, xflip=mirror, max_size=subset,
            random_seed=seed)
    res = dataset.resolution

    spec = dict(CFG_SPECS[cfg])
    n_dev = n_devices or len(jax.devices())
    if cfg == "auto":
        spec["mb"] = max(min(n_dev * min(4096 // res, 32), 64), n_dev)
        spec["mbstd"] = min(spec["mb"] // n_dev, 4)
        spec["fmaps"] = 1 if res >= 512 else 0.5
        spec["lrate"] = 0.002 if res >= 1024 else 0.0025
        spec["gamma"] = 0.0002 * (res ** 2) / spec["mb"]
        spec["ema"] = spec["mb"] * 10 / 32
    if kimg is not None:
        spec["kimg"] = kimg
    if batch is not None:
        spec["mb"] = batch
    if gamma is not None:
        spec["gamma"] = gamma
    if lrate is not None:
        spec["lrate"] = lrate
    spec["glrate"] = glrate if glrate is not None else spec["lrate"]
    spec["dlrate"] = dlrate if dlrate is not None else spec["lrate"]

    # batch_gpu < batch/devices => sequential gradient-accumulation rounds
    # inside the jitted phase step (reference train.py:300-306).
    device_batch = max(spec["mb"] // n_dev, 1)
    accum_rounds = 1
    g_reg_rounds = d_reg_rounds = None
    if batch_gpu is not None:
        if device_batch % batch_gpu:
            raise click.ClickException(
                f"--batch-gpu={batch_gpu} must divide the per-device batch "
                f"{device_batch} (= batch {spec['mb']} / {n_dev} devices)")
        accum_rounds = device_batch // batch_gpu
    elif res >= 1024:
        # Auto live-batch cap for one 16G v5e chip at 1024²: alternating
        # main phases fit 16 samples, the simultaneous Gmain+Dmain joint
        # graph and R1's double-backward fit 8 (measured; batch 32 runs
        # the full ADA step at 55.0 sec/kimg simultaneous / 67.1
        # alternating vs 177-191 at live-batch 4).
        def rounds_for(cap):
            r = -(-device_batch // cap)
            while device_batch % r:
                r += 1
            return r

        main_cap = 8 if phase_schedule == "simultaneous" else 16
        accum_rounds = rounds_for(main_cap)
        g_reg_rounds = rounds_for(16)
        d_reg_rounds = rounds_for(8)

    g_parts = tuple(generator_requires_grad_parts.split(","))

    # At 1024² the auto accumulation above caps the live batch so the hot
    # phase variants fit (and run 10-17% faster) without remat; only the
    # R1-containing variant is remat'd (loop reg_remat).  At 512 the live
    # batch is uncapped, so keep full remat there.
    main_remat = (res == 512) or (res >= 1024
                                  and device_batch // accum_rounds > 16)
    reg_remat = res >= 1024 and not main_remat
    g_cfg = sg2.GeneratorConfig(
        z_dim=512, w_dim=512, c_dim=dataset.label_dim if cond else 0,
        img_resolution=res, img_channels=dataset.num_channels,
        mapping=sg2.MappingConfig(num_layers=spec["map"]),
        synthesis=sg2.SynthesisConfig(
            channel_base=int(spec["fmaps"] * 32768), channel_max=512,
            num_fp16_res=4, conv_clamp=256,
            packed_last_block=(res >= 64 and packed_tail_blocks > 0),
            packed_tail_blocks=max(packed_tail_blocks, 1),
            remat=main_remat))
    d_cfg = sg2.DiscriminatorConfig(
        c_dim=dataset.label_dim if cond else 0, img_resolution=res,
        img_channels=dataset.num_channels,
        channel_base=int(spec["fmaps"] * 32768), channel_max=512,
        num_fp16_res=4, conv_clamp=256, mbstd_group_size=spec["mbstd"],
        packed_first_block=(res >= 64 and packed_head_blocks > 0),
        packed_head_blocks=max(packed_head_blocks, 1), remat=main_remat)

    train_cfg = ts.TrainConfig(
        g_lr=spec["glrate"], d_lr=spec["dlrate"],
        ema_kimg=spec["ema"], ema_rampup=spec["ramp"],
        ada_target=(target if aug == "ada" else None),
        batch_size=spec["mb"],
        accum_rounds=accum_rounds,
        g_reg_accum_rounds=g_reg_rounds,
        d_reg_accum_rounds=d_reg_rounds,
        loss=gan_loss.GANLossConfig(r1_gamma=spec["gamma"]),
        g_requires_grad_parts=g_parts,
        freeze_d_layers=freezed,
        simultaneous_main=(phase_schedule == "simultaneous"),
        ga_threshold=ga_threshold,
        ga_mutation_rate=ga_mutation_rate)

    augment_cfg = None
    if aug != "noaug":
        # 'auto': bf16 pipe when the D's high-res blocks are bf16 anyway
        # (the pipe is HBM-bound; see AugmentConfig.compute_dtype).
        if aug_dtype == "auto":
            compute_dtype = "bfloat16" if res >= 256 else None
        else:
            compute_dtype = None if aug_dtype == "float32" else aug_dtype
        augment_cfg = aug_lib.make_config(augpipe,
                                          compute_dtype=compute_dtype)

    loop_cfg = loop_lib.LoopConfig(
        run_dir=outdir, total_kimg=spec["kimg"], random_seed=seed,
        n_devices=n_devices, image_snapshot_ticks=snap,
        network_snapshot_ticks=snap, resume_from=resume,
        initial_ada_p=(aug_p or 0.0) if aug == "fixed" else 0.0)

    desc = f"{dataset.name}-{cfg}-b{spec['mb']}"
    if use_domain_modulation:
        desc += f"-dm-{domain_modulation_parametrization}"
    print(f"Run: {desc}")
    print(json.dumps({"spec": spec, "parts": g_parts,
                      "schedule": phase_schedule,
                      "accum_rounds": [accum_rounds, g_reg_rounds,
                                       d_reg_rounds]},
                     indent=2, default=str))

    if dry_run:
        print("Dry run; exiting.")
        return

    loop_lib.training_loop(
        loop_cfg, train_cfg, g_cfg, d_cfg, dataset,
        augment_cfg=augment_cfg,
        parametrization=(domain_modulation_parametrization
                         if use_domain_modulation else None),
        weight_parts=g_parts,
        reg_remat=reg_remat,
        spatial_shard_min_res=spatial_shard_min_res)


if __name__ == "__main__":
    main()
