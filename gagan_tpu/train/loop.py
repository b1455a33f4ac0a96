"""The adversarial training loop harness.

TPU-native re-expression of `DissimilarDomains/training/training_loop.py:163-661`:
host-side scheduling of the jit'd phase steps (lazy-reg interval gating),
tick-cadenced status lines / stats.jsonl, image + network snapshots, ADA p
heuristic, abort polling, checkpoint resume, and optional in-loop metric
evaluation.  The GA refinement splice (training_loop.py:392-434) runs inside
the jitted D phases when `TrainConfig.ga_threshold` is set (clean
re-implementation of the intended semantics; the reference's splice is
broken — SURVEY.md §0).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import PIL.Image

from gagan_tpu.data import ImageFolderDataset, data_loader
from gagan_tpu.models import stylegan2 as sg2
from gagan_tpu.parallel import create_mesh, place_state, shard_batch
from gagan_tpu.train import augment as aug
from gagan_tpu.train import train_step as ts
from gagan_tpu.utils import checkpoint as ckpt
from gagan_tpu.utils.config import to_dict as config_lib_to_dict
from gagan_tpu.utils.stats import Collector, StatsLogger


@dataclasses.dataclass
class LoopConfig:
    run_dir: str = "runs/exp"
    total_kimg: float = 25000
    kimg_per_tick: float = 4
    image_snapshot_ticks: Optional[int] = 50
    network_snapshot_ticks: Optional[int] = 50
    random_seed: int = 0
    n_devices: Optional[int] = None
    grid_size: Tuple[int, int] = (4, 4)
    resume_from: Optional[str] = None   # snapshot npz to resume params from
    initial_ada_p: float = 0.0          # for --aug=fixed
    metrics_fn: Optional[Callable] = None  # called with (g_ema_params, g_cfg)
    abort_fn: Optional[Callable[[], bool]] = None
    progress_fn: Optional[Callable[[int, int], None]] = None
    # Per-parameter TensorBoard histograms each tick (reference
    # training_loop.py:640-649 logs them unconditionally when TB is up).
    log_param_histograms: bool = True


def save_image_grid(img: np.ndarray, fname: str, drange, grid_size):
    """(training_loop.py:140-157)"""
    lo, hi = drange
    img = np.asarray(img, dtype=np.float32)
    img = (img - lo) * (255 / (hi - lo))
    img = np.rint(img).clip(0, 255).astype(np.uint8)
    gw, gh = grid_size
    _n, c, h, w = img.shape
    img = img[: gw * gh].reshape(gh, gw, c, h, w)
    img = img.transpose(0, 3, 1, 4, 2).reshape(gh * h, gw * w, c)
    if c == 1:
        PIL.Image.fromarray(img[:, :, 0], "L").save(fname)
    else:
        PIL.Image.fromarray(img, "RGB").save(fname)


def training_loop(
    loop_cfg: LoopConfig,
    train_cfg: ts.TrainConfig,
    g_cfg: sg2.GeneratorConfig,
    d_cfg: sg2.DiscriminatorConfig,
    dataset: ImageFolderDataset,
    augment_cfg: Optional[aug.AugmentConfig] = None,
    parametrization: Optional[str] = None,
    weight_parts: Tuple[str, ...] = ("all",),
    reg_remat: bool = False,
    spatial_shard_min_res: Optional[int] = None,
) -> ts.TrainState:
    run_dir = loop_cfg.run_dir
    os.makedirs(run_dir, exist_ok=True)
    key = jax.random.PRNGKey(loop_cfg.random_seed)

    # Networks.
    k_g, k_d, key = jax.random.split(key, 3)
    g_params = sg2.init_generator(k_g, g_cfg)
    d_params = sg2.init_discriminator(k_d, d_cfg)
    if loop_cfg.resume_from:
        trees, _cfg = ckpt.load_snapshot(loop_cfg.resume_from)
        # Copy params by name, tolerating missing keys
        # (misc.copy_params_and_buffers semantics, training_loop.py:245-250).
        def merge(dst, src):
            for k2, v in src.items():
                if k2 in dst:
                    if isinstance(v, dict):
                        merge(dst[k2], v)
                    elif dst[k2].shape == v.shape:
                        dst[k2] = jnp.asarray(v)
        if "G" in trees:
            merge(g_params, trees["G"])
        if "D" in trees:
            merge(d_params, trees["D"])

    # Optional offsets parameterization (domain adaptation).
    offsets_spec = None
    offsets_tx = None
    if parametrization:
        from gagan_tpu.params import offsets as offs_lib

        offsets_spec = offs_lib.OffsetsSpec.from_string(
            parametrization, weight_parts=weight_parts)
        key, k_off = jax.random.split(key)
        offsets = offs_lib.init_offsets(k_off, g_cfg.synthesis, offsets_spec)
        import optax

        from gagan_tpu.train import masks as masks_lib

        o_mask = jax.tree.map(
            lambda a, b: a and b,
            offs_lib.trainable_mask(offsets_spec, offsets),
            masks_lib.offsets_mask(offsets, weight_parts))
        offsets_tx = optax.multi_transform(
            {"train": optax.adam(train_cfg.g_lr, b1=train_cfg.adam_beta1,
                                 b2=train_cfg.adam_beta2,
                                 eps=train_cfg.adam_eps),
             "freeze": optax.set_to_zero()},
            jax.tree.map(lambda m: "train" if m else "freeze", o_mask))

    # Optimizers / state / mesh.
    g_tx, d_tx, _gm, _dm = ts.build_optimizers(train_cfg, g_params, d_params)
    state = ts.init_train_state(train_cfg, g_params, d_params, g_tx, d_tx)
    if offsets_spec is not None:
        state = state.replace(
            offsets=offsets,
            offsets_ema=jax.tree.map(jnp.copy, offsets),
            offsets_opt_state=offsets_tx.init(offsets))
    if loop_cfg.resume_from and "G_ema" in trees:
        g_ema = state.g_ema
        merge(g_ema, trees["G_ema"])
        state = state.replace(g_ema=g_ema)

    if loop_cfg.initial_ada_p:
        state = state.replace(
            ada_p=jnp.asarray(loop_cfg.initial_ada_p, jnp.float32))

    mesh = create_mesh(loop_cfg.n_devices)
    n_dev = int(mesh.devices.size)
    state = place_state(mesh, state)

    augment_fn = aug.make_augment_fn(augment_cfg) if augment_cfg else None

    # Phase steps: 4 static variants keyed by (do_g_reg, do_d_reg).
    # reg_remat: with un-remat'd base configs, only the d_reg (R1) phase —
    # whose double-backward peaks past HBM when the rest of the fused
    # program is un-remat'd — runs a remat'd D.  The program peak is the
    # max over the sequential phases, so this fits whenever the hot
    # (no-d_reg) step and the remat'd R1 both fit, and the main/Greg
    # phases keep their 10-17% un-remat'd speed even inside the R1 step
    # (measured at 1024²: 2.89 vs 3.37 s/step; see tools/bench_train.py).
    r1_d_cfg = None
    if reg_remat:
        r1_d_cfg = dataclasses.replace(d_cfg, remat=True)
    # The Pallas fused level's custom VJP is first-order only: PL-reg
    # differentiates the synthesis VJP again, so the Greg phase gets a
    # config with the fused path disabled (XLA path, exact double grads).
    pl_g_cfg = None
    if g_cfg.synthesis.pallas_level:
        pl_g_cfg = dataclasses.replace(
            g_cfg, synthesis=dataclasses.replace(
                g_cfg.synthesis, pallas_level=False))
    # Spatial (H-axis) sharding of the >= min_res synthesis activations —
    # the beyond-reference scaling axis (parallel/spatial.py): identity
    # sharding-constraint hooks make XLA insert conv halo exchanges so one
    # image spans the mesh.
    extra_hooks = None
    d_constraint = None
    if spatial_shard_min_res is not None and n_dev > 1:
        from gagan_tpu.parallel import spatial as spatial_lib

        extra_hooks = spatial_lib.spatial_sharding_hooks(
            g_cfg.synthesis, mesh, min_res=spatial_shard_min_res)
        d_constraint = spatial_lib.d_spatial_constraint(mesh)
    steps = {}
    for do_g in (False, True):
        for do_d in (False, True):
            steps[(do_g, do_d)] = jax.jit(ts.make_fused_step(
                train_cfg, g_cfg, d_cfg, g_tx, d_tx, augment_fn=augment_fn,
                do_g_reg=do_g, do_d_reg=do_d,
                reg_g_cfg=pl_g_cfg if do_g else None,
                reg_d_cfg=r1_d_cfg if do_d else None,
                offsets_spec=offsets_spec, offsets_tx=offsets_tx,
                extra_hooks=extra_hooks, d_constraint=d_constraint),
                donate_argnums=(0,))

    # Data.  A NativeZipDataset decodes whole batches in the C++ loader
    # (GIL-free libpng threads, native/gagan_loader.cpp) — on a weak host
    # the Python per-image decode path competes with step dispatch for
    # CPU and dominates sec/kimg.
    from gagan_tpu.data import native_loader as nl

    if isinstance(dataset, nl.NativeZipDataset):
        loader = nl.native_data_loader(dataset, train_cfg.batch_size,
                                       seed=loop_cfg.random_seed)
    else:
        loader = data_loader(dataset, train_cfg.batch_size,
                             seed=loop_cfg.random_seed)

    # Snapshot grid latents.
    grid_n = loop_cfg.grid_size[0] * loop_cfg.grid_size[1]
    key, k_grid = jax.random.split(key)
    grid_z = jax.random.normal(k_grid, (grid_n, g_cfg.z_dim))
    grid_c = None

    @jax.jit
    def ema_synthesize(g_ema, z):
        return sg2.generator_apply(g_cfg, g_ema, z, c=grid_c,
                                   noise_mode="const")

    collector = Collector()
    logger = StatsLogger(run_dir)
    with open(os.path.join(run_dir, "training_options.json"), "wt") as f:
        json.dump({
            "loop": {k: str(v) for k, v in dataclasses.asdict(loop_cfg).items()},
            "train": {k: str(v) for k, v in dataclasses.asdict(train_cfg).items()},
        }, f, indent=2)

    start_time = time.time()
    cur_tick = 0
    tick_start_nimg = 0
    tick_start_time = start_time
    batch_idx = 0
    done = False

    while not done:
        images, labels = next(loader)
        real = jnp.asarray(images, jnp.float32) / 127.5 - 1.0
        real_c = jnp.asarray(labels) if labels.shape[1] > 0 else None
        key, k_z, k_step = jax.random.split(key, 3)
        z = jax.random.normal(k_z, (train_cfg.batch_size, g_cfg.z_dim))
        if n_dev > 1:
            real, z = shard_batch(mesh, (real, z))
            if real_c is not None:
                (real_c,) = shard_batch(mesh, (real_c,))

        do_g_reg = (train_cfg.g_reg_interval is not None
                    and batch_idx % train_cfg.g_reg_interval == 0)
        do_d_reg = (train_cfg.d_reg_interval is not None
                    and batch_idx % train_cfg.d_reg_interval == 0)
        state, metrics = steps[(do_g_reg, do_d_reg)](
            state, real, real_c, z, real_c, k_step)
        collector.report_dict(
            {k: np.asarray(v) for k, v in metrics.items()})
        batch_idx += 1
        cur_nimg = int(state.cur_nimg)

        # ADA heuristic (training_loop.py:529-535).
        if (train_cfg.ada_target is not None
                and batch_idx % train_cfg.ada_interval == 0):
            new_p = ts.ada_update(train_cfg, float(state.ada_p),
                                  collector.mean("Loss/signs/real"))
            state = state.replace(ada_p=jnp.asarray(new_p, jnp.float32))

        done = cur_nimg >= loop_cfg.total_kimg * 1000
        if (not done) and (cur_nimg < tick_start_nimg
                           + loop_cfg.kimg_per_tick * 1000):
            continue

        # ---- Tick maintenance (training_loop.py:537-652) ----
        tick_end_time = time.time()
        sec_per_kimg = ((tick_end_time - tick_start_time)
                        / max(cur_nimg - tick_start_nimg, 1) * 1000)
        fields = [
            f"tick {cur_tick:<5d}",
            f"kimg {cur_nimg / 1e3:<8.1f}",
            f"sec/tick {tick_end_time - tick_start_time:<7.1f}",
            f"sec/kimg {sec_per_kimg:<7.2f}",
            f"augment {float(state.ada_p):.3f}",
            f"G_loss {collector.mean('Loss/G/loss'):.3f}",
            f"D_loss {collector.mean('Loss/D/loss'):.3f}",
        ]
        print(" ".join(fields), flush=True)
        logger.write(collector, step=cur_nimg, extra={
            "Progress/tick": cur_tick,
            "Progress/kimg": cur_nimg / 1e3,
            "Progress/augment": float(state.ada_p),
            "Timing/sec_per_kimg": sec_per_kimg,
            "Timing/total_sec": tick_end_time - start_time,
        })
        if loop_cfg.log_param_histograms:
            logger.log_histograms({"G": state.g_params, "D": state.d_params},
                                  step=cur_nimg)
        collector.reset()

        if loop_cfg.abort_fn is not None and loop_cfg.abort_fn():
            done = True
        if loop_cfg.progress_fn is not None:
            loop_cfg.progress_fn(cur_nimg // 1000, loop_cfg.total_kimg)

        if (loop_cfg.image_snapshot_ticks is not None
                and (done or cur_tick % loop_cfg.image_snapshot_ticks == 0)):
            imgs = np.asarray(ema_synthesize(state.g_ema, grid_z))
            save_image_grid(
                imgs, os.path.join(run_dir, f"fakes{cur_nimg // 1000:06d}.png"),
                drange=[-1, 1], grid_size=loop_cfg.grid_size)

        if (loop_cfg.network_snapshot_ticks is not None
                and (done or cur_tick % loop_cfg.network_snapshot_ticks == 0)):
            snap_path = os.path.join(
                run_dir, f"network-snapshot-{cur_nimg // 1000:06d}.npz")
            from gagan_tpu.utils import config as config_lib

            ckpt.save_snapshot(
                snap_path,
                g_params=jax.device_get(state.g_params),
                d_params=jax.device_get(state.d_params),
                g_ema=jax.device_get(state.g_ema),
                config={"g_cfg": config_lib.to_dict(g_cfg),
                        "d_cfg": config_lib.to_dict(d_cfg)},
                extra={"pl_mean": np.asarray(state.pl_mean),
                       "ada_p": np.asarray(state.ada_p),
                       "cur_nimg": np.asarray(state.cur_nimg)})
            if offsets_spec is not None:
                ckpt.save_adaptation(
                    os.path.join(run_dir,
                                 f"adaptation-{cur_nimg // 1000:06d}.npz"),
                    model_type="parametrization",
                    parametrization=parametrization,
                    offsets=jax.device_get(state.offsets_ema),
                    sg2_config=config_lib_to_dict(g_cfg))
            if loop_cfg.metrics_fn is not None:
                loop_cfg.metrics_fn(jax.device_get(state.g_ema), g_cfg,
                                    snapshot=snap_path)

        cur_tick += 1
        tick_start_nimg = cur_nimg
        tick_start_time = time.time()

    loader.close()
    logger.close()
    return state
