"""A/B training-dynamics harness: quantify deviations of the fast paths.

Trains the same tiny GAN (32px, synthetic blob dataset) under two augment /
schedule configurations and compares the trajectories that drive ADA and
convergence: Loss/signs/real (the ADA feedback signal), ada_p, G/D losses,
and a final feature-space FID-like proxy (random-weight Inception tower, so
relative comparisons are meaningful, absolute values are not).

This backs two deliberate deviations with measurements (VERDICT round 1 #5):
  * geom_mode fast warp vs the reference's exact FIR-pyramid grid-sample;
  * simultaneous Gmain+Dmain vs the reference's alternating phases.

    python tools/ab_train.py --kimg 64 --arms exact,fast,simultaneous
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def blob_dataset(n: int, res: int, seed: int = 0) -> np.ndarray:
    """Synthetic learnable distribution: 1-3 colored soft ellipses on a
    vertical gradient background, [-1, 1] NCHW float32."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
    imgs = np.empty((n, 3, res, res), np.float32)
    for i in range(n):
        top = rng.uniform(-0.8, 0.2, 3)
        bot = rng.uniform(-0.2, 0.8, 3)
        img = top[:, None, None] + (bot - top)[:, None, None] * yy[None]
        for _ in range(rng.randint(1, 4)):
            c = rng.uniform(-1, 1, 3)
            cx, cy = rng.uniform(0.2, 0.8, 2)
            rx, ry = rng.uniform(0.05, 0.25, 2)
            ang = rng.uniform(0, np.pi)
            dx, dy = xx - cx, yy - cy
            u = dx * np.cos(ang) + dy * np.sin(ang)
            v = -dx * np.sin(ang) + dy * np.cos(ang)
            m = np.exp(-((u / rx) ** 2 + (v / ry) ** 2) * 2.0)
            img = img * (1 - m[None]) + c[:, None, None] * m[None]
        imgs[i] = np.clip(img, -1, 1)
    return imgs


def parse_arm(spec: str):
    """Arm grammar: '<exact|fast|simultaneous>[@pX][@dN][@gT]'.

    @pX  — fixed augment probability X (no ADA adjustment), e.g. '@p0.6';
    @dN  — train on only the first N images (D overfits, ADA drives p up);
    @gT  — GA refinement splice with ga_threshold=T (the reference
           training_loop.py:199 default is 0.5).
    Bare names keep the round-2 semantics (ADA on the full dataset).
    """
    parts = spec.split("@")
    base = parts[0]
    assert base in ("exact", "fast", "simultaneous"), spec
    fixed_p = None
    n_data = None
    ga_threshold = None
    for p in parts[1:]:
        if p.startswith("p"):
            fixed_p = float(p[1:])
        elif p.startswith("d"):
            n_data = int(p[1:])
        elif p.startswith("g"):
            ga_threshold = float(p[1:])
        else:
            raise ValueError(f"bad arm token {p!r} in {spec!r}")
    return base, fixed_p, n_data, ga_threshold


def run_arm(name: str, data: np.ndarray, kimg: float, batch: int,
            seed: int) -> dict:
    from gagan_tpu.metrics import inception as inc_lib
    from gagan_tpu.train import augment as aug_lib
    from gagan_tpu.train import gan_loss, train_step as ts
    from gagan_tpu.models import stylegan2 as sg2

    base, fixed_p, n_data, ga_threshold = parse_arm(name)
    eval_data = data
    if n_data is not None:
        data = data[:n_data]
    res = data.shape[-1]
    g_cfg = sg2.GeneratorConfig(
        z_dim=64, w_dim=64, img_resolution=res,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=4096, channel_max=128))
    d_cfg = sg2.DiscriminatorConfig(
        img_resolution=res, channel_base=4096, channel_max=128,
        mbstd_group_size=4)
    cfg = ts.TrainConfig(
        batch_size=batch, ema_kimg=2.0, ema_rampup=0.05,
        ada_target=(None if fixed_p is not None else 0.6), ada_kimg=20.0,
        loss=gan_loss.GANLossConfig(r1_gamma=0.0002 * res * res / batch),
        simultaneous_main=(base == "simultaneous"),
        ga_threshold=ga_threshold)

    aug_cfg = aug_lib.make_config("bgc")
    if base == "exact":
        aug_cfg = dataclasses.replace(aug_cfg, geom_mode="exact")
    augment_fn = aug_lib.make_augment_fn(aug_cfg)

    g_params = sg2.init_generator(jax.random.PRNGKey(seed), g_cfg)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(seed + 1), d_cfg)
    g_tx, d_tx, _, _ = ts.build_optimizers(cfg, g_params, d_params)
    state = ts.init_train_state(cfg, g_params, d_params, g_tx, d_tx)

    steps = {}
    for vname, (dg, dd) in {"none": (False, False), "greg": (True, False),
                            "dreg": (False, True),
                            "both": (True, True)}.items():
        steps[vname] = jax.jit(ts.make_fused_step(
            cfg, g_cfg, d_cfg, g_tx, d_tx, augment_fn=augment_fn,
            do_g_reg=dg, do_d_reg=dd), donate_argnums=(0,))

    if fixed_p is not None:
        state = state.replace(ada_p=jnp.float32(fixed_p))

    rng = np.random.RandomState(seed + 2)
    key = jax.random.PRNGKey(seed + 3)
    n_steps = int(kimg * 1000) // batch

    # AOT-compile every step variant BEFORE the timed loop.  Round 3 timed
    # compile inside wall_s, which made the FIRST arm of each geom_mode an
    # 8.8x wall outlier (exact@p0.3 2056 s vs exact@p0.6 233 s — identical
    # programs, p is runtime data; the later arm merely hit the persistent
    # executable cache).  docs/ab_dynamics_p.json predates this fix.
    t0 = time.time()
    ex_real = jnp.zeros((batch, 3, res, res), jnp.float32)
    ex_z = jnp.zeros((batch, 64), jnp.float32)
    ex_key = jax.random.PRNGKey(0)
    steps = {vname: fn.lower(state, ex_real, None, ex_z, None,
                             ex_key).compile()
             for vname, fn in steps.items()}
    compile_s = time.time() - t0

    traj = {"signs_real": [], "ada_p": [], "g_loss": [], "d_loss": []}
    if ga_threshold is not None:
        traj["ga_replaced"] = []
    signs_acc = []
    t0 = time.time()
    for it in range(n_steps):
        idx = rng.randint(0, data.shape[0], batch)
        real = jnp.asarray(data[idx])
        z = jnp.asarray(rng.randn(batch, 64).astype(np.float32))
        key, sub = jax.random.split(key)
        do_g = it % 4 == 0
        do_d = it % 16 == 0
        vname = {(0, 0): "none", (1, 0): "greg", (0, 1): "dreg",
                 (1, 1): "both"}[(int(do_g), int(do_d))]
        state, metrics = steps[vname](state, real, None, z, None, sub)
        signs_acc.append(float(metrics["Loss/signs/real"]))
        if fixed_p is None and it % 4 == 3:      # ada_interval
            new_p = ts.ada_update(cfg, state.ada_p,
                                  float(np.mean(signs_acc[-4:])))
            state = state.replace(ada_p=jnp.float32(new_p))
        if it % 8 == 0:
            traj["signs_real"].append(float(np.mean(signs_acc[-8:] or [0])))
            traj["ada_p"].append(float(state.ada_p))
            traj["g_loss"].append(float(metrics["Loss/G/loss"]))
            traj["d_loss"].append(float(metrics["Loss/D/loss"]))
            if ga_threshold is not None:
                traj["ga_replaced"].append(
                    float(metrics["Loss/ga/replaced"]))
    wall = time.time() - t0

    # FID-like proxy on the random inception tower: EMA samples vs data.
    inc_params = inc_lib.init_inception_v3(jax.random.PRNGKey(0))
    feat = jax.jit(lambda im: inc_lib.inception_v3_features(
        inc_params, (im + 1) * 127.5))

    def stats(images):
        fs = []
        for i in range(0, images.shape[0], 64):
            fs.append(np.asarray(feat(jnp.asarray(images[i:i + 64]))))
        fs = np.concatenate(fs)
        return fs.mean(0), np.cov(fs, rowvar=False)

    n_eval = 512
    zs = np.random.RandomState(99).randn(n_eval, 64).astype(np.float32)
    gen = []
    gen_fn = jax.jit(lambda z: sg2.generator_apply(
        g_cfg, state.g_ema, z, noise_mode="const"))
    for i in range(0, n_eval, 64):
        gen.append(np.asarray(gen_fn(jnp.asarray(zs[i:i + 64]))))
    gen = np.concatenate(gen)
    mu_g, cov_g = stats(gen)
    mu_r, cov_r = stats(eval_data[:n_eval])

    from gagan_tpu.metrics.fid import frechet_distance

    fid_proxy = float(frechet_distance(mu_g, cov_g, mu_r, cov_r))
    rec = {"arm": name, "fid_proxy": fid_proxy, "wall_s": round(wall, 1),
           "compile_s": round(compile_s, 1),
           "final_ada_p": traj["ada_p"][-1],
           "mean_signs_real": float(np.mean(traj["signs_real"])),
           "traj": traj}
    if ga_threshold is not None:
        rec["mean_ga_replaced"] = float(np.mean(traj["ga_replaced"]))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kimg", type=float, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--n-data", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arms", default="exact,fast,simultaneous")
    ap.add_argument("--out", default=None, help="write JSON here")
    args = ap.parse_args()

    # Persist compiled executables (the axon-tunnel compile service is slow;
    # arms share most step variants, and reruns become free).  TPU-only:
    # XLA:CPU caches AOT machine code keyed on the *build* host's CPU
    # features, and this VM migrates between hosts — loading a stale entry
    # can SIGILL.
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_gagan_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    data = blob_dataset(args.n_data, args.res, seed=123)
    results = []
    for arm in args.arms.split(","):
        r = run_arm(arm.strip(), data, args.kimg, args.batch, args.seed)
        traj = r.pop("traj")
        r["traj_tail"] = {k: [round(x, 4) for x in v[-8:]]
                         for k, v in traj.items()}
        print(json.dumps(r), flush=True)
        results.append(dict(r, traj=traj))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f)


if __name__ == "__main__":
    main()
