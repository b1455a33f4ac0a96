"""Component-level timing of the one-shot CLIP adaptation step (DiFa bench
shapes: 1024² G, batch 4, ViT-B/32 + ViT-B/16) on the current backend —
the per-phase breakdown `tools/profile_train.py` provides for the
adversarial step, but for `AdaptationTrainer` (reference protocol:
`SimilarDomains/configs/im2im_difa.yaml:15-57`).

Usage:
    python tools/profile_adapt.py            # full breakdown
    python tools/profile_adapt.py --batch 8
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

# Persist compiled executables across runs — the axon-tunnel compile
# service takes 180-1200 s per program (bench.py:97-104).  TPU-only: the
# XLA:CPU cache embeds the build host's CPU features and this VM migrates.
if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_gagan_bench"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, n=6, label=""):
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    # axon tunnel: fetch a scalar to force full sync.
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
    print(f"{label:44s} {dt * 1000:9.1f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--parametrization", default="s_delta")
    args = ap.parse_args()

    from gagan_tpu.clip import VIT_B_16, VIT_B_32, init_clip
    from gagan_tpu.clip import model as clip_model
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.params import offsets as offs_lib
    from gagan_tpu.train import adapt_losses as al
    from gagan_tpu.train import adaptation as ad

    batch, res, n = args.batch, args.res, args.n
    g_cfg = sg2.GeneratorConfig(
        img_resolution=res,
        synthesis=sg2.SynthesisConfig(num_fp16_res=4, conv_clamp=256,
                                      packed_last_block=res >= 64))
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    encoders = {
        "ViT-B/32": (VIT_B_32, init_clip(jax.random.PRNGKey(1), VIT_B_32)),
        "ViT-B/16": (VIT_B_16, init_clip(jax.random.PRNGKey(2), VIT_B_16)),
    }
    emb = {}
    for i, (name, (ccfg, _)) in enumerate(encoders.items()):
        e = jax.random.normal(jax.random.PRNGKey(10 + i), (2, ccfg.embed_dim))
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
        emb[name] = {"src": e[0][None], "trg": e[1][None]}

    spec = offs_lib.OffsetsSpec.from_string(args.parametrization)
    offsets = offs_lib.init_offsets(jax.random.PRNGKey(3), g_cfg.synthesis,
                                    spec)
    hooks = offs_lib.make_hooks(spec, offsets)

    key = jax.random.PRNGKey(4)
    z = jax.random.normal(jax.random.PRNGKey(5), (batch, g_cfg.z_dim))
    ws = sg2.mapping_apply(g_cfg.mapping, g_params["mapping"], z)
    ws = jax.block_until_ready(ws)

    print(f"res={res} batch={batch} parametrization={args.parametrization}",
          flush=True)

    null = jax.jit(lambda s: s + 1.0)
    timeit(lambda: null(jnp.float32(0.0)), n=n, label="null jit call")

    # --- G components ---
    synth = jax.jit(functools.partial(
        sg2.synthesis_apply, g_cfg.synthesis, noise_mode="const"))
    t_fwd = timeit(lambda: synth(g_params["synthesis"], ws), n=n,
                   label=f"G synthesis fwd (batch {batch})")
    ws2x = jnp.concatenate([ws, ws], axis=0)
    timeit(lambda: synth(g_params["synthesis"], ws2x), n=n,
           label=f"G synthesis fwd (batch {2 * batch})")

    def synth_with_offsets(o, ws_in):
        h = offs_lib.make_hooks(spec, o)
        img = sg2.synthesis_apply(g_cfg.synthesis, g_params["synthesis"],
                                  ws_in, noise_mode="const", hooks=h)
        return jnp.mean(img.astype(jnp.float32)), img

    gb = jax.jit(jax.grad(lambda o: synth_with_offsets(o, ws)[0]))
    t_gbwd = timeit(lambda: gb(offsets), n=n,
                    label="G synth fwd+bwd wrt offsets")

    if spec.per_sample_only:
        sel = jnp.concatenate([jnp.zeros((batch,), jnp.bool_),
                               jnp.ones((batch,), jnp.bool_)])
        ws_j = jnp.concatenate([ws, ws], axis=0)

        def joint_loss(o):
            h = offs_lib.make_hooks(spec, o, batch_select=sel)
            img = sg2.synthesis_apply(g_cfg.synthesis,
                                      g_params["synthesis"], ws_j,
                                      noise_mode="const", hooks=h)
            return jnp.mean(img.astype(jnp.float32))

        gj = jax.jit(jax.grad(joint_loss))
        timeit(lambda: gj(offsets), n=n,
               label="joint pair (2N) fwd+bwd wrt offsets")

    # --- CLIP tower components (batch 2x: [trainable; frozen]) ---
    img8 = jax.random.normal(jax.random.PRNGKey(6),
                             (2 * batch, 3, res, res), jnp.float32)
    rsz = jax.jit(lambda x: clip_model.preprocess_image(
        jnp.clip(x * 127.5 + 128, 0, 255), 224))
    timeit(lambda: rsz(img8), n=n, label=f"resize {res}->224 (batch "
                                         f"{2 * batch})")

    for name, (ccfg, cparams) in encoders.items():
        enc = jax.jit(lambda p, x, c=ccfg: clip_model.encode_image(
            c, p, jnp.clip(x * 127.5 + 128, 0, 255),
            dtype=jnp.bfloat16)[0])
        t_enc = timeit(lambda: enc(cparams, img8), n=n,
                       label=f"{name} encode fwd (batch {2 * batch})")
        # Tower params travel as an ARGUMENT — a closure would bake ~10^8
        # literals into the HLO upload (the remote compile service 413s).
        encb = jax.jit(jax.grad(
            lambda x, p, c=ccfg: jnp.sum(clip_model.encode_image(
                c, p, jnp.clip(x * 127.5 + 128, 0, 255),
                dtype=jnp.bfloat16)[0].astype(jnp.float32)), argnums=0))
        timeit(lambda: encb(img8, cparams), n=n,
               label=f"{name} encode fwd+bwd (batch {2 * batch})")
        # Same but from a pre-resized 224 input: isolates the 1024->224
        # bicubic-resize VJP from the tower VJP.
        img224 = jax.image.resize(img8, img8.shape[:2] + (224, 224),
                                  "bicubic")
        encb224 = jax.jit(jax.grad(
            lambda x, p, c=ccfg: jnp.sum(clip_model.encode_image(
                c, p, jnp.clip(x * 127.5 + 128, 0, 255),
                dtype=jnp.bfloat16)[0].astype(jnp.float32)), argnums=0))
        timeit(lambda: encb224(img224, cparams), n=n,
               label=f"{name} fwd+bwd from 224 input")

    # --- full steps ---
    cfg = ad.AdaptationConfig(
        trainer="td_single", batch_size=batch, iter_num=301,
        parametrization=args.parametrization,
        visual_encoders=("ViT-B/32", "ViT-B/16"),
        loss=al.DirectLossConfig(loss_funcs=("direction",),
                                 loss_coefs=(1.0,)))
    trainer = ad.AdaptationTrainer(cfg, g_cfg, g_params, encoders,
                                   jax.random.PRNGKey(7),
                                   domain_embeddings=emb)
    t_step = timeit(trainer.train_step, n=n,
                    label="full step (td_single, sync every step)")

    # Full loss fwd vs fwd+bwd vs optimizer: isolates where the step's
    # device time goes beyond the G/tower components above.
    import optax

    frozen = trainer._frozen
    spec2 = trainer.spec
    step_fn_src = trainer._build_step()

    def loss_only(offsets, key_):
        k_z, k_z2, k_mix, k_step = jax.random.split(key_, 4)
        z_ = jax.random.normal(k_z, (batch, g_cfg.z_dim))
        z2_ = jax.random.normal(k_z2, (batch, g_cfg.z_dim))
        use_mix = jax.random.uniform(k_mix) < cfg.mixing_noise
        # reuse the trainer's private loss through its step-closure
        # machinery: cheaper to re-derive the public pieces here.
        hooks = None
        from gagan_tpu.params import offsets as offs_lib2
        if spec2.per_sample_only:
            fro, tra = trainer._run_g_pair(frozen["g"], offsets, z_, z2_,
                                           use_mix, k_step)
        else:
            hooks = offs_lib2.make_hooks(spec2, offsets)
            fro = trainer._run_g(frozen["g"], z_, z2_, use_mix, None, k_step)
            tra = trainer._run_g(frozen["g"], z_, z2_, use_mix, hooks, k_step)
        total = jnp.float32(0)
        for nm in cfg.visual_encoders:
            ccfg2, _ = trainer.clip_encoders[nm]
            both, _ = clip_model.encode_image(
                ccfg2, frozen["clip"][nm],
                jnp.clip(jnp.concatenate([tra, fro]) * 127.5 + 128, 0, 255),
                dtype=jnp.bfloat16)
            t_, s_ = jnp.split(both, 2, axis=0)
            total = total + jnp.mean(1 - jnp.sum(
                (t_ - s_) * (frozen["emb"][nm]["trg"]
                             - frozen["emb"][nm]["src"]), axis=-1))
        return total

    # Guarded: this probe's compile has repeatedly broken the axon
    # remote-compile helper (Broken pipe) — never let it kill the
    # pipelined-block measurement below.
    try:
        lf = jax.jit(loss_only)
        timeit(lambda: lf(trainer.offsets, key), n=n,
               label="full loss fwd only")
        lg = jax.jit(jax.grad(loss_only))
        timeit(lambda: lg(trainer.offsets, key), n=n,
               label="full loss fwd+bwd")
    except Exception as e:
        print(f"(loss-only probe failed: {type(e).__name__})", flush=True)

    # Pipelined: dispatch a block of steps, sync once (the real loop syncs
    # only on log cadence, cfg.log_every=10).
    def block10():
        for _ in range(10):
            out = trainer.train_step_async()
        return out

    if hasattr(trainer, "train_step_async"):
        t10 = timeit(block10, n=max(2, n // 2),
                     label="10-step block (async, one sync)")
        print(f"{'-> pipelined steps/s':44s} {10 / t10:9.2f}", flush=True)
    print(f"{'-> sync steps/s':44s} {1 / t_step:9.2f}", flush=True)


if __name__ == "__main__":
    main()
