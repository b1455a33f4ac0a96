"""Headline benchmarks on TPU: FFHQ-1024 synthesis, ADA training, adaptation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extra}.
The headline metric stays FFHQ-1024 synthesis imgs/sec/chip (continuity with
BENCH_r01); the extra fields carry the full BASELINE.md:59 target surface
("synthesis + adaptation steps/sec" plus the training tables):

* train_sec_per_kimg / train_vs_baseline — the fused ADA training step
  (Gmain+Greg+Dmain+Dreg+EMA, phase-scheduled 12:3:1 per 16 batches) at
  1024², global batch 32.  Baseline: V100 1-GPU 154.3-161.6 sec/kimg
  (BASE_README.md:292) / 2.03 A100-vs-V100 training speedup (NVIDIA A100
  whitepaper-era measured StyleGAN2 ratio) ~= 77.8 sec/kimg on one A100.
  vs_baseline = 77.8 / measured (>1 is faster than A100).
* adapt10_sec_per_kimg / adapt10_vs_baseline — BASELINE config 4: the
  10-shot Affine+ few-shot adaptation protocol (offsets-only G via the
  affine/weights-offset trainable parts + out_in_additive offsets, full D,
  ADA, 1024², glrate 0.02 — DissimilarDomains/README.md:190-195 run 05),
  same A100 anchor derivation as training (the reference runs the full
  training loop for this protocol; see BASELINE_A100_ADAPT10_SEC_PER_KIMG).
* adapt_steps_per_sec / adapt_vs_baseline — one-shot CLIP adaptation step
  (DiFa-style: frozen G fwd + trainable G fwd/bwd + ViT-B/32+B/16 encodes,
  batch 4 at 1024², the im2im_difa.yaml:15-57 protocol shapes).  A100
  anchor: 4 G-forward-equivalents per step (frozen fwd + trainable fwd +
  ~2x fwd for the backward) at the 35 imgs/sec A100 synthesis rate, CLIP
  ViT cost negligible at these batch sizes -> 35 / (4 * 4) ~= 2.19
  steps/sec.  vs_baseline = measured / 2.19.

Each section is watchdog-bounded; a failed section reports null for its
fields instead of killing the whole bench.
"""

import contextlib
import json
import signal
import time

BASELINE_A100_IMGS_PER_SEC = 35.0
BASELINE_A100_TRAIN_SEC_PER_KIMG = 77.8
BASELINE_A100_ADAPT_STEPS_PER_SEC = 35.0 / (4 * 4)
# The full im2im_difa protocol step is strictly heavier on the reference
# stack: the td_single 4 G-forward-equivalents, plus 2 e4e decoder forwards
# (get_image_latents calls net() which synthesizes UNUSED 1024² images
# eagerly, trainers.py:992-1001 — torch can't DCE them), plus the IR-50
# encoder fwd x2 / bwd x1 at 256² (~1 G-equivalent) -> ~7 equivalents.
BASELINE_A100_DIFA_STEPS_PER_SEC = 35.0 / (4 * 7)

# Config-4 (BASELINE.md:45,57 — 10-shot Affine+ few-shot adaptation,
# DissimilarDomains/README.md:190-195 run 05): the SAME training loop as
# full-G ADA training with G grads restricted to the affine/offsets parts
# and the out_in_additive offsets trained jointly.  On the reference stack
# freezing parts does not shrink the G backward (grads into the affine
# layers still backprop through all synthesis convs) nor the D step, so the
# protocol's A100 anchor is the full-training one (77.8 sec/kimg, derived
# from the V100 154.3-161.6 range x the 2.03 A100/V100 StyleGAN2 ratio).
BASELINE_A100_ADAPT10_SEC_PER_KIMG = 77.8

_RETRY_ENV = "GAGAN_BENCH_INIT_RETRY"


def _short_err(e: BaseException, limit: int = 500) -> str:
    """One-line-ish error text: TPU RESOURCE_EXHAUSTED messages embed a
    multi-KB HBM allocation dump which (round 4) drowned the driver-stored
    stdout tail — keep the head, which carries the status + byte counts."""
    text = f"{type(e).__name__}: {e}"
    lines = [ln for ln in text.splitlines() if ln.strip()][:6]
    text = " | ".join(lines)
    return text[:limit] + ("..." if len(text) > limit else "")


def ensure_backend(max_retries: int = 5, cooldown_s: int = 90) -> None:
    """Initialize the TPU backend, re-exec'ing this process on failure.

    Two failure modes of the axon-tunnel environment are handled:
    * the plugin registers under a different platform name than the
      environment presets (axon vs tpu) — normalize to auto-select;
    * backend init transiently fails ("No jellyfish device found"),
      e.g. for a while after a previous client exits.  jax caches a
      failed init for the process lifetime, so the only clean retry is
      to re-exec the process after a cooldown (bounded via an env
      counter).
    """
    import os
    import subprocess
    import sys

    import jax

    preset = os.environ.get("JAX_PLATFORMS", "")
    if preset in ("axon", "tpu"):
        # Let jax pick whichever name the plugin actually registered.
        os.environ.pop("JAX_PLATFORMS", None)
        jax.config.update("jax_platforms", None)
    # A WEDGED tunnel hangs backend init inside a C nanosleep retry loop
    # that SIGALRM cannot interrupt — probe liveness in a subprocess first
    # so this process can fail fast (and re-exec-retry) instead of hanging
    # the whole bench.
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            env={k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"},
            timeout=240, check=True, capture_output=True)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        tries = int(os.environ.get(_RETRY_ENV, "0"))
        if tries >= max_retries:
            raise RuntimeError(f"TPU backend probe failed: {e}")
        print(f"# backend probe failed ({type(e).__name__}); re-exec "
              f"{tries + 1}/{max_retries} in {cooldown_s}s", flush=True)
        time.sleep(cooldown_s)
        os.environ[_RETRY_ENV] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    try:
        jax.devices()
    except RuntimeError as e:
        tries = int(os.environ.get(_RETRY_ENV, "0"))
        if tries >= max_retries:
            raise
        print(f"# backend init failed ({e}); re-exec {tries + 1}/"
              f"{max_retries} in {cooldown_s}s", flush=True)
        time.sleep(cooldown_s)
        os.environ[_RETRY_ENV] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    # Persist compiled executables: the remote compile service's latency
    # varies 180s..1200s for the same program, so a warm cache is the
    # difference between a 2-minute and a 40-minute bench.  TPU-only:
    # XLA:CPU cache entries embed the build host's CPU features and this
    # VM migrates between hosts — loading a stale entry can SIGILL.
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_gagan_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@contextlib.contextmanager
def watchdog(seconds: int):
    def _alarm(signum, frame):
        raise TimeoutError("bench watchdog")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _timed(run, n_iters=6, trim=True):
    times = []
    for _ in range(n_iters):
        start = time.perf_counter()
        run()
        times.append(time.perf_counter() - start)
    if trim and len(times) > 2:
        times = sorted(times)[1:-1]
    return sum(times) / len(times)


def bench_synthesis():
    import jax
    import jax.numpy as jnp

    from gagan_tpu.models import stylegan2 as sg2

    cfg = sg2.GeneratorConfig(
        img_resolution=1024,
        synthesis=sg2.SynthesisConfig(num_fp16_res=4, conv_clamp=256,
                                      packed_last_block=True))
    params = sg2.init_generator(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def forward(params, z):
        return sg2.generator_apply(cfg, params, z, noise_mode="const")

    def make_runner(batch):
        z = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.z_dim))

        def run_blocked():
            out = forward(params, z)
            # Force a device->host scalar transfer: on the axon-tunnel TPU
            # platform block_until_ready alone returns before execution
            # finishes and under-reports wall time by orders of magnitude.
            return float(jnp.mean(out[0, 0, 0, :8]))

        return run_blocked

    # Larger batches amortize per-op overheads (+50% at 96 vs 32) but the
    # remote compile service intermittently rejects or stalls on the
    # biggest programs; bound each attempt and fall back.
    run_blocked = None
    for batch in (96, 64, 32):
        try:
            with watchdog(900):
                run_blocked = make_runner(batch)
                run_blocked()   # warmup / compile
                run_blocked()
            break
        except Exception as e:
            print(f"# synthesis batch {batch} failed: {e}", flush=True)
            run_blocked = None
    assert run_blocked is not None, "no synthesis batch size compiled"

    dt = _timed(run_blocked, n_iters=10)
    return batch / dt


def _load_bench_train_module():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_train", os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools", "bench_train.py"))
    bt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bt)
    return bt


# Most-reliable-first; each later rung trades speed for memory headroom.
# Rung 1 is the round-3-proven configuration (52.4 s/kimg official r3):
# the packed_fused_torgb variant that landed in round 4 has failed the
# remote compile service on BOTH driver-condition runs since (r4:
# RESOURCE_EXHAUSTED, r5: compile-helper exit 1), so it is not in the
# ladder — re-add ahead of rung 1 only after a clean measured win.
# Rung 2 halves the live batch; rung 3 fully remats.  A slower measured
# number always beats a null.
_TRAIN_LADDER = (
    dict(note="r3-proven (unfused torgb)", fused_torgb=False),
    dict(note="live batch 4", fused_torgb=False,
         accum=8, g_reg_accum=4, d_reg_accum=8),
    dict(note="full remat", fused_torgb=False, remat=True,
         reg_remat=False, reg_remat_selective=False),
)


def _run_train_ladder(batch: int = 32, section: str = "train",
                      **build_overrides):
    """Measure the three scheduled step variants, walking the memory ladder
    on failure.  Returns (sec_per_kimg, per_variant dict)."""
    import gc

    import jax

    bt = _load_bench_train_module()
    base = dict(
        res=1024, batch=batch, aug=True, fmaps=1.0, remat=False, packed=True,
        accum=4, reg_accum=2, g_reg_accum=2, d_reg_accum=4, reg_remat=True,
        reuse_fakes=True, reg_remat_selective=True)
    base.update(build_overrides)

    real = jax.random.normal(jax.random.PRNGKey(3), (batch, 3, 1024, 1024))
    z = jax.random.normal(jax.random.PRNGKey(4), (batch, 512))

    per_variant = {}
    last_err = None
    for rung in _TRAIN_LADDER:
        rung = dict(rung)
        note = rung.pop("note")
        cfg = dict(base)
        cfg.update(rung)
        steps = state = None
        try:
            remaining = [v for v in ("none", "greg", "both")
                         if v not in per_variant]
            if not remaining:
                break
            steps, state = bt.build(**cfg)
            key = jax.random.PRNGKey(2)

            def run(name):
                nonlocal state
                state, metrics = steps[name](state, real, None, z, None, key)
                jax.block_until_ready(state.pl_mean)
                return float(state.pl_mean)

            for name in remaining:
                for attempt in (0, 1, 2):
                    try:
                        with watchdog(1800):
                            run(name)          # compile
                            per_variant[name] = _timed(
                                lambda: run(name), n_iters=4)
                        break
                    except (TimeoutError, Exception) as e:
                        # Transient tunnel faults (watchdog timeouts, HTTP
                        # 5xx / truncated responses from the remote compile
                        # service) retry in-rung — the executable may now
                        # sit in the persistent cache, so a retry is cheap.
                        # Anything else (e.g. RESOURCE_EXHAUSTED) escalates
                        # to the next memory rung immediately.
                        transient = isinstance(e, TimeoutError) or any(
                            s in str(e) for s in
                            ("remote_compile", "HTTP 5", "DEADLINE",
                             "UNAVAILABLE", "body closed"))
                        last_err = e
                        if not transient or attempt == 2:
                            raise
                        print(f"# {section}[{note}] variant {name} transient "
                              f"failure (attempt {attempt + 1}): "
                              f"{_short_err(e, 160)}", flush=True)
                print(f"# {section}[{note}] variant {name}: "
                      f"{per_variant[name]:.3f} s/step", flush=True)
            break
        except Exception as e:
            last_err = e
            print(f"# {section} rung '{note}' failed: {_short_err(e)}",
                  flush=True)
        finally:
            del steps, state
            gc.collect()
    if len(per_variant) < 3:
        raise RuntimeError(
            f"no train ladder rung completed: {_short_err(last_err)}")
    # Scheduler weights per 16 batches: Greg every 4, Dreg every 16 ->
    # 12x none, 3x +Greg, 1x both.
    sec_per_batch = (12 * per_variant["none"] + 3 * per_variant["greg"]
                     + per_variant["both"]) / 16
    return sec_per_batch / batch * 1000.0, per_variant


def bench_train():
    """Fused ADA train step at 1024², global batch 32, simultaneous
    Gmain+Dmain (accum 4/2/4), phase-variant remat — the shipping CLI
    configuration, with a memory-fallback ladder."""
    sec_per_kimg, _ = _run_train_ladder()
    return sec_per_kimg


def bench_adapt10():
    """BASELINE config 4: the 10-shot Affine+ adaptation step — offsets-only
    G (synt/tRGB affine + b64 weights offsets, out_in_additive), full D,
    ADA, 1024², glrate 0.02 (DissimilarDomains/README.md:190-195 run 05)."""
    sec_per_kimg, per_variant = _run_train_ladder(
        section="adapt10",
        parametrization="out_in_additive",
        g_parts=("synt_affine", "tRGB_affine", "synt_weights_offset.b64",
                 "tRGB_weights_offset.b64"),
        g_lr=0.02)
    return sec_per_kimg


def _adaptation_setup():
    import jax
    import jax.numpy as jnp

    from gagan_tpu.clip import VIT_B_16, VIT_B_32, init_clip
    from gagan_tpu.models import stylegan2 as sg2

    g_cfg = sg2.GeneratorConfig(
        img_resolution=1024,
        synthesis=sg2.SynthesisConfig(num_fp16_res=4, conv_clamp=256,
                                      packed_last_block=True))
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
    return g_cfg, g_params, encoders, emb


def _time_adaptation_blocks(trainer, seconds=1500):
    """Steady-state training cadence: the loop dispatches steps back-to-back
    and syncs on the log cadence (cfg.log_every=10, the im2im_difa.yaml
    logging protocol) — time blocks of 10 async steps with one sync, like
    AdaptationTrainer.train does."""
    import jax

    def block10():
        for _ in range(10):
            losses = trainer.train_step_async()
        jax.device_get(losses)

    with watchdog(seconds):
        trainer.train_step()   # compile + sync
        dt = _timed(block10, n_iters=4) / 10.0
    return 1.0 / dt


def bench_adaptation():
    """One-shot CLIP adaptation step (DiFa shapes: 1024² G, batch 4,
    ViT-B/32 + ViT-B/16), lightest loss stack (td_single + direction)."""
    import jax

    from gagan_tpu.train import adapt_losses as al
    from gagan_tpu.train import adaptation as ad

    g_cfg, g_params, encoders, emb = _adaptation_setup()
    cfg = ad.AdaptationConfig(
        trainer="td_single", batch_size=4, iter_num=301,
        parametrization="s_delta",
        visual_encoders=("ViT-B/32", "ViT-B/16"),
        loss=al.DirectLossConfig(loss_funcs=("direction",),
                                 loss_coefs=(1.0,)))
    trainer = ad.AdaptationTrainer(cfg, g_cfg, g_params, encoders,
                                   jax.random.PRNGKey(3),
                                   domain_embeddings=emb)
    return _time_adaptation_blocks(trainer)


def bench_adaptation_difa():
    """The REAL im2im_difa protocol step (im2im_difa.yaml:43-57): direction
    1.0 + difa_w 6.0 + difa_local 1.0 — token hooks captured on both ViT
    towers (difa_local), e4e image->W+ latents of both images computed
    inside the jitted step with grads through the trainable side (difa_w,
    trainers.py:992-1001/1159-1166), SCC sliding window updated."""
    import numpy as np

    import jax

    from gagan_tpu.inversion import encoders as enc_lib
    from gagan_tpu.train import adapt_losses as al
    from gagan_tpu.train import adaptation as ad

    g_cfg, g_params, encoders, emb = _adaptation_setup()
    style_image = np.random.RandomState(11).randint(
        0, 255, (3, 1024, 1024), np.uint8)
    e_cfg = enc_lib.EncoderConfig(stylegan_size=1024)
    e_params = enc_lib.init_encoder(jax.random.PRNGKey(5), e_cfg)
    cfg = ad.AdaptationConfig(
        trainer="im2im_difa", batch_size=4, iter_num=301,
        parametrization="s_delta", clip_layer=8,
        visual_encoders=("ViT-B/32", "ViT-B/16"),
        loss=al.DirectLossConfig(
            loss_funcs=("direction", "difa_local"), loss_coefs=(1.0, 1.0),
            scc=al.SCCConfig(weight=6.0)))
    trainer = ad.AdaptationTrainer(cfg, g_cfg, g_params, encoders,
                                   jax.random.PRNGKey(3),
                                   domain_embeddings=emb,
                                   style_image=style_image,
                                   latent_encoder=(e_cfg, e_params))
    return _time_adaptation_blocks(trainer)


def main():
    import gc

    result = {
        "metric": "ffhq1024_synthesis_imgs_per_sec_per_chip",
        "value": None,
        "unit": "imgs/sec/chip",
        "vs_baseline": None,
        "train_sec_per_kimg": None,
        "train_vs_baseline": None,
        "adapt10_sec_per_kimg": None,
        "adapt10_vs_baseline": None,
        "adapt_steps_per_sec": None,
        "adapt_vs_baseline": None,
        "adapt_difa_steps_per_sec": None,
        "adapt_difa_vs_baseline": None,
        # The difa/adapt A100 anchors are DERIVED (G-forward-equivalent
        # accounting, see module docstring + BASELINE_A100_DIFA_* comment),
        # not measured A100 runs; vs_baseline ratios against them are
        # model-based estimates (ADVICE r4 #4).
        "derived_anchors": ["adapt_vs_baseline", "adapt_difa_vs_baseline"],
    }
    try:
        ensure_backend()
    except Exception as e:
        # Emit the JSON line with nulls rather than nothing: the driver
        # records whatever single line this prints.
        print(f"# backend unavailable: {_short_err(e)}", flush=True)
        print(json.dumps(result))
        return
    try:
        imgs_per_sec = bench_synthesis()
        result["value"] = round(imgs_per_sec, 2)
        result["vs_baseline"] = round(
            imgs_per_sec / BASELINE_A100_IMGS_PER_SEC, 3)
        print(f"# synthesis: {imgs_per_sec:.1f} imgs/s/chip", flush=True)
    except Exception as e:
        print(f"# synthesis bench failed: {_short_err(e)}", flush=True)
    gc.collect()
    try:
        sec_per_kimg = bench_train()
        result["train_sec_per_kimg"] = round(sec_per_kimg, 2)
        result["train_vs_baseline"] = round(
            BASELINE_A100_TRAIN_SEC_PER_KIMG / sec_per_kimg, 3)
        print(f"# train: {sec_per_kimg:.1f} sec/kimg @1024² ADA", flush=True)
    except Exception as e:
        print(f"# train bench failed: {_short_err(e)}", flush=True)
    gc.collect()
    try:
        sec_per_kimg = bench_adapt10()
        result["adapt10_sec_per_kimg"] = round(sec_per_kimg, 2)
        result["adapt10_vs_baseline"] = round(
            BASELINE_A100_ADAPT10_SEC_PER_KIMG / sec_per_kimg, 3)
        print(f"# adapt10 (Affine+ protocol): {sec_per_kimg:.1f} sec/kimg "
              f"@1024² ADA", flush=True)
    except Exception as e:
        print(f"# adapt10 bench failed: {_short_err(e)}", flush=True)
    gc.collect()
    try:
        steps_per_sec = bench_adaptation()
        result["adapt_steps_per_sec"] = round(steps_per_sec, 3)
        result["adapt_vs_baseline"] = round(
            steps_per_sec / BASELINE_A100_ADAPT_STEPS_PER_SEC, 3)
        print(f"# adaptation: {steps_per_sec:.2f} steps/s (batch 4)",
              flush=True)
    except Exception as e:
        print(f"# adaptation bench failed: {_short_err(e)}", flush=True)
    gc.collect()
    try:
        steps_per_sec = bench_adaptation_difa()
        result["adapt_difa_steps_per_sec"] = round(steps_per_sec, 3)
        result["adapt_difa_vs_baseline"] = round(
            steps_per_sec / BASELINE_A100_DIFA_STEPS_PER_SEC, 3)
        print(f"# adaptation difa protocol: {steps_per_sec:.2f} steps/s "
              f"(batch 4)", flush=True)
    except Exception as e:
        print(f"# adaptation difa bench failed: {_short_err(e)}", flush=True)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
