"""Headline benchmark: FFHQ-1024 StyleGAN2 synthesis throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference stack (StyleGAN2-ADA PyTorch) synthesizes FFHQ-1024
at roughly 35 imgs/sec on a single A100 (extrapolated from the V100 training
tables in BASELINE.md — 1024² training at 6.1 imgs/sec/GPU with G+D+ADA+reg
≈ 5-6x the cost of synthesis-only — and NVIDIA's published ~2x A100/V100
speedup).  vs_baseline is measured imgs/sec/chip divided by that A100 number;
the BASELINE.json target is vs_baseline >= 5.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_A100_IMGS_PER_SEC = 35.0


_RETRY_ENV = "GAGAN_BENCH_INIT_RETRY"


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
    import sys

    import jax

    preset = os.environ.get("JAX_PLATFORMS", "")
    if preset in ("axon", "tpu"):
        # Let jax pick whichever name the plugin actually registered.
        os.environ.pop("JAX_PLATFORMS", None)
        jax.config.update("jax_platforms", None)
    try:
        jax.devices()
        return
    except RuntimeError as e:
        tries = int(os.environ.get(_RETRY_ENV, "0"))
        if tries >= max_retries:
            raise
        print(f"# backend init failed ({e}); re-exec {tries + 1}/"
              f"{max_retries} in {cooldown_s}s", flush=True)
        time.sleep(cooldown_s)
        os.environ[_RETRY_ENV] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    ensure_backend()

    from gagan_tpu.models import stylegan2 as sg2

    cfg = sg2.GeneratorConfig(
        img_resolution=1024,
        synthesis=sg2.SynthesisConfig(num_fp16_res=4, conv_clamp=256,
                                      packed_last_block=True),
    )
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
    # biggest programs; bound each attempt with SIGALRM and fall back.
    import signal

    def _alarm(signum, frame):
        raise TimeoutError("compile watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    run_blocked = None
    for batch in (96, 64, 32):
        try:
            # The remote compile service's latency varies by an order of
            # magnitude between sessions (observed 180s..1200s for the
            # same program); keep the watchdog generous.
            signal.alarm(900)
            run_blocked = make_runner(batch)
            run_blocked()   # warmup / compile
            run_blocked()
            break
        except Exception:
            run_blocked = None
        finally:
            signal.alarm(0)
    assert run_blocked is not None, "no batch size compiled"

    n_iters = 10
    times = []
    for _ in range(n_iters):
        start = time.perf_counter()
        run_blocked()
        times.append(time.perf_counter() - start)
    times = sorted(times)[1:-1]  # trim best/worst
    imgs_per_sec = batch / (sum(times) / len(times))
    print(json.dumps({
        "metric": "ffhq1024_synthesis_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_A100_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
