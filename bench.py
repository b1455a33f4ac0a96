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


def wait_for_backend(attempts: int = 6, cooldown_s: int = 120) -> None:
    """Block until the TPU backend initializes.

    The axon tunnel intermittently refuses new clients ("No jellyfish
    device found"), typically for a minute or two; jax caches a failed
    backend init for the process lifetime, so probe in a subprocess and
    only touch the device here once a probe succeeds.
    """
    import os
    import subprocess
    import sys

    probe = ("import jax; jax.devices(); "
             "import jax.numpy as jnp; print(float(jnp.ones(()).sum()))")
    # The tunnel plugin has been observed to register under 'tpu' while the
    # environment presets JAX_PLATFORMS=axon (and vice versa) — probe the
    # candidates and adopt whichever initializes.
    preset = os.environ.get("JAX_PLATFORMS")
    candidates = [preset] if preset else [None]
    for alt in (None, "tpu", "axon"):
        if alt not in candidates:
            candidates.append(alt)
    for i in range(attempts):
        for plat in candidates:
            env = dict(os.environ)
            env.pop("JAX_PLATFORMS", None)
            if plat is not None:
                env["JAX_PLATFORMS"] = plat
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=300, env=env)
            if r.returncode == 0:
                if plat is None:
                    os.environ.pop("JAX_PLATFORMS", None)
                else:
                    os.environ["JAX_PLATFORMS"] = plat
                import jax

                jax.config.update("jax_platforms", plat or None)
                return
        print(f"# backend probe {i + 1}/{attempts} failed; "
              f"retrying in {cooldown_s}s", flush=True)
        time.sleep(cooldown_s)
    # Fall through: let the real run surface the error.


def main():
    wait_for_backend()

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
            signal.alarm(240)
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
