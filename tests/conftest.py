import os

# Force an 8-virtual-device CPU platform for tests.  NOTE: this environment
# preloads an 'axon' TPU-tunnel JAX plugin via sitecustomize that registers
# itself at interpreter start and overrides JAX_PLATFORMS — so we must both
# set XLA_FLAGS (read at CPU-backend init) and force jax_platforms via
# jax.config AFTER import.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is XLA:CPU-compile-bound on small boxes; backend optimization
# buys nothing for single-shot tiny-shape test programs but costs ~30% of
# the cold suite (measured 49.7 -> 33.9 s on the heaviest parity test).
# Numerics stay IEEE; parity tolerances are unaffected.
if "xla_backend_optimization_level" not in _flags:
    _flags = (_flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Parity tests compare against float32 torch-CPU oracles.
jax.config.update("jax_default_matmul_precision", "highest")

# Cache compiled executables across test runs.  XLA:CPU AOT entries embed
# the BUILD host's CPU features and this VM migrates between hosts — loading
# a stale entry risks SIGILL/bad code, so key the directory by the current
# host's CPU feature set.
def _cpu_cache_dir():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    return "/tmp/jax_cache_" + hashlib.md5(flags.encode()).hexdigest()[:10]


jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("GAGAN_TEST_CACHE_DIR") or _cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) >= 8, jax.devices()
