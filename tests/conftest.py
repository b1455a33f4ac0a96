import os

# Configure JAX for CPU testing with a virtual 8-device mesh BEFORE jax imports.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Parity tests compare against float32 torch-CPU oracles.
jax.config.update("jax_default_matmul_precision", "highest")

# Cache compiled executables across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
