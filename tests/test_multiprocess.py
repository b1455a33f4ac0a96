"""Multi-process (multi-host-style) execution path.

The reference deploys one process per GPU with NCCL DDP
(`DissimilarDomains/train.py:472-500`); our demonstrated equivalent is
`tools/dryrun_multiprocess.py` — 2 coordinated `jax.distributed` processes
x 4 virtual CPU devices running the full fused adversarial step over a
(dcn=2, data=4) mesh with per-rank data feeding, cross-process stats
reduction, rank-sharded metric stats, rank-0 snapshot gating, and bitwise
cross-rank parameter agreement.

Also guards the process-stable-tracing invariant that makes cross-rank
bitwise agreement possible at all: the traced program must not bake in any
per-process salted values (Python `hash()` was doing exactly that for the
per-layer noise fold-ins until round 4 — each rank drew different noise and
silently diverged).
"""

import hashlib
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LOWER_SNIPPET = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import hashlib
from gagan_tpu.models import stylegan2 as sg2

cfg = sg2.GeneratorConfig(
    z_dim=16, w_dim=16, img_resolution=16, img_channels=3,
    mapping=sg2.MappingConfig(num_layers=1),
    synthesis=sg2.SynthesisConfig(channel_base=512, channel_max=32))
params = sg2.init_generator(jax.random.PRNGKey(0), cfg)
z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))


def fwd(p, zz, key):
    return sg2.generator_apply(cfg, p, zz, noise_mode="random", rng=key)


text = jax.jit(fwd).lower(params, z, jax.random.PRNGKey(2)).as_text()
print(hashlib.sha256(text.encode()).hexdigest())
"""


def _lower_hash(hashseed: str) -> str:
    env = dict(os.environ)
    env["PYTHONHASHSEED"] = hashseed
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", _LOWER_SNIPPET], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    return out.stdout.strip().splitlines()[-1]


def test_traced_program_is_process_stable():
    """The lowered module (including every RNG fold-in constant) must be
    byte-identical across interpreters with different hash salts; otherwise
    multi-process SPMD ranks trace different programs (models/stylegan2.py
    `_name_fold`)."""
    assert _lower_hash("0") == _lower_hash("12345")


@pytest.mark.slow
def test_multiprocess_dryrun():
    """End-to-end: 2 jax.distributed processes, full fused step, bitwise
    cross-rank agreement, rank-0 snapshot (tools/dryrun_multiprocess.py)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dryrun_multiprocess.py")],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multiprocess dryrun ok" in out.stdout


@pytest.mark.slow
def test_multiprocess_resume_cycle():
    """Distributed failure recovery (§5.3/§5.4): rank 0 snapshots the FULL
    train state mid-run, both ranks restart from it, and the continuation is
    bitwise-identical to an uninterrupted run on every rank."""
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "dryrun_multiprocess.py"),
         "--resume-cycle"],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multiprocess resume dryrun ok" in out.stdout
