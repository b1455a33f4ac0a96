"""Smoke tests: every examples/*.py runs end-to-end in demo mode.

The reference ships notebooks as its integration layer (SURVEY.md §4 item 4);
our runnable ports must not rot silently.  Each script runs in a subprocess
(own cold jit, tiny shapes, random weights) and must exit 0 and produce its
output artifact.
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_example(script, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # This image's sitecustomize registers the axon TPU-tunnel PJRT plugin
    # whenever PALLAS_AXON_POOL_IPS is set — even under JAX_PLATFORMS=cpu —
    # and a wedged tunnel then hangs backend init.  CPU subprocesses must
    # skip registration entirely.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, (
        f"{script} failed:\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    return proc.stdout


@pytest.fixture(scope="module")
def tiny_adaptation_ckpt(tmp_path_factory):
    """A tiny (32px) s-space adaptation ckpt with embedded generator config,
    as saved by the adaptation trainers (common.py:343-368 schema)."""
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.params import offsets as offs_lib
    from gagan_tpu.utils import checkpoint as ckpt_lib
    from gagan_tpu.utils.config import to_dict

    g_cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=32,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=512, channel_max=32))
    spec = offs_lib.OffsetsSpec.from_string("additive")
    offsets = offs_lib.init_offsets(jax.random.PRNGKey(1), g_cfg.synthesis,
                                    spec)
    offsets = jax.tree.map(
        lambda x: x + 0.3 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        offsets)
    path = str(tmp_path_factory.mktemp("examples") / "adapt.npz")
    ckpt_lib.save_adaptation(path, model_type="parametrization",
                             parametrization="additive",
                             offsets=jax.device_get(offsets),
                             sg2_config=to_dict(g_cfg))
    return path


def test_quick_start(tmp_path):
    out = run_example("quick_start.py", "--outdir", str(tmp_path),
                      "--res", "32", "--seeds", "0-15")
    assert (tmp_path / "quick_start_grid.png").exists(), out


def test_editing(tmp_path):
    run_example("editing.py", "--outdir", str(tmp_path), "--res", "32",
                "--alphas=-2,2")
    assert any(p.suffix == ".png" for p in tmp_path.iterdir())


def test_adaptation_inference(tmp_path, tiny_adaptation_ckpt):
    out = run_example("adaptation_inference.py",
                      "--ckpt", tiny_adaptation_ckpt,
                      "--outdir", str(tmp_path), "--n", "2")
    assert (tmp_path / "pair_00.png").exists(), out


def test_morphing(tmp_path, tiny_adaptation_ckpt):
    run_example("morphing.py", "--ckpt", tiny_adaptation_ckpt,
                "--outdir", str(tmp_path), "--frames", "3",
                "--n-latents", "2")
    pngs = [p for p in tmp_path.iterdir() if p.suffix == ".png"]
    assert pngs


def test_pruned_forward(tmp_path, tiny_adaptation_ckpt):
    out = run_example("pruned_forward.py", "--ckpt", tiny_adaptation_ckpt,
                      "--outdir", str(tmp_path), "--percs", "1.0,0.1",
                      "--n-latents", "2")
    assert (tmp_path / "pruned_sweep.png").exists(), out
