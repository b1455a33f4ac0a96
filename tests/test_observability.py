"""Observability utils tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gagan_tpu.utils import observability as obs


def test_assert_shape():
    x = jnp.zeros((2, 3, 4))
    obs.assert_shape(x, [2, None, 4])
    with pytest.raises(AssertionError):
        obs.assert_shape(x, [2, 3])
    with pytest.raises(AssertionError):
        obs.assert_shape(x, [2, 3, 5])


def test_phase_timer():
    t = obs.PhaseTimer()
    x = jnp.ones((100, 100))
    with t.phase("matmul", sync_on=x):
        y = x @ x
    m = t.as_metrics()
    assert "Timing/matmul" in m and m["Timing/matmul"] >= 0


def test_fingerprint_detects_change():
    p = {"a": jnp.ones((4,)), "b": {"c": jnp.zeros((2, 2))}}
    f1 = obs.params_fingerprint(p)
    p2 = {"a": jnp.ones((4,)).at[0].set(2.0), "b": {"c": jnp.zeros((2, 2))}}
    f2 = obs.params_fingerprint(p2)
    assert not np.allclose(f1, f2)


def test_summary_and_nan_guard():
    p = {"mapping": {"w": jnp.ones((4, 4))}, "synthesis": {"w": jnp.ones(3)}}
    s = obs.summarize_params(p, "G")
    assert "Total" in s and "19" in s
    assert not obs.nan_guard(p)
    assert obs.nan_guard({"x": jnp.asarray([jnp.nan])})


def test_stats_logger_histograms(tmp_path):
    import jax.numpy as jnp

    from gagan_tpu.utils.stats import Collector, StatsLogger

    logger = StatsLogger(str(tmp_path), use_tensorboard=True)
    tree = {"conv": {"weight": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    logger.log_histograms({"G": tree}, step=1)
    c = Collector()
    c.report("Loss/G/loss", 1.0)
    logger.write(c, step=1)
    logger.close()
    import os

    files = os.listdir(tmp_path)
    assert "stats.jsonl" in files
    if any(f.startswith("events.out") for f in files):  # TB available
        assert sum(os.path.getsize(tmp_path / f) for f in files
                   if f.startswith("events.out")) > 0


def test_stats_logger_wandb_backend(tmp_path, monkeypatch):
    """The optional wandb backend (reference WandbLogger, loggers.py:80-116)
    drives init/log/Image through a stub module — wandb is not installed in
    this image, so the call contract is what we can pin down."""
    import sys
    import types

    import numpy as np

    calls = {"init": [], "log": []}
    stub = types.ModuleType("wandb")

    class _Image:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

    stub.init = lambda **kw: calls["init"].append(kw)
    stub.log = lambda payload, step=None: calls["log"].append((payload, step))
    stub.Image = _Image
    monkeypatch.setitem(sys.modules, "wandb", stub)

    from gagan_tpu.utils.stats import Collector, StatsLogger

    logger = StatsLogger(str(tmp_path / "run"), use_tensorboard=False,
                         use_wandb=True, config={"lr": 0.1})
    assert calls["init"] and calls["init"][0]["config"] == {"lr": 0.1}

    col = Collector()
    col.report("Loss/G/loss", 1.5)
    logger.write(col, step=3)
    payload, step = calls["log"][-1]
    assert step == 3 and abs(payload["Loss/G/loss"] - 1.5) < 1e-6

    logger.log_images(np.zeros((2, 8, 8, 3), np.uint8), step=4, name="fakes")
    payload, step = calls["log"][-1]
    assert step == 4 and len(payload["fakes"]) == 2
    assert isinstance(payload["fakes"][0], _Image)

    # Unavailable wandb degrades to jsonl-only (no raise).
    monkeypatch.delitem(sys.modules, "wandb")
    import builtins
    real_import = builtins.__import__

    def deny_wandb(name, *a, **kw):
        if name == "wandb":
            raise ImportError("not installed")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", deny_wandb)
    logger2 = StatsLogger(str(tmp_path / "run2"), use_tensorboard=False,
                          use_wandb=True)
    col2 = Collector()
    col2.report("x", 1.0)
    logger2.write(col2, step=0)   # must not raise
