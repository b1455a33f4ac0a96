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
