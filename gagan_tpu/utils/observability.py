"""Tracing, profiling, and consistency checks.

TPU-native equivalents of the reference's auxiliary machinery (SURVEY.md §5):
  * `record_function` phase spans (`training_loop.py:438`, `loss.py:78-151`)
    -> `jax.profiler.TraceAnnotation` / `jax.named_scope` wrappers;
  * CUDA-event phase timing (`training_loop.py:316-321`) -> wall-clock timer
    with forced host sync;
  * `misc.check_ddp_consistency` (`torch_utils/misc.py:191-203`) ->
    cross-host parameter fingerprint comparison;
  * `misc.print_module_summary` (`torch_utils/misc.py:206`) -> pytree
    parameter/buffer summary table;
  * `misc.assert_shape` (`torch_utils/misc.py:84`) -> shape assertion.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def assert_shape(x, ref_shape) -> None:
    """(misc.py:84-101): None entries are wildcards."""
    if x.ndim != len(ref_shape):
        raise AssertionError(
            f"Wrong number of dimensions: got {x.ndim}, "
            f"expected {len(ref_shape)}")
    for i, (size, ref) in enumerate(zip(x.shape, ref_shape)):
        if ref is not None and size != ref:
            raise AssertionError(
                f"Wrong size for dimension {i}: got {size}, expected {ref}")


@contextlib.contextmanager
def trace_scope(name: str):
    """Named profiler span (replaces record_function)."""
    with jax.profiler.TraceAnnotation(name):
        with jax.named_scope(name):
            yield


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device profile viewable in TensorBoard's profile plugin
    (`tensorboard --logdir <log_dir>`); trace_scope spans appear as named
    regions.  The whole-program analogue of the reference's autograd
    profiler sessions."""
    with jax.profiler.trace(log_dir):
        yield


class PhaseTimer:
    """Per-phase wall timing with device sync (replaces CUDA events)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on: Any = None):
        start = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        elapsed = time.perf_counter() - start
        self.totals[name] = self.totals.get(name, 0.0) + elapsed
        self.counts[name] = self.counts.get(name, 0) + 1

    def as_metrics(self) -> Dict[str, float]:
        return {f"Timing/{k}": v / max(self.counts[k], 1)
                for k, v in self.totals.items()}


def params_fingerprint(params) -> np.ndarray:
    """Cheap order-stable fingerprint of a pytree (sum + sumsq per leaf)."""
    leaves = jax.tree.leaves(params)
    vals = []
    for leaf in leaves:
        arr = np.asarray(jax.device_get(leaf), dtype=np.float64)
        vals.extend([arr.sum(), np.square(arr).sum()])
    return np.asarray(vals)


def check_cross_host_consistency(params, label: str = "params") -> None:
    """All hosts must hold identical replicated parameters
    (check_ddp_consistency equivalent, misc.py:191-203).  No-op single-host."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    fp = params_fingerprint(params)
    all_fp = multihost_utils.process_allgather(jnp.asarray(fp))
    if not np.allclose(np.asarray(all_fp), fp, rtol=0, atol=0):
        raise RuntimeError(f"{label}: cross-host parameter mismatch")


def summarize_params(params, name: str = "module") -> str:
    """Parameter-count table (print_module_summary spirit, misc.py:206)."""
    from gagan_tpu.utils.checkpoint import tree_to_flat

    flat = tree_to_flat(jax.tree.map(lambda x: np.asarray(x), params))
    lines = [f"{name:<40s} {'shape':<20s} {'params':>12s}"]
    total = 0
    groups: Dict[str, int] = {}
    for key, arr in flat.items():
        total += arr.size
        top = key.split(".")[0]
        groups[top] = groups.get(top, 0) + arr.size
    for top, n in sorted(groups.items()):
        lines.append(f"{top:<40s} {'':<20s} {n:>12,d}")
    lines.append(f"{'Total':<40s} {'':<20s} {total:>12,d}")
    return "\n".join(lines)


def nan_guard(tree, label: str = "") -> bool:
    """True if any leaf contains non-finite values (debug helper)."""
    for leaf in jax.tree.leaves(tree):
        if not bool(jnp.all(jnp.isfinite(leaf))):
            return True
    return False
