"""Training statistics: name-keyed moment accumulators + jsonl/TensorBoard.

Functional equivalent of the reference `training_stats`
(`DissimilarDomains/torch_utils/training_stats.py:56-268`): each reported
value accumulates [num, sum, sum-of-squares] per name.  Under SPMD the jit'd
step already returns globally-reduced scalars (the loss means cross the
sharded batch axis), so no explicit all-reduce is needed on one host; for
multi-host, pass process-local means through `jax.experimental.multihost_utils`
before reporting.  Metric names match the reference so dashboards are
comparable (`Loss/G/loss`, `Loss/signs/real`, `Progress/kimg`, `Timing/...`).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class Collector:
    """Accumulate [num, sum, sumsq] per metric name between ticks."""

    def __init__(self):
        self._moments: Dict[str, list] = {}

    def report(self, name: str, value) -> None:
        import numpy as np

        arr = np.asarray(value, dtype=np.float64).reshape(-1)
        m = self._moments.setdefault(name, [0, 0.0, 0.0])
        m[0] += arr.size
        m[1] += float(arr.sum())
        m[2] += float(np.square(arr).sum())

    def report_dict(self, metrics: Dict) -> None:
        for k, v in metrics.items():
            if not k.startswith("aux/"):
                self.report(k, v)

    def mean(self, name: str, default: float = 0.0) -> float:
        m = self._moments.get(name)
        if not m or m[0] == 0:
            return default
        return m[1] / m[0]

    def std(self, name: str) -> float:
        import numpy as np

        m = self._moments.get(name)
        if not m or m[0] == 0:
            return 0.0
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean * mean, 0.0)
        return float(np.sqrt(var))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"num": m[0], "mean": self.mean(name), "std": self.std(name)}
            for name, m in self._moments.items()
        }

    def reset(self) -> None:
        self._moments.clear()


class StatsLogger:
    """stats.jsonl + optional TensorBoard scalars (training_loop.py:634-652)
    + optional wandb backend (reference WandbLogger,
    SimilarDomains/core/utils/loggers.py:80-116).

    wandb activates when ``use_wandb`` is true (or the GAGAN_WANDB env var is
    set) AND the package imports; it is not part of this image, so the
    backend degrades to a no-op with a one-line notice rather than failing.
    """

    def __init__(self, run_dir: str, use_tensorboard: bool = True,
                 use_wandb: Optional[bool] = None,
                 wandb_project: str = "gagan_tpu",
                 config: Optional[Dict] = None):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self._jsonl = open(os.path.join(run_dir, "stats.jsonl"), "at")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils import tensorboard

                self._tb = tensorboard.SummaryWriter(run_dir)
            except Exception:
                self._tb = None
        self._wandb = None
        if use_wandb is None:
            use_wandb = bool(os.environ.get("GAGAN_WANDB"))
        if use_wandb:
            try:
                import wandb

                wandb.init(project=wandb_project,
                           name=os.path.basename(run_dir.rstrip("/")),
                           dir=run_dir, config=config or {})
                self._wandb = wandb
            except Exception as e:
                print(f"[stats] wandb requested but unavailable ({e}); "
                      f"continuing with jsonl/TensorBoard only")

    def write(self, collector: Collector, step: int,
              extra: Optional[Dict[str, float]] = None) -> None:
        stats = collector.as_dict()
        if extra:
            for k, v in extra.items():
                stats[k] = {"num": 1, "mean": float(v), "std": 0.0}
        payload = {k: v["mean"] for k, v in stats.items()}
        payload["timestamp"] = time.time()
        self._jsonl.write(json.dumps(payload) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for name, v in stats.items():
                self._tb.add_scalar(name, v["mean"], global_step=step)
            self._tb.flush()
        if self._wandb is not None:
            self._wandb.log({k: v["mean"] for k, v in stats.items()},
                            step=step)

    def log_images(self, images, step: int, name: str = "images") -> None:
        """Image logging (WandbLogger.log_images, loggers.py:98-108);
        no-op without wandb — the training loop writes PNG grids to the run
        dir regardless."""
        if self._wandb is None:
            return
        import numpy as np

        arr = np.asarray(images)
        self._wandb.log({name: [self._wandb.Image(a) for a in arr]},
                        step=step)

    def log_histograms(self, trees: Dict[str, Any], step: int) -> None:
        """Per-parameter TensorBoard histograms, named
        '<tree>/<dotted.path>' (reference training_stats log_histograms,
        training_loop.py:47-53 + 640-649).  No-op without TensorBoard."""
        if self._tb is None:
            return
        import jax
        import numpy as np

        for tree_name, tree in trees.items():
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            for path, leaf in flat:
                name = ".".join(str(getattr(k, "key", k)) for k in path)
                try:
                    self._tb.add_histogram(f"{tree_name}/{name}",
                                           np.asarray(leaf), global_step=step)
                except Exception:
                    pass
        self._tb.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
