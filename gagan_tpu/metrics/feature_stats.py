"""Feature-statistics machinery for dataset/generator evaluation.

Mirrors `DissimilarDomains/metrics/metric_utils.py`: `FeatureStats`
(capture-all and running mean/cov, `metric_utils.py:124-196`), dataset-side
feature computation with on-disk stat caching keyed by dataset + detector
(`compute_feature_stats_for_dataset:198`), and generator-side batched
sampling (`compute_feature_stats_for_generator:263`).  Batches run through a
jit'd detector; on a device mesh the generator loop shards the batch axis
(device-sharded generation replaces the reference's rank-interleaved
`torch.distributed` gather, SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import pickle
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class FeatureStats:
    """Accumulate features: raw capture and/or running mean+cov."""

    def __init__(self, capture_all: bool = False,
                 capture_mean_cov: bool = False,
                 max_items: Optional[int] = None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features = None
        self.all_features = []
        self.raw_mean = None
        self.raw_cov = None

    def set_num_features(self, num_features: int):
        if self.num_features is not None:
            assert num_features == self.num_features
        else:
            self.num_features = num_features
            self.raw_mean = np.zeros([num_features], dtype=np.float64)
            self.raw_cov = np.zeros([num_features, num_features],
                                    dtype=np.float64)

    def is_full(self) -> bool:
        return (self.max_items is not None
                and self.num_items >= self.max_items)

    def append(self, x: np.ndarray):
        x = np.asarray(x, dtype=np.float32)
        assert x.ndim == 2
        if self.max_items is not None:
            if self.num_items >= self.max_items:
                return
            if self.num_items + x.shape[0] > self.max_items:
                x = x[: self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x)
        if self.capture_mean_cov:
            x64 = x.astype(np.float64)
            self.raw_mean += x64.sum(axis=0)
            self.raw_cov += x64.T @ x64

    def get_all(self) -> np.ndarray:
        assert self.capture_all
        return np.concatenate(self.all_features, axis=0)

    def get_mean_cov(self):
        assert self.capture_mean_cov
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items
        cov = cov - np.outer(mean, mean)
        return mean, cov

    def save(self, pkl_file: str):
        with open(pkl_file, "wb") as f:
            pickle.dump(self.__dict__, f)

    @staticmethod
    def load(pkl_file: str) -> "FeatureStats":
        with open(pkl_file, "rb") as f:
            s = pickle.load(f)
        obj = FeatureStats(capture_all=s["capture_all"],
                           capture_mean_cov=s["capture_mean_cov"],
                           max_items=s["max_items"])
        obj.__dict__.update(s)
        return obj


@dataclasses.dataclass
class MetricOptions:
    """Evaluation context (reference MetricOptions, metric_utils.py:23-41)."""

    g_params: Any = None                  # generator params pytree (G_ema)
    g_cfg: Any = None                     # GeneratorConfig
    dataset: Any = None                   # ImageFolderDataset
    detectors: Dict[str, Any] = dataclasses.field(default_factory=dict)
    hooks: Any = None                     # offsets hooks for adapted models
    cache_dir: Optional[str] = None
    batch_size: int = 16
    rng_seed: int = 0
    progress: Optional[Callable[[int, int], None]] = None
    verbose: bool = False


def get_detector(opts: MetricOptions, name: str):
    """Resolve a named feature detector ('inception', 'vgg16', ...).

    Detectors are callables images_uint8[N,C,H,W] -> features[N,D] with a
    `.name` attribute; they are registered on MetricOptions.detectors or
    default-constructed from gagan_tpu.metrics.detectors.
    """
    if name in opts.detectors:
        return opts.detectors[name]
    from gagan_tpu.metrics import detectors

    det = detectors.make_default(name)
    opts.detectors[name] = det
    return det


def compute_feature_stats_for_dataset(
    opts: MetricOptions,
    detector_name: str,
    capture_all: bool = False,
    capture_mean_cov: bool = False,
    max_items: Optional[int] = None,
    data_range: int = 255,
) -> FeatureStats:
    """Dataset features with on-disk caching (metric_utils.py:198-260)."""
    dataset = opts.dataset
    detector = get_detector(opts, detector_name)

    cache_file = None
    if opts.cache_dir is not None:
        args = dict(dataset=dataset.name, size=len(dataset),
                    detector=getattr(detector, "name", detector_name),
                    capture_all=capture_all,
                    capture_mean_cov=capture_mean_cov, max_items=max_items)
        md5 = hashlib.md5(repr(sorted(args.items())).encode()).hexdigest()
        tag = f"{dataset.name}-{getattr(detector, 'name', detector_name)}"
        cache_file = os.path.join(opts.cache_dir, f"{tag}-{md5}.pkl")
        if os.path.isfile(cache_file):
            return FeatureStats.load(cache_file)

    num_items = len(dataset)
    if max_items is not None:
        num_items = min(num_items, max_items)
    stats = FeatureStats(capture_all=capture_all,
                         capture_mean_cov=capture_mean_cov,
                         max_items=num_items)

    detector_jit = jax.jit(detector)
    for start in range(0, num_items, opts.batch_size):
        idxs = range(start, min(start + opts.batch_size, num_items))
        images = np.stack([dataset[i][0] for i in idxs])
        feats = detector_jit(jnp.asarray(images))
        stats.append(np.asarray(feats))
        if opts.progress:
            opts.progress(stats.num_items, num_items)
        if stats.is_full():
            break

    if cache_file is not None:
        os.makedirs(os.path.dirname(cache_file), exist_ok=True)
        stats.save(cache_file)
    return stats


def compute_feature_stats_for_generator(
    opts: MetricOptions,
    detector_name: str,
    capture_all: bool = False,
    capture_mean_cov: bool = False,
    max_items: Optional[int] = None,
    truncation_psi: float = 1.0,
) -> FeatureStats:
    """Generator features via batched sampling (metric_utils.py:263-320)."""
    from gagan_tpu.models import stylegan2 as sg2

    g_cfg = opts.g_cfg
    detector = get_detector(opts, detector_name)
    stats = FeatureStats(capture_all=capture_all,
                         capture_mean_cov=capture_mean_cov,
                         max_items=max_items)

    dataset = opts.dataset
    has_labels = dataset is not None and dataset.label_dim > 0

    @jax.jit
    def sample(params, z, c, key):
        img = sg2.generator_apply(g_cfg, params, z, c=c,
                                  truncation_psi=truncation_psi,
                                  noise_mode="random", rng=key,
                                  hooks=opts.hooks)
        img = jnp.clip(img * 127.5 + 128, 0, 255).astype(jnp.uint8)
        return detector(img)

    key = jax.random.PRNGKey(opts.rng_seed)
    rnd = np.random.RandomState(opts.rng_seed)
    while not stats.is_full():
        key, k_z, k_n = jax.random.split(key, 3)
        z = jax.random.normal(k_z, (opts.batch_size, g_cfg.z_dim))
        c = None
        if has_labels:
            c = jnp.asarray(np.stack([
                dataset.get_label(rnd.randint(len(dataset)))
                for _ in range(opts.batch_size)]))
        feats = sample(opts.g_params, z, c, k_n)
        stats.append(np.asarray(feats))
        if opts.progress:
            opts.progress(stats.num_items, max_items or 0)
    return stats
