"""Metric registry and driver (`DissimilarDomains/metrics/metric_main.py`).

All 16 reference registrations are reproduced (metric_main.py:89-224),
including the parametric fid<N>k family, plus jsonl result reporting
(report_metric, metric_main.py:72-85).
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Any, Dict

from gagan_tpu.metrics import feature_stats as fs

_metric_dict: Dict[str, Any] = {}


def register_metric(fn):
    assert callable(fn)
    _metric_dict[fn.__name__] = fn
    return fn


# Parametric families: fid<N>k / kid<N>k for any N (reference
# metric_main.py:214-224 registers fid<N>k dynamically; kid5k at :146).
_PARAMETRIC = re.compile(r"^(fid|kid)([0-9]+)k$")


def is_valid_metric(metric: str) -> bool:
    return metric in _metric_dict or _PARAMETRIC.match(metric) is not None


def list_valid_metrics():
    return list(_metric_dict.keys())


def calc_metric(metric: str, **kwargs) -> Dict[str, Any]:
    assert is_valid_metric(metric), f"unknown metric {metric}"
    opts = fs.MetricOptions(**kwargs)
    start_time = time.time()
    m = _PARAMETRIC.match(metric)
    if m and metric not in _metric_dict:
        kind, n = m.group(1), int(m.group(2)) * 1000
        if kind == "fid":
            results = {metric: _fid_parametric(opts, n)["fid"]}
        else:
            results = {metric: _kid_parametric(opts, n)["kid"]}
    else:
        results = _metric_dict[metric](opts)
    total_time = time.time() - start_time
    return dict(
        results=results,
        metric=metric,
        total_time=total_time,
        total_time_str=f"{total_time:.1f}s",
        num_gpus=1,
    )


def report_metric(result_dict, run_dir=None, snapshot_pkl=None):
    """Append to metric-<name>.jsonl (metric_main.py:72-85)."""
    metric = result_dict["metric"]
    if snapshot_pkl is not None and run_dir is not None:
        snapshot_pkl = os.path.relpath(snapshot_pkl, run_dir)
    jsonl_line = json.dumps(dict(
        result_dict, snapshot_pkl=snapshot_pkl, timestamp=time.time()))
    print(jsonl_line)
    if run_dir is not None and os.path.isdir(run_dir):
        with open(os.path.join(run_dir, f"metric-{metric}.jsonl"), "at") as f:
            f.write(jsonl_line + "\n")
    return result_dict


# ----------------------------------------------------------------------------
# Registrations (metric_main.py:89-224).


def _fid_parametric(opts, num):
    from gagan_tpu.metrics import fid as fid_lib

    return {"fid": fid_lib.compute_fid(opts, max_real=None, num_gen=num)}


def _kid_parametric(opts, num):
    from gagan_tpu.metrics import kid as kid_lib

    return {"kid": kid_lib.compute_kid(opts, max_real=num, num_gen=num)}


@register_metric
def fid50k_full(opts):
    from gagan_tpu.metrics import fid as fid_lib

    return {"fid50k_full": fid_lib.compute_fid(opts, max_real=None,
                                               num_gen=50000)}


@register_metric
def fid50k(opts):
    from gagan_tpu.metrics import fid as fid_lib

    return {"fid50k": fid_lib.compute_fid(opts, max_real=50000,
                                          num_gen=50000)}


@register_metric
def fid10k(opts):
    from gagan_tpu.metrics import fid as fid_lib

    return {"fid10k": fid_lib.compute_fid(opts, max_real=10000,
                                          num_gen=10000)}


@register_metric
def fid5k(opts):
    from gagan_tpu.metrics import fid as fid_lib

    return {"fid5k": fid_lib.compute_fid(opts, max_real=5000, num_gen=5000)}


@register_metric
def kid5k(opts):
    """(reference metric_main.py:146-152)"""
    from gagan_tpu.metrics import kid as kid_lib

    return {"kid5k": kid_lib.compute_kid(opts, max_real=5000, num_gen=5000)}


@register_metric
def kid50k_full(opts):
    from gagan_tpu.metrics import kid as kid_lib

    return {"kid50k_full": kid_lib.compute_kid(
        opts, max_real=1000000, num_gen=50000)}


@register_metric
def kid50k(opts):
    from gagan_tpu.metrics import kid as kid_lib

    return {"kid50k": kid_lib.compute_kid(opts, max_real=50000,
                                          num_gen=50000)}


@register_metric
def pr50k3_full(opts):
    from gagan_tpu.metrics import precision_recall as pr_lib

    precision, recall = pr_lib.compute_pr(opts, max_real=200000,
                                          num_gen=50000)
    return {"pr50k3_full_precision": precision,
            "pr50k3_full_recall": recall}


@register_metric
def pr50k3(opts):
    from gagan_tpu.metrics import precision_recall as pr_lib

    precision, recall = pr_lib.compute_pr(opts, max_real=50000,
                                          num_gen=50000)
    return {"pr50k3_precision": precision, "pr50k3_recall": recall}


@register_metric
def ppl2_wend(opts):
    from gagan_tpu.metrics import ppl as ppl_lib

    return {"ppl2_wend": ppl_lib.compute_ppl(
        opts, num_samples=50000, epsilon=1e-4, space="w", sampling="end",
        crop=False)}


@register_metric
def ppl_zfull(opts):
    from gagan_tpu.metrics import ppl as ppl_lib

    return {"ppl_zfull": ppl_lib.compute_ppl(
        opts, num_samples=50000, epsilon=1e-4, space="z", sampling="full",
        crop=True)}


@register_metric
def ppl_wfull(opts):
    from gagan_tpu.metrics import ppl as ppl_lib

    return {"ppl_wfull": ppl_lib.compute_ppl(
        opts, num_samples=50000, epsilon=1e-4, space="w", sampling="full",
        crop=True)}


@register_metric
def ppl_zend(opts):
    from gagan_tpu.metrics import ppl as ppl_lib

    return {"ppl_zend": ppl_lib.compute_ppl(
        opts, num_samples=50000, epsilon=1e-4, space="z", sampling="end",
        crop=True)}


@register_metric
def ppl_wend(opts):
    from gagan_tpu.metrics import ppl as ppl_lib

    return {"ppl_wend": ppl_lib.compute_ppl(
        opts, num_samples=50000, epsilon=1e-4, space="w", sampling="end",
        crop=True)}


@register_metric
def is50k(opts):
    from gagan_tpu.metrics import inception_score as is_lib

    mean, std = is_lib.compute_is(opts, num_gen=50000, num_splits=10)
    return {"is50k_mean": mean, "is50k_std": std}
