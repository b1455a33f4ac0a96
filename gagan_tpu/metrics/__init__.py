"""Evaluation metrics: FID / KID / Precision-Recall / PPL / IS and the
feature-statistics machinery, plus CLIP-based quality/diversity evaluators."""

from .metric_main import calc_metric, is_valid_metric, list_valid_metrics

__all__ = ["calc_metric", "is_valid_metric", "list_valid_metrics"]
