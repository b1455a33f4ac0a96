"""Recompute metrics for a saved snapshot (`DissimilarDomains/calc_metrics.py:120`)."""

from __future__ import annotations

import os

import click


@click.command()
@click.option("--network", required=True, help="Snapshot .npz")
@click.option("--metrics", default="fid50k_full", show_default=True,
              help="Comma-separated metric names")
@click.option("--data", default=None, help="Dataset (dir or zip)")
@click.option("--mirror", is_flag=True)
@click.option("--cache-dir", default="~/.cache/gagan_tpu_metrics",
              show_default=True)
@click.option("--batch", type=int, default=16, show_default=True)
@click.option("--verbose", is_flag=True)
def main(network, metrics, data, mirror, cache_dir, batch, verbose):
    """Calculate quality metrics for a trained snapshot."""
    from gagan_tpu.cli.generate import load_generator
    from gagan_tpu.data import ImageFolderDataset
    from gagan_tpu.metrics import calc_metric, is_valid_metric, metric_main

    metric_list = metrics.split(",")
    for m in metric_list:
        if not is_valid_metric(m):
            raise click.ClickException(
                f"Unknown metric: {m}. Valid: "
                f"{metric_main.list_valid_metrics()} or fid<N>k")

    from gagan_tpu.metrics import detectors as det_lib

    probe = det_lib.make_default("inception")
    if probe.name.endswith("-random"):
        click.secho(
            "WARNING: feature detectors are deterministic RANDOM towers "
            "(GAGAN_DETECTOR_DIR unset or missing converted weights).  "
            "Metric machinery runs, but the reported values are NOT "
            "canonical FID/KID/etc. and are not comparable to published "
            "numbers.", fg="yellow", err=True)

    g_cfg, params = load_generator(network)
    dataset = ImageFolderDataset(data, xflip=mirror) if data else None

    run_dir = os.path.dirname(network) or "."
    for m in metric_list:
        result = calc_metric(
            m, g_params=params, g_cfg=g_cfg, dataset=dataset,
            cache_dir=os.path.expanduser(cache_dir), batch_size=batch,
            verbose=verbose)
        metric_main.report_metric(result, run_dir=run_dir,
                                  snapshot_pkl=network)


if __name__ == "__main__":
    main()
