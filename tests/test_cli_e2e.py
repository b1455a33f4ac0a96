"""End-to-end CLI tests: dataset_tool -> train (few steps, with and without
domain modulation) -> snapshot -> generate -> style_mixing."""

import json
import os

import numpy as np
import PIL.Image
import pytest
from click.testing import CliRunner

from gagan_tpu.data import dataset_tool

# Cold-compile e2e runs (tiny ADA trainings + CLIs) dominate full-suite wall
# time; keep them out of the default parity core (`pytest -m "not slow"`).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_zip(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    rng = np.random.RandomState(0)
    for i in range(16):
        img = rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        PIL.Image.fromarray(img).save(d / f"img{i:04d}.png")
    dest = str(tmp_path_factory.mktemp("data") / "tiny.zip")
    dataset_tool.convert_dataset(str(d), dest)
    return dest


@pytest.fixture(scope="module")
def trained_run(tiny_zip, tmp_path_factory):
    from gagan_tpu.cli import train as train_cli

    outdir = str(tmp_path_factory.mktemp("run"))
    runner = CliRunner()
    result = runner.invoke(train_cli.main, [
        "--outdir", outdir, "--data", tiny_zip, "--gpus", "1",
        "--cfg", "cifar", "--batch", "4", "--kimg", "1",
        "--aug", "ada", "--augpipe", "bgc", "--snap", "1", "--seed", "0",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    return outdir


def _patch_tiny_loop(monkeypatch):
    # Shrink total_kimg so the loop finishes after a few batches.
    from gagan_tpu.train import loop as loop_lib

    orig = loop_lib.training_loop

    def wrapper(loop_cfg, *args, **kwargs):
        loop_cfg.total_kimg = 0.012   # 12 imgs = 3 batches at bs 4
        loop_cfg.kimg_per_tick = 0.004
        return orig(loop_cfg, *args, **kwargs)

    monkeypatch.setattr(loop_lib, "training_loop", wrapper)
    from gagan_tpu.cli import train as train_cli
    monkeypatch.setattr(train_cli.loop_lib if hasattr(train_cli, "loop_lib")
                        else loop_lib, "training_loop", wrapper, raising=False)
    return wrapper


def test_train_with_ga_splice(tiny_zip, tmp_path, monkeypatch):
    """GA-GAN in-training refinement reachable from the CLI: a tiny run with
    --ga-threshold finishes, reports a replaced fraction, and snapshots load
    (reference training_loop.py:199 threshold kwarg; splice at :392-434)."""
    from gagan_tpu.train import loop as loop_lib
    from gagan_tpu.utils import checkpoint as ckpt

    orig = loop_lib.training_loop
    seen = {}

    def tiny(loop_cfg, train_cfg, *args, **kwargs):
        loop_cfg.total_kimg = 0.012
        loop_cfg.kimg_per_tick = 0.004
        seen["ga_threshold"] = train_cfg.ga_threshold
        return orig(loop_cfg, train_cfg, *args, **kwargs)

    monkeypatch.setattr(loop_lib, "training_loop", tiny)

    from gagan_tpu.cli import train as train_cli

    outdir = str(tmp_path / "run")
    runner = CliRunner()
    result = runner.invoke(train_cli.main, [
        "--outdir", outdir, "--data", tiny_zip, "--gpus", "1",
        "--cfg", "cifar", "--batch", "4", "--aug", "noaug", "--snap", "1",
        "--ga-threshold", "1e9",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert seen["ga_threshold"] == 1e9

    # The replaced fraction is logged (threshold=inf replaces every fake).
    with open(os.path.join(outdir, "stats.jsonl")) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    assert lines
    replaced = [l["Loss/ga/replaced"] for l in lines
                if "Loss/ga/replaced" in l]
    assert replaced and all(r == 1.0 for r in replaced)

    # Snapshot written and loadable.
    snaps = sorted(f for f in os.listdir(outdir)
                   if f.startswith("network-snapshot"))
    assert snaps
    trees, cfg = ckpt.load_snapshot(os.path.join(outdir, snaps[-1]))
    assert "G" in trees and "D" in trees


def test_train_dry_run(tiny_zip, tmp_path):
    from gagan_tpu.cli import train as train_cli

    runner = CliRunner()
    result = runner.invoke(train_cli.main, [
        "--outdir", str(tmp_path), "--data", tiny_zip,
        "--cfg", "auto", "--dry-run",
    ], catch_exceptions=False)
    assert result.exit_code == 0
    assert "Dry run" in result.output


def test_train_generate_stylemix(tiny_zip, tmp_path, monkeypatch):
    from gagan_tpu.train import loop as loop_lib

    # Shrink the run so it completes in seconds.
    orig = loop_lib.training_loop

    def tiny(loop_cfg, *args, **kwargs):
        loop_cfg.total_kimg = 0.012
        loop_cfg.kimg_per_tick = 0.004
        return orig(loop_cfg, *args, **kwargs)

    monkeypatch.setattr(loop_lib, "training_loop", tiny)

    from gagan_tpu.cli import generate as gen_cli
    from gagan_tpu.cli import style_mixing as mix_cli
    from gagan_tpu.cli import train as train_cli

    outdir = str(tmp_path / "run")
    runner = CliRunner()
    result = runner.invoke(train_cli.main, [
        "--outdir", outdir, "--data", tiny_zip, "--gpus", "1",
        "--cfg", "cifar", "--batch", "4",
        "--aug", "ada", "--augpipe", "bgc", "--snap", "1",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output

    snapshots = sorted(f for f in os.listdir(outdir)
                       if f.startswith("network-snapshot"))
    assert snapshots, os.listdir(outdir)
    snap = os.path.join(outdir, snapshots[-1])
    assert any(f.startswith("fakes") for f in os.listdir(outdir))
    assert os.path.exists(os.path.join(outdir, "stats.jsonl"))
    assert os.path.exists(os.path.join(outdir, "training_options.json"))

    gen_out = str(tmp_path / "gen")
    result = runner.invoke(gen_cli.main, [
        "--network", snap, "--seeds", "0-2", "--outdir", gen_out,
        "--trunc", "0.7",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert sorted(os.listdir(gen_out)) == [
        "seed0000.png", "seed0001.png", "seed0002.png"]
    img = np.array(PIL.Image.open(os.path.join(gen_out, "seed0000.png")))
    assert img.shape == (16, 16, 3)

    mix_out = str(tmp_path / "mix")
    result = runner.invoke(mix_cli.main, [
        "--network", snap, "--rows", "1,2", "--cols", "3,4",
        "--styles", "0-3", "--outdir", mix_out,
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert "grid.png" in os.listdir(mix_out)


def test_train_with_domain_modulation(tiny_zip, tmp_path, monkeypatch):
    from gagan_tpu.train import loop as loop_lib

    orig = loop_lib.training_loop

    def tiny(loop_cfg, *args, **kwargs):
        loop_cfg.total_kimg = 0.008
        loop_cfg.kimg_per_tick = 0.004
        return orig(loop_cfg, *args, **kwargs)

    monkeypatch.setattr(loop_lib, "training_loop", tiny)

    from gagan_tpu.cli import train as train_cli

    outdir = str(tmp_path / "run_dm")
    runner = CliRunner()
    result = runner.invoke(train_cli.main, [
        "--outdir", outdir, "--data", tiny_zip, "--gpus", "1",
        "--cfg", "cifar", "--batch", "4", "--aug", "noaug", "--snap", "1",
        "--use-domain-modulation",
        "--domain-modulation-parametrization", "additive,out_in_additive",
        "--generator-requires-grad-parts",
        "synt_affine,tRGB_affine,synt_weights_offset,tRGB_weights_offset,synt_offset,tRGB_offset",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    adapts = [f for f in os.listdir(outdir) if f.startswith("adaptation-")]
    assert adapts, os.listdir(outdir)

    # The adaptation checkpoint round-trips and applies via generate.
    from gagan_tpu.utils import checkpoint as ckpt

    meta, offsets, _ = ckpt.load_adaptation(os.path.join(outdir, adapts[-1]))
    assert meta["parametrization"] == "additive,out_in_additive"
    assert any("offset" in k for layer in offsets.values() for k in layer)

    snap = sorted(f for f in os.listdir(outdir)
                  if f.startswith("network-snapshot"))[-1]
    from gagan_tpu.cli import generate as gen_cli

    gen_out = str(tmp_path / "gen_dm")
    result = runner.invoke(gen_cli.main, [
        "--network", os.path.join(outdir, snap), "--seeds", "0",
        "--outdir", gen_out,
        "--s-direction", os.path.join(outdir, adapts[-1]),
        "--s-scale", "1.5",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert os.listdir(gen_out) == ["seed0000.png"]


def test_train_resume_from_snapshot(tiny_zip, trained_run, tmp_path):
    # Resume path (training_loop resume_from; reference
    # misc.copy_params_and_buffers semantics): params load from the
    # snapshot by name and training continues.
    import glob

    import numpy as np

    from gagan_tpu.cli import train as train_cli
    from gagan_tpu.utils import checkpoint as ckpt

    snaps = sorted(glob.glob(os.path.join(trained_run, "**",
                                          "network-snapshot-*.npz"),
                             recursive=True))
    assert snaps, "no snapshot produced by trained_run"
    src = snaps[-1]

    outdir = str(tmp_path / "resumed")
    runner = CliRunner()
    result = runner.invoke(train_cli.main, [
        "--outdir", outdir, "--data", tiny_zip, "--gpus", "1",
        "--cfg", "cifar", "--batch", "4", "--kimg", "1",
        "--aug", "noaug", "--snap", "1", "--seed", "1",
        "--resume", src,
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output

    new_snaps = sorted(glob.glob(os.path.join(outdir, "**",
                                              "network-snapshot-*.npz"),
                                 recursive=True))
    assert new_snaps
    trees_src, _ = ckpt.load_snapshot(src)
    trees_new, _ = ckpt.load_snapshot(new_snaps[-1])
    # Training moved the params, but they started from the snapshot:
    # compare a large early-layer weight — should be close but not equal.
    a = np.asarray(trees_src["G"]["synthesis"]["b4"]["conv1"]["weight"])
    b = np.asarray(trees_new["G"]["synthesis"]["b4"]["conv1"]["weight"])
    assert not np.array_equal(a, b)
    assert np.abs(a - b).mean() < 0.1 * np.abs(a).mean() + 0.05

def test_adapt_cli(tmp_path):
    # One-shot adaptation entry point (reference SimilarDomains/main.py:9-27
    # equivalent): YAML config -> td_single trainer -> a few steps -> losses
    # jsonl + adaptation checkpoint.  Runs offline: byte-fallback tokenizer,
    # random tiny CLIP, demo-mode generator.
    import yaml

    from gagan_tpu.cli import adapt as adapt_cli

    cfg = {
        "exp": {"trainer": "td_single", "name": "t", "seed": 0,
                "root": str(tmp_path / "adapt_runs")},
        "training": {
            "img_resolution": 32,
            "generator_args": {"z_dim": 32, "w_dim": 32,
                               "channel_base": 1024, "channel_max": 64,
                               "num_mapping_layers": 2},
            "batch_size": 2, "iter_num": 4,
            "source_class": "Photo", "target_class": "Sketch",
            "patch_key": "s_delta",
            "visual_encoders": ["ViT-B/32"],
            "clip_config_overrides": {
                "image_resolution": 32, "vision_layers": 2,
                "vision_width": 64, "vision_patch_size": 8,
                "transformer_width": 32, "transformer_layers": 2,
                "transformer_heads": 4, "embed_dim": 32},
        },
        "optimization_setup": {"lr": 0.002, "loss_funcs": ["direction"],
                               "loss_coefs": [1.0]},
        "logging": {"log_every": 1},
        "checkpointing": {"step_backup": 2},
    }
    cfg_path = str(tmp_path / "tiny_nada.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    runner = CliRunner()
    result = runner.invoke(adapt_cli.main, [
        "--config", cfg_path, "training.target_class=Anime Painting",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output

    outdir = str(tmp_path / "adapt_runs" / "t")
    files = os.listdir(outdir)
    assert "config.yaml" in files and "losses.jsonl" in files
    # Dotlist override reached the saved config.
    import yaml as _y

    with open(os.path.join(outdir, "config.yaml")) as f:
        saved = _y.safe_load(f)
    assert saved["training"]["target_class"] == "Anime Painting"
    ckpts = sorted(f for f in files if f.startswith("adaptation-"))
    assert ckpts, files
    with open(os.path.join(outdir, "losses.jsonl")) as f:
        lines = [json.loads(line) for line in f]
    assert len(lines) == 4 and all(np.isfinite(x["total"]) for x in lines)

    # The checkpoint round-trips through the loader.
    from gagan_tpu.utils import checkpoint as ckpt

    meta, offsets, _extra = ckpt.load_adaptation(
        os.path.join(outdir, ckpts[-1]))
    assert meta["parametrization"] == "s_delta"
    assert meta["sg2_params"]["img_resolution"] == 32


@pytest.mark.slow
def test_adapt_cli_difa_protocol(tmp_path):
    # The full im2im_difa protocol through the CLI (im2im_difa.yaml:43-50):
    # direction + difa_w + difa_local.  difa_w wires the e4e latent encoder
    # (random weights offline, like the CLIP towers); difa_local engages the
    # token hooks; style latents are supplied so no projector runs.
    import yaml

    import PIL.Image

    from gagan_tpu.cli import adapt as adapt_cli

    img_path = str(tmp_path / "style.png")
    PIL.Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    ).save(img_path)
    lat_path = str(tmp_path / "latents.npz")
    np.savez(lat_path, w=np.random.RandomState(1).randn(
        1, 8, 32).astype(np.float32))

    cfg = {
        "exp": {"trainer": "im2im_difa", "name": "difa", "seed": 0,
                "root": str(tmp_path / "adapt_runs")},
        "training": {
            "img_resolution": 32,
            "generator_args": {"z_dim": 32, "w_dim": 32,
                               "channel_base": 1024, "channel_max": 64,
                               "num_mapping_layers": 2},
            "batch_size": 2, "iter_num": 3,
            "source_class": "Photo", "target_class": img_path,
            "patch_key": "s_delta", "clip_layer": 1,
            "visual_encoders": ["ViT-B/32"],
            "clip_config_overrides": {
                "image_resolution": 32, "vision_layers": 2,
                "vision_width": 64, "vision_patch_size": 8,
                "transformer_width": 32, "transformer_layers": 2,
                "transformer_heads": 4, "embed_dim": 32},
        },
        "optimization_setup": {
            "lr": 0.002,
            "loss_funcs": ["direction", "difa_w", "difa_local"],
            "loss_coefs": [1.0, 6.0, 1.0]},
        "inversion": {"latents": lat_path},
        "logging": {"log_every": 1},
        "checkpointing": {"step_backup": 3},
    }
    cfg_path = str(tmp_path / "tiny_difa.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    runner = CliRunner()
    result = runner.invoke(adapt_cli.main, ["--config", cfg_path],
                           catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert "random e4e encoder" in result.output

    outdir = str(tmp_path / "adapt_runs" / "difa")
    with open(os.path.join(outdir, "losses.jsonl")) as f:
        lines = [json.loads(line) for line in f]
    assert len(lines) == 3
    assert all("difa_psp_loss" in x and "difa_local_ViT-B-32" in x
               for x in lines)
    assert all(np.isfinite(x["total"]) for x in lines)


def test_calc_metrics_cli(trained_run, tiny_zip, tmp_path):
    # calc_metrics CLI on a snapshot (DissimilarDomains/calc_metrics.py:120):
    # parametric fid<N>k path, random-tower warning, jsonl report.
    import glob

    from gagan_tpu.cli import calc_metrics as cm_cli

    snaps = sorted(glob.glob(os.path.join(trained_run, "**",
                                          "network-snapshot-*.npz"),
                             recursive=True))
    assert snaps
    runner = CliRunner()
    result = runner.invoke(cm_cli.main, [
        "--network", snaps[-1], "--metrics", "fid1k", "--data", tiny_zip,
        "--batch", "8", "--cache-dir", str(tmp_path / "cache"),
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert "RANDOM towers" in result.output

    run_dir = os.path.dirname(snaps[-1])
    report = os.path.join(run_dir, "metric-fid1k.jsonl")
    assert os.path.exists(report)
    with open(report) as f:
        rec = json.loads(f.readlines()[-1])
    assert np.isfinite(rec["results"]["fid1k"])


def test_projector_cli(trained_run, tmp_path):
    # Mirrors the reference projector.py run_projection driver: project a
    # target image into w-space and replay the latents through generate
    # --projected-w (DissimilarDomains/projector.py:196-331, generate.py:85).
    import glob

    from gagan_tpu.cli import generate as gen_cli
    from gagan_tpu.cli import projector as proj_cli

    snaps = sorted(glob.glob(os.path.join(trained_run, "**",
                                          "network-snapshot-*.npz"),
                             recursive=True))
    assert snaps
    target = str(tmp_path / "target.png")
    rng = np.random.RandomState(7)
    PIL.Image.fromarray(
        rng.randint(0, 255, (20, 24, 3), dtype=np.uint8)).save(target)

    outdir = str(tmp_path / "proj")
    runner = CliRunner()
    result = runner.invoke(proj_cli.main, [
        "--network", snaps[-1], "--target", target, "--outdir", outdir,
        "--space", "w", "--num-steps", "4", "--save-image",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert os.path.exists(os.path.join(outdir, "projected_w.npz"))
    assert os.path.exists(os.path.join(outdir, "target_proj.png"))
    # Center-cropped to the generator resolution.
    assert np.array(PIL.Image.open(
        os.path.join(outdir, "target_target.png"))).shape == (16, 16, 3)

    ws = np.load(os.path.join(outdir, "projected_w.npz"))["w"]
    assert ws.ndim == 3 and ws.shape[0] == 1

    gen_out = str(tmp_path / "replay")
    result = runner.invoke(gen_cli.main, [
        "--network", snaps[-1], "--outdir", gen_out,
        "--projected-w", os.path.join(outdir, "projected_w.npz"),
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert os.listdir(gen_out) == ["proj00.png"]

    # z-space with --save-all-steps: trajectory latents are z vectors —
    # saved under key 'z' and mapped through the mapping network before
    # frame synthesis (regression: frames used to skip the mapping).
    outdir_z = str(tmp_path / "proj_z")
    result = runner.invoke(proj_cli.main, [
        "--network", snaps[-1], "--target", target, "--outdir", outdir_z,
        "--space", "z", "--num-steps", "4", "--save-all-steps",
        "--save-n", "2",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    steps = np.load(os.path.join(outdir_z, "target_steps.npz"))
    assert steps.files == ["z"]
    assert steps["z"].shape[0] == 4
    frames = sorted(os.listdir(os.path.join(outdir_z, "target_steps")))
    assert frames == ["step00000.png", "step00002.png"]


def test_train_packed_paths_64(tmp_path_factory, tmp_path, monkeypatch):
    """Full CLI train at res 64 with multi-block packed G tail / D head —
    exercises the packed-grid fast paths through the real entry point
    (model-level parity lives in test_stylegan2_parity)."""
    from gagan_tpu.cli import train as train_cli

    d = tmp_path_factory.mktemp("raw64")
    rng = np.random.RandomState(1)
    for i in range(8):
        img = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        PIL.Image.fromarray(img).save(d / f"img{i:04d}.png")
    zip64 = str(tmp_path_factory.mktemp("data64") / "tiny64.zip")
    dataset_tool.convert_dataset(str(d), zip64)

    _patch_tiny_loop(monkeypatch)
    outdir = str(tmp_path)
    runner = CliRunner()
    result = runner.invoke(train_cli.main, [
        "--outdir", outdir, "--data", zip64, "--gpus", "1",
        "--cfg", "cifar", "--batch", "4", "--kimg", "1",
        "--aug", "ada", "--augpipe", "bgc", "--snap", "1", "--seed", "0",
        "--packed-tail-blocks", "2", "--packed-head-blocks", "2",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    snapshots = [f for f in os.listdir(outdir)
                 if f.startswith("network-snapshot")]
    assert snapshots, os.listdir(outdir)
