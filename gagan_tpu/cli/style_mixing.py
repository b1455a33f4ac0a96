"""Style-mixing grids, mirroring `DissimilarDomains/style_mixing.py:37-113`,
plus StyleSpace direction mixing (BASELINE config 2): linear combinations of
saved adaptation directions applied during synthesis."""

from __future__ import annotations

import os
from typing import List

import click
import numpy as np
import PIL.Image

from gagan_tpu.cli import num_range
from gagan_tpu.cli.generate import load_generator


@click.command()
@click.option("--network", required=True, help="Snapshot .npz")
@click.option("--rows", "row_seeds", type=num_range, required=True)
@click.option("--cols", "col_seeds", type=num_range, required=True)
@click.option("--styles", "col_styles", type=num_range, default="0-6",
              show_default=True)
@click.option("--trunc", "truncation_psi", type=float, default=1.0,
              show_default=True)
@click.option("--noise-mode", type=click.Choice(["const", "random", "none"]),
              default="const", show_default=True)
@click.option("--s-direction", "s_directions", multiple=True,
              help="StyleSpace direction npz (repeatable); mixed linearly")
@click.option("--s-scale", "s_scales", multiple=True, type=float,
              help="Scale per direction (default 1.0 each)")
@click.option("--outdir", required=True)
def main(network, row_seeds: List[int], col_seeds: List[int],
         col_styles: List[int], truncation_psi, noise_mode, s_directions,
         s_scales, outdir):
    """Generate style-mixing grids from a gagan_tpu snapshot."""
    import jax
    import jax.numpy as jnp

    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.params import offsets as offs
    from gagan_tpu.utils import checkpoint as ckpt

    g_cfg, params = load_generator(network)
    os.makedirs(outdir, exist_ok=True)

    hooks = None
    if s_directions:
        scales = list(s_scales) + [1.0] * (len(s_directions) - len(s_scales))
        combined = None
        spec = None
        for path, scale in zip(s_directions, scales):
            meta, offsets, _ = ckpt.load_adaptation(path)
            cur = offs.OffsetsSpec.from_string(meta["parametrization"])
            if spec is None:
                spec = cur
            else:
                assert cur == spec, "directions must share a parametrization"
            scaled = jax.tree.map(lambda x: x * scale, offsets)
            combined = scaled if combined is None else jax.tree.map(
                lambda a, b: a + b, combined, scaled)
        hooks = offs.make_hooks(spec, combined)

    print("Generating W vectors...")
    all_seeds = list(dict.fromkeys(row_seeds + col_seeds))
    all_z = np.stack([np.random.RandomState(seed).randn(g_cfg.z_dim)
                      for seed in all_seeds])
    all_w = sg2.mapping_apply(g_cfg.mapping, params["mapping"],
                              jnp.asarray(all_z))
    w_avg = params["mapping"]["w_avg"]
    all_w = w_avg + (all_w - w_avg) * truncation_psi
    w_dict = {seed: np.asarray(w) for seed, w in zip(all_seeds, all_w)}

    synth = jax.jit(lambda w: sg2.synthesis_apply(
        g_cfg.synthesis, params["synthesis"], w, noise_mode=noise_mode,
        rng=jax.random.PRNGKey(0), hooks=hooks))

    def to_uint8(img):
        img = np.asarray(img).transpose(0, 2, 3, 1)
        return np.clip(img * 127.5 + 128, 0, 255).astype(np.uint8)

    print("Generating images...")
    image_dict = {}
    all_images = to_uint8(synth(jnp.asarray(np.stack(
        [w_dict[s] for s in all_seeds]))))
    for seed, image in zip(all_seeds, all_images):
        image_dict[(seed, seed)] = image

    print("Generating style-mixed images...")
    for row_seed in row_seeds:
        for col_seed in col_seeds:
            w = w_dict[row_seed].copy()
            w[col_styles] = w_dict[col_seed][col_styles]
            image_dict[(row_seed, col_seed)] = to_uint8(
                synth(jnp.asarray(w)[None]))[0]

    print("Saving images...")
    for (row_seed, col_seed), image in image_dict.items():
        PIL.Image.fromarray(image, "RGB").save(
            f"{outdir}/{row_seed}-{col_seed}.png")

    print("Saving image grid...")
    res = g_cfg.img_resolution
    canvas = PIL.Image.new(
        "RGB", (res * (len(col_seeds) + 1), res * (len(row_seeds) + 1)),
        "black")
    for row_idx, row_seed in enumerate([0] + row_seeds):
        for col_idx, col_seed in enumerate([0] + col_seeds):
            if row_idx == 0 and col_idx == 0:
                continue
            key = (row_seed, col_seed)
            if row_idx == 0:
                key = (col_seed, col_seed)
            if col_idx == 0:
                key = (row_seed, row_seed)
            canvas.paste(PIL.Image.fromarray(image_dict[key], "RGB"),
                         (res * col_idx, res * row_idx))
    canvas.save(f"{outdir}/grid.png")


if __name__ == "__main__":
    main()
