"""Generate images from a trained snapshot.

Mirrors `DissimilarDomains/generate.py:48-123`: per-seed z drawn with
np.random.RandomState(seed) for seed-exact parity with the reference,
truncation, class labels, projected-W replay — plus StyleSpace direction
application (BASELINE config 1): `--s-direction` loads a saved offsets npz
(additive S-space direction) applied at `--s-scale`.
"""

from __future__ import annotations

import os
from typing import List, Optional

import click
import numpy as np
import PIL.Image

from gagan_tpu.cli import num_range


def load_generator(network: str):
    import jax.numpy as jnp

    from gagan_tpu.utils import checkpoint as ckpt
    from gagan_tpu.utils import config as config_lib

    trees, config = ckpt.load_snapshot(network)
    params = trees.get("G_ema", trees.get("G"))
    assert params is not None, "snapshot has no generator"
    g_cfg = config_lib.generator_config_from_dict(config["g_cfg"])
    return g_cfg, params


@click.command()
@click.option("--network", required=True, help="Snapshot .npz")
@click.option("--seeds", type=num_range, help="List of random seeds")
@click.option("--trunc", "truncation_psi", type=float, default=1.0,
              show_default=True)
@click.option("--class", "class_idx", type=int, default=None)
@click.option("--noise-mode", type=click.Choice(["const", "random", "none"]),
              default="const", show_default=True)
@click.option("--projected-w", default=None, help="Replay projected W .npz")
@click.option("--s-direction", default=None,
              help="StyleSpace direction (adaptation npz) to apply")
@click.option("--s-scale", type=float, default=1.0, show_default=True)
@click.option("--outdir", required=True)
def main(network, seeds, truncation_psi, class_idx, noise_mode, projected_w,
         s_direction, s_scale, outdir):
    """Generate images from a trained gagan_tpu snapshot."""
    import jax
    import jax.numpy as jnp

    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.params import offsets as offs
    from gagan_tpu.utils import checkpoint as ckpt

    g_cfg, params = load_generator(network)
    os.makedirs(outdir, exist_ok=True)

    hooks = None
    if s_direction is not None:
        meta, offsets, _ = ckpt.load_adaptation(s_direction)
        spec = offs.OffsetsSpec.from_string(meta["parametrization"])
        if s_scale != 1.0:
            offsets = jax.tree.map(lambda x: x * s_scale, offsets)
        hooks = offs.make_hooks(spec, offsets)

    def to_uint8(img):
        img = np.asarray(img).transpose(0, 2, 3, 1)
        return np.clip(img * 127.5 + 128, 0, 255).astype(np.uint8)

    if projected_w is not None:
        ws = np.load(projected_w)["w"]
        assert ws.shape[1:] == (g_cfg.num_ws, g_cfg.w_dim)
        synth = jax.jit(lambda w: sg2.synthesis_apply(
            g_cfg.synthesis, params["synthesis"], w, noise_mode=noise_mode,
            rng=jax.random.PRNGKey(0), hooks=hooks))
        for idx, w in enumerate(ws):
            img = to_uint8(synth(jnp.asarray(w)[None]))
            PIL.Image.fromarray(img[0], "RGB").save(
                f"{outdir}/proj{idx:02d}.png")
        return

    if seeds is None:
        raise click.ClickException("--seeds required without --projected-w")

    label = None
    if g_cfg.c_dim != 0:
        if class_idx is None:
            raise click.ClickException("--class required for conditional nets")
        label = jnp.zeros((1, g_cfg.c_dim)).at[0, class_idx].set(1)

    forward = jax.jit(lambda z, key: sg2.generator_apply(
        g_cfg, params, z, c=label, truncation_psi=truncation_psi,
        noise_mode=noise_mode, rng=key, hooks=hooks))

    for seed_idx, seed in enumerate(seeds):
        print(f"Generating image for seed {seed} "
              f"({seed_idx}/{len(seeds)}) ...")
        z = jnp.asarray(np.random.RandomState(seed).randn(1, g_cfg.z_dim))
        img = to_uint8(forward(z, jax.random.PRNGKey(seed)))
        PIL.Image.fromarray(img[0], "RGB").save(
            f"{outdir}/seed{seed:04d}.png")


if __name__ == "__main__":
    main()
