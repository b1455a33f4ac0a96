"""Quick start: synthesize a grid of faces from a StyleGAN2 snapshot.

Reference parity: SimilarDomains/examples Quick Start notebook.  Runs
offline with random weights when --network is omitted (layout demo only).

    python examples/quick_start.py --outdir out [--network ffhq.npz]
"""

import argparse
import os

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

import numpy as np

import jax
import jax.numpy as jnp


def load_generator(network, res):
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.utils.config import generator_config_from_dict

    if network:
        from gagan_tpu.utils.checkpoint import load_snapshot

        trees, config = load_snapshot(network)
        return (generator_config_from_dict(config["g_cfg"]),
                trees.get("G_ema", trees.get("G")))
    cfg = sg2.GeneratorConfig(z_dim=512, w_dim=512, img_resolution=res,
                              img_channels=3)
    return cfg, sg2.init_generator(jax.random.PRNGKey(0), cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", default=None, help="snapshot .npz")
    ap.add_argument("--outdir", default="out")
    ap.add_argument("--seeds", default="0-15")
    ap.add_argument("--trunc", type=float, default=0.7)
    ap.add_argument("--res", type=int, default=256,
                    help="resolution for the random-weights demo")
    args = ap.parse_args()

    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.utils.image_utils import construct_paper_image_grid

    cfg, params = load_generator(args.network, args.res)
    lo, hi = (args.seeds.split("-") + [args.seeds])[:2]
    seeds = list(range(int(lo), int(hi) + 1))
    z = jnp.stack([jnp.asarray(np.random.RandomState(s).randn(cfg.z_dim),
                               jnp.float32) for s in seeds])
    imgs = sg2.generator_apply(cfg, params, z, truncation_psi=args.trunc)

    os.makedirs(args.outdir, exist_ok=True)
    grid = construct_paper_image_grid(imgs[:16])
    import PIL.Image

    out = os.path.join(args.outdir, "quick_start_grid.png")
    PIL.Image.fromarray(grid).save(out)
    print(f"wrote {out} ({grid.shape[1]}x{grid.shape[0]})")


if __name__ == "__main__":
    main()
