"""Multiple/combined domain morphing from saved adaptation checkpoints.

Reference parity: SimilarDomains/examples `multiple_morphing.ipynb` and
`combined_morphing.ipynb` — interpolate the trained offsets of one or more
adaptation checkpoints (scale sweep per domain; convex combination across
domains) and render a latent grid per morph position.  Without --network a
random source generator matching the first ckpt's embedded config is used
(offline layout demo).

    python examples/morphing.py --ckpt dom1.npz [--ckpt dom2.npz ...] \
        [--network ffhq.npz] --outdir out [--frames 5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", action="append", required=True,
                    help="Adaptation npz (repeatable: 2+ = combined morph)")
    ap.add_argument("--network", default=None)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--n-latents", type=int, default=4)
    ap.add_argument("--truncation", type=float, default=0.7)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from examples.adaptation_inference import ensure_network
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.params import offsets as offs
    import PIL.Image

    from gagan_tpu.utils.checkpoint import load_adaptation, load_snapshot
    from gagan_tpu.utils.config import generator_config_from_dict
    from gagan_tpu.utils.image_utils import t2im

    def save_grid(imgs, path, size=256):
        row = np.concatenate([t2im(im, size=size) for im in imgs], axis=1)
        PIL.Image.fromarray(row).save(path)

    os.makedirs(args.outdir, exist_ok=True)
    network = ensure_network(args.network, args.ckpt[0], args.outdir)
    trees, config = load_snapshot(network)
    params = trees.get("G_ema", trees.get("G"))
    g_cfg = generator_config_from_dict(config["g_cfg"])

    domains = []
    for path in args.ckpt:
        meta, offsets, _ = load_adaptation(path)
        spec = offs.OffsetsSpec.from_string(meta["parametrization"])
        domains.append((os.path.splitext(os.path.basename(path))[0],
                        spec, offsets))

    z = jax.random.normal(jax.random.PRNGKey(args.seed),
                          (args.n_latents, g_cfg.z_dim))

    @jax.jit
    def forward(scales):
        # Convex/multi-scale combination: all domains share the source
        # generator; scaled offsets add through the same hook slots
        # (combined_morphing.ipynb semantics).
        hooks = None
        from gagan_tpu.parallel.spatial import merge_hooks
        for (_, spec, offsets), s in zip(domains, scales):
            scaled = jax.tree.map(lambda x: x * s, offsets)
            h = offs.make_hooks(spec, scaled)
            hooks = h if hooks is None else merge_hooks(hooks, h)
        return sg2.generator_apply(g_cfg, params, z,
                                   truncation_psi=args.truncation,
                                   noise_mode="const", hooks=hooks)

    if len(domains) == 1:
        # Multiple-morphing sweep: source -> domain at frames scales.
        for fi, s in enumerate(np.linspace(0.0, 1.0, args.frames)):
            img = forward(jnp.asarray([s]))
            save_grid(img, os.path.join(args.outdir, f"morph_{fi:02d}.png"))
            print(f"scale {s:.2f} -> morph_{fi:02d}.png")
    else:
        # Pairwise combined morphing between the first two domains, plus
        # the joint (1,1) combination.
        for fi, t in enumerate(np.linspace(0.0, 1.0, args.frames)):
            scales = [1.0 - t, t] + [0.0] * (len(domains) - 2)
            img = forward(jnp.asarray(scales))
            save_grid(img, os.path.join(args.outdir, f"blend_{fi:02d}.png"))
            print(f"blend {1 - t:.2f}/{t:.2f} -> blend_{fi:02d}.png")
        img = forward(jnp.ones((len(domains),)))
        save_grid(img, os.path.join(args.outdir, "combined.png"))
        print("joint combination -> combined.png")


if __name__ == "__main__":
    main()
