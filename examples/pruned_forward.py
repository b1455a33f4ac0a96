"""Pruned StyleSpace-direction forward: sparsity sweep of a trained domain.

Reference parity: SimilarDomains/examples `pruned_forward.ipynb` +
`core/sparse_models.py` (`SparsedModel`, magnitude pruning): flatten a
trained s-space adaptation into the 6048-dim (at 1024²) StyleSpace delta
vector, zero all but the top-``perc`` fraction by magnitude, and render the
same latents at several sparsity levels side by side.  Without --network a
random source generator from the ckpt's embedded config is used (offline
layout demo).

    python examples/pruned_forward.py --ckpt sdelta.npz [--network ffhq.npz] \
        --outdir out [--percs 1.0,0.3,0.1,0.03]
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
    ap.add_argument("--ckpt", required=True,
                    help="Adaptation npz with an s-space (s_delta) direction")
    ap.add_argument("--network", default=None)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--percs", default="1.0,0.3,0.1,0.03",
                    help="Comma-separated kept fractions")
    ap.add_argument("--n-latents", type=int, default=4)
    ap.add_argument("--truncation", type=float, default=0.7)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import PIL.Image

    from examples.adaptation_inference import ensure_network
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.params import offsets as offs, sparse
    from gagan_tpu.utils.checkpoint import load_adaptation, load_snapshot
    from gagan_tpu.utils.config import generator_config_from_dict
    from gagan_tpu.utils.image_utils import t2im

    os.makedirs(args.outdir, exist_ok=True)
    network = ensure_network(args.network, args.ckpt, args.outdir)
    trees, config = load_snapshot(network)
    params = trees.get("G_ema", trees.get("G"))
    g_cfg = generator_config_from_dict(config["g_cfg"])

    meta, offsets, _ = load_adaptation(args.ckpt)
    spec = offs.OffsetsSpec.from_string(meta["parametrization"])
    # Flatten to the global StyleSpace delta vector; requires an s-space
    # parametrization (additive style deltas).
    deltas = sparse.from_offsets(g_cfg.synthesis, offsets)
    total = int(deltas.shape[0])
    print(f"flat StyleSpace direction: {total} dims, "
          f"{int(jnp.sum(deltas != 0))} nonzero")

    z = jax.random.normal(jax.random.PRNGKey(args.seed),
                          (args.n_latents, g_cfg.z_dim))

    @jax.jit
    def forward(deltas):
        hooks = sparse.to_hooks(g_cfg.synthesis, deltas)
        return sg2.generator_apply(g_cfg, params, z,
                                   truncation_psi=args.truncation,
                                   noise_mode="const", hooks=hooks)

    rows = []
    for keep in [float(p) for p in args.percs.split(",")]:
        # sparse.pruned zeros the smallest-|delta| fraction; convert the
        # kept fraction to the pruned fraction.
        pruned = sparse.pruned(deltas, 1.0 - keep)
        kept = int(jnp.sum(pruned != 0))
        img = forward(pruned)
        rows.append(np.concatenate([t2im(im, size=256) for im in img],
                                   axis=1))
        print(f"keep {keep:.2f}: kept {kept}/{total} dims")
    grid = np.concatenate(rows, axis=0)
    out = os.path.join(args.outdir, "pruned_sweep.png")
    PIL.Image.fromarray(grid).save(out)
    print(f"wrote {out} (rows = kept fractions {args.percs})")


if __name__ == "__main__":
    main()
