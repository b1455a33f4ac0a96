"""Domain-adaptation inference: source/target pairs from a saved ckpt.

Reference parity: SimilarDomains/examples "Multiple Domains Morphing" /
Inferencer usage (core/utils/example_utils.py:31-118).  Without --network,
a random source generator matching the ckpt's embedded config is
snapshotted into --outdir first (offline demo).

    python examples/adaptation_inference.py --ckpt adaptation.npz \
        [--network ffhq.npz] --outdir out
"""

import argparse
import os

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

import numpy as np

import jax
import jax.numpy as jnp


def ensure_network(network, ckpt, outdir):
    if network:
        return network
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.utils.checkpoint import load_adaptation, save_snapshot
    from gagan_tpu.utils.config import generator_config_from_dict, to_dict

    meta, _, _ = load_adaptation(ckpt)
    if "sg2_params" not in meta:
        raise SystemExit("--network required: ckpt has no embedded config")
    cfg = generator_config_from_dict(meta["sg2_params"])
    params = sg2.init_generator(jax.random.PRNGKey(0), cfg)
    path = os.path.join(outdir, "source_random.npz")
    save_snapshot(path, g_ema=params, config={"g_cfg": to_dict(cfg)})
    print(f"(no --network: wrote random source generator to {path})")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="adaptation .npz")
    ap.add_argument("--network", default=None, help="source snapshot .npz")
    ap.add_argument("--outdir", default="out")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--trunc", type=float, default=0.7)
    ap.add_argument("--mtg-mixing", action="store_true",
                    help="MTG-style style_latents[7:] swap")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    from gagan_tpu.inference import Inferencer
    from gagan_tpu.utils.image_utils import t2im

    network = ensure_network(args.network, args.ckpt, args.outdir)
    inf = Inferencer(args.ckpt, network)
    z = jnp.asarray(np.random.RandomState(0).randn(
        args.n, inf.g_cfg.z_dim), jnp.float32)
    src, trg = inf(z, truncation=args.trunc, mtg_mixing=args.mtg_mixing)

    import PIL.Image

    for i in range(args.n):
        pair = np.concatenate([t2im(src[i], 256), t2im(trg[i], 256)], axis=1)
        PIL.Image.fromarray(pair).save(
            os.path.join(args.outdir, f"pair_{i:02d}.png"))
    print(f"wrote {args.n} source/target pairs to {args.outdir}")


if __name__ == "__main__":
    main()
