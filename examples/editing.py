"""Semantic editing: InterFaceGAN direction sweep + StyleSpace channel edit.

Reference parity: SimilarDomains/examples "Semantic Editing" notebook,
editing/latent_editor_wrapper.py + networks.py StyleSpace modifications.

    python examples/editing.py --outdir out [--network ffhq.npz] \
        [--direction age.npz]
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
    ap.add_argument("--network", default=None)
    ap.add_argument("--outdir", default="out")
    ap.add_argument("--direction", default=None,
                    help=".npz W direction (random demo if absent)")
    ap.add_argument("--alphas", default="-3,0,3")
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    from gagan_tpu.editing.interfacegan import LatentEditor
    from gagan_tpu.editing.stylespace import build_style_modification_hooks
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.utils.image_utils import t2im

    from quick_start import load_generator

    cfg, params = load_generator(args.network, args.res)
    z = jnp.asarray(np.random.RandomState(1).randn(1, cfg.z_dim),
                    jnp.float32)
    ws = sg2.mapping_apply(cfg.mapping, params["mapping"], z)

    if args.direction:
        editor = LatentEditor.from_files({"edit": args.direction})
    else:
        d = np.random.RandomState(2).randn(cfg.w_dim)
        editor = LatentEditor({"edit": d / np.linalg.norm(d)})

    os.makedirs(args.outdir, exist_ok=True)
    import PIL.Image

    row = []
    for alpha in (float(a) for a in args.alphas.split(",")):
        edited = editor.apply_interfacegan(ws, "edit", alpha)
        img = sg2.synthesis_apply(cfg.synthesis, params["synthesis"],
                                  edited, noise_mode="const")
        row.append(t2im(img[0], size=256))
    PIL.Image.fromarray(np.concatenate(row, axis=1)).save(
        os.path.join(args.outdir, "interfacegan_sweep.png"))

    # StyleSpace single-channel edit (layer 6, channel 10, +5.0).
    hooks = build_style_modification_hooks(cfg.synthesis,
                                           [((6, 10), 5.0, 1.0)])
    img = sg2.synthesis_apply(cfg.synthesis, params["synthesis"], ws,
                              noise_mode="const", hooks=hooks)
    PIL.Image.fromarray(t2im(img[0], size=256)).save(
        os.path.join(args.outdir, "stylespace_edit.png"))
    print(f"wrote edits to {args.outdir}")


if __name__ == "__main__":
    main()
