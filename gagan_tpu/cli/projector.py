"""Project images into a generator's latent space.

Mirrors `DissimilarDomains/projector.py:196-331` (`run_projection` + the
`BunchOfImagesDataset` batch driver): a file or a directory of images is
center-cropped, LANCZOS-resized to the generator resolution, and each image
is optimized into `w` or `z` space with VGG16-LPIPS distance plus noise
regularization (gagan_tpu.inversion.projector).  Outputs per image: the
projected latents (`projected_w.npz`, key 'w', stacked over images like the
reference's `torch.cat(all_projected)`), optionally the final re-synthesized
image (`--save-image`) and every `save-n`-strided trajectory step
(`--save-all-steps`).  The reference's `--save-video` depends on imageio
ffmpeg; here the frames are written as PNGs under `<stem>_steps/` instead.
"""

from __future__ import annotations

import glob
import os

import click
import numpy as np
import PIL.Image


def _load_targets(target_path: str, resolution: int):
    exts = (".png", ".jpg", ".jpeg")
    if os.path.isdir(target_path):
        files = sorted(f for f in glob.glob(target_path + "/**",
                                            recursive=True)
                       if f.lower().endswith(exts))
    else:
        files = [target_path]
    for fname in files:
        img = PIL.Image.open(fname).convert("RGB")
        w, h = img.size
        s = min(w, h)
        img = img.crop(((w - s) // 2, (h - s) // 2,
                        (w + s) // 2, (h + s) // 2))
        img = img.resize((resolution, resolution), PIL.Image.LANCZOS)
        yield fname, np.array(img, dtype=np.uint8)


@click.command()
@click.option("--network", required=True, help="Snapshot .npz")
@click.option("--target", "target_fname", required=True, metavar="FILE",
              help="Target image file or directory to project")
@click.option("--num-steps", type=int, default=1000, show_default=True)
@click.option("--seed", type=int, default=303, show_default=True)
@click.option("--outdir", required=True, metavar="DIR")
@click.option("--space", required=True, type=click.Choice(["w", "z"]))
@click.option("--truncation-psi", type=float, default=1.0, show_default=True)
@click.option("--save-all-steps", is_flag=True, show_default=True,
              help="Save trajectory latents (and frames) for all images")
@click.option("--save-image", is_flag=True, show_default=True,
              help="Save the re-synthesized image per target")
@click.option("--save-n", type=int, default=10, show_default=True,
              help="Stride between saved trajectory frames")
def main(network, target_fname, num_steps, seed, outdir, space,
         truncation_psi, save_all_steps, save_image, save_n):
    """Project images to the latent space of a trained snapshot."""
    import jax
    import jax.numpy as jnp

    from gagan_tpu.cli.generate import load_generator
    from gagan_tpu.inversion import projector
    from gagan_tpu.models import stylegan2 as sg2

    g_cfg, params = load_generator(network)
    os.makedirs(outdir, exist_ok=True)

    synth = jax.jit(lambda w: sg2.synthesis_apply(
        g_cfg.synthesis, params["synthesis"], w, noise_mode="const"))
    mapping = jax.jit(lambda z: sg2.mapping_apply(
        g_cfg.mapping, params["mapping"], z, truncation_psi=truncation_psi))

    def latent_to_ws(latent):
        """Dispatch per space like the reference's generate_image
        (DissimilarDomains/projector.py:184-207): z latents go through the
        mapping network (with truncation); w latents are broadcast to W+."""
        latent = jnp.asarray(latent)[None]
        if space == "z":
            return mapping(latent)
        return jnp.repeat(latent[:, None], g_cfg.num_ws, axis=1)

    def to_uint8(img):
        img = np.asarray(img).transpose(0, 2, 3, 1)
        return np.clip(img * 127.5 + 128, 0, 255).astype(np.uint8)

    all_projected = []
    for idx, (fname, target) in enumerate(
            _load_targets(target_fname, g_cfg.img_resolution)):
        stem = os.path.splitext(os.path.basename(fname))[0]
        print(f"Projecting [{idx}] {fname} ({space}-space, {num_steps} steps)")
        result = projector.project(
            g_cfg, params, target.transpose(2, 0, 1),
            num_steps=num_steps, space=space, truncation_psi=truncation_psi,
            key=jax.random.PRNGKey(seed), verbose=True,
            return_trajectory=save_all_steps)
        if save_all_steps:
            trajectory, w_plus = result
            np.savez(f"{outdir}/{stem}_steps.npz", **{space: trajectory})
            frame_dir = f"{outdir}/{stem}_steps"
            os.makedirs(frame_dir, exist_ok=True)
            for step in range(0, len(trajectory), max(save_n, 1)):
                w_step = latent_to_ws(trajectory[step])
                PIL.Image.fromarray(
                    to_uint8(synth(w_step))[0], "RGB").save(
                        f"{frame_dir}/step{step:05d}.png")
        else:
            w_plus = result
        all_projected.append(w_plus)

        if save_image:
            img = to_uint8(synth(jnp.asarray(w_plus)[None]))
            PIL.Image.fromarray(img[0], "RGB").save(f"{outdir}/{stem}_proj.png")
            PIL.Image.fromarray(target, "RGB").save(
                f"{outdir}/{stem}_target.png")

    np.savez(f"{outdir}/projected_w.npz", w=np.stack(all_projected))
    print(f"Saved {len(all_projected)} projected latents to "
          f"{outdir}/projected_w.npz")


if __name__ == "__main__":
    main()
