"""One-shot domain adaptation CLI (mirrors `SimilarDomains/main.py:9-27`):
YAML config + dotlist overrides -> trainer -> setup -> train loop.

Usage:
    python -m gagan_tpu.cli.adapt --config configs/td_nada.yaml \
        training.target_class="Anime" exp.name=my_run

Frozen towers load from converted npz checkpoints: the source generator
(--network or exp.checkpoint in YAML) and CLIP (GAGAN_CLIP_DIR containing
vit_b_32.npz / vit_b_16.npz, produced by tools/convert_weights.py).  With no
CLIP checkpoints present a deterministic random CLIP is used (machinery runs;
semantics need real weights).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import click
import numpy as np
import yaml


def load_clip_encoders(names, overrides: Optional[Dict] = None):
    """overrides (demo/test only): CLIPConfig field replacements applied when
    falling back to random weights — lets tiny configs run the full CLI path
    without the cost of a real ViT."""
    import dataclasses

    import jax

    from gagan_tpu.clip import VIT_B_16, VIT_B_32, init_clip
    from gagan_tpu.utils import checkpoint as ckpt

    cfg_map = {"ViT-B/32": (VIT_B_32, "vit_b_32.npz"),
               "ViT-B/16": (VIT_B_16, "vit_b_16.npz")}
    out = {}
    clip_dir = os.environ.get("GAGAN_CLIP_DIR", "")
    for name in names:
        ccfg, fname = cfg_map[name]
        path = os.path.join(clip_dir, fname) if clip_dir else ""
        if path and os.path.isfile(path):
            data = np.load(path, allow_pickle=False)
            params = ckpt.flat_to_tree({k: data[k] for k in data.files})
        else:
            click.echo(f"[adapt] no converted weights for {name}; "
                       f"using random CLIP (set GAGAN_CLIP_DIR)")
            if overrides:
                ccfg = dataclasses.replace(ccfg, **overrides)
            params = init_clip(jax.random.PRNGKey(0), ccfg)
        out[name] = (ccfg, params)
    return out


def text_embeddings(encoders, source_class, target_class, templates):
    """encode_text over templates, mean-free: [1, T, D] per class — the
    reference keeps all template embeddings, unsqueezes the batch axis
    (trainers.py:551-555), and lets the losses' ndim==3 branch mean the
    template axis (core/loss.py:143-145)."""
    import jax.numpy as jnp

    from gagan_tpu.clip import encode_text
    from gagan_tpu.clip.tokenizer import SimpleTokenizer, tokenize

    tok = SimpleTokenizer()
    emb = {}
    for name, (ccfg, cparams) in encoders.items():
        out = {}
        for key, text in (("src", source_class), ("trg", target_class)):
            prompts = [t.format(text) for t in templates]
            tokens = jnp.asarray(tokenize(prompts, tok))
            out[key] = encode_text(ccfg, cparams, tokens)[None]
        emb[name] = out
    return emb


@click.command(context_settings=dict(ignore_unknown_options=True,
                                     allow_extra_args=True))
@click.option("--config", "config_path", required=True,
              help="YAML experiment config (see configs/*.yaml: td_nada, "
                   "im2im_mtg, im2im_jojo, im2im_difa + _sdelta/_low_memory "
                   "variants)")
@click.option("--network", default=None,
              help="Source generator snapshot npz (converted via "
                   "tools/convert_weights.py); overrides exp.checkpoint. "
                   "Without either, a freshly initialized generator is used "
                   "(demo mode).")
@click.option("--outdir", default=None,
              help="Output directory; default <exp.root>/<exp.name>")
@click.pass_context
def main(ctx, config_path, network, outdir):
    """Run a one-shot/zero-shot domain-adaptation experiment from a YAML
    config (mirrors SimilarDomains/main.py).

    Any extra KEY=VALUE arguments are OmegaConf-style dotlist overrides
    merged over the YAML, e.g.:

        python -m gagan_tpu.cli.adapt --config configs/td_nada.yaml
        training.target_class="Anime" optimization_setup.lr=0.005 exp.name=run1

    Config blocks: exp (trainer/name/root/seed/checkpoint), training
    (batch_size, iter_num, source_class, target_class, patch_key,
    visual_encoders, mixing_noise, auto layer selection), optimization_setup
    (lr, loss_funcs, loss_coefs), logging (log_every), checkpointing
    (step_backup), inversion (latents/steps, im2im trainers).

    Frozen towers: CLIP weights load from GAGAN_CLIP_DIR
    (vit_b_32.npz/vit_b_16.npz); without them a deterministic random CLIP is
    used (machinery runs; semantics need real weights).  Text prompts use
    the CLIP BPE vocab from GAGAN_CLIP_BPE, else a byte-level fallback
    tokenizer (tagged, unmerged token sequences).

    Outputs in the run dir: config.yaml (resolved), losses.jsonl, and
    adaptation-NNNNNN.npz checkpoints consumable by generate --s-direction
    and gagan_tpu.inference.Inferencer.
    """
    import jax

    from gagan_tpu.cli.generate import load_generator
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.train import adapt_losses as al
    from gagan_tpu.train import adaptation as ad
    from gagan_tpu.utils import config as config_lib
    from gagan_tpu.utils.text_templates import imagenet_templates

    with open(config_path) as f:
        cfg_dict = yaml.safe_load(f)
    cfg_dict = config_lib.apply_dotlist(cfg_dict, ctx.args)

    exp = cfg_dict.get("exp", {})
    training = cfg_dict.get("training", {})
    opt = cfg_dict.get("optimization_setup", {})
    logging_cfg = cfg_dict.get("logging", {})

    network = network or exp.get("checkpoint")
    outdir = outdir or exp.get("root", "runs/adapt") + "/" + exp.get(
        "name", "exp")
    os.makedirs(outdir, exist_ok=True)

    if network:
        g_cfg, g_params = load_generator(network)
    else:
        click.echo("[adapt] no --network; using a freshly initialized "
                   "generator (demo mode)")
        gen_args = training.get("generator_args", {})
        g_cfg = sg2.GeneratorConfig(
            img_resolution=int(training.get("img_resolution", 256)),
            z_dim=int(gen_args.get("z_dim", 512)),
            w_dim=int(gen_args.get("w_dim", 512)),
            mapping=sg2.MappingConfig(
                num_layers=int(gen_args.get("num_mapping_layers", 8))),
            synthesis=sg2.SynthesisConfig(
                channel_base=int(gen_args.get("channel_base", 32768)),
                channel_max=int(gen_args.get("channel_max", 512))))
        g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)

    encoders = load_clip_encoders(
        tuple(training.get("visual_encoders", ["ViT-B/32"])),
        overrides=training.get("clip_config_overrides"))

    scc = None
    loss_funcs = tuple(opt.get("loss_funcs", ["direction"]))
    loss_coefs = tuple(opt.get("loss_coefs", [1.0]))
    latent_encoder = None
    if "difa_w" in loss_funcs:
        idx = loss_funcs.index("difa_w")
        scc = al.SCCConfig(weight=loss_coefs[idx])
        loss_funcs = loss_funcs[:idx] + loss_funcs[idx + 1:]
        loss_coefs = loss_coefs[:idx] + loss_coefs[idx + 1:]
        # difa_w needs the e4e image->W+ encoder (the reference loads
        # pretrained/e4e_ffhq_encode.pt, trainers.py:969-983).  Converted
        # npz via inversion.e4e_checkpoint; random weights otherwise so the
        # machinery runs (tagged like the random CLIP towers).
        from gagan_tpu.inversion import encoders as enc_lib
        from gagan_tpu.utils import checkpoint as ckpt_lib

        e_cfg = enc_lib.EncoderConfig(stylegan_size=g_cfg.img_resolution)
        e4e_path = cfg_dict.get("inversion", {}).get("e4e_checkpoint", "")
        if e4e_path:
            # Configured but missing is a hard error: silently training
            # with a random encoder makes difa_w semantically meaningless
            # (a typo'd path would otherwise go unnoticed).
            if not os.path.isfile(e4e_path):
                raise click.ClickException(
                    f"inversion.e4e_checkpoint={e4e_path!r} does not exist "
                    f"(difa_w needs the converted e4e npz; drop the key to "
                    f"run with tagged random weights)")
            data = np.load(e4e_path, allow_pickle=False)
            e_params = ckpt_lib.flat_to_tree({k: data[k] for k in data.files})
        else:
            click.echo("[adapt] difa_w: no inversion.e4e_checkpoint; using "
                       "a random e4e encoder (machinery runs; semantics "
                       "need real weights)")
            e_params = enc_lib.init_encoder(jax.random.PRNGKey(7), e_cfg)
        latent_encoder = (e_cfg, e_params)

    acfg = ad.AdaptationConfig(
        trainer=exp.get("trainer", "td_single"),
        batch_size=int(training.get("batch_size", 4)),
        iter_num=int(training.get("iter_num", 301)),
        lr=float(opt.get("lr", 0.002)),
        mixing_noise=float(training.get("mixing_noise", 0.9)),
        source_class=training.get("source_class", "Photo"),
        target_class=training.get("target_class", ""),
        parametrization=training.get("patch_key", "additive"),
        visual_encoders=tuple(training.get("visual_encoders", ["ViT-B/32"])),
        clip_layer=int(training.get("clip_layer", 8)),
        alpha=float(training.get("alpha", 0.0)),
        preserve_color=bool(training.get("preserve_color", False)),
        loss=al.DirectLossConfig(loss_funcs=loss_funcs,
                                 loss_coefs=loss_coefs, scc=scc),
        log_every=int(logging_cfg.get("log_every", 10)),
        checkpoint_every=int(cfg_dict.get("checkpointing", {}).get(
            "step_backup", 100)),
    )

    # Domain embeddings / style image.
    kwargs = {}
    if latent_encoder is not None:
        kwargs["latent_encoder"] = latent_encoder
    if acfg.trainer == "td_single":
        try:
            kwargs["domain_embeddings"] = text_embeddings(
                encoders, acfg.source_class, acfg.target_class,
                imagenet_templates)
        except FileNotFoundError as e:
            raise click.ClickException(
                f"{e}\n(td_single needs the CLIP BPE vocab for text prompts)")
    else:
        import PIL.Image

        img = np.array(PIL.Image.open(acfg.target_class).convert("RGB"))
        img = np.array(PIL.Image.fromarray(img).resize(
            (g_cfg.img_resolution,) * 2)).transpose(2, 0, 1)
        kwargs["style_image"] = img
        latents_path = cfg_dict.get("inversion", {}).get("latents")
        if latents_path:
            kwargs["style_latents"] = np.load(latents_path)["w"]
        else:
            from gagan_tpu.inversion import projector

            click.echo("[adapt] projecting style image (no cached latents)")
            w = projector.project(
                g_cfg, g_params, img,
                num_steps=int(cfg_dict.get("inversion", {}).get("steps", 300)),
                key=jax.random.PRNGKey(0))
            kwargs["style_latents"] = w[None] if w.ndim == 2 else w

    trainer = ad.AdaptationTrainer(acfg, g_cfg, g_params, encoders,
                                   jax.random.PRNGKey(int(exp.get("seed", 0))),
                                   **kwargs)

    log_path = os.path.join(outdir, "losses.jsonl")
    with open(os.path.join(outdir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg_dict, f)

    def log_fn(step, losses):
        line = {"step": step, **losses}
        with open(log_path, "a") as f:
            f.write(json.dumps(line) + "\n")
        click.echo(f"step {step}: total {losses['total']:.4f}")

    trainer.train(log_fn=log_fn, checkpoint_dir=outdir)
    click.echo(f"done; checkpoints in {outdir}")


if __name__ == "__main__":
    main()
