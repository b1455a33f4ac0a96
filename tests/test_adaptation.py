"""Adaptation trainer tests: loss-function parity vs the reference formulas
and end-to-end trainer smoke for td_single / im2im / JoJo / DiFa."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.clip import model as clip_model
from gagan_tpu.models import stylegan2 as sg2
from gagan_tpu.train import adapt_losses as al
from gagan_tpu.train import adaptation as ad


# ----------------------------------------------------------------------------
# Loss parity vs the reference implementations (torch).


def torch_cosine_loss(x, y):
    return 1.0 - torch.nn.functional.cosine_similarity(x, y)


def test_direction_loss_parity():
    rng = np.random.RandomState(0)
    cb = {k: rng.randn(4, 16).astype(np.float32)
          for k in ("trg_encoded", "src_encoded", "trg_domain_emb",
                    "src_domain_emb")}
    want = torch_cosine_loss(
        torch.from_numpy(cb["trg_encoded"] - cb["src_encoded"]),
        torch.from_numpy(cb["trg_domain_emb"] - cb["src_domain_emb"]),
    ).mean().item()
    got = float(al.direction_loss({k: jnp.asarray(v) for k, v in cb.items()}))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_direction_loss_template_embeddings():
    """[1, T, D] template text embeddings (the adapt CLI's shape, mirroring
    reference trainers.py:551-555): the ndim==3 branch means the template
    axis (core/loss.py:143-145), independent of batch size."""
    rng = np.random.RandomState(2)
    cb = {"trg_encoded": rng.randn(2, 16).astype(np.float32),
          "src_encoded": rng.randn(2, 16).astype(np.float32),
          "trg_domain_emb": rng.randn(1, 7, 16).astype(np.float32),
          "src_domain_emb": rng.randn(1, 7, 16).astype(np.float32)}
    want = torch_cosine_loss(
        torch.from_numpy(cb["trg_encoded"] - cb["src_encoded"]),
        torch.from_numpy(
            cb["trg_domain_emb"] - cb["src_domain_emb"]).mean(axis=1),
    ).mean().item()
    got = float(al.direction_loss({k: jnp.asarray(v) for k, v in cb.items()}))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_indomain_loss_parity():
    rng = np.random.RandomState(1)
    src = rng.randn(5, 8).astype(np.float32)
    trg = rng.randn(5, 8).astype(np.float32)
    mask = al.tril_mask(5)
    src_c = (src @ src.T)[mask]
    trg_c = (trg @ trg.T)[mask]
    want = ((src_c - trg_c) ** 2).sum() / 5 / 4 * 2
    got = float(al.indomain_loss({"src_encoded": jnp.asarray(src),
                                  "trg_encoded": jnp.asarray(trg)}))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_difa_local_parity():
    # Oracle: reference clip_difa_local formula (core/loss.py:212-236).
    rng = np.random.RandomState(2)
    tgt = rng.randn(2, 6, 16).astype(np.float32)
    style = rng.randn(6, 16).astype(np.float32)

    t_t = torch.from_numpy(tgt.copy())
    t_s = torch.from_numpy(style.copy())[None].repeat(2, 1, 1)
    t_t = t_t / t_t.norm(dim=-1, keepdim=True)
    t_s = t_s / t_s.norm(dim=-1, keepdim=True)
    attn = torch.bmm(t_t, t_s.permute(0, 2, 1))
    cost = 1 - attn
    row = cost.min(dim=2)[0].mean(dim=1)
    col = cost.min(dim=1)[0].mean(dim=1)
    want = torch.stack([row, col], dim=1).max(dim=1)[0].mean().item()

    got = float(al.difa_local_loss({
        "trg_tokens": jnp.asarray(tgt),
        "trg_tokens_style": jnp.asarray(style)}))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_offsets_reg_losses():
    offsets = {
        "b8.conv0": {"offset": jnp.asarray([[1.0, -2.0]])},
        "b8.conv1": {"offset": jnp.asarray([[0.5, 0.5]])},
    }
    l2 = float(al.offsets_l2(offsets))
    want = (1 + 4) / 2 + (0.25 + 0.25) / 2
    np.testing.assert_allclose(l2, want, rtol=1e-6)
    l1 = float(al.offsets_l1(offsets))
    np.testing.assert_allclose(l1, 3 / 2 + 1 / 2, rtol=1e-6)


def test_scc_loss_window():
    cfg = al.SCCConfig(weight=1.0, num_keep_first=2, sliding_window_size=4)
    state = al.init_scc_state(2 * 8, window=4)
    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.randn(3, 32).astype(np.float32))
    trg = jnp.asarray(rng.randn(3, 32).astype(np.float32))
    loss, state = al.scc_loss(cfg, state, src, trg, 0.0, 100.0)
    assert float(loss) == 0.0          # regular_weight = 0 before window fills
    assert int(state.count) == 1
    for i in range(10):
        loss, state = al.scc_loss(cfg, state, src, trg, 50.0 + i, 100.0)
    assert int(state.count) == 4       # window saturates
    assert np.isfinite(float(loss)) and float(loss) > 0


# ----------------------------------------------------------------------------
# Trainer end-to-end (tiny models).


@pytest.fixture(scope="module")
def tiny_setup():
    g_cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=32, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=1024, channel_max=64))
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    ccfg = clip_model.CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, transformer_width=32, transformer_heads=4,
        transformer_layers=2, vision_heads_override=4)
    cparams = clip_model.init_clip(jax.random.PRNGKey(1), ccfg)
    return g_cfg, g_params, {"ViT-B/32": (ccfg, cparams)}


def test_joint_pair_pass_matches_separate(tiny_setup):
    """The batched frozen+trainable synthesis (make_hooks batch_select)
    is exact: the first half equals the hook-free forward and the second
    half equals the hooked forward, bit-for-bit under const noise."""
    from gagan_tpu.params import offsets as offs_lib

    g_cfg, g_params, _ = tiny_setup
    for parametrization in ("s_delta", "additive", "multiplicative",
                            "w_delta"):
        spec = offs_lib.OffsetsSpec.from_string(parametrization)
        assert spec.per_sample_only
        offsets = offs_lib.init_offsets(jax.random.PRNGKey(7),
                                        g_cfg.synthesis, spec)
        # Non-zero offsets so the halves genuinely differ.
        offsets = jax.tree.map(
            lambda x: x + 0.1 * jax.random.normal(
                jax.random.PRNGKey(8), x.shape), offsets)
        ws = sg2.mapping_apply(
            g_cfg.mapping, g_params["mapping"],
            jax.random.normal(jax.random.PRNGKey(9), (3, 32)))
        sel = jnp.concatenate([jnp.zeros((3,), jnp.bool_),
                               jnp.ones((3,), jnp.bool_)])
        joint = sg2.synthesis_apply(
            g_cfg.synthesis, g_params["synthesis"],
            jnp.concatenate([ws, ws], axis=0), noise_mode="const",
            hooks=offs_lib.make_hooks(spec, offsets, batch_select=sel))
        plain = sg2.synthesis_apply(
            g_cfg.synthesis, g_params["synthesis"], ws, noise_mode="const")
        hooked = sg2.synthesis_apply(
            g_cfg.synthesis, g_params["synthesis"], ws, noise_mode="const",
            hooks=offs_lib.make_hooks(spec, offsets))
        np.testing.assert_array_equal(np.asarray(joint[:3]),
                                      np.asarray(plain))
        np.testing.assert_array_equal(np.asarray(joint[3:]),
                                      np.asarray(hooked))
        assert not np.allclose(np.asarray(plain), np.asarray(hooked))

    # Weight-space specs cannot be batch-gated: assert the guard trips.
    wspec = offs_lib.OffsetsSpec.from_string("out_in_additive")
    assert not wspec.per_sample_only
    woffs = offs_lib.init_offsets(jax.random.PRNGKey(7), g_cfg.synthesis,
                                  wspec)
    with pytest.raises(AssertionError):
        offs_lib.make_hooks(wspec, woffs, batch_select=sel)


def test_td_single_trains(tiny_setup):
    g_cfg, g_params, encoders = tiny_setup
    rng = np.random.RandomState(0)
    emb = {"ViT-B/32": {
        "src": jnp.asarray(rng.randn(1, 32).astype(np.float32)),
        "trg": jnp.asarray(rng.randn(1, 32).astype(np.float32)),
    }}
    cfg = ad.AdaptationConfig(
        trainer="td_single", batch_size=2, iter_num=6, lr=0.05,
        parametrization="additive",
        loss=al.DirectLossConfig(loss_funcs=("direction", "offsets_l2"),
                                 loss_coefs=(1.0, 0.1)))
    tr = ad.AdaptationTrainer(cfg, g_cfg, g_params, encoders,
                              jax.random.PRNGKey(2), domain_embeddings=emb)
    losses0 = tr.train_step()
    assert "direction_ViT-B-32" in losses0
    assert "offsets_l2" in losses0
    for _ in range(5):
        losses = tr.train_step()
    assert np.isfinite(losses["total"])
    # Offsets moved and adapted output differs from source.
    delta = max(float(jnp.max(jnp.abs(x)))
                for x in jax.tree.leaves(tr.offsets))
    assert delta > 0
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 32))
    adapted = tr.synthesize(z)
    source = sg2.generator_apply(g_cfg, g_params, z)
    assert not bool(jnp.allclose(adapted, source))


def test_im2im_jojo_trains(tiny_setup):
    g_cfg, g_params, encoders = tiny_setup
    rng = np.random.RandomState(1)
    style_image = rng.randint(0, 255, (3, 32, 32), np.uint8)
    style_latents = jnp.asarray(
        rng.randn(1, g_cfg.num_ws, 32).astype(np.float32))
    cfg = ad.AdaptationConfig(
        trainer="im2im_JoJo", batch_size=2, iter_num=4, lr=0.05, alpha=0.5,
        parametrization="additive",
        loss=al.DirectLossConfig(loss_funcs=("l2_rec_fullres",),
                                 loss_coefs=(1.0,)))
    tr = ad.AdaptationTrainer(cfg, g_cfg, g_params, encoders,
                              jax.random.PRNGKey(2), style_image=style_image,
                              style_latents=style_latents)
    l0 = tr.train_step()["total"]
    for _ in range(3):
        l = tr.train_step()["total"]
    assert np.isfinite(l)
    assert l < l0  # reconstruction improves on a pure rec loss


def test_im2im_single_mtg_trains(tiny_setup):
    """End-to-end MindTheGap trainer (reference trainers.py:566-793) with
    the reference im2im_mtg.yaml loss stack — direction + clip_within +
    clip_ref + l2_rec + lpips_rec (coefs 1.0/0.5/30/10/10) — exercising the
    rec-loss branch (train/adaptation.py rec_data for im2im_single) that no
    other trainer test touches."""
    g_cfg, g_params, encoders = tiny_setup
    rng = np.random.RandomState(3)
    style_image = rng.randint(0, 255, (3, 32, 32), np.uint8)
    style_latents = jnp.asarray(
        rng.randn(1, g_cfg.num_ws, 32).astype(np.float32))
    emb = {"ViT-B/32": {
        "src": jnp.asarray(rng.randn(1, 32).astype(np.float32)),
        "trg": jnp.asarray(rng.randn(1, 32).astype(np.float32)),
    }}
    cfg = ad.AdaptationConfig(
        trainer="im2im_single", batch_size=2, iter_num=6, lr=0.05,
        parametrization="additive",
        loss=al.DirectLossConfig(
            loss_funcs=("direction", "clip_within", "clip_ref",
                        "l2_rec_resized", "lpips_rec"),
            loss_coefs=(1.0, 0.5, 30.0, 10.0, 10.0)))
    tr = ad.AdaptationTrainer(cfg, g_cfg, g_params, encoders,
                              jax.random.PRNGKey(6), domain_embeddings=emb,
                              style_image=style_image,
                              style_latents=style_latents)
    l0 = tr.train_step()
    for key in ("direction_ViT-B-32", "clip_within_ViT-B-32",
                "clip_ref_ViT-B-32", "l2_rec_resized", "lpips_rec"):
        assert key in l0, sorted(l0)
    assert np.isfinite(l0["total"])

    # Loss-value parity on the fixed first step: l2_rec_resized must equal
    # 10 * MSE of the 256-resized (inverted-B, style) pair computed from
    # the trainer's own state (trainers.py:700-720 rec semantics).
    from gagan_tpu.params import offsets as offs_lib

    hooks = offs_lib.make_hooks(tr.spec, jax.tree.map(jnp.zeros_like,
                                                      tr.offsets))
    ws = jnp.broadcast_to(style_latents, (1,) + style_latents.shape[1:])
    inverted = sg2.synthesis_apply(g_cfg.synthesis,
                                   g_params["synthesis"], ws,
                                   noise_mode="const", hooks=hooks)
    style_f = jnp.asarray(style_image)[None].astype(jnp.float32) / 127.5 - 1
    want = 10.0 * float(jnp.mean(jnp.square(
        jax.image.resize(inverted, inverted.shape[:2] + (256, 256), "cubic")
        - jax.image.resize(style_f, style_f.shape[:2] + (256, 256),
                           "cubic"))))
    np.testing.assert_allclose(float(l0["l2_rec_resized"]), want,
                               rtol=2e-3, atol=1e-4)

    losses = l0
    for _ in range(5):
        losses = tr.train_step()
    assert np.isfinite(losses["total"])
    # Offsets actually trained.
    assert max(float(jnp.max(jnp.abs(x)))
               for x in jax.tree.leaves(tr.offsets)) > 0
    # Descent on the rec stack alone (the full reference mix includes
    # clip_ref at coef 30 whose RANDOM-tower gradients are directionless
    # noise that can swamp the rec term): rec-only MTG must reconstruct.
    cfg_rec = ad.AdaptationConfig(
        trainer="im2im_single", batch_size=2, iter_num=6, lr=0.05,
        parametrization="additive",
        loss=al.DirectLossConfig(
            loss_funcs=("l2_rec_resized", "lpips_rec"),
            loss_coefs=(10.0, 10.0)))
    tr_rec = ad.AdaptationTrainer(cfg_rec, g_cfg, g_params, encoders,
                                  jax.random.PRNGKey(7),
                                  domain_embeddings=emb,
                                  style_image=style_image,
                                  style_latents=style_latents)
    r0 = tr_rec.train_step()
    assert "lpips_rec" in r0
    for _ in range(5):
        r = tr_rec.train_step()
    assert float(r["l2_rec_resized"] + r["lpips_rec"]) < \
        float(r0["l2_rec_resized"] + r0["lpips_rec"])


def test_im2im_difa_tokens(tiny_setup):
    g_cfg, g_params, encoders = tiny_setup
    rng = np.random.RandomState(2)
    style_image = rng.randint(0, 255, (3, 32, 32), np.uint8)
    style_latents = jnp.asarray(
        rng.randn(1, g_cfg.num_ws, 32).astype(np.float32))
    cfg = ad.AdaptationConfig(
        trainer="im2im_difa", batch_size=2, iter_num=3, lr=0.01,
        clip_layer=1, parametrization="additive",
        loss=al.DirectLossConfig(
            loss_funcs=("direction", "difa_local"), loss_coefs=(1.0, 1.0)))
    tr = ad.AdaptationTrainer(cfg, g_cfg, g_params, encoders,
                              jax.random.PRNGKey(3), style_image=style_image,
                              style_latents=style_latents)
    losses = tr.train_step()
    assert "difa_local_ViT-B-32" in losses
    assert np.isfinite(losses["total"])


@pytest.mark.slow
def test_im2im_difa_full_protocol(tiny_setup):
    """The complete im2im_difa loss stack (im2im_difa.yaml:43-50): direction
    + difa_local + difa_w, where difa_w runs the e4e image->W+ encoder on
    both images inside the jitted step (reference trainers.py:992-1001,
    1159-1166) and updates the SCC sliding window."""
    from gagan_tpu.inversion import encoders as enc_lib

    g_cfg, g_params, encoders = tiny_setup
    rng = np.random.RandomState(4)
    style_image = rng.randint(0, 255, (3, 32, 32), np.uint8)
    e_cfg = enc_lib.EncoderConfig(stylegan_size=32)
    e_params = enc_lib.init_encoder(jax.random.PRNGKey(9), e_cfg)
    cfg = ad.AdaptationConfig(
        trainer="im2im_difa", batch_size=2, iter_num=5, lr=0.01,
        clip_layer=1, parametrization="additive",
        loss=al.DirectLossConfig(
            loss_funcs=("direction", "difa_local"), loss_coefs=(1.0, 1.0),
            scc=al.SCCConfig(weight=6.0, sliding_window_size=4)))
    tr = ad.AdaptationTrainer(cfg, g_cfg, g_params, encoders,
                              jax.random.PRNGKey(5), style_image=style_image,
                              latent_encoder=(e_cfg, e_params))
    losses = tr.train_step()
    assert "difa_psp_loss" in losses
    assert "difa_local_ViT-B-32" in losses
    assert np.isfinite(losses["total"])
    # The SCC circular window actually advanced with e4e batch means.
    assert int(tr.scc_state.count) == 1
    assert float(jnp.abs(tr.scc_state.source_set[0]).sum()) > 0


def test_adaptation_checkpoint_roundtrip(tiny_setup, tmp_path):
    g_cfg, g_params, encoders = tiny_setup
    rng = np.random.RandomState(0)
    emb = {"ViT-B/32": {
        "src": jnp.asarray(rng.randn(1, 32).astype(np.float32)),
        "trg": jnp.asarray(rng.randn(1, 32).astype(np.float32)),
    }}
    # Same loss/parametrization as test_td_single_trains ON PURPOSE: the
    # jitted step program is then identical and the in-process jit cache
    # reuses its compile (iter_num/checkpoint_every never enter the jaxpr).
    cfg = ad.AdaptationConfig(
        trainer="td_single", batch_size=2, iter_num=2, lr=0.05,
        checkpoint_every=2, parametrization="additive",
        loss=al.DirectLossConfig(loss_funcs=("direction", "offsets_l2"),
                                 loss_coefs=(1.0, 0.1)))
    tr = ad.AdaptationTrainer(cfg, g_cfg, g_params, encoders,
                              jax.random.PRNGKey(2), domain_embeddings=emb)
    tr.train(checkpoint_dir=str(tmp_path))
    import os

    files = [f for f in os.listdir(tmp_path) if f.startswith("adaptation-")]
    assert files

    from gagan_tpu.utils import checkpoint as ckpt

    meta, offsets, _ = ckpt.load_adaptation(str(tmp_path / files[-1]))
    assert meta["parametrization"] == "additive"
    chex_structs = jax.tree.structure(offsets) == jax.tree.structure(tr.offsets)
    assert chex_structs
