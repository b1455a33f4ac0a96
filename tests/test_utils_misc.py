"""image_utils / math_utils / auto-layer selection tests.

The bicubic oracle re-derives the reference's separable conv with torch
(BicubicDownSample, image_utils.py:9-80) since torchvision is unavailable.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gagan_tpu.utils import image_utils as iu
from gagan_tpu.utils import math_utils as mu


def torch_bicubic_downsample(x: np.ndarray, factor: int) -> np.ndarray:
    """Oracle matching BicubicDownSample.forward semantics."""
    def kernel1d(factor, a=-0.5):
        size = factor * 4
        xs = (np.arange(size) - np.floor(size / 2) + 0.5) / factor
        ax = np.abs(xs)
        k = np.where(ax <= 1, (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
                     np.where(ax < 2,
                              a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a,
                              0.0))
        return (k / k.sum()).astype(np.float32)

    k = torch.from_numpy(kernel1d(factor))
    c = x.shape[1]
    t = torch.from_numpy(x)
    size = factor * 4
    pad = size - factor
    lo, hi = pad // 2, pad - pad // 2
    k1 = k.reshape(1, 1, size, 1).repeat(c, 1, 1, 1)
    k2 = k.reshape(1, 1, 1, size).repeat(c, 1, 1, 1)
    t = F.pad(t, (0, 0, lo, hi), "reflect")
    t = F.conv2d(t, k1, stride=(factor, 1), groups=c)
    t = F.pad(t, (lo, hi, 0, 0), "reflect")
    t = F.conv2d(t, k2, stride=(1, factor), groups=c)
    return t.numpy()


@pytest.mark.parametrize("factor", [2, 4])
def test_bicubic_downsample_parity(factor):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    want = torch_bicubic_downsample(x, factor)
    got = np.asarray(iu.bicubic_downsample(jnp.asarray(x), factor))
    assert got.shape == (2, 3, 32 // factor, 32 // factor)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bicubic_downsample_differentiable():
    x = jnp.ones((1, 3, 16, 16))
    g = jax.grad(lambda im: jnp.sum(iu.bicubic_downsample(im, 2) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_t2im_and_grid():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(3, 32, 64).astype(np.float32))
    out = iu.t2im(img, size=16)
    assert out.dtype == np.uint8 and out.shape == (16, 32, 3)

    batch = jnp.asarray(rng.uniform(-1, 1, (16, 3, 32, 32)).astype(np.float32))
    fig = iu.construct_paper_image_grid(batch)
    assert fig.dtype == np.uint8
    # Reference layout: height 512, width 512 * (2 + 3 + 2) / 2.
    assert fig.shape[0] == 512 and fig.shape[2] == 3


def test_crop_augmentation_shape():
    img = jnp.zeros((2, 3, 64, 64))
    out = iu.crop_augmentation(jax.random.PRNGKey(0), img, size=64, alpha=0.5)
    assert out.shape == (2, 3, 32, 32)


# ----------------------------------------------------------------------------


def test_resample_single_vector_cos_bound():
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(jax.random.PRNGKey(1), (24,))
    out = mu.resample_single_vector(key, v, cos_lower_bound=0.8, n_vectors=16)
    assert out.shape == (16, 24)
    u = v / jnp.linalg.norm(v)
    cos = np.asarray(out @ u)
    assert (cos >= 0.8 - 1e-5).all()
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0,
                               rtol=1e-5)


def test_resample_batch_templated():
    key = jax.random.PRNGKey(2)
    emb = jax.random.normal(jax.random.PRNGKey(3), (4, 5, 12))
    out = mu.resample_batch_templated_embeddings(key, emb, 0.9)
    assert out.shape == emb.shape
    u = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    cos = np.asarray(jnp.einsum("btd,btd->bt", out, u))
    assert (cos >= 0.9 - 1e-5).all()


def test_convex_hull_parity():
    # Oracle: reference convex_hull (math_utils.py:85-134) in torch.
    rng = np.random.RandomState(4)
    vecs = rng.randn(3, 6, 8).astype(np.float32)
    alphas = rng.rand(2, 3).astype(np.float32)
    t_v, t_a = torch.from_numpy(vecs), torch.from_numpy(alphas)
    want = (t_v.unsqueeze(0) * t_a.unsqueeze(2).unsqueeze(3)).sum(dim=1)
    want = (want / want.clone().norm(dim=-1, keepdim=True)).numpy()
    got = np.asarray(mu.convex_hull(jnp.asarray(vecs), jnp.asarray(alphas)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    vecs2 = rng.randn(3, 8).astype(np.float32)
    want2 = (torch.from_numpy(vecs2).unsqueeze(0)
             * t_a.unsqueeze(2)).sum(dim=1)
    want2 = (want2 / want2.clone().norm(dim=-1, keepdim=True)).numpy()
    got2 = np.asarray(mu.convex_hull_small(jnp.asarray(vecs2),
                                           jnp.asarray(alphas)))
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-6)


# ----------------------------------------------------------------------------


def test_auto_layer_selection_and_training():
    from gagan_tpu.clip import model as clip_model
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.train import adapt_losses as al
    from gagan_tpu.train import adaptation as ad
    from gagan_tpu.train import auto_layers

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
    target = jax.random.normal(jax.random.PRNGKey(2), (1, 32))

    names, scores = auto_layers.determine_opt_layers(
        jax.random.PRNGKey(3), g_cfg, g_params, ccfg, cparams, target,
        auto_layer_iters=2, auto_layer_batch=2, auto_layer_k=3)
    all_names = g_cfg.synthesis.layer_names()
    assert len(names) == 3 and all(n in all_names[:-1] for n in names)
    assert scores.shape == (g_cfg.num_ws,)
    assert np.asarray(scores).min() >= 0

    # Trainer path: with auto layers on, offsets outside the chosen set
    # stay zero after a step.
    emb = {"ViT-B/32": {"src": target, "trg": target + 1.0}}
    cfg = ad.AdaptationConfig(
        trainer="td_single", batch_size=2, iter_num=2, lr=0.05,
        parametrization="additive", auto_layer_iters=1, auto_layer_batch=2,
        auto_layer_k=2,
        loss=al.DirectLossConfig(loss_funcs=("direction",),
                                 loss_coefs=(1.0,)))
    tr = ad.AdaptationTrainer(cfg, g_cfg, g_params,
                              {"ViT-B/32": (ccfg, cparams)},
                              jax.random.PRNGKey(4), domain_embeddings=emb)
    tr.train_step()
    moved = [lname for lname, layer in tr.offsets.items()
             if max(float(jnp.max(jnp.abs(x)))
                    for x in jax.tree.leaves(layer)) > 0]
    assert 0 < len(moved) <= 2


# ----------------------------------------------------------------------------


def test_class_registry():
    from gagan_tpu.utils.registry import ClassRegistry

    reg = ClassRegistry()

    @reg.add_to_registry("trainer_a")
    class TrainerA:
        def __init__(self, lr=0.1, steps=5, name="x"):
            self.lr = lr

    @reg.add_to_registry(["fn_b", "fn_b2"])
    def fn_b(alpha=1.0, beta=None):
        return alpha

    assert "trainer_a" in reg and "fn_b2" in reg
    assert reg["trainer_a"] is TrainerA
    cfg = reg.args["trainer_a"]()
    assert cfg.lr == 0.1 and cfg.steps == 5 and cfg.name == "x"
    cfg_b = reg.args["fn_b"]()
    assert cfg_b.alpha == 1.0 and cfg_b.beta is None
    grouped = reg.args and __import__("gagan_tpu.utils.registry",
                                      fromlist=["x"]).make_dataclass_from_func(
        TrainerA.__init__, "G", arg_keys=["exp", "training"])()
    assert grouped.exp.lr == 0.1 and grouped.training.steps == 5


def test_download_registry(tmp_path, monkeypatch):
    from gagan_tpu.utils import download as dl

    with pytest.raises(KeyError):
        dl.fetch("nope")
    # Pre-populated archive short-circuits without network.
    monkeypatch.setenv("GAGAN_PRETRAINED_DIR", str(tmp_path))
    src = dl.SOURCES["sg2-ffhq"]
    (tmp_path / src.filename).write_bytes(b"zip")
    (tmp_path / (src.filename + ".extracted")).write_text("ok")
    path = dl.fetch("sg2-ffhq")
    assert str(tmp_path) in path


def test_style_images_dataset(tmp_path):
    import PIL.Image

    from gagan_tpu.data.style_dataset import ImagesDataset

    rng = np.random.RandomState(0)
    for i in range(2):
        PIL.Image.fromarray(
            (rng.rand(96, 80, 3) * 255).astype(np.uint8)).save(
            tmp_path / f"img{i}.png")
    ds = ImagesDataset(size=64, image_path=str(tmp_path))
    assert len(ds) == 2
    rec = ds[0]
    assert rec["image_high_res"].shape == (64, 64, 3)
    assert rec["image_low_res"].shape == (256, 256, 3)
    assert rec["image_high_res_t"].shape == (3, 64, 64)
    assert rec["image_high_res_t"].min() >= -1.0
    assert rec["image_name"] == "img0"
    with pytest.raises(ValueError):
        ImagesDataset(size=64, image_path=str(tmp_path), align_input=True)
