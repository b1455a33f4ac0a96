"""Swin feature backbone parity vs transformers.SwinModel (random init)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.models import swin


def make_pair(image_size=32, embed_dim=24, depths=(2, 2), heads=(2, 4),
              window=4):
    from transformers import SwinConfig as HFConfig
    from transformers import SwinModel

    torch.manual_seed(0)
    hf = SwinModel(HFConfig(
        image_size=image_size, patch_size=4, embed_dim=embed_dim,
        depths=list(depths), num_heads=list(heads), window_size=window,
        num_channels=3, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0)).eval()
    cfg = swin.SwinConfig(image_size=image_size, patch_size=4,
                          embed_dim=embed_dim, depths=depths,
                          num_heads=heads, window_size=window)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = swin.params_from_hf(sd, cfg)
    return hf, cfg, params


@pytest.mark.parametrize("size,window", [(32, 4), (28, 4)])
def test_swin_features_parity(size, window):
    hf, cfg, params = make_pair(image_size=size, window=window)
    x = np.random.RandomState(1).randn(2, 3, size, size).astype(np.float32)
    with torch.no_grad():
        # hidden_states[-1] is the encoder output before the model's final
        # layernorm — the torchvision `.features` equivalent.
        want = hf(torch.from_numpy(x),
                  output_hidden_states=True).hidden_states[-1].numpy()
    got = np.asarray(swin.swin_features(cfg, params, jnp.asarray(x)))
    got = got.reshape(got.shape[0], -1, got.shape[-1])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_swin_shifted_windows_active():
    # Sanity: with resolution > window, odd blocks shift; masked attention
    # must differ from the unshifted computation.
    hf, cfg, params = make_pair(image_size=32, window=4)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 3, 32, 32)
                    .astype(np.float32))
    base = swin.swin_features(cfg, params, x)
    # Zeroing the second (shifted) block's attention output projection
    # changes the result — i.e. the shifted path contributes.
    import copy

    p2 = jax.tree.map(lambda a: a, params)
    blk = p2["layers"][0]["blocks"][1]
    blk["proj"] = {"weight": blk["proj"]["weight"] * 0,
                   "bias": blk["proj"]["bias"] * 0}
    alt = swin.swin_features(cfg, p2, x)
    assert not bool(jnp.allclose(base, alt))


def test_swin_feature_extractor_for_ga():
    extract = swin.make_feature_extractor(
        cfg=swin.SwinConfig(image_size=32, embed_dim=24, depths=(2, 2),
                            num_heads=(2, 4), window_size=4),
        key=jax.random.PRNGKey(0))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (3, 3, 32, 32),
                              minval=-1, maxval=1)
    feats = extract(imgs)
    assert feats.shape == (3, 48)
    assert bool(jnp.all(jnp.isfinite(feats)))
