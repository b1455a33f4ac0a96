"""CLIP parity vs a random-weight transformers.CLIPModel (offline oracle)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gagan_tpu.clip import model as clip_model
from gagan_tpu.clip import convert as clip_convert


@pytest.fixture(scope="module")
def hf_pair():
    import transformers

    hf_cfg = transformers.CLIPConfig(
        # eos_token_id must be the max id so HF's eos-position pooling and
        # our argmax pooling agree (true for the real vocab: eot = 49407).
        text_config=dict(hidden_size=64, intermediate_size=256,
                         num_hidden_layers=3, num_attention_heads=4,
                         max_position_embeddings=77, vocab_size=1000,
                         bos_token_id=1, eos_token_id=999),
        vision_config=dict(hidden_size=96, intermediate_size=384,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=32, patch_size=8),
        projection_dim=32,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPModel(hf_cfg).eval()

    cfg = clip_model.CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=3, vision_width=96,
        vision_patch_size=8, context_length=77, vocab_size=1000,
        transformer_width=64, transformer_heads=4, transformer_layers=3,
        vision_heads_override=4)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = clip_convert.from_hf_state_dict(sd)
    return hf, cfg, params


def test_image_encoder_parity(hf_pair):
    hf, cfg, params = hf_pair
    rng = np.random.RandomState(0)
    # Already-normalized inputs: bypass both preprocessings.
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = hf.get_image_features(pixel_values=torch.from_numpy(x)).numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)

    got, _ = clip_model.encode_image(cfg, params, jnp.asarray(x),
                                     preprocess=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_text_encoder_parity(hf_pair):
    hf, cfg, params = hf_pair
    rng = np.random.RandomState(1)
    tokens = np.zeros((2, 77), dtype=np.int64)
    lengths = [9, 15]
    for i, L in enumerate(lengths):
        tokens[i, 0] = 1
        tokens[i, 1:L - 1] = rng.randint(2, 900, L - 2)
        tokens[i, L - 1] = 999  # eot = max id
    with torch.no_grad():
        want = hf.get_text_features(input_ids=torch.from_numpy(tokens)).numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    got = clip_model.encode_text(cfg, params, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_hidden_token_taps(hf_pair):
    hf, cfg, params = hf_pair
    x = np.random.RandomState(2).randn(2, 3, 32, 32).astype(np.float32)
    emb, hidden = clip_model.encode_image(
        cfg, params, jnp.asarray(x), preprocess=False, return_hidden=(1,))
    n_patches = (32 // 8) ** 2
    assert 1 in hidden
    assert hidden[1].shape == (2, n_patches, 96)

    # Oracle: HF hidden_states[2] == after layer index 1 (0 is embeddings).
    with torch.no_grad():
        out = hf.vision_model(pixel_values=torch.from_numpy(x),
                              output_hidden_states=True)
    want = out.hidden_states[2][:, 1:].numpy()
    np.testing.assert_allclose(np.asarray(hidden[1]), want, rtol=2e-3,
                               atol=2e-3)


def test_preprocess_range():
    x = jnp.full((1, 3, 64, 64), 255.0)
    out = clip_model.preprocess_image(x)
    assert out.shape == (1, 3, 224, 224)
    # white pixel -> (1 - mean) / std
    want = (1.0 - clip_model.IMAGE_MEAN) / clip_model.IMAGE_STD
    np.testing.assert_allclose(np.asarray(out[0, :, 0, 0]), want, rtol=1e-4)
