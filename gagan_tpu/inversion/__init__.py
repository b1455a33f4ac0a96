"""Latent inversion: LPIPS projector, II2S optimization, encoder inference
(single-pass pSp/e4e and the iterative ReStyle family)."""

from .encoders import EncoderConfig, encode_image_to_wplus, init_encoder
from .restyle import (
    RestyleEncoderConfig,
    RestyleNet,
    get_avg_image,
    init_restyle_encoder,
    load_net,
    restyle_encode,
    run_on_batch,
)

__all__ = [
    "EncoderConfig",
    "RestyleEncoderConfig",
    "RestyleNet",
    "encode_image_to_wplus",
    "get_avg_image",
    "init_encoder",
    "init_restyle_encoder",
    "load_net",
    "restyle_encode",
    "run_on_batch",
]
