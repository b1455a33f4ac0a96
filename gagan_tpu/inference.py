"""One-call inference over trained adaptations.

Port of the reference `Inferencer` (`SimilarDomains/core/utils/example_utils.py:31-133`):
load a portable adaptation checkpoint (original / parametrization / mapper),
rebuild the frozen source generator + trainable, and produce (source, target)
image pairs — including the MindTheGap-style latent mixing that swaps
`style_latents[7:]` into the medium/fine layers (`example_utils.py:86-96`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gagan_tpu.models import stylegan2 as sg2
from gagan_tpu.params import offsets as offs_lib
from gagan_tpu.utils import checkpoint as ckpt_lib
from gagan_tpu.utils.config import generator_config_from_dict


class Inferencer:
    def __init__(self, adaptation_path: str, generator_path: str,
                 style_latents: Optional[np.ndarray] = None):
        trees, config = ckpt_lib.load_snapshot(generator_path)
        self.g_params = trees.get("G_ema", trees.get("G"))
        self.g_cfg = generator_config_from_dict(config["g_cfg"])

        meta, offsets, extra = ckpt_lib.load_adaptation(adaptation_path)
        self.model_type = meta["model_type"]
        self.parametrization = meta["parametrization"]
        if self.model_type in ("parametrization", "offsets"):
            self.spec = offs_lib.OffsetsSpec.from_string(self.parametrization)
            self.hooks = offs_lib.make_hooks(self.spec, offsets)
        elif self.model_type == "original":
            # Full finetune: the checkpoint stores replacement G params.
            self.hooks = None
            merged = jax.tree.map(lambda x: x, self.g_params)
            self._merge(merged, offsets)
            self.g_params_adapted = merged
        else:
            raise ValueError(f"unsupported model_type {self.model_type}")

        self.style_latents = (jnp.asarray(style_latents)
                              if style_latents is not None else None)
        if extra is not None and "style_latents" in extra:
            self.style_latents = jnp.asarray(extra["style_latents"])

        self._forward = jax.jit(self._forward_impl,
                                static_argnames=("mtg", "truncation"))

    @staticmethod
    def _merge(dst, src):
        for k, v in src.items():
            if k in dst:
                if isinstance(v, dict):
                    Inferencer._merge(dst[k], v)
                else:
                    dst[k] = jnp.asarray(v)

    def _adapted(self):
        if self.model_type == "original":
            return self.g_params_adapted, None
        return self.g_params, self.hooks

    def _forward_impl(self, z, truncation, mtg: bool):
        g_cfg = self.g_cfg
        ws = sg2.mapping_apply(g_cfg.mapping, self.g_params["mapping"], z,
                               truncation_psi=truncation)
        if mtg and self.style_latents is not None:
            # MTG mixing: medium/fine w layers come from the style image
            # (example_utils.py:86-96).
            style = jnp.broadcast_to(self.style_latents, ws.shape)
            layer_idx = jnp.arange(g_cfg.num_ws)[None, :, None]
            ws = jnp.where(layer_idx < 7, ws, style)
        src = sg2.synthesis_apply(g_cfg.synthesis, self.g_params["synthesis"],
                                  ws, noise_mode="const")
        params, hooks = self._adapted()
        trg = sg2.synthesis_apply(g_cfg.synthesis, params["synthesis"], ws,
                                  noise_mode="const", hooks=hooks)
        return src, trg

    def __call__(self, z, truncation: float = 1.0,
                 mtg_mixing: bool = False) -> Tuple[jax.Array, jax.Array]:
        """Returns (source images, adapted images) in [-1, 1]."""
        return self._forward(z, truncation, mtg_mixing)

    def from_wplus(self, ws) -> Tuple[jax.Array, jax.Array]:
        """(source, adapted) renders from W+ latents [N, num_ws, 512] —
        the projected-image path of the reference notebooks (encode with
        `project_e4e`/`project_restyle`, then render the pair)."""
        ws = jnp.asarray(ws)
        src = sg2.synthesis_apply(self.g_cfg.synthesis,
                                  self.g_params["synthesis"], ws,
                                  noise_mode="const")
        params, hooks = self._adapted()
        trg = sg2.synthesis_apply(self.g_cfg.synthesis, params["synthesis"],
                                  ws, noise_mode="const", hooks=hooks)
        return src, trg


# ----------------------------------------------------------------------------
# Image -> latent convenience paths (example_utils.py:191-253).


def preprocess_image(image: np.ndarray) -> jax.Array:
    """uint8/float HWC (or CHW) image -> [1, 3, 256, 256] in [-1, 1]: the
    reference eval transform (Resize(256) short-side + CenterCrop(256) +
    Normalize(0.5, 0.5), `example_utils.py:200-208`)."""
    arr = np.asarray(image)
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (
            1, 3):
        arr = np.transpose(arr, (1, 2, 0))          # CHW -> HWC
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    arr = arr.astype(np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    h, w = arr.shape[:2]
    scale = 256.0 / min(h, w)
    nh, nw = max(256, int(round(h * scale))), max(256, int(round(w * scale)))
    x = jax.image.resize(jnp.asarray(arr), (nh, nw, 3), method="bilinear")
    top, left = (nh - 256) // 2, (nw - 256) // 2
    x = x[top:top + 256, left:left + 256]
    x = x * 2.0 - 1.0
    return jnp.transpose(x, (2, 0, 1))[None]


def project_e4e(image, e_cfg, e_params, g_cfg, g_params,
                latent_avg=None) -> Tuple[jax.Array, jax.Array]:
    """One-call image -> e4e W+ -> reconstruction
    (`example_utils.py:191-218` project_e4e): returns (images, w_plus).

    ``e_cfg``/``e_params`` are the single-pass Encoder4Editing
    (`inversion/encoders.py`); ``latent_avg`` is added when given
    (start_from_latent_avg semantics)."""
    from gagan_tpu.inversion import encoders as enc_lib

    x = preprocess_image(image) if np.asarray(image).ndim != 4 else \
        jnp.asarray(image)
    ws = enc_lib.encode_image_to_wplus(e_cfg, e_params, x,
                                       latent_avg=latent_avg, kind="e4e")
    img = sg2.synthesis_apply(g_cfg.synthesis, g_params["synthesis"], ws,
                              noise_mode="const")
    return img, ws


def project_restyle(image, net, n_iters: int = 5,
                    ) -> Tuple[jax.Array, jax.Array]:
    """One-call image -> iterative ReStyle W+ -> reconstruction
    (`example_utils.py:221-253` project_restyle_psp, opts.n_iters_per_batch
    = 5): returns (images, w_plus) of the final iteration.

    ``net`` is a `inversion.restyle.RestyleNet` or a path to a converted
    restyle npz (tools/convert_weights.py::convert_restyle)."""
    from gagan_tpu.inversion import restyle as restyle_lib

    if isinstance(net, str):
        net = restyle_lib.load_net(net)
    x = preprocess_image(image) if np.asarray(image).ndim != 4 else \
        jnp.asarray(image)
    images, latents = restyle_lib.run_on_batch(net, x, n_iters=n_iters)
    return images[-1], latents[-1]
