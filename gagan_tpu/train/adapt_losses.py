"""CLIP-guided domain-adaptation losses (SimilarDomains `core/loss.py`).

Pure-function registries mirroring the reference's three registries
(clip / rec / reg, `core/loss.py:19-21`) and the composite `DirectLoss`
(`core/loss.py:427-460`), plus the DiFa SCC (difa_w) latent loss
(`core/loss.py:351-424`) with its sliding-window state threaded explicitly
(the reference mutates a python queue; here the window is a fixed-size
circular buffer pytree so the whole loss jits).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


def _safe_normalize(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """x / max(||x||, ~eps) with a NaN-free VJP at x == 0.

    torch.cosine_similarity clamps the norms at eps=1e-8, which keeps its
    backward finite at a zero vector.  That case is reachable here: with
    zero-initialized offsets the trainable and frozen generator paths are
    BITWISE equal under bf16, so the CLIP edit direction is exactly 0 on
    the first step (fp32 only escapes through hook-vs-no-hook op-order
    asymmetry).  norm = sqrt(sum(x^2) + eps^2) gives the same clamp scale
    with a finite gradient; Adam normalizes the large first-step gradient
    to an O(lr) update exactly as it does for the reference."""
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True)
                        + eps * eps)


def cosine_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """1 - cosine_similarity (loss_utils.py:6-7)."""
    return 1.0 - jnp.sum(_safe_normalize(x) * _safe_normalize(y), axis=-1)


def tril_mask(n: int) -> np.ndarray:
    """Strictly-lower-triangular mask (loss_utils.py:22-26)."""
    mask = np.zeros((n, n), dtype=bool)
    mask[np.tril_indices(n)] = True
    np.fill_diagonal(mask, False)
    return mask


# ----------------------------------------------------------------------------
# CLIP losses: operate on a clip_batch dict with keys matching the reference
# (trg_encoded, src_encoded, trg_domain_emb, src_domain_emb, trg_tokens, ...).

clip_losses: Dict[str, Callable] = {}
rec_losses: Dict[str, Callable] = {}
reg_losses: Dict[str, Callable] = {}


def _register(registry, name):
    def deco(fn):
        registry[name] = fn
        return fn

    return deco


@_register(clip_losses, "global")
def global_loss(cb):
    """(core/loss.py:103-108)"""
    return jnp.mean(cosine_loss(cb["trg_encoded"], cb["trg_domain_emb"]))


@_register(clip_losses, "direction")
def direction_loss(cb):
    """(core/loss.py:132-147)"""
    edit_im = cb["trg_encoded"] - cb["src_encoded"]
    edit_domain = cb["trg_domain_emb"] - cb["src_domain_emb"]
    if edit_domain.ndim == 3:
        edit_domain = jnp.mean(edit_domain, axis=1)
    return jnp.mean(cosine_loss(edit_im, edit_domain))


@_register(clip_losses, "indomain")
def indomain_loss(cb):
    """(core/loss.py:149-166)"""
    src, trg = cb["src_encoded"], cb["trg_encoded"]
    n = src.shape[0]
    mask = jnp.asarray(tril_mask(n))
    src_cos = (src @ src.T)[mask]
    trg_cos = (trg @ trg.T)[mask]
    return jnp.sum(jnp.square(src_cos - trg_cos)) / n / (n - 1) * 2


@_register(clip_losses, "tt_direction")
def tt_direction_loss(cb):
    """(core/loss.py:168-186)"""
    trg, trg_emb = cb["trg_encoded"], cb["trg_domain_emb"]
    n = trg.shape[0]
    mask = jnp.asarray(tril_mask(n))
    deltas_text = (trg_emb[None] - trg_emb[:, None])[mask]
    deltas_img = (trg[None] - trg[:, None])[mask]
    if trg_emb.ndim == 3:
        deltas_text = jnp.mean(deltas_text, axis=1)
    return jnp.mean(cosine_loss(deltas_img, deltas_text))


@_register(clip_losses, "clip_within")
def clip_within_loss(cb):
    """(core/loss.py:189-199)"""
    trg_dir = cb["trg_encoded"] - cb["trg_domain_emb"]
    src_dir = cb["src_encoded"] - cb["src_domain_emb"]
    return jnp.mean(cosine_loss(trg_dir, src_dir))


@_register(clip_losses, "clip_ref")
def clip_ref_loss(cb):
    """(core/loss.py:202-209)"""
    return jnp.mean(cosine_loss(cb["trg_trainable_emb"], cb["trg_emb"]))


@_register(clip_losses, "difa_local")
def difa_local_loss(cb):
    """Token-matching relaxed EMD (core/loss.py:212-236)."""
    tgt = cb["trg_tokens"]
    style = cb["trg_tokens_style"]
    b = tgt.shape[0]
    if style.ndim == 2:
        style = style[None]
    style = jnp.broadcast_to(style, (b,) + style.shape[1:])
    tgt = _safe_normalize(tgt)
    style = _safe_normalize(style)
    attn = jnp.einsum("bnc,bmc->bnm", tgt, style)
    cost = 1.0 - attn
    row = jnp.mean(jnp.min(cost, axis=2), axis=1)
    col = jnp.mean(jnp.min(cost, axis=1), axis=1)
    return jnp.mean(jnp.maximum(row, col))


# ----------------------------------------------------------------------------
# Reconstruction losses (core/loss.py:238-294).


@_register(rec_losses, "l2_rec_resized")
def l2_rec_resized(rd):
    return jnp.mean(jnp.square(rd["style_inverted_B_256x256"]
                               - rd["style_image_256x256"]))


@_register(rec_losses, "l2_rec_fullres")
def l2_rec_fullres(rd):
    return jnp.mean(jnp.square(rd["style_inverted_B_1024x1024"]
                               - rd["style_image_1024x1024"]))


@_register(rec_losses, "lpips_rec")
def lpips_rec(rd):
    """LPIPS via the precomputed embeddings supplied in rec_data."""
    a, b = rd["style_inverted_B_lpips"], rd["style_image_lpips"]
    return jnp.mean(jnp.sum(jnp.square(a - b), axis=-1))


@_register(rec_losses, "disc_feat_matching")
def disc_feat_matching(rd):
    """L1 over discriminator feature lists (core/loss.py:266-278)."""
    fake_feats, real_feats = rd["disc_feats_fake"], rd["disc_feats_real"]
    total = 0.0
    for a, b in zip(fake_feats, real_feats):
        rep = a.shape[0] // b.shape[0]
        b = jnp.tile(b, (rep,) + (1,) * (b.ndim - 1))
        total = total + jnp.mean(jnp.abs(a - b))
    return total / len(fake_feats)


# ----------------------------------------------------------------------------
# Regularization losses on offsets (core/loss.py:68-100).


def _layer_delta_sum(conv_inputs: Dict[str, jax.Array]):
    vals = [v for v in conv_inputs.values() if not isinstance(v, dict)]
    return sum(vals)


@_register(reg_losses, "offsets_l2")
def offsets_l2(offsets):
    loss = 0.0
    for conv_inputs in offsets.values():
        delta = _layer_delta_sum(conv_inputs)
        loss = loss + jnp.sum(jnp.square(delta)) / delta.size
    return loss


@_register(reg_losses, "offsets_l1")
def offsets_l1(offsets):
    loss = 0.0
    for conv_inputs in offsets.values():
        delta = _layer_delta_sum(conv_inputs)
        loss = loss + jnp.sum(jnp.abs(delta)) / delta.size
    return loss


@_register(reg_losses, "affine_l2")
def affine_l2(offsets):
    loss = 0.0
    for conv_inputs in offsets.values():
        gamma, beta = conv_inputs["gamma"], conv_inputs["beta"]
        val = jnp.sum(jnp.square(gamma - 1) + jnp.square(beta))
        loss = loss + val / gamma.size
    return loss


# ----------------------------------------------------------------------------
# SCC (difa_w) loss with explicit sliding-window state (core/loss.py:351-424).


class SCCState(flax.struct.PyTreeNode):
    source_set: jax.Array     # [window, D]
    target_set: jax.Array
    count: jax.Array          # filled entries
    pos: jax.Array            # circular write position


def init_scc_state(latent_dim: int, window: int = 50) -> SCCState:
    return SCCState(
        source_set=jnp.zeros((window, latent_dim)),
        target_set=jnp.zeros((window, latent_dim)),
        count=jnp.zeros((), jnp.int32),
        pos=jnp.zeros((), jnp.int32),
    )


@dataclasses.dataclass(frozen=True)
class SCCConfig:
    weight: float = 6.0
    num_keep_first: int = 7
    sliding_window_size: int = 50
    psp_alpha: float = 0.6
    latent_dim: int = 512


def scc_loss(cfg: SCCConfig, state: SCCState, src_latents, trg_latents,
             cur_iter, total_iters) -> Tuple[jax.Array, SCCState]:
    """difa_w dynamic loss.  Latents are flattened W+ [(B, num_ws*w_dim)];
    the kept prefix length is fixed by the state buffers."""
    keep = state.source_set.shape[1]
    src = src_latents[:, :keep]
    trg = trg_latents[:, :keep]

    # Update circular window with batch means (update_queue, loss.py:507-515).
    src_mean_entry = jax.lax.stop_gradient(jnp.mean(src, axis=0))
    trg_mean_entry = jax.lax.stop_gradient(jnp.mean(trg, axis=0))
    w = cfg.sliding_window_size
    pos = state.pos % w
    state = state.replace(
        source_set=state.source_set.at[pos].set(src_mean_entry),
        target_set=state.target_set.at[pos].set(trg_mean_entry),
        count=jnp.minimum(state.count + 1, w),
        pos=(state.pos + 1) % w,
    )
    denom = jnp.maximum(state.count, 1).astype(jnp.float32)
    valid = (jnp.arange(w) < state.count)[:, None]
    source_mean = jnp.sum(state.source_set * valid, axis=0) / denom
    target_mean = jnp.sum(state.target_set * valid, axis=0) / denom
    delta_w = target_mean - source_mean

    regular_weight = jnp.maximum(
        0.0, (cur_iter - w) / jnp.maximum(total_iters - w, 1))

    # dynamic_loss: keep the (psp_alpha fraction of) channels with the
    # smallest |delta_w| (loss.py:543-558).
    num_channel = keep
    k = int(cfg.psp_alpha * num_channel)
    order = jnp.argsort(jnp.abs(delta_w))
    cond = jnp.zeros((num_channel,)).at[order[:k]].set(1.0)
    l1 = jnp.mean(jnp.abs(cond * trg - cond * src))
    return cfg.weight * regular_weight * l1, state


# ----------------------------------------------------------------------------
# Composite (DirectLoss, core/loss.py:427-460).


@dataclasses.dataclass(frozen=True)
class DirectLossConfig:
    loss_funcs: Tuple[str, ...] = ("direction",)
    loss_coefs: Tuple[float, ...] = (1.0,)
    scc: Optional[SCCConfig] = None


def direct_loss(cfg: DirectLossConfig, batch: Dict[str, Any],
                scc_state: Optional[SCCState] = None):
    """Returns (losses dict incl. 'total', new_scc_state)."""
    losses: Dict[str, jax.Array] = {}
    for func, coef in zip(cfg.loss_funcs, cfg.loss_coefs):
        if func in clip_losses:
            for enc_key, cb in batch["clip_data"].items():
                tag = enc_key.replace("/", "-")
                losses[f"{func}_{tag}"] = coef * clip_losses[func](cb)
        elif func in rec_losses and batch.get("rec_data"):
            losses[func] = coef * rec_losses[func](batch["rec_data"])
        elif func in reg_losses and batch.get("offsets") is not None:
            losses[func] = coef * reg_losses[func](batch["offsets"])

    if cfg.scc is not None and scc_state is not None:
        inv = batch["inv_data"]
        scc_val, scc_state = scc_loss(
            cfg.scc, scc_state, inv["src_latents"], inv["trg_latents"],
            inv["iters"], inv["total_iters"])
        losses["difa_psp_loss"] = scc_val

    losses["total"] = sum(losses.values())
    return losses, scc_state
