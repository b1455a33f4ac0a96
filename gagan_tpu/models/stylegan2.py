"""Unified StyleGAN2 generator / discriminator as pure functions over pytrees.

One implementation replaces the reference's two divergent stacks (NVlabs
`DissimilarDomains/training/networks.py:592-1437` and rosinality
`SimilarDomains/gan_models/StyleGAN2/model.py:364-838`).  Parameterization and
naming follow NVlabs (channel_base / channel_max / num_fp16_res / conv_clamp,
`train.py:258-267`); rosinality checkpoints load through the converter in
tools/convert_weights.py (the mapping the reference itself documents in
`SimilarDomains/core/utils/karras_to_rosinality.py`).

Design notes (TPU-first):
  * Modules are config dataclasses (static) + parameter pytrees (dynamic);
    every forward is a pure function, jit/pjit/vmap-compatible.
  * Mixed precision uses bfloat16 for the `num_fp16_res` highest resolutions
    (where the reference uses fp16); no loss-scaling or overflow guards are
    needed because bf16 shares float32's exponent range.
  * The w_avg buffer is not mutated in-place; `mapping_apply` returns the
    batch statistics needed for the trainer to update it functionally.
  * StyleSpace access is first-class: `generator_styles` exposes the per-layer
    style vectors, `synthesis_from_styles` consumes (possibly edited) styles —
    mirroring `get_s_code` / `forward_with_s`
    (`SimilarDomains/gan_models/StyleGAN2/offsets_model.py:407,569`).
"""

from __future__ import annotations

import dataclasses
import zlib
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# `from pkg.mod import name` bypasses the package-attribute shadowing that
# ops/__init__'s function re-exports would otherwise cause.
from gagan_tpu.ops import bias_act as _ba  # noqa: F401  (module via sys.modules)
from gagan_tpu.ops.bias_act import activation_funcs, bias_act
from gagan_tpu.ops.conv2d_resample import conv2d_resample
from gagan_tpu.ops.modulated_conv2d import modulated_conv2d
from gagan_tpu.ops.upfirdn2d import setup_filter, upsample2d, downsample2d

Params = Dict[str, Any]


def _name_fold(name: str) -> int:
    """Process-stable integer for folding a layer name into a PRNG key.

    Python's builtin ``hash(str)`` is salted per interpreter (PYTHONHASHSEED),
    so it would bake *different* fold-in constants into the traced program on
    every process/run — multi-process SPMD ranks would then draw different
    per-layer noise and silently diverge (found via cross-rank HLO diff in
    tools/dryrun_multiprocess.py), and snapshot/resume would change the noise
    stream.  CRC32 is stable everywhere."""
    return zlib.crc32(name.encode()) % (2 ** 31)


# ----------------------------------------------------------------------------
# Configs


@dataclasses.dataclass(frozen=True)
class MappingConfig:
    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    num_ws: Optional[int] = None
    num_layers: int = 8
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.995

    @property
    def resolved_embed_features(self) -> int:
        if self.c_dim == 0:
            return 0
        return self.embed_features if self.embed_features is not None else self.w_dim

    @property
    def resolved_layer_features(self) -> int:
        return self.layer_features if self.layer_features is not None else self.w_dim

    @property
    def features_list(self) -> List[int]:
        lf = self.resolved_layer_features
        return [self.z_dim + self.resolved_embed_features] + [lf] * (
            self.num_layers - 1
        ) + [self.w_dim]


@dataclasses.dataclass(frozen=True)
class SynthesisConfig:
    w_dim: int = 512
    img_resolution: int = 1024
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0          # bf16 for the N highest resolutions
    conv_clamp: Optional[float] = None
    architecture: str = "skip"
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    activation: str = "lrelu"
    use_noise: bool = True
    # Space-to-depth fast path for the final (lowest-channel) block: exact
    # reformulation of its convs on a 2x2-packed grid so the MXU sees 4x the
    # channels (gagan_tpu.ops.packed).  ~2-3x faster tail on TPU.
    packed_last_block: bool = False
    # Relayout-free tail boundary: the final block's torgb runs as ONE
    # lhs-dilated transposed conv from the packed feature map straight to
    # the unpacked image (ops/packed.build_torgb_transposed), the skip img
    # upsamples unpacked, and no pack/unpack op exists in fwd or VJP.
    # Exact same math; cost vs the packed boundary measured by
    # tools/bench_relayout.py.
    packed_fused_torgb: bool = True
    # How many trailing blocks run packed when packed_last_block is set.
    # With 2, the feature map crosses the block boundary still packed
    # (build_packed_upconv_packed) — worthwhile at 1024 where the 512
    # block has only 64 channels.
    packed_tail_blocks: int = 1
    # Rematerialize each synthesis block in the backward pass
    # (jax.checkpoint): trades recompute for activation memory — needed for
    # 1024-square training on a single 16 GB chip.
    remat: bool = False
    # Selective variant: remat only blocks at res >= this (None = follow
    # `remat`).  The high-res blocks hold most of the activation bytes but a
    # minority of the FLOPs, so rematting just the tail buys most of the
    # memory at a fraction of the recompute.
    remat_min_res: Optional[int] = None
    # Run eligible stride-1 3x3 levels through the Pallas fused
    # modconv+noise+bias_act kernel (ops/pallas_modconv.py): x read once,
    # y written once.  First-order-differentiable only (custom VJP) — the
    # training loop disables it on the reg-phase configs (PL double-grad);
    # layers outside the kernel's shape scope keep the XLA path.
    pallas_level: bool = False

    @property
    def block_resolutions(self) -> List[int]:
        return [2 ** i for i in range(2, int(np.log2(self.img_resolution)) + 1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def bf16_resolution(self) -> int:
        return max(
            2 ** (int(np.log2(self.img_resolution)) + 1 - self.num_fp16_res), 8
        )

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            n += 1 if res == 4 else 2          # conv1 only at 4x4, else conv0+conv1
        return n + 1                            # + torgb of the last block

    def layer_names(self) -> List[str]:
        """Per-conv layer names in reference layer_idx order (networks.py:1162-1166)."""
        names = []
        for res in self.block_resolutions:
            if res > 4:
                names.append(f"b{res}.conv0")
            names.append(f"b{res}.conv1")
            names.append(f"b{res}.torgb")
        return names

    def layer_in_channels(self) -> List[int]:
        """Input-channel count (= style dimension) for each layer of layer_names()."""
        dims = []
        for res in self.block_resolutions:
            if res > 4:
                dims.append(self.channels(res // 2))   # conv0 input
            dims.append(self.channels(res))            # conv1 input
            dims.append(self.channels(res))            # torgb input
        return dims


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    img_resolution: int = 1024
    img_channels: int = 3
    mapping: MappingConfig = dataclasses.field(default_factory=MappingConfig)
    synthesis: SynthesisConfig = dataclasses.field(default_factory=SynthesisConfig)

    def __post_init__(self):
        m = dataclasses.replace(
            self.mapping, z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=dataclasses.replace(
                self.synthesis, w_dim=self.w_dim,
                img_resolution=self.img_resolution,
                img_channels=self.img_channels).num_ws,
        )
        s = dataclasses.replace(
            self.synthesis, w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels,
        )
        object.__setattr__(self, "mapping", m)
        object.__setattr__(self, "synthesis", s)

    @property
    def num_ws(self) -> int:
        return self.synthesis.num_ws


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    c_dim: int = 0
    img_resolution: int = 1024
    img_channels: int = 3
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    conv_clamp: Optional[float] = None
    cmap_dim: Optional[int] = None
    activation: str = "lrelu"
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    freeze_layers: int = 0
    remat: bool = False
    # Selective remat: only blocks at res >= this (None = follow `remat`);
    # see SynthesisConfig.remat_min_res.
    remat_min_res: Optional[int] = None
    # Space-to-depth fast path for the first (highest-res, lowest-channel)
    # block, mirroring SynthesisConfig.packed_last_block.
    packed_first_block: bool = False
    # How many leading blocks run packed when packed_first_block is set.
    # Blocks after the first pack their input with a pure transpose
    # (ops/packed.pack) and reuse the same composed kernels — no fromrgb.
    packed_head_blocks: int = 1
    mapping: MappingConfig = dataclasses.field(default_factory=MappingConfig)

    @property
    def block_resolutions(self) -> List[int]:
        return [2 ** i for i in range(int(np.log2(self.img_resolution)), 2, -1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def bf16_resolution(self) -> int:
        return max(
            2 ** (int(np.log2(self.img_resolution)) + 1 - self.num_fp16_res), 8
        )

    @property
    def resolved_cmap_dim(self) -> int:
        if self.c_dim == 0:
            return 0
        return self.cmap_dim if self.cmap_dim is not None else self.channels(4)


# ----------------------------------------------------------------------------
# Initialization


def _init_fc(key, in_features: int, out_features: int, lr_multiplier: float = 1.0,
             bias: bool = True, bias_init: float = 0.0) -> Params:
    p = {"weight": jax.random.normal(key, (out_features, in_features),
                                     dtype=jnp.float32) / lr_multiplier}
    if bias:
        p["bias"] = jnp.full((out_features,), float(bias_init), dtype=jnp.float32)
    return p


def _init_conv(key, in_channels: int, out_channels: int, kernel: int,
               bias: bool = True) -> Params:
    p = {"weight": jax.random.normal(
        key, (out_channels, in_channels, kernel, kernel), dtype=jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((out_channels,), dtype=jnp.float32)
    return p


def init_mapping(key, cfg: MappingConfig) -> Params:
    keys = jax.random.split(key, cfg.num_layers + 1)
    params: Params = {}
    if cfg.c_dim > 0:
        params["embed"] = _init_fc(keys[-1], cfg.c_dim, cfg.resolved_embed_features)
    feats = cfg.features_list
    for idx in range(cfg.num_layers):
        params[f"fc{idx}"] = _init_fc(
            keys[idx], feats[idx], feats[idx + 1], lr_multiplier=cfg.lr_multiplier)
    if cfg.num_ws is not None and cfg.w_avg_beta is not None:
        params["w_avg"] = jnp.zeros((cfg.w_dim,), dtype=jnp.float32)
    return params


def _init_synthesis_layer(key, in_channels: int, out_channels: int, w_dim: int,
                          resolution: int, kernel: int = 3,
                          use_noise: bool = True) -> Params:
    k_w, k_a = jax.random.split(key)
    p = _init_conv(k_w, in_channels, out_channels, kernel)
    p["affine"] = _init_fc(k_a, w_dim, in_channels, bias_init=1.0)
    if use_noise:
        p["noise_const"] = jax.random.normal(
            jax.random.fold_in(key, 7), (resolution, resolution), dtype=jnp.float32)
        p["noise_strength"] = jnp.zeros((), dtype=jnp.float32)
    return p


def _init_torgb_layer(key, in_channels: int, out_channels: int, w_dim: int) -> Params:
    k_w, k_a = jax.random.split(key)
    p = _init_conv(k_w, in_channels, out_channels, 1)
    p["affine"] = _init_fc(k_a, w_dim, in_channels, bias_init=1.0)
    return p


def init_synthesis(key, cfg: SynthesisConfig) -> Params:
    params: Params = {}
    for res in cfg.block_resolutions:
        bkey = jax.random.fold_in(key, res)
        ks = jax.random.split(bkey, 8)
        block: Params = {}
        out_ch = cfg.channels(res)
        if res == 4:
            block["const"] = jax.random.normal(ks[0], (out_ch, res, res),
                                               dtype=jnp.float32)
            block["conv1"] = _init_synthesis_layer(
                ks[1], out_ch, out_ch, cfg.w_dim, res, use_noise=cfg.use_noise)
        else:
            in_ch = cfg.channels(res // 2)
            block["conv0"] = _init_synthesis_layer(
                ks[1], in_ch, out_ch, cfg.w_dim, res, use_noise=cfg.use_noise)
            block["conv1"] = _init_synthesis_layer(
                ks[2], out_ch, out_ch, cfg.w_dim, res, use_noise=cfg.use_noise)
            if cfg.architecture == "resnet":
                block["skip"] = _init_conv(ks[4], in_ch, out_ch, 1, bias=False)
        if cfg.architecture == "skip" or res == cfg.img_resolution:
            block["torgb"] = _init_torgb_layer(ks[3], out_ch, cfg.img_channels,
                                               cfg.w_dim)
        params[f"b{res}"] = block
    return params


def init_generator(key, cfg: GeneratorConfig) -> Params:
    k_m, k_s = jax.random.split(key)
    return {
        "mapping": init_mapping(k_m, cfg.mapping),
        "synthesis": init_synthesis(k_s, cfg.synthesis),
    }


def init_discriminator(key, cfg: DiscriminatorConfig) -> Params:
    params: Params = {}
    for res in cfg.block_resolutions:
        bkey = jax.random.fold_in(key, res)
        ks = jax.random.split(bkey, 4)
        block: Params = {}
        in_ch = cfg.channels(res) if res < cfg.img_resolution else 0
        tmp_ch = cfg.channels(res)
        out_ch = cfg.channels(res // 2)
        if in_ch == 0 or cfg.architecture == "skip":
            block["fromrgb"] = _init_conv(ks[0], cfg.img_channels, tmp_ch, 1)
        block["conv0"] = _init_conv(ks[1], tmp_ch, tmp_ch, 3)
        block["conv1"] = _init_conv(ks[2], tmp_ch, out_ch, 3)
        if cfg.architecture == "resnet":
            block["skip"] = _init_conv(ks[3], tmp_ch, out_ch, 1, bias=False)
        params[f"b{res}"] = block

    if cfg.c_dim > 0:
        mcfg = dataclasses.replace(
            cfg.mapping, z_dim=0, c_dim=cfg.c_dim, w_dim=cfg.resolved_cmap_dim,
            num_ws=None, w_avg_beta=None)
        params["mapping"] = init_mapping(jax.random.fold_in(key, 1), mcfg)

    ek = jax.random.split(jax.random.fold_in(key, 2), 4)
    ch4 = cfg.channels(4)
    epilogue: Params = {}
    if cfg.architecture == "skip":
        epilogue["fromrgb"] = _init_conv(ek[0], cfg.img_channels, ch4, 1)
    epilogue["conv"] = _init_conv(ek[1], ch4 + cfg.mbstd_num_channels, ch4, 3)
    epilogue["fc"] = _init_fc(ek[2], ch4 * 16, ch4)
    epilogue["out"] = _init_fc(
        ek[3], ch4, 1 if cfg.resolved_cmap_dim == 0 else cfg.resolved_cmap_dim)
    params["b4"] = epilogue
    return params


# ----------------------------------------------------------------------------
# Primitive layer applies


def fc_apply(p: Params, x: jax.Array, activation: str = "linear",
             lr_multiplier: float = 1.0, weight_offset: Optional[jax.Array] = None,
             weight_offset_mode: str = "none") -> jax.Array:
    """FullyConnectedLayer forward (reference networks.py:674-704).

    ``weight_offset`` implements AffineLight+ (low-rank offsets on the raw
    affine weight, applied before the equalized-lr gain; networks.py:692).
    """
    w = p["weight"]
    if weight_offset is not None:
        if weight_offset_mode == "additive":
            w = w + weight_offset
        else:
            w = (1.0 + weight_offset) * w
    in_features = w.shape[1]
    w = w.astype(x.dtype) * (lr_multiplier / np.sqrt(in_features))
    x = jnp.matmul(x, w.T)
    b = p.get("bias")
    if b is not None and lr_multiplier != 1.0:
        b = b * lr_multiplier
    return bias_act(x, b, act=activation)


def conv2d_layer_apply(p: Params, x: jax.Array, cfg_activation: str = "linear",
                       up: int = 1, down: int = 1,
                       resample_filter: Optional[jax.Array] = None,
                       conv_clamp: Optional[float] = None,
                       gain: float = 1.0) -> jax.Array:
    """Conv2dLayer forward (reference networks.py:710-760)."""
    w = p["weight"]
    out_ch, in_ch, kh, kw = w.shape
    w = w * (1.0 / np.sqrt(in_ch * kh * kw))
    x = conv2d_resample(
        x, w.astype(x.dtype), f=resample_filter, up=up, down=down,
        padding=kh // 2, flip_weight=(up == 1))
    spec = activation_funcs[cfg_activation]
    act_gain = spec.def_gain * gain
    act_clamp = conv_clamp * gain if conv_clamp is not None else None
    b = p.get("bias")
    return bias_act(x, b.astype(x.dtype) if b is not None else None,
                              act=cfg_activation, gain=act_gain, clamp=act_clamp)


def normalize_2nd_moment(x: jax.Array, axis: int = 1, eps: float = 1e-8) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


# ----------------------------------------------------------------------------
# Mapping network


def mapping_apply(
    cfg: MappingConfig,
    params: Params,
    z: Optional[jax.Array],
    c: Optional[jax.Array] = None,
    truncation_psi: float = 1.0,
    truncation_cutoff: Optional[int] = None,
    broadcast: bool = True,
) -> jax.Array:
    """MappingNetwork forward (reference networks.py:766-842).

    Returns ws of shape [N, num_ws, w_dim] (broadcast) or [N, w_dim].
    The w_avg moving average is read from ``params['w_avg']``; updating it is
    the trainer's job (use ``jnp.mean(ws[:, 0], axis=0)`` and a functional lerp).
    """
    x = None
    if cfg.z_dim > 0:
        x = normalize_2nd_moment(z.astype(jnp.float32))
    if cfg.c_dim > 0:
        y = normalize_2nd_moment(fc_apply(params["embed"], c.astype(jnp.float32)))
        x = jnp.concatenate([x, y], axis=1) if x is not None else y

    for idx in range(cfg.num_layers):
        x = fc_apply(params[f"fc{idx}"], x, activation=cfg.activation,
                     lr_multiplier=cfg.lr_multiplier)

    if broadcast and cfg.num_ws is not None:
        x = jnp.repeat(x[:, None, :], cfg.num_ws, axis=1)

    if truncation_psi != 1.0:
        w_avg = params["w_avg"]
        if cfg.num_ws is None or truncation_cutoff is None:
            x = w_avg + truncation_psi * (x - w_avg)
        else:
            head = w_avg + truncation_psi * (x[:, :truncation_cutoff] - w_avg)
            x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
    return x


# ----------------------------------------------------------------------------
# Synthesis network

# Per-layer transform hooks supplied by the offsets/parameterization system
# (gagan_tpu.params.offsets).  Keys are layer names from
# SynthesisConfig.layer_names(); values are dicts of transform callables that
# close over offset parameters.  Everything here stays jit-compatible because
# the hook *structure* is static — only the closed-over arrays are traced.
LayerHooks = Dict[str, Dict[str, Any]]


def _apply_hook(hooks: Optional[LayerHooks], layer_name: str, kind: str, value,
                default=None):
    if hooks is None:
        return value if default is None else default(value)
    h = hooks.get(layer_name, {})
    fn = h.get(kind)
    if fn is None:
        return value if default is None else default(value)
    return fn(value)


def _layer_styles(
    cfg: SynthesisConfig,
    lp: Params,
    w: jax.Array,
    weight_gain: float,
    layer_name: str,
    hooks: Optional[LayerHooks],
) -> jax.Array:
    """w -> s: affine + offsets (reference w_to_s, networks.py:474-532)."""
    if hooks is not None and "w" in hooks.get(layer_name, {}):
        w = hooks[layer_name]["w"](w)
    affine_offset = None
    affine_mode = "none"
    if hooks is not None and "affine_weight" in hooks.get(layer_name, {}):
        affine_offset, affine_mode = hooks[layer_name]["affine_weight"]
    styles = fc_apply(lp["affine"], w, weight_offset=affine_offset,
                      weight_offset_mode=affine_mode)
    if weight_gain != 1.0:
        styles = styles * weight_gain
    if hooks is not None and "style" in hooks.get(layer_name, {}):
        styles = hooks[layer_name]["style"](styles)
    return styles


def _layer_weight(lp: Params, layer_name: str, hooks: Optional[LayerHooks]):
    weight = lp["weight"]
    if hooks is not None and "weight" in hooks.get(layer_name, {}):
        weight = hooks[layer_name]["weight"](weight)
    return weight


def synthesis_layer_apply(
    cfg: SynthesisConfig,
    lp: Params,
    x: jax.Array,
    w: jax.Array,
    resolution: int,
    up: int,
    resample_filter: jax.Array,
    layer_name: str,
    noise_mode: str = "random",
    rng: Optional[jax.Array] = None,
    gain: float = 1.0,
    hooks: Optional[LayerHooks] = None,
) -> jax.Array:
    """SynthesisLayer forward (reference networks.py:848-922)."""
    styles = _layer_styles(cfg, lp, w, 1.0, layer_name, hooks)
    weight = _layer_weight(lp, layer_name, hooks)

    noise = None
    if cfg.use_noise and noise_mode == "random":
        noise = jax.random.normal(
            rng, (x.shape[0], 1, resolution, resolution), dtype=jnp.float32
        ) * lp["noise_strength"]
    elif cfg.use_noise and noise_mode == "const":
        noise = lp["noise_const"] * lp["noise_strength"]

    if (cfg.pallas_level and up == 1 and cfg.activation == "lrelu"
            and gain == 1.0
            and (hooks is None or "post" not in hooks.get(layer_name, {}))):
        from gagan_tpu.ops import pallas_modconv as pmc

        if pmc.supported_shape(x.shape, weight.shape):
            nz = noise
            if nz is not None and nz.ndim == 2:      # const buffer [H, W]
                nz = jnp.broadcast_to(nz[None, None],
                                      (x.shape[0], 1) + nz.shape)
            spec_ = activation_funcs[cfg.activation]
            return pmc.fused_modconv_level(
                x, weight, styles, lp["bias"], noise=nz,
                act_gain=spec_.def_gain, clamp=cfg.conv_clamp)

    x = modulated_conv2d(
        x, weight, styles,
        noise=None, up=up, padding=weight.shape[-1] // 2,
        resample_filter=resample_filter, flip_weight=(up == 1))
    # Post-conv activation hook (per-sample output-channel offsets, e.g.
    # mapper 'out' heads — equivalent to the reference's post-demodulation
    # cout weight patches, stylegan_patches.py:149-215).
    if hooks is not None and "post" in hooks.get(layer_name, {}):
        x = hooks[layer_name]["post"](x)
    if noise is not None:
        x = x + noise.astype(x.dtype)

    spec = activation_funcs[cfg.activation]
    act_gain = spec.def_gain * gain
    act_clamp = cfg.conv_clamp * gain if cfg.conv_clamp is not None else None
    return bias_act(x, lp["bias"].astype(x.dtype), act=cfg.activation,
                              gain=act_gain, clamp=act_clamp)


def torgb_layer_apply(
    cfg: SynthesisConfig,
    lp: Params,
    x: jax.Array,
    w: jax.Array,
    layer_name: str,
    hooks: Optional[LayerHooks] = None,
) -> jax.Array:
    """ToRGBLayer forward (reference networks.py:928-963)."""
    in_ch = lp["weight"].shape[1]
    kernel = lp["weight"].shape[-1]
    weight_gain = 1.0 / np.sqrt(in_ch * kernel ** 2)
    styles = _layer_styles(cfg, lp, w, weight_gain, layer_name, hooks)
    weight = _layer_weight(lp, layer_name, hooks)
    x = modulated_conv2d(x, weight, styles, demodulate=False)
    if hooks is not None and "post" in hooks.get(layer_name, {}):
        x = hooks[layer_name]["post"](x)
    return bias_act(x, lp["bias"].astype(x.dtype), clamp=cfg.conv_clamp)


def _packed_tail(cfg, params, x, img, tail, noise_mode, rng, hooks,
                 force_fp32):
    """Trailing synthesis blocks on the 2x2-packed grid (exact;
    ops/packed.py).  ``tail`` is a list of (res, block_ws); the feature map
    enters unpacked, gets packed by the first block's composed up-conv, and
    crosses subsequent block boundaries still packed
    (build_packed_upconv_packed)."""
    from gagan_tpu.ops import packed as pk

    taps = jnp.asarray(cfg.resample_filter, jnp.float32)
    taps = taps / jnp.sum(taps)
    spec = activation_funcs[cfg.activation]
    batch = x.shape[0]

    def lrng(name):
        return (jax.random.fold_in(rng, _name_fold(name))
                if rng is not None else None)

    def demod_coefs(weight, styles):
        w32 = weight.astype(jnp.float32)
        s32 = styles.astype(jnp.float32)
        wsq = jnp.sum(jnp.square(w32), axis=(2, 3))
        return jax.lax.rsqrt(
            jnp.einsum("ni,oi->no", jnp.square(s32), wsq) + 1e-8)

    def packed_noise(lp, name, res):
        if not cfg.use_noise or noise_mode == "none":
            return None
        if noise_mode == "const":
            nz = lp["noise_const"][None, None] * lp["noise_strength"]
        else:
            nz = jax.random.normal(lrng(name), (batch, 1, res, res),
                                   dtype=jnp.float32) * lp["noise_strength"]
        return pk.pack(nz)                               # [., 4, res/2, res/2]

    def add_noise_act(lp, h, name, res, out_ch):
        nz = packed_noise(lp, name, res)
        if nz is not None:
            h = h + jnp.repeat(nz, out_ch, axis=1).astype(h.dtype)
        bias = pk.pack_channel_tile(lp["bias"])
        return bias_act(h, bias.astype(h.dtype), act=cfg.activation,
                        gain=spec.def_gain, clamp=cfg.conv_clamp)

    packed = False
    for bi, (res, block_ws) in enumerate(tail):
        block = params[f"b{res}"]
        dtype = (jnp.bfloat16
                 if res >= cfg.bf16_resolution and not force_fp32
                 else jnp.float32)
        x = x.astype(dtype)

        # conv0 (up=2): unpacked input -> packed output via the composed
        # up-conv kernel.  Between tail blocks the feature map is unpacked
        # first (pure reshape/transpose): the stay-packed crossing kernel
        # (build_packed_upconv_packed) is exact but carries 4x structural
        # zeros in its dense [16O, 4I, 3, 3] form, which costs more than
        # the relayout saves.
        if packed:
            x = pk.unpack(x)
        lp = block["conv0"]
        name0 = f"b{res}.conv0"
        styles = _layer_styles(cfg, lp, block_ws[0], 1.0, name0, hooks)
        weight = _layer_weight(lp, name0, hooks)
        out_ch = weight.shape[0]
        d = demod_coefs(weight, styles)
        wp = pk.build_packed_upconv(weight, taps)
        h = x * styles.astype(x.dtype)[:, :, None, None]
        h = pk.conv_packed(h, wp.astype(dtype))
        h = h * pk.pack_channel_tile(d).astype(h.dtype)[:, :, None, None]
        h = add_noise_act(lp, h, name0, res, out_ch)
        packed = True

        # conv1: packed -> packed.
        lp = block["conv1"]
        name1 = f"b{res}.conv1"
        styles = _layer_styles(cfg, lp, block_ws[1], 1.0, name1, hooks)
        weight = _layer_weight(lp, name1, hooks)
        out_ch = weight.shape[0]
        d = demod_coefs(weight, styles)
        wp = pk.build_packed_conv3x3(weight)
        h = h * pk.pack_channel_tile(styles).astype(h.dtype)[:, :, None, None]
        h = pk.conv_packed(h, wp.astype(dtype))
        h = h * pk.pack_channel_tile(d).astype(h.dtype)[:, :, None, None]
        h = add_noise_act(lp, h, name1, res, out_ch)

        # torgb: packed 1x1 (block-diagonal over cells), no demod.
        lp = block["torgb"]
        name2 = f"b{res}.torgb"
        in_ch = lp["weight"].shape[1]
        weight_gain = 1.0 / np.sqrt(in_ch)
        styles = _layer_styles(cfg, lp, block_ws[2], weight_gain, name2,
                               hooks)
        weight = _layer_weight(lp, name2, hooks)
        img_ch = weight.shape[0]
        is_last = bi == len(tail) - 1
        if cfg.packed_fused_torgb and is_last:
            # Relayout-free boundary: torgb 1x1 + depth-to-space as ONE
            # lhs-dilated transposed conv to the unpacked image, skip img
            # upsampled unpacked — no pack/unpack op in fwd or VJP
            # (measured vs the packed boundary in tools/bench_relayout.py).
            krgb = pk.build_torgb_transposed(weight[:, :, 0, 0])
            y = h * pk.pack_channel_tile(styles).astype(h.dtype)[
                :, :, None, None]
            y = pk.conv_transposed_unpack(y, krgb.astype(dtype))
            y = bias_act(y, lp["bias"].astype(y.dtype),
                         clamp=cfg.conv_clamp)
            y = y.astype(jnp.float32)
            if img is not None:
                if bi > 0:
                    img = pk.unpack(img)
                img = upsample2d(img, taps)
                img = img + y
            else:
                img = y
            return img
        wrgb = jnp.zeros((4 * img_ch, 4 * in_ch, 1, 1), dtype=weight.dtype)
        for cell in range(4):
            wrgb = wrgb.at[cell * img_ch:(cell + 1) * img_ch,
                           cell * in_ch:(cell + 1) * in_ch].set(weight)
        y = h * pk.pack_channel_tile(styles).astype(h.dtype)[:, :, None, None]
        y = pk.conv_packed(y, wrgb.astype(dtype))
        y = bias_act(y, pk.pack_channel_tile(lp["bias"]).astype(y.dtype),
                     clamp=cfg.conv_clamp)
        y = y.astype(jnp.float32)

        # skip-img upsample directly into this block's packed layout.  Past
        # the first tail block, img arrives packed at the previous block's
        # layout — unpack (3 channels, cheap) before re-upsampling.
        if img is not None:
            if bi > 0:
                img = pk.unpack(img)
            img = pk.fir_upsample_packed(img, taps)
            img = img + y
        else:
            img = y
        x = h

    return pk.unpack(img)


def _want_remat(cfg, res: int) -> bool:
    """Block-level remat decision: cfg.remat remats everything;
    cfg.remat_min_res remats only blocks at res >= the threshold."""
    if cfg.remat:
        return True
    return cfg.remat_min_res is not None and res >= cfg.remat_min_res


def synthesis_apply(
    cfg: SynthesisConfig,
    params: Params,
    ws: jax.Array,
    noise_mode: str = "const",
    rng: Optional[jax.Array] = None,
    hooks: Optional[LayerHooks] = None,
    force_fp32: bool = False,
) -> jax.Array:
    """SynthesisNetwork forward (reference networks.py:1080-1132)."""
    assert noise_mode in ("random", "const", "none")
    if noise_mode == "random":
        assert rng is not None
    resample_filter = setup_filter(cfg.resample_filter)
    batch = ws.shape[0]
    ws = ws.astype(jnp.float32)

    resolutions = cfg.block_resolutions
    n_tail = 0
    if cfg.packed_last_block and cfg.architecture == "skip":
        # The packed tail may cover up to packed_tail_blocks trailing
        # blocks (all res > 4; at least the 4x4 block stays unpacked).
        n_tail = max(0, min(cfg.packed_tail_blocks, len(resolutions) - 1))
        tail_res = resolutions[-n_tail:] if n_tail else []
        if any(r <= 4 for r in tail_res) or (hooks and any(
                "post" in hooks.get(f"b{r}.{l}", {})
                for r in tail_res for l in ("conv0", "conv1", "torgb"))):
            n_tail = 0
    tail_start = resolutions[-n_tail] if n_tail else None

    x = None
    img = None
    w_idx = 0
    for res in cfg.block_resolutions:
        block = params[f"b{res}"]
        dtype = (jnp.bfloat16 if res >= cfg.bf16_resolution and not force_fp32
                 else jnp.float32)
        num_conv = 1 if res == 4 else 2
        block_ws = [ws[:, w_idx + i] for i in range(num_conv + 1)]
        w_idx += num_conv

        def lrng(name):
            return jax.random.fold_in(rng, _name_fold(name)) if rng is not None else None

        if tail_start is not None and res == tail_start:
            tail = [(res, block_ws)]
            for r2 in resolutions[resolutions.index(res) + 1:]:
                tail.append((r2, [ws[:, w_idx + i] for i in range(3)]))
                w_idx += 2
            if _want_remat(cfg, res) and hooks is None:
                tail_res = tuple(t[0] for t in tail)   # static, closed over
                packed_fn = jax.checkpoint(
                    lambda params, x, img, tail_ws, rng: _packed_tail(
                        cfg, params, x, img, list(zip(tail_res, tail_ws)),
                        noise_mode, rng, None, force_fp32))
                return packed_fn(params, x, img, [t[1] for t in tail], rng)
            return _packed_tail(cfg, params, x, img, tail, noise_mode, rng,
                                hooks, force_fp32)

        def block_fn(block, x, img, block_ws, res=res, dtype=dtype,
                     num_conv=num_conv):
            if res == 4:
                x = jnp.repeat(block["const"].astype(dtype)[None], batch,
                               axis=0)
                x = synthesis_layer_apply(
                    cfg, block["conv1"], x, block_ws[0], res, 1,
                    resample_filter, f"b{res}.conv1", noise_mode,
                    lrng(f"b{res}.conv1"), hooks=hooks)
            else:
                x = x.astype(dtype)
                x = synthesis_layer_apply(
                    cfg, block["conv0"], x, block_ws[0], res, 2,
                    resample_filter, f"b{res}.conv0", noise_mode,
                    lrng(f"b{res}.conv0"), hooks=hooks)
                x = synthesis_layer_apply(
                    cfg, block["conv1"], x, block_ws[1], res, 1,
                    resample_filter, f"b{res}.conv1", noise_mode,
                    lrng(f"b{res}.conv1"), hooks=hooks)

            if img is not None:
                img = upsample2d(img, resample_filter)
            if cfg.architecture == "skip" or res == cfg.img_resolution:
                y = torgb_layer_apply(cfg, block["torgb"], x,
                                      block_ws[num_conv], f"b{res}.torgb",
                                      hooks=hooks)
                y = y.astype(jnp.float32)
                img = y if img is None else img + y
            return x, img

        if _want_remat(cfg, res):
            block_fn = jax.checkpoint(block_fn)
        x, img = block_fn(block, x, img, block_ws)
    return img


def generator_apply(
    cfg: GeneratorConfig,
    params: Params,
    z: jax.Array,
    c: Optional[jax.Array] = None,
    truncation_psi: float = 1.0,
    truncation_cutoff: Optional[int] = None,
    noise_mode: str = "const",
    rng: Optional[jax.Array] = None,
    hooks: Optional[LayerHooks] = None,
    force_fp32: bool = False,
) -> jax.Array:
    ws = mapping_apply(cfg.mapping, params["mapping"], z, c,
                       truncation_psi=truncation_psi,
                       truncation_cutoff=truncation_cutoff)
    return synthesis_apply(cfg.synthesis, params["synthesis"], ws,
                           noise_mode=noise_mode, rng=rng, hooks=hooks,
                           force_fp32=force_fp32)


# ----------------------------------------------------------------------------
# StyleSpace access


def generator_styles(
    cfg: SynthesisConfig,
    params: Params,
    ws: jax.Array,
    hooks: Optional[LayerHooks] = None,
) -> List[jax.Array]:
    """Per-layer style vectors in layer_names() order (S space).

    Mirrors `get_s_code` (`offsets_model.py:407`) — the ToRGB styles include
    the weight_gain factor exactly as the reference's forward does.
    """
    styles = []
    w_idx = 0
    for res in cfg.block_resolutions:
        block = params[f"b{res}"]
        num_conv = 1 if res == 4 else 2
        names = ([f"b{res}.conv1"] if res == 4 else
                 [f"b{res}.conv0", f"b{res}.conv1"])
        for i, name in enumerate(names):
            lp = block[name.split(".")[1]]
            styles.append(_layer_styles(cfg, lp, ws[:, w_idx + i], 1.0, name, hooks))
        if cfg.architecture == "skip" or res == cfg.img_resolution:
            lp = block["torgb"]
            in_ch = lp["weight"].shape[1]
            k = lp["weight"].shape[-1]
            styles.append(_layer_styles(cfg, lp, ws[:, w_idx + num_conv],
                                        1.0 / np.sqrt(in_ch * k ** 2),
                                        f"b{res}.torgb", hooks))
        w_idx += num_conv
    return styles


def synthesis_from_styles(
    cfg: SynthesisConfig,
    params: Params,
    styles: Sequence[jax.Array],
    noise_mode: str = "const",
    rng: Optional[jax.Array] = None,
    hooks: Optional[LayerHooks] = None,
) -> jax.Array:
    """Forward from explicit per-layer S-space styles (`forward_with_s`,
    offsets_model.py:569)."""
    resample_filter = setup_filter(cfg.resample_filter)
    styles = list(styles)
    batch = styles[0].shape[0]

    def layer_fwd(lp, x, s, res, up, name, demodulate=True, gain=1.0):
        weight = _layer_weight(lp, name, hooks)
        noise = None
        if demodulate and cfg.use_noise:
            if noise_mode == "random":
                noise = jax.random.normal(
                    jax.random.fold_in(rng, _name_fold(name)),
                    (x.shape[0], 1, res, res), dtype=jnp.float32,
                ) * lp["noise_strength"]
            elif noise_mode == "const":
                noise = lp["noise_const"] * lp["noise_strength"]
        x = modulated_conv2d(
            x, weight, s, up=up, padding=weight.shape[-1] // 2,
            resample_filter=resample_filter if up > 1 else None,
            demodulate=demodulate, flip_weight=(up == 1))
        if noise is not None:
            x = x + noise.astype(x.dtype)
        if demodulate:
            spec = activation_funcs[cfg.activation]
            return bias_act(x, lp["bias"].astype(x.dtype),
                                      act=cfg.activation,
                                      gain=spec.def_gain * gain,
                                      clamp=cfg.conv_clamp)
        return bias_act(x, lp["bias"].astype(x.dtype),
                                  clamp=cfg.conv_clamp)

    idx = 0
    x = None
    img = None
    for res in cfg.block_resolutions:
        block = params[f"b{res}"]
        if res == 4:
            x = jnp.repeat(block["const"].astype(jnp.float32)[None], batch, axis=0)
            x = layer_fwd(block["conv1"], x, styles[idx], res, 1, f"b{res}.conv1")
            idx += 1
        else:
            x = layer_fwd(block["conv0"], x, styles[idx], res, 2, f"b{res}.conv0")
            idx += 1
            x = layer_fwd(block["conv1"], x, styles[idx], res, 1, f"b{res}.conv1")
            idx += 1
        if img is not None:
            img = upsample2d(img, resample_filter)
        if cfg.architecture == "skip" or res == cfg.img_resolution:
            y = layer_fwd(block["torgb"], x, styles[idx], res, 1,
                          f"b{res}.torgb", demodulate=False)
            idx += 1
            img = y.astype(jnp.float32) if img is None else img + y.astype(jnp.float32)
    return img


# ----------------------------------------------------------------------------
# Discriminator


def minibatch_std(x: jax.Array, group_size: Optional[int],
                  num_channels: int = 1) -> jax.Array:
    """MinibatchStdLayer (reference networks.py:1278-1301)."""
    N, C, H, W = x.shape
    G = min(group_size, N) if group_size is not None else N
    F = num_channels
    c = C // F
    y = x.reshape(G, -1, F, c, H, W).astype(jnp.float32)
    y = y - jnp.mean(y, axis=0)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(2, 3, 4))
    y = y.reshape(-1, F, 1, 1).astype(x.dtype)
    y = jnp.tile(y, (G, 1, H, W))
    return jnp.concatenate([x, y], axis=1)


def discriminator_apply(
    cfg: DiscriminatorConfig,
    params: Params,
    img: jax.Array,
    c: Optional[jax.Array] = None,
    force_fp32: bool = False,
    spatial_constraint=None,
) -> jax.Array:
    """Discriminator forward (reference networks.py:1373-1437).

    ``spatial_constraint`` (parallel.spatial.d_spatial_constraint) is
    applied to every block input activation — it pins large feature maps
    H-sharded over the mesh and replicates small ones (required for
    correctness under spatial sharding; see d_spatial_constraint)."""
    resample_filter = setup_filter(cfg.resample_filter)
    if spatial_constraint is not None:
        img = spatial_constraint(img)

    def _packed_res_core(block, x, dtype):
        """conv0/conv1/skip of a resnet block on the packed grid
        (ops/packed.py): conv0 3x3 -> packed conv; conv1/skip (down=2) ->
        composed packed->unpacked kernels.  ``x`` is the packed input
        [N, 4C, res/2, res/2]; returns the unpacked [N, C_out, res/2, res/2]
        block output."""
        from gagan_tpu.ops import packed as pk

        taps = jnp.asarray(cfg.resample_filter, jnp.float32)
        taps = taps / jnp.sum(taps)
        spec = activation_funcs[cfg.activation]

        def gains(w):
            o, i, kh, kw = w.shape
            return w * (1.0 / np.sqrt(i * kh * kw))

        w = gains(block["conv0"]["weight"])
        y = pk.conv_packed(x, pk.build_packed_conv3x3(w).astype(dtype))
        y = bias_act(y, pk.pack_channel_tile(
            block["conv0"]["bias"]).astype(y.dtype), act=cfg.activation,
            gain=spec.def_gain, clamp=cfg.conv_clamp)

        w = gains(block["conv1"]["weight"])
        y = pk.conv_packed(y, pk.build_packed_downconv(w, taps).astype(dtype))
        g = float(np.sqrt(0.5))
        y = bias_act(y, block["conv1"]["bias"].astype(y.dtype),
                     act=cfg.activation, gain=spec.def_gain * g,
                     clamp=cfg.conv_clamp * g if cfg.conv_clamp else None)

        w = gains(block["skip"]["weight"])
        sk = pk.conv_packed(x, pk.build_packed_down1x1(w, taps).astype(dtype))
        sk = sk * jnp.asarray(g, sk.dtype)
        return sk + y

    def d_first_block_packed(block, img, dtype):
        """First resnet block on the packed grid: fromrgb 1x1 ->
        cell-diagonal conv on pack(img), then the packed conv0/conv1/skip
        core."""
        from gagan_tpu.ops import packed as pk

        spec = activation_funcs[cfg.activation]

        def gains(w):
            o, i, kh, kw = w.shape
            return w * (1.0 / np.sqrt(i * kh * kw))

        img_p = pk.pack(img.astype(dtype))
        w = gains(block["fromrgb"]["weight"])
        x = pk.conv_packed(img_p, pk.build_packed_conv1x1(w).astype(dtype))
        x = bias_act(x, pk.pack_channel_tile(
            block["fromrgb"]["bias"]).astype(x.dtype), act=cfg.activation,
            gain=spec.def_gain, clamp=cfg.conv_clamp)
        return _packed_res_core(block, x, dtype), (
            downsample2d(img, resample_filter)
            if cfg.architecture == "skip" else None)

    def d_head_block_packed(block, x, dtype):
        """A later head block on the packed grid: the unpacked input map is
        packed with a pure transpose (4x the channels at half the spatial
        dims — MXU-friendly at high res / low channel count), then the
        packed conv0/conv1/skip core runs."""
        from gagan_tpu.ops import packed as pk

        return _packed_res_core(block, pk.pack(x.astype(dtype)), dtype)

    def d_block(block, x, img, dtype):
        if x is not None:
            x = x.astype(dtype)
        if "fromrgb" in block:
            img_c = img.astype(dtype)
            y = conv2d_layer_apply(block["fromrgb"], img_c, cfg.activation,
                                   conv_clamp=cfg.conv_clamp)
            x = x + y if x is not None else y
            if cfg.architecture == "skip":
                img = downsample2d(img, resample_filter)
            else:
                img = None
        if cfg.architecture == "resnet":
            y = conv2d_layer_apply(block["skip"], x, "linear", down=2,
                                   resample_filter=resample_filter,
                                   gain=float(np.sqrt(0.5)))
            x = conv2d_layer_apply(block["conv0"], x, cfg.activation,
                                   conv_clamp=cfg.conv_clamp)
            x = conv2d_layer_apply(block["conv1"], x, cfg.activation, down=2,
                                   resample_filter=resample_filter,
                                   conv_clamp=cfg.conv_clamp,
                                   gain=float(np.sqrt(0.5)))
            x = y + x
        else:
            x = conv2d_layer_apply(block["conv0"], x, cfg.activation,
                                   conv_clamp=cfg.conv_clamp)
            x = conv2d_layer_apply(block["conv1"], x, cfg.activation, down=2,
                                   resample_filter=resample_filter,
                                   conv_clamp=cfg.conv_clamp)
        return x, img

    d_block_remat = jax.checkpoint(d_block, static_argnums=(3,))

    x = None
    for bi, res in enumerate(cfg.block_resolutions):
        block = params[f"b{res}"]
        remat_here = _want_remat(cfg, res)
        dtype = (jnp.bfloat16 if res >= cfg.bf16_resolution and not force_fp32
                 else jnp.float32)
        packed_ok = (cfg.packed_first_block and res > 4
                     and cfg.architecture == "resnet"
                     and bi < cfg.packed_head_blocks)
        if packed_ok and res == cfg.img_resolution:
            fb = d_first_block_packed
            if remat_here:
                fb = jax.checkpoint(fb, static_argnums=(2,))
            x, img = fb(block, img, dtype)
            continue
        if packed_ok:
            hb = d_head_block_packed
            if remat_here:
                hb = jax.checkpoint(hb, static_argnums=(2,))
            x = hb(block, x, dtype)
            continue
        if spatial_constraint is not None and x is not None:
            x = spatial_constraint(x)
        x, img = (d_block_remat if remat_here else d_block)(
            block, x, img, dtype)

    if spatial_constraint is not None:
        x = spatial_constraint(x)
    cmap = None
    if cfg.c_dim > 0:
        mcfg = dataclasses.replace(
            cfg.mapping, z_dim=0, c_dim=cfg.c_dim, w_dim=cfg.resolved_cmap_dim,
            num_ws=None, w_avg_beta=None)
        cmap = mapping_apply(mcfg, params["mapping"], None, c, broadcast=False)

    # Epilogue (reference networks.py:1307-1367).
    ep = params["b4"]
    x = x.astype(jnp.float32)
    if cfg.architecture == "skip":
        x = x + conv2d_layer_apply(ep["fromrgb"], img.astype(jnp.float32),
                                   cfg.activation)
    if cfg.mbstd_num_channels > 0:
        x = minibatch_std(x, cfg.mbstd_group_size, cfg.mbstd_num_channels)
    x = conv2d_layer_apply(ep["conv"], x, cfg.activation, conv_clamp=cfg.conv_clamp)
    x = fc_apply(ep["fc"], x.reshape(x.shape[0], -1), activation=cfg.activation)
    x = fc_apply(ep["out"], x)

    if cfg.resolved_cmap_dim > 0:
        x = jnp.sum(x * cmap, axis=1, keepdims=True) * (
            1.0 / np.sqrt(cfg.resolved_cmap_dim))
    return x
