"""The ADA training step family: jit'd G/D phases with lazy regularization.

TPU-native re-expression of the reference training loop's phase machinery
(`DissimilarDomains/training/training_loop.py:287-537`):

* Phases (Gmain / Greg / Dmain / Dreg) are separate jit'd pure steps; the
  host scheduler runs reg phases every `*_reg_interval` batches exactly like
  the reference's `batch_idx % phase.interval` gating.
* Lazy-regularization hyperparameter scaling (lr * mb_ratio,
  betas ** mb_ratio, training_loop.py:303-312) is applied when building the
  optimizers.
* EMA is a pytree lerp (buffers copied, training_loop.py:514-523); the
  mapping w_avg and pl_mean buffers update functionally from step outputs.
* The ADA p heuristic (training_loop.py:529-535) consumes the step's
  'Loss/signs/real' metric on the host.
* Selective training (requires-grad parts / Freeze-D) is optax.masked over
  the masks from gagan_tpu.train.masks; gradients are nan-scrubbed like
  training_loop.py:508-510.

Data parallelism: every step is pure jnp — jit it with NamedSharding
(params replicated, batch sharded over the 'data' axis) and XLA inserts the
gradient all-reduce; see gagan_tpu.parallel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from gagan_tpu.models import stylegan2 as sg2
from gagan_tpu.train import gan_loss, masks as masks_lib

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    g_lr: float = 0.0025
    d_lr: float = 0.0025
    adam_beta1: float = 0.0
    adam_beta2: float = 0.99
    adam_eps: float = 1e-8
    g_reg_interval: Optional[int] = 4
    d_reg_interval: Optional[int] = 16
    ema_kimg: float = 10.0
    ema_rampup: Optional[float] = None
    ada_target: Optional[float] = None    # None = no ADA adjustment
    ada_interval: int = 4
    ada_kimg: float = 500.0
    batch_size: int = 32                  # global batch (for EMA/ADA rates)
    loss: gan_loss.GANLossConfig = dataclasses.field(
        default_factory=gan_loss.GANLossConfig)
    g_requires_grad_parts: Tuple[str, ...] = ("all",)
    d_requires_grad_parts: Tuple[str, ...] = ("all",)
    freeze_d_layers: int = 0
    # Gradient accumulation: each phase splits its device batch into this
    # many sequential rounds and AVERAGES the gradients.  Deliberate
    # deviation from the reference's batch_size / batch_gpu rounds loop
    # (training_loop.py:496-516), which SUMS per-round gradients
    # (loss.mean().mul(gain).backward() with no division) so its effective
    # gradient scales with the round count.  Averaging keeps the effective
    # step invariant to accum_rounds; to reproduce a reference run that
    # relied on sum semantics, scale the learning rate by the round count.
    # Exact for all losses here since every loss/metric is a per-sample
    # mean.  The reg phases may use a higher round count (R1's
    # double-backward holds ~4x the activations of a main phase).
    accum_rounds: int = 1
    reg_accum_rounds: Optional[int] = None    # default: accum_rounds
    # Per-phase overrides: R1's D double-backward peaks higher than PL's
    # G jvp (which already runs on batch/pl_batch_shrink), so on a memory
    # edge d_reg wants more rounds than g_reg (measured at 1024²/batch 32:
    # g_reg fits at 2 rounds where d_reg needs 4).
    g_reg_accum_rounds: Optional[int] = None  # default: reg_accum_rounds
    d_reg_accum_rounds: Optional[int] = None  # default: reg_accum_rounds
    # Roll the rounds into one lax.scan body (compile time independent of
    # the round count) instead of unrolling them in Python.  Numerics are
    # identical; unrolling lets XLA specialize per round and is fine for
    # 2-3 rounds.
    accum_scan: bool = True
    # Run Gmain+Dmain as one simultaneous update over a shared forward
    # (gan_loss.gd_main_loss): ~20% faster at 1024² on TPU.  Deviation from
    # the reference's alternating schedule — see gd_main_loss's docstring;
    # set False for reference phase semantics.
    simultaneous_main: bool = False
    # GA-GAN in-training refinement (the fork's namesake feature,
    # DissimilarDomains/training/training_loop.py:392-434, threshold kwarg
    # at :199): when set, fakes whose |D(real)-D(fake)| < ga_threshold are
    # replaced by crossed+mutated GA offspring before the D step scores
    # them.  None (default) disables the splice.
    ga_threshold: Optional[float] = None
    ga_mutation_rate: float = 0.1


class TrainState(flax.struct.PyTreeNode):
    g_params: Params
    d_params: Params
    g_ema: Params
    g_opt_state: Any
    d_opt_state: Any
    pl_mean: jax.Array
    ada_p: jax.Array
    cur_nimg: jax.Array                  # image counter
    # Optional offsets parameterization (domain adaptation): trained jointly
    # with the unfrozen generator parts during G phases.
    offsets: Any = None
    offsets_ema: Any = None
    offsets_opt_state: Any = None


def _lazy_scaled_adam(lr: float, betas: Tuple[float, float], eps: float,
                      reg_interval: Optional[int]) -> optax.GradientTransformation:
    if reg_interval is not None:
        mb_ratio = reg_interval / (reg_interval + 1)
        lr = lr * mb_ratio
        betas = tuple(beta ** mb_ratio for beta in betas)
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


def _masked(tx: optax.GradientTransformation, mask: Params):
    """Apply ``tx`` to mask=True leaves, zero updates elsewhere.

    (optax.masked alone passes masked-out gradients through as raw updates,
    which would still modify frozen parameters.)
    """
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)


def _scrub(grads):
    """nan_to_num gradient scrub (training_loop.py:508-510)."""
    return jax.tree.map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), grads)


def _chunk(x, rounds: int, r):
    """Round ``r``'s chunk of the leading (batch) axis.  ``r`` may be a
    traced scalar (the lax.scan carry index)."""
    if x is None or rounds <= 1:
        return x
    if x.shape[0] % rounds:
        raise ValueError(
            f"accumulation rounds ({rounds}) must divide the phase batch "
            f"({x.shape[0]}); a remainder would be silently dropped")
    n = x.shape[0] // rounds
    return jax.lax.dynamic_slice_in_dim(x, r * n, n, axis=0)


def _accum(run_round, rounds: int, key, scan: bool = True):
    """Average the ((loss, metrics), grads) output of ``run_round(r, key_r)``
    over ``rounds`` sequential chunks.  Deviation from the reference rounds
    loop (training_loop.py:496-516), which sums — see TrainConfig.accum_rounds.
    Exact for per-sample-mean losses; with rounds == 1 the caller's key
    passes through untouched.

    ``scan=True`` rolls the rounds into one lax.scan body so compile time
    does not grow with the round count; numerics match the unrolled loop
    (same addition order)."""
    if rounds <= 1:
        return run_round(0, key)
    if not scan:
        acc = None
        for r in range(rounds):
            out = run_round(r, jax.random.fold_in(key, r))
            acc = out if acc is None else jax.tree.map(jnp.add, acc, out)
        return jax.tree.map(lambda x: x / rounds, acc)

    out_shapes = jax.eval_shape(run_round, 0, key)
    init = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), out_shapes)

    def body(acc, r):
        out = run_round(r, jax.random.fold_in(key, r))
        return jax.tree.map(jnp.add, acc, out), None

    acc, _ = jax.lax.scan(body, init, jnp.arange(rounds))
    return jax.tree.map(lambda x: x / rounds, acc)


def build_optimizers(cfg: TrainConfig, g_params: Params, d_params: Params):
    g_mask = masks_lib.generator_mask(g_params, cfg.g_requires_grad_parts)
    d_mask = masks_lib.discriminator_mask(
        d_params, cfg.d_requires_grad_parts, cfg.freeze_d_layers)
    g_tx = _masked(_lazy_scaled_adam(cfg.g_lr, (cfg.adam_beta1, cfg.adam_beta2),
                                     cfg.adam_eps, cfg.g_reg_interval), g_mask)
    d_tx = _masked(_lazy_scaled_adam(cfg.d_lr, (cfg.adam_beta1, cfg.adam_beta2),
                                     cfg.adam_eps, cfg.d_reg_interval), d_mask)
    return g_tx, d_tx, g_mask, d_mask


def init_train_state(cfg: TrainConfig, g_params: Params, d_params: Params,
                     g_tx, d_tx) -> TrainState:
    return TrainState(
        g_params=g_params,
        d_params=d_params,
        # Materialize a copy: aliasing g_params would make XLA see the same
        # buffer donated twice when the step runs with donate_argnums.
        g_ema=jax.tree.map(jnp.copy, g_params),
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
        pl_mean=jnp.zeros((), jnp.float32),
        ada_p=jnp.zeros((), jnp.float32),
        cur_nimg=jnp.zeros((), jnp.int32),
    )


def ema_update(g_params: Params, g_ema: Params, cur_nimg: jax.Array,
               cfg: TrainConfig) -> Params:
    """G_ema lerp; buffers copied outright (training_loop.py:514-523)."""
    ema_nimg = cfg.ema_kimg * 1000.0
    if cfg.ema_rampup is not None:
        ema_nimg = jnp.minimum(ema_nimg, cur_nimg.astype(jnp.float32) *
                               cfg.ema_rampup)
    ema_beta = 0.5 ** (cfg.batch_size / jnp.maximum(ema_nimg, 1e-8))

    flat_p = jax.tree_util.tree_flatten_with_path(g_params)[0]
    flat_e, treedef = jax.tree_util.tree_flatten_with_path(g_ema)
    out = []
    for (path_p, p), (path_e, e) in zip(flat_p, flat_e):
        keys = tuple(getattr(k, "key", str(k)) for k in path_p)
        if masks_lib.is_buffer(keys):
            out.append(p)
        else:
            out.append(p + ema_beta * (e - p))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(g_ema), out)


def make_phase_steps(
    cfg: TrainConfig,
    g_cfg: sg2.GeneratorConfig,
    d_cfg: sg2.DiscriminatorConfig,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    augment_fn: gan_loss.AugmentFn = None,
    offsets_spec=None,
    offsets_tx: Optional[optax.GradientTransformation] = None,
    reg_g_cfg: Optional[sg2.GeneratorConfig] = None,
    reg_d_cfg: Optional[sg2.DiscriminatorConfig] = None,
    extra_hooks=None,
    d_constraint=None,
):
    """Build the four phase step functions (not yet jitted).

    ``extra_hooks`` (a LayerHooks tree, e.g.
    parallel.spatial.spatial_sharding_hooks) is merged after the offsets
    hooks on every G forward — the spatial-sharding entry point.

    With ``offsets_spec``/``offsets_tx`` set, the G phases differentiate
    jointly w.r.t. (g_params, offsets) with the offset hooks applied — the
    domain-adaptation training mode (Affine+/AffineLight+/StyleSpace+,
    reference README.md:149-212 protocol).

    ``reg_g_cfg``/``reg_d_cfg`` override the model configs for the reg
    phases only — apply-time knobs (remat), not parameter structure.  R1's
    double-backward peaks well above the main phases, so on a memory edge
    the best configuration runs the main phases un-remat'd and only the
    d_reg phase with remat (measured at 1024²: main phases are 14-17%
    faster without remat, while R1 OOMs without it).
    """
    lcfg = cfg.loss
    reg_g_cfg = reg_g_cfg or g_cfg
    reg_d_cfg = reg_d_cfg or d_cfg
    if offsets_spec is not None:
        from gagan_tpu.params import offsets as offs_lib

        def make_offsets_hooks(offsets):
            return offs_lib.make_hooks(offsets_spec, offsets)
    else:
        def make_offsets_hooks(offsets):
            return None

    if extra_hooks:
        from gagan_tpu.parallel.spatial import merge_hooks

        def make_hooks(offsets):
            return merge_hooks(make_offsets_hooks(offsets), extra_hooks)
    else:
        make_hooks = make_offsets_hooks

    main_rounds = max(cfg.accum_rounds, 1)
    reg_default = cfg.reg_accum_rounds or cfg.accum_rounds
    g_reg_rounds = max(cfg.g_reg_accum_rounds or reg_default, 1)
    d_reg_rounds = max(cfg.d_reg_accum_rounds or reg_default, 1)

    def g_main_step(state: TrainState, z, c, key):
        def run_round(r, k):
            def loss_fn(g_params, offsets):
                return gan_loss.g_main_loss(
                    lcfg, g_cfg, d_cfg, g_params, state.d_params,
                    _chunk(z, main_rounds, r), _chunk(c, main_rounds, r), k,
                    augment_fn=augment_fn, ada_p=state.ada_p,
                    hooks=make_hooks(offsets))

            return jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.g_params, state.offsets)

        (loss, metrics), grads = _accum(run_round, main_rounds, key, scan=cfg.accum_scan)
        g_grads = _scrub(grads[0])
        updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                           state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        state = state.replace(g_params=g_params, g_opt_state=g_opt_state)
        if offsets_tx is not None:
            o_grads = _scrub(grads[1])
            o_updates, o_opt_state = offsets_tx.update(
                o_grads, state.offsets_opt_state, state.offsets)
            state = state.replace(
                offsets=optax.apply_updates(state.offsets, o_updates),
                offsets_opt_state=o_opt_state)
        # Functional w_avg update (networks.py:824-827).
        g_params = state.g_params
        if g_cfg.mapping.w_avg_beta is not None:
            beta = g_cfg.mapping.w_avg_beta
            w_avg = g_params["mapping"]["w_avg"]
            mean_w = metrics.pop("aux/mean_w")
            g_params["mapping"]["w_avg"] = mean_w + beta * (w_avg - mean_w)
            state = state.replace(g_params=g_params)
        else:
            metrics.pop("aux/mean_w", None)
        return state, metrics

    def g_reg_step(state: TrainState, z, c, key):
        gain = float(cfg.g_reg_interval or 1)

        def run_round(r, k):
            def loss_fn(g_params, offsets):
                loss, metrics = gan_loss.g_pl_loss(
                    lcfg, reg_g_cfg, g_params, _chunk(z, g_reg_rounds, r),
                    _chunk(c, g_reg_rounds, r), k, state.pl_mean,
                    hooks=make_hooks(offsets))
                return loss * gain, metrics

            return jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.g_params, state.offsets)

        (_, metrics), grads = _accum(run_round, g_reg_rounds, key, scan=cfg.accum_scan)
        g_grads = _scrub(grads[0])
        updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                           state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        state = state.replace(g_params=g_params, g_opt_state=g_opt_state)
        if offsets_tx is not None:
            o_grads = _scrub(grads[1])
            o_updates, o_opt_state = offsets_tx.update(
                o_grads, state.offsets_opt_state, state.offsets)
            state = state.replace(
                offsets=optax.apply_updates(state.offsets, o_updates),
                offsets_opt_state=o_opt_state)
        pl_mean = metrics.pop("aux/pl_mean")
        return state.replace(pl_mean=pl_mean), metrics

    def gd_main_step(state: TrainState, real_img, real_c, z, gen_c, key):
        """Simultaneous Gmain+Dmain over one shared forward
        (gan_loss.gd_main_loss; enabled by cfg.simultaneous_main)."""
        def run_round(r, k):
            def loss_fn(g_params, offsets, d_params):
                return gan_loss.gd_main_loss(
                    lcfg, g_cfg, d_cfg, g_params, d_params,
                    _chunk(real_img, main_rounds, r),
                    _chunk(real_c, main_rounds, r),
                    _chunk(z, main_rounds, r), _chunk(gen_c, main_rounds, r),
                    k, augment_fn=augment_fn, ada_p=state.ada_p,
                    hooks=make_hooks(offsets),
                    ga_threshold=cfg.ga_threshold,
                    ga_mutation_rate=cfg.ga_mutation_rate,
                    d_constraint=d_constraint)

            return jax.value_and_grad(loss_fn, argnums=(0, 1, 2),
                                      has_aux=True)(
                state.g_params, state.offsets, state.d_params)

        (_, metrics), grads = _accum(run_round, main_rounds, key,
                                     scan=cfg.accum_scan)
        g_grads, o_grads, d_grads = grads
        updates, g_opt_state = g_tx.update(_scrub(g_grads),
                                           state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        d_updates, d_opt_state = d_tx.update(_scrub(d_grads),
                                             state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        state = state.replace(g_params=g_params, g_opt_state=g_opt_state,
                              d_params=d_params, d_opt_state=d_opt_state)
        if offsets_tx is not None:
            o_updates, o_opt_state = offsets_tx.update(
                _scrub(o_grads), state.offsets_opt_state, state.offsets)
            state = state.replace(
                offsets=optax.apply_updates(state.offsets, o_updates),
                offsets_opt_state=o_opt_state)
        g_params = state.g_params
        if g_cfg.mapping.w_avg_beta is not None:
            beta = g_cfg.mapping.w_avg_beta
            w_avg = g_params["mapping"]["w_avg"]
            mean_w = metrics.pop("aux/mean_w")
            g_params["mapping"]["w_avg"] = mean_w + beta * (w_avg - mean_w)
            state = state.replace(g_params=g_params)
        else:
            metrics.pop("aux/mean_w", None)
        return state, metrics

    def d_main_step(state: TrainState, real_img, real_c, z, gen_c, key):
        def run_round(r, k):
            def loss_fn(d_params):
                return gan_loss.d_main_loss(
                    lcfg, g_cfg, d_cfg, state.g_params, d_params,
                    _chunk(real_img, main_rounds, r),
                    _chunk(real_c, main_rounds, r),
                    _chunk(z, main_rounds, r), _chunk(gen_c, main_rounds, r),
                    k, augment_fn=augment_fn, ada_p=state.ada_p,
                    hooks=make_hooks(state.offsets),
                    ga_threshold=cfg.ga_threshold,
                    ga_mutation_rate=cfg.ga_mutation_rate,
                    d_constraint=d_constraint)

            return jax.value_and_grad(loss_fn, has_aux=True)(state.d_params)

        (_, metrics), grads = _accum(run_round, main_rounds, key, scan=cfg.accum_scan)
        grads = _scrub(grads)
        updates, d_opt_state = d_tx.update(grads, state.d_opt_state,
                                           state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        return state.replace(d_params=d_params, d_opt_state=d_opt_state), metrics

    def d_reg_step(state: TrainState, real_img, real_c, key):
        gain = float(cfg.d_reg_interval or 1)

        def run_round(r, k):
            def loss_fn(d_params):
                loss, metrics = gan_loss.d_r1_loss(
                    lcfg, reg_d_cfg, d_params, _chunk(real_img, d_reg_rounds, r),
                    _chunk(real_c, d_reg_rounds, r), k,
                    augment_fn=augment_fn, ada_p=state.ada_p,
                    d_constraint=d_constraint)
                return loss * gain, metrics

            return jax.value_and_grad(loss_fn, has_aux=True)(state.d_params)

        (_, metrics), grads = _accum(run_round, d_reg_rounds, key, scan=cfg.accum_scan)
        grads = _scrub(grads)
        updates, d_opt_state = d_tx.update(grads, state.d_opt_state,
                                           state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        return state.replace(d_params=d_params, d_opt_state=d_opt_state), metrics

    return g_main_step, g_reg_step, d_main_step, d_reg_step, gd_main_step


def make_fused_step(
    cfg: TrainConfig,
    g_cfg: sg2.GeneratorConfig,
    d_cfg: sg2.DiscriminatorConfig,
    g_tx,
    d_tx,
    augment_fn: gan_loss.AugmentFn = None,
    do_g_reg: bool = True,
    do_d_reg: bool = True,
    offsets_spec=None,
    offsets_tx=None,
    reg_g_cfg=None,
    reg_d_cfg=None,
    extra_hooks=None,
    d_constraint=None,
):
    """One batch = Gmain [+Greg] + Dmain [+Dreg] + EMA + nimg bump.

    The reg flags are static so the scheduler gets at most four compiled
    variants; `cur_nimg` advances by cfg.batch_size (the global batch).
    """
    g_main, g_reg, d_main, d_reg, gd_main = make_phase_steps(
        cfg, g_cfg, d_cfg, g_tx, d_tx, augment_fn,
        offsets_spec=offsets_spec, offsets_tx=offsets_tx,
        reg_g_cfg=reg_g_cfg, reg_d_cfg=reg_d_cfg, extra_hooks=extra_hooks,
        d_constraint=d_constraint)

    def step(state: TrainState, real_img, real_c, z, gen_c, key):
        keys = jax.random.split(key, 4)
        metrics: Dict[str, jax.Array] = {}
        if cfg.simultaneous_main:
            state, m = gd_main(state, real_img, real_c, z, gen_c, keys[0])
            metrics.update(m)
            if do_g_reg and cfg.g_reg_interval is not None:
                state, m = g_reg(state, z, gen_c, keys[1])
                metrics.update(m)
            if do_d_reg and cfg.d_reg_interval is not None:
                state, m = d_reg(state, real_img, real_c, keys[3])
                metrics.update(m)
            cur_nimg = state.cur_nimg + cfg.batch_size
            g_ema = ema_update(state.g_params, state.g_ema, cur_nimg, cfg)
            state = state.replace(g_ema=g_ema, cur_nimg=cur_nimg)
            if state.offsets is not None and state.offsets_ema is not None:
                ema_nimg = cfg.ema_kimg * 1000.0
                if cfg.ema_rampup is not None:
                    ema_nimg = jnp.minimum(
                        ema_nimg,
                        cur_nimg.astype(jnp.float32) * cfg.ema_rampup)
                beta = 0.5 ** (cfg.batch_size / jnp.maximum(ema_nimg, 1e-8))
                state = state.replace(offsets_ema=jax.tree.map(
                    lambda p, e: p + beta * (e - p), state.offsets,
                    state.offsets_ema))
            return state, metrics
        state, m = g_main(state, z, gen_c, keys[0])
        metrics.update(m)
        if do_g_reg and cfg.g_reg_interval is not None:
            state, m = g_reg(state, z, gen_c, keys[1])
            metrics.update(m)
        state, m = d_main(state, real_img, real_c, z, gen_c, keys[2])
        metrics.update(m)
        if do_d_reg and cfg.d_reg_interval is not None:
            state, m = d_reg(state, real_img, real_c, keys[3])
            metrics.update(m)
        cur_nimg = state.cur_nimg + cfg.batch_size
        g_ema = ema_update(state.g_params, state.g_ema, cur_nimg, cfg)
        state = state.replace(g_ema=g_ema, cur_nimg=cur_nimg)
        if state.offsets is not None and state.offsets_ema is not None:
            ema_nimg = cfg.ema_kimg * 1000.0
            if cfg.ema_rampup is not None:
                ema_nimg = jnp.minimum(
                    ema_nimg, cur_nimg.astype(jnp.float32) * cfg.ema_rampup)
            beta = 0.5 ** (cfg.batch_size / jnp.maximum(ema_nimg, 1e-8))
            state = state.replace(offsets_ema=jax.tree.map(
                lambda p, e: p + beta * (e - p), state.offsets,
                state.offsets_ema))
        return state, metrics

    return step


def ada_update(cfg: TrainConfig, ada_p, real_signs_mean: float):
    """ADA p adjustment, executed on host every ada_interval batches
    (training_loop.py:529-535)."""
    import numpy as np

    adjust = np.sign(real_signs_mean - cfg.ada_target) * (
        cfg.batch_size * cfg.ada_interval) / (cfg.ada_kimg * 1000)
    return np.clip(float(ada_p) + adjust, 0.0, 1.0)
