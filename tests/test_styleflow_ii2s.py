"""StyleFlow CNF invertibility + II2S inversion tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gagan_tpu.editing import styleflow as sf
from gagan_tpu.inversion import ii2s
from gagan_tpu.models import stylegan2 as sg2


@pytest.mark.parametrize("solver", ["dopri5", "rk4"])
def test_cnf_forward_reverse_invertible(solver):
    cfg = sf.StyleFlowConfig(input_dim=16, hidden_dims=(32, 32),
                             context_dim=5, solver=solver, rk4_steps=60)
    params = sf.init_styleflow(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 5))
    z = sf.flow_apply(params, cfg, x, ctx, reverse=False)
    back = sf.flow_apply(params, cfg, z, ctx, reverse=True)
    assert not bool(jnp.allclose(z, x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-3, atol=1e-4)


def _install_torchdiffeq_stub():
    """Register a scipy-backed `torchdiffeq.odeint` so the reference CNF
    modules (which import torchdiffeq at module scope, cnf.py:3-4) can run
    as numeric oracles.  solve_ivp at 1e-8 tolerance approximates the exact
    ODE solution far tighter than either side's 1e-5 solver."""
    import sys
    import types

    import scipy.integrate
    import torch

    def odeint(func, y0, t, rtol=1e-7, atol=1e-9, method=None, options=None):
        shapes = [tuple(s.shape) for s in y0]
        sizes = [int(np.prod(sh)) for sh in shapes]

        def pack(states):
            return np.concatenate(
                [s.detach().numpy().reshape(-1) for s in states])

        def unpack(vec):
            out, i = [], 0
            for sh, n in zip(shapes, sizes):
                out.append(torch.tensor(vec[i:i + n],
                                        dtype=torch.float32).reshape(sh))
                i += n
            return tuple(out)

        def rhs(tt, vec):
            d = func(torch.tensor(float(tt)), unpack(vec))
            return pack(d)

        sol = scipy.integrate.solve_ivp(
            rhs, (float(t[0]), float(t[-1])), pack(tuple(y0)),
            t_eval=[float(x) for x in t], rtol=1e-8, atol=1e-8,
            method="RK45")
        assert sol.success, sol.message
        outs = [unpack(sol.y[:, i]) for i in range(sol.y.shape[1])]
        return tuple(torch.stack([o[k] for o in outs])
                     for k in range(len(y0)))

    mod = types.ModuleType("torchdiffeq")
    mod.odeint = odeint
    mod.odeint_adjoint = odeint
    sys.modules.setdefault("torchdiffeq", mod)


def test_styleflow_parity_vs_reference():
    # Oracle: the reference's own MovingBatchNorm1d/CNF/ODEnet modules
    # (editing/styleflow/{flow,cnf,odefunc,normalization}.py) with the ODE
    # integrated by scipy at 1e-8 tolerance; ours runs the adaptive dopri5
    # at the reference's shipping 1e-5 tolerance after converting the torch
    # state_dict.  The chain is driven module-by-module (the editor also
    # owns the order, editor.py:60-71); both module types share the
    # 5-positional (x, context, logpx, integration_times, reverse)
    # signature (normalization.py:143-147, cnf.py:57).
    import torch

    from tests import oracle  # noqa: F401  (puts SimilarDomains on sys.path)

    _install_torchdiffeq_stub()
    from editing.styleflow.cnf import CNF
    from editing.styleflow.flow import build_model
    from editing.styleflow.normalization import MovingBatchNorm1d

    torch.manual_seed(0)
    cfg = sf.StyleFlowConfig(input_dim=16, hidden_dims=(32, 32),
                             context_dim=5, num_blocks=2)
    model = build_model(cfg.input_dim, cfg.hidden_dims, cfg.context_dim,
                        cfg.num_blocks, True).eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, MovingBatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(0, 0.2)
                m.bias.normal_(0, 0.2)
            if isinstance(m, CNF):
                m.sqrt_end_time.fill_(0.9)

    rng = np.random.RandomState(1)
    x = rng.randn(6, cfg.input_dim).astype(np.float32)
    ctx = rng.randn(6, cfg.context_dim).astype(np.float32)

    def ref_flow(x_np, reverse):
        mods = list(model.chain)
        if reverse:
            mods = mods[::-1]
        h = torch.from_numpy(x_np)
        c = torch.from_numpy(ctx)
        # enable_grad: ODEfunc's divergence estimator needs autograd even
        # though only the y-state is compared.
        with torch.enable_grad():
            for m in mods:
                h = m(h, c, None, None, reverse)
        return h.detach().numpy()

    params = sf.torch_state_to_tree(model.state_dict(), cfg)
    for reverse in (False, True):
        want = ref_flow(x, reverse)
        got = np.asarray(sf.flow_apply(params, cfg, jnp.asarray(x),
                                       jnp.asarray(ctx), reverse=reverse))
        assert not np.allclose(want, x)     # flow does something
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_editor_changes_latents_and_preserves_layers():
    cfg = sf.StyleFlowConfig(input_dim=32, hidden_dims=(64,), context_dim=17,
                             rk4_steps=30)
    params = sf.init_styleflow(jax.random.PRNGKey(0), cfg)
    editor = sf.StyleFlowEditor(params, cfg, num_ws=18)
    w = jax.random.normal(jax.random.PRNGKey(1), (1, 18, 32))
    attrs = np.zeros(8, np.float32)
    light = np.zeros(9, np.float32)
    edited = editor.edit(w, attrs, light, attr_idx=0, edit_power=1.0)
    assert edited.shape == w.shape
    # Gender edit preserves layers 8+ (editor.py:73-74).
    np.testing.assert_allclose(np.asarray(edited[:, 8:]),
                               np.asarray(w[:, 8:]))
    assert not bool(jnp.allclose(edited[:, :8], w[:, :8]))


def test_ii2s_inverts_generated_image():
    g_cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=32, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=2),
        synthesis=sg2.SynthesisConfig(channel_base=1024, channel_max=64))
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    target = sg2.generator_apply(g_cfg, g_params, z, noise_mode="const")

    def pixel_lpips(images):
        x = images.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, x.shape[:2] + (8, 8), method="bilinear")
        return x.reshape(x.shape[0], -1)

    cfg = ii2s.II2SConfig(steps=40, learning_rate=0.05, p_norm_lambda=1e-4,
                          pca_samples=512)
    w = ii2s.invert_image(cfg, g_cfg, g_params,
                          np.asarray(target[0]), lpips_fn=pixel_lpips,
                          key=jax.random.PRNGKey(2))
    assert w.shape == (g_cfg.num_ws, 32)
    recon = sg2.synthesis_apply(g_cfg.synthesis, g_params["synthesis"],
                                jnp.asarray(w)[None], noise_mode="const")
    err = float(jnp.mean(jnp.abs(recon - target)))
    base = float(jnp.mean(jnp.abs(target)))
    assert err < 0.8 * base, (err, base)


def test_pca_model_shapes():
    g_cfg = sg2.GeneratorConfig(
        z_dim=16, w_dim=16, img_resolution=16, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=1),
        synthesis=sg2.SynthesisConfig(channel_base=256, channel_max=16))
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    pca = ii2s.build_pca_model(g_cfg, g_params, jax.random.PRNGKey(1),
                               n_samples=256)
    assert pca["X_mean"].shape == (16,)
    assert pca["X_comp"].shape == (16, 16)
    assert pca["X_stdev"].shape == (16,)
    # p-norm of the mean latent in PCA space is small vs a far-out latent.
    lat_mean = jnp.asarray(pca["X_mean"][None, None])
    # invert leaky5 of the mean: for the prior value only shape matters here
    near = ii2s.p_norm_loss(pca, jnp.zeros((1, 1, 16)), 1.0)
    far = ii2s.p_norm_loss(pca, jnp.full((1, 1, 16), 100.0), 1.0)
    assert float(far) > float(near)
