"""FNO1D / SpectralConv1D tests (beyond reference: the reference's PINOODE
trains DeepONet/MLP operators only, src/pino_ode_solve.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neuralpde_tpu import (
    FNO1D, GridTraining, ODEProblem, PINOODE, SpectralConv1D,
    StochasticTraining, solve_pino_gauss_newton, solve_pino_ode,
)
from neuralpde_tpu.nn import mlp


def test_spectral_conv_shapes_and_mode_clip():
    layer = SpectralConv1D(3, 5, modes=64)  # modes > T//2+1: clipped
    params = layer.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (3, 16, 7), jnp.float32)
    y = layer.apply(params, x)
    assert y.shape == (5, 16, 7)
    assert jnp.isfinite(y).all()


def test_spectral_conv_resolution_consistency():
    """rFFT/irFFT normalization is grid-size consistent: a band-limited
    periodic input sampled at T and 2T gives matching outputs at the shared
    nodes (the discretization-invariance property of the FNO layer)."""
    layer = SpectralConv1D(1, 1, modes=4)
    params = layer.init(jax.random.key(2))

    def run(T):
        t = jnp.arange(T) / T          # periodic grid, endpoint excluded
        x = (jnp.sin(2 * jnp.pi * t) + 0.5 * jnp.cos(4 * jnp.pi * t))
        return layer.apply(params, x[None, :, None])[0, :, 0]

    coarse, fine = run(32), run(64)
    np.testing.assert_allclose(np.asarray(coarse), np.asarray(fine[::2]),
                               rtol=0, atol=1e-5)


def test_fno_input_layouts():
    """Parameter columns (C, P) broadcast over the grid; function-valued
    fields (C, T, P) pass through; bad ranks raise."""
    net = FNO1D(in_channels=2, width=8, modes=4, depth=2)
    params = net.init(jax.random.key(0))
    t = jnp.linspace(0.0, 1.0, 17)[None, :]
    p_cols = jax.random.normal(jax.random.key(1), (2, 5), jnp.float32)
    out = net.apply(params, (p_cols, t))
    assert out.shape == (17, 5)
    p_field = jnp.broadcast_to(p_cols[:, None, :], (2, 17, 5))
    out2 = net.apply(params, (p_field, t))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=0, atol=1e-6)
    with pytest.raises(ValueError, match="in_channels"):
        net.apply(params, (p_cols[0], t))


def test_fno_vector_output_shape():
    net = FNO1D(in_channels=1, width=8, modes=4, depth=2, out_channels=3)
    params = net.init(jax.random.key(0))
    t = jnp.linspace(0.0, 1.0, 9)[None, :]
    p = jnp.ones((1, 4), jnp.float32)
    assert net.apply(params, (p, t)).shape == (3, 9, 4)


def test_fno_rejects_stochastic_training():
    prob = ODEProblem(f=lambda u, p, t: jnp.cos(p * t), u0=1.0,
                      tspan=(0.0, 1.0))
    alg = PINOODE(FNO1D(in_channels=1, width=8, modes=4, depth=2),
                  optax.adam(1e-3), bounds=[(0.1, 2.0)],
                  strategy=StochasticTraining(40))
    with pytest.raises(ValueError, match="GridTraining"):
        solve_pino_ode(prob, alg, maxiters=1)


def test_pinoode_fno_family():
    """du/dt = cos(p t) family over p in [0.1, 2] with an FNO operator
    (same family/rtol as the DeepONet test; reference:
    test/PINOODE/pino_ode__example_chain_du_cos_p_t.jl, rtol 0.08)."""
    prob = ODEProblem(f=lambda u, p, t: jnp.cos(p * t), u0=1.0,
                      tspan=(0.0, 1.0))
    chain = FNO1D(in_channels=1, width=16, modes=8, depth=3)
    alg = PINOODE(chain, optax.adam(5e-3), bounds=[(0.1, 2.0)],
                  number_of_parameters=40, strategy=GridTraining(0.05))
    sol = solve_pino_ode(prob, alg, maxiters=3000, inner_steps=25)
    ps = np.linspace(0.2, 1.9, 20)
    ts = np.linspace(0.0, 1.0, 21)     # uniform: the FNO evaluation contract
    pred = np.asarray(sol(ps[None, :], ts[None, :]))  # (T, P)
    want = 1.0 + np.sin(ps[None, :] * ts[:, None]) / ps[None, :]
    rel = np.abs(pred - want) / np.abs(want)
    assert rel.mean() < 0.08


def test_fno_resolution_transfer():
    """A trained FNO evaluates on a finer uniform grid than it trained on
    (21 -> 41 nodes) without retraining — the property DeepONet gets
    pointwise and the FNO gets from discretization invariance."""
    prob = ODEProblem(f=lambda u, p, t: p * u, u0=1.0, tspan=(0.0, 1.0))
    chain = FNO1D(in_channels=1, width=16, modes=8, depth=3)
    alg = PINOODE(chain, optax.adam(5e-3), bounds=[(0.2, 1.0)],
                  number_of_parameters=30, strategy=GridTraining(0.05))
    sol = solve_pino_ode(prob, alg, maxiters=2500, inner_steps=25)
    ps = np.linspace(0.3, 0.9, 10)
    ts = np.linspace(0.0, 1.0, 41)
    pred = np.asarray(sol(ps[None, :], ts[None, :]))
    want = np.exp(ps[None, :] * ts[:, None])
    rel = np.abs(pred - want) / np.abs(want)
    assert rel.mean() < 0.08


def test_fno_gauss_newton_driver():
    """solve_pino_gauss_newton accepts an FNO chain (the residual builder
    goes through the same tuple-input branch)."""
    prob = ODEProblem(f=lambda u, p, t: jnp.cos(p * t), u0=1.0,
                      tspan=(0.0, 1.0))
    chain = FNO1D(in_channels=1, width=8, modes=6, depth=2)
    alg = PINOODE(chain, bounds=[(0.5, 1.5)], number_of_parameters=16,
                  strategy=GridTraining(0.1))
    sol = solve_pino_gauss_newton(prob, alg, maxiters=40)
    ps = np.linspace(0.6, 1.4, 8)
    ts = np.linspace(0.0, 1.0, 11)
    pred = np.asarray(sol(ps[None, :], ts[None, :]))
    want = 1.0 + np.sin(ps[None, :] * ts[:, None]) / ps[None, :]
    rel = np.abs(pred - want) / np.abs(want)
    assert rel.mean() < 0.08


def test_fno_mlp_consistency_ic():
    """The FNO branch reads u(t0) off the first grid row; the grid must
    therefore start at tspan[0] — julia_range does (regression guard)."""
    from neuralpde_tpu.solvers.pino import _grid_trainset
    p, t = _grid_trainset([(0.1, 2.0)], 7, (0.25, 1.0), 0.05, jnp.float32)
    assert float(t[0, 0]) == 0.25
