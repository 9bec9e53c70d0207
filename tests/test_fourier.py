"""Random Fourier feature embedding (beyond reference: the standard remedy
for the spectral bias of coordinate MLPs — Tancik et al. 2020).  The
reference has no embedding layers; this is a TPU-era capability addition on
the same Chain substrate, so it composes with every solver and derivative
backend."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, FourierFeatures, GridTraining,
    Interval, PDESystem, PhysicsInformedNN, discretize, mlp, symbols, solve,
)


def test_embedding_shapes_and_export():
    ff = FourierFeatures(3, 8, sigma=2.0)
    assert ff.in_dim == 3 and ff.out_dim == 16
    p = ff.init(jax.random.key(0))
    assert p["B"].shape == (8, 3)
    x = jnp.ones((3, 5))
    y = ff.apply(p, x)
    assert y.shape == (16, 5)
    # sin/cos structure: sin² + cos² = 1 per frequency
    np.testing.assert_allclose(np.asarray(y[:8] ** 2 + y[8:] ** 2), 1.0,
                               atol=1e-6)
    chain = mlp([2, 16, 1], fourier_features=4, fourier_sigma=1.5)
    assert chain.layers[0].out_dim == 8
    params = chain.init(jax.random.key(1))
    assert chain.apply(params, jnp.zeros((2, 7))).shape == (1, 7)


def test_embedding_jvp_exact():
    """Forward-mode derivative of the embedding matches the analytic one —
    the PINN derivative pipeline (jvp/jet) sees exact frequencies."""
    ff = FourierFeatures(2, 5, sigma=1.3)
    p = ff.init(jax.random.key(1))
    x = jax.random.uniform(jax.random.key(2), (2, 7))
    tangent = jnp.zeros_like(x).at[0, :].set(1.0)
    got = jax.jvp(lambda z: ff.apply(p, z), (x,), (tangent,))[1]
    proj = 2 * jnp.pi * p["B"] @ x
    b0 = 2 * jnp.pi * p["B"][:, 0:1]
    want = jnp.concatenate([b0 * jnp.cos(proj), -b0 * jnp.sin(proj)], axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_embedding_matrix_is_fixed():
    """B rides the params pytree but must never train (Tancik recipe):
    its gradient is exactly zero, so Adam/L-BFGS leave it in place."""
    chain = mlp([1, 8, 1], fourier_features=4)
    params = chain.init(jax.random.key(0))
    x = jnp.linspace(0, 1, 9)[None, :]
    g = jax.grad(lambda p: jnp.sum(chain.apply(p, x) ** 2))(params)
    assert float(jnp.max(jnp.abs(g["layer_0"]["B"]))) == 0.0
    nonzero = float(jnp.max(jnp.abs(g["layer_1"]["weight"])))
    assert nonzero > 0.0  # the trainable layers do receive gradient


def test_high_frequency_poisson_rff_beats_plain():
    """Spectral-bias benchmark: u'' = -(4π)² sin(4πx) on [0,1].  At equal
    iteration budget the Fourier-embedded net must fit the 4-period solution
    markedly better than the plain tanh MLP (measured margin ~6x at 1500
    iters; asserted loosely here at a reduced budget)."""
    a = 4.0
    x = symbols("x")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    eq = Eq(Dxx(u(x)), -((a * np.pi) ** 2) * npde.sin(a * np.pi * x))
    bcs = [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])
    cord = jnp.linspace(0, 1, 101)[None, :]
    want = jnp.sin(a * np.pi * cord[0])

    errs = {}
    for name, chain in [
            ("plain", mlp([1, 32, 32, 1])),
            ("rff", mlp([1, 32, 32, 1], fourier_features=16,
                        fourier_sigma=2.0))]:
        prob = discretize(system, PhysicsInformedNN(chain, GridTraining(0.01)))
        res = solve(prob, optax.adam(2e-3), maxiters=1500)
        pred = prob.pinnrep.phi(cord, res.u["depvar"])[0]
        errs[name] = float(jnp.max(jnp.abs(pred - want)))
    assert errs["rff"] < 0.15, errs
    assert errs["rff"] < 0.5 * errs["plain"], errs


def test_transformed_hard_constraint():
    """Transformed imposes Dirichlet BCs exactly: boundary values are
    identically zero, bc losses vanish at init, and training spends its
    budget on the interior physics (converges in few iterations)."""
    from neuralpde_tpu import Transformed

    x, y = symbols("x y")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    Dyy = Differential(y) ** 2
    eq = Eq(Dxx(u(x, y)) + Dyy(u(x, y)),
            -npde.sin(np.pi * x) * npde.sin(np.pi * y))
    bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
           Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    net = Transformed(
        mlp([2, 24, 24, 1]),
        lambda c, out: c[0:1] * (1 - c[0:1]) * c[1:2] * (1 - c[1:2]) * out)
    disc = PhysicsInformedNN(net, GridTraining(0.05), derivative="jet")
    prob = discretize(system, disc)

    # boundary exactness at init
    ys = jnp.linspace(0, 1, 7)
    edge = jnp.stack([jnp.zeros_like(ys), ys])
    vals = disc.phi(edge, prob.init_params["depvar"])
    assert float(jnp.max(jnp.abs(vals))) == 0.0
    # bc losses are identically zero
    key = jax.random.key(0)
    for lf in prob.pinnrep.loss_functions.bc_loss_functions:
        assert float(lf(prob.init_params, key)) == 0.0

    res = solve(prob, optax.adam(2e-2), maxiters=800)
    cord = jnp.stack([jnp.full((9,), 0.5), jnp.linspace(0.1, 0.9, 9)])
    pred = disc.phi(cord, res.u["depvar"])[0]
    want = (jnp.sin(np.pi * 0.5) * jnp.sin(np.pi * cord[1])
            / (2 * np.pi**2))
    assert float(jnp.max(jnp.abs(pred - want))) < 0.01


def test_periodic_embedding_exact_periodicity():
    """PeriodicEmbedding makes any downstream net exactly periodic in the
    embedded axis: value AND derivative match at the two domain edges to
    float rounding, so periodic BC losses vanish (~1e-14)."""
    from neuralpde_tpu import Chain, PeriodicEmbedding

    emb = PeriodicEmbedding(2, axis=0, period=2.0, n_modes=4)
    assert emb.out_dim == 1 + 8
    net = Chain(emb, *mlp([9, 16, 1]).layers)
    p = net.init(jax.random.key(0))
    t = jnp.linspace(0, 1, 5)
    lo = jnp.stack([jnp.full_like(t, -1.0), t])
    hi = jnp.stack([jnp.full_like(t, 1.0), t])
    val_err = float(jnp.max(jnp.abs(net.apply(p, lo) - net.apply(p, hi))))
    tang = jnp.zeros((2, 5)).at[0].set(1.0)
    g_lo = jax.jvp(lambda c: net.apply(p, c), (lo,), (tang,))[1]
    g_hi = jax.jvp(lambda c: net.apply(p, c), (hi,), (tang,))[1]
    slope_err = float(jnp.max(jnp.abs(g_lo - g_hi)))
    # float64 under the test conftest: periodicity to ~1e-15; the squared
    # BC losses are then ~1e-30
    assert val_err < 1e-12 and slope_err < 1e-11, (val_err, slope_err)


def test_gradient_enhanced_residual():
    """gPINN (gradient_enhanced=w): PDE residuals grow one √w·∂f/∂x_i row
    per independent variable (exact jvp — verified against FD), BCs stay
    untouched, and training still converges."""
    x = symbols("x")
    u = DepVar("u")
    eq = Eq((Differential(x) ** 2)(u(x)), -np.pi**2 * npde.sin(np.pi * x))
    system = PDESystem(eq, [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0)],
                       [Domain(x, Interval(0, 1))], [x], [u(x)])
    w = 0.09
    disc = PhysicsInformedNN(mlp([1, 16, 1]), GridTraining(0.05),
                             gradient_enhanced=w)
    prob = discretize(system, disc)
    f = prob.pinnrep.loss_functions.datafree_pde_loss_functions[0]
    theta = prob.init_params
    cord = jnp.linspace(0.1, 0.9, 9)[None, :]
    out = f(cord, theta)
    assert out.shape[0] == 2  # residual + one gradient row

    # the gradient row is sqrt(w) * d(residual)/dx — check against FD
    h = 1e-5
    plain = PhysicsInformedNN(mlp([1, 16, 1]), GridTraining(0.05), seed=0)
    prob0 = discretize(system, plain)
    f0 = prob0.pinnrep.loss_functions.datafree_pde_loss_functions[0]
    th0 = prob0.init_params
    fd = np.atleast_2d((f0(cord + h, th0) - f0(cord - h, th0)) / (2 * h))
    probw = discretize(system, PhysicsInformedNN(mlp([1, 16, 1]),
                                                 GridTraining(0.05), seed=0,
                                                 gradient_enhanced=w))
    fw = probw.pinnrep.loss_functions.datafree_pde_loss_functions[0]
    got = fw(cord, probw.init_params)[1]
    np.testing.assert_allclose(np.asarray(got).ravel(),
                               np.sqrt(w) * np.asarray(fd).ravel(), atol=1e-5)

    # bc residuals untouched (single row)
    bc = prob.pinnrep.loss_functions.datafree_bc_loss_functions[0]
    assert jnp.atleast_2d(bc(jnp.zeros((1, 3)), theta)).shape[0] == 1

    res = solve(prob, optax.adam(2e-2), maxiters=500)
    cord_e = jnp.linspace(0, 1, 21)[None, :]
    pred = prob.pinnrep.phi(cord_e, res.u["depvar"])[0]
    assert float(jnp.max(jnp.abs(pred - jnp.sin(np.pi * cord_e[0])))) < 0.1
