"""Deep Ritz (variational energy-minimization) solver — beyond reference.

Anchored by: the energy minimizer is the weak solution, so the trained
field must match the same analytic solutions the strong-form tests use.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from neuralpde_tpu import (
    DeepRitz, DepVar, Differential, Domain, Eq, GridTraining, Interval,
    PDESystem, StochasticTraining, Sym, Transformed, discretize_ritz, mlp,
    solve, symbols,
)
from neuralpde_tpu.symbolic.expr import cos, sin


def test_1d_poisson_energy_matches_analytic():
    # -u'' = pi^2 sin(pi x), u(0)=u(1)=0  ->  u = sin(pi x)
    # E[u] = int 1/2 u'^2 - pi^2 sin(pi x) u
    x = Sym("x")
    u = DepVar("u")
    Dx = Differential(x)
    energy = 0.5 * Dx(u(x)) ** 2 - (np.pi**2) * sin(np.pi * x) * u(x)
    bcs = [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0)]
    sys = PDESystem([], bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])
    alg = DeepRitz(mlp([1, 24, 24, 1]), energy,
                   strategy=StochasticTraining(2048), bc_weight=500.0,
                   dtype=jnp.float32, seed=0)
    prob = discretize_ritz(sys, alg)
    res = solve(prob, optax.adam(3e-3), maxiters=3000)
    xs = np.linspace(0, 1, 101)
    up = np.asarray(prob.pinnrep.phi(jnp.asarray(xs, jnp.float32)[None, :],
                                     res.params["depvar"])).ravel()
    rel = np.linalg.norm(up - np.sin(np.pi * xs)) / np.linalg.norm(
        np.sin(np.pi * xs))
    assert rel < 5e-2, rel
    # the converged energy approximates the true minimum E* = -pi^2/4;
    # res.aux["energy"] is a single 2048-point Monte-Carlo estimate, whose
    # sampling std at this batch size is ~0.1
    assert abs(float(res.aux["energy"]) - (-np.pi**2 / 4)) < 0.25


def test_2d_poisson_energy_hard_constrained_grid():
    # -Δu = 2 pi^2 sin sin with EXACT BCs: pure energy minimization, no
    # penalty terms at all
    x, y = symbols("x y")
    u = DepVar("u")
    Dx, Dy = Differential(x), Differential(y)
    f = 2 * np.pi**2 * sin(np.pi * x) * sin(np.pi * y)
    energy = (0.5 * (Dx(u(x, y)) ** 2 + Dy(u(x, y)) ** 2)
              - f * u(x, y))
    sys = PDESystem([], [], [Domain(x, Interval(0, 1)),
                             Domain(y, Interval(0, 1))], [x, y], [u(x, y)])
    hard = lambda c, o: c[0:1] * (1 - c[0:1]) * c[1:2] * (1 - c[1:2]) * o
    alg = DeepRitz(Transformed(mlp([2, 32, 32, 1]), hard), energy,
                   strategy=GridTraining(1 / 48), dtype=jnp.float32, seed=1)
    prob = discretize_ritz(sys, alg)
    res = solve(prob, optax.adam(3e-3), maxiters=3000)
    xs = np.linspace(0, 1, 65)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    cord = jnp.asarray(np.stack([X.ravel(), Y.ravel()]), jnp.float32)
    up = np.asarray(prob.pinnrep.phi(cord, res.params["depvar"])).ravel()
    ua = (np.sin(np.pi * X) * np.sin(np.pi * Y)).ravel()
    rel = np.linalg.norm(up - ua) / np.linalg.norm(ua)
    assert rel < 5e-2, rel


def test_neumann_natural_bc_needs_no_bc_equation():
    """The variational form's signature feature: homogeneous Neumann BCs
    are NATURAL — the energy minimizer satisfies u'(0)=u'(1)=0 without any
    boundary equation.  -u'' + u = (1+pi^2) cos(pi x) has the unique
    solution u = cos(pi x) with u'(0)=u'(1)=0; energy
    E = int 1/2 u'^2 + 1/2 u^2 - f u needs NO BCs at all (the +u^2 term
    fixes the gauge)."""
    x = Sym("x")
    u = DepVar("u")
    Dx = Differential(x)
    f = (1 + np.pi**2) * cos(np.pi * x)
    energy = 0.5 * Dx(u(x)) ** 2 + 0.5 * u(x) ** 2 - f * u(x)
    sys = PDESystem([], [], [Domain(x, Interval(0, 1))], [x], [u(x)])
    alg = DeepRitz(mlp([1, 24, 24, 1]), energy,
                   strategy=GridTraining(1 / 128), dtype=jnp.float32, seed=2)
    prob = discretize_ritz(sys, alg)
    res = solve(prob, optax.adam(3e-3), maxiters=3000)
    xs = np.linspace(0, 1, 101)
    up = np.asarray(prob.pinnrep.phi(jnp.asarray(xs, jnp.float32)[None, :],
                                     res.params["depvar"])).ravel()
    ua = np.cos(np.pi * xs)
    rel = np.linalg.norm(up - ua) / np.linalg.norm(ua)
    assert rel < 5e-2, rel
    # the natural BC emerged: du/dx ~ 0 at both ends
    h = 1e-3
    for t in (0.0, 1.0):
        pts = jnp.asarray([[t, t + h] if t == 0.0 else [t - h, t]],
                          jnp.float32)
        v = np.asarray(prob.pinnrep.phi(pts, res.params["depvar"])).ravel()
        slope = (v[1] - v[0]) / h
        assert abs(slope) < 0.15, (t, slope)


def test_errors():
    x = Sym("x")
    u = DepVar("u")
    with pytest.raises(TypeError, match="symbolic Expr"):
        DeepRitz(mlp([1, 8, 1]), energy="not an expr")
    energy = u(x) ** 2
    sys = PDESystem([], [], [Domain(x, Interval(0, 1))], [x], [u(x)])
    from neuralpde_tpu import QuadratureTraining

    alg = DeepRitz(mlp([1, 8, 1]), energy, strategy=QuadratureTraining())
    with pytest.raises(TypeError, match="GridTraining or StochasticTraining"):
        discretize_ritz(sys, alg)
    from neuralpde_tpu import MiniMaxAdaptiveLoss

    with pytest.raises(ValueError, match="adaptive_loss"):
        DeepRitz(mlp([1, 8, 1]), energy,
                 adaptive_loss=MiniMaxAdaptiveLoss(reweight_every=5))


def test_robin_bc_via_boundary_energy():
    """Robin conditions with NO boundary equation (VERDICT r2 item 6): for
    -u'' = f with  -u'(0)+u(0) = g0,  u'(1)+u(1) = g1  the functional

        E[u] = ∫ ½u'² - f·u dx  +  ½u(0)² - g0·u(0)  +  ½u(1)² - g1·u(1)

    has the Robin problem as its Euler-Lagrange system.  Target
    u* = cos(πx): f = π²cos(πx), g0 = 1, g1 = -1."""
    import optax

    from neuralpde_tpu import cos, solve

    x = Sym("x")
    u = DepVar("u")
    Dx = Differential(x)
    f = (np.pi ** 2) * cos(np.pi * x)
    energy = 0.5 * Dx(u(x)) ** 2 - f * u(x)
    boundary = [0.5 * u(0.0) ** 2 - 1.0 * u(0.0),
                0.5 * u(1.0) ** 2 - (-1.0) * u(1.0)]
    sys = PDESystem([], [], [Domain(x, Interval(0, 1))], [x], [u(x)])
    alg = DeepRitz(mlp([1, 32, 32, 1]), energy, boundary_energies=boundary,
                   strategy=GridTraining(1 / 256))
    prob = discretize_ritz(sys, alg)
    r1 = solve(prob, optax.adam(3e-3), maxiters=6000, inner_steps=100)
    res = solve(prob.with_params(r1.u), optax.lbfgs(), maxiters=500,
                inner_steps=50)
    xs = np.linspace(0, 1, 101)
    pred = np.asarray(prob.pinnrep.phi(jnp.asarray(xs)[None, :],
                                       res.u["depvar"])[0])
    want = np.cos(np.pi * xs)
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 0.02, rel
    # both Robin conditions hold without ever being imposed as equations
    h = 1e-4
    up0 = float((prob.pinnrep.phi(jnp.asarray([[h]]), res.u["depvar"])[0, 0]
                 - prob.pinnrep.phi(jnp.asarray([[0.0]]),
                                    res.u["depvar"])[0, 0]) / h)
    u0 = float(prob.pinnrep.phi(jnp.asarray([[0.0]]), res.u["depvar"])[0, 0])
    assert abs(-up0 + u0 - 1.0) < 0.1, (-up0 + u0)


def test_boundary_energy_2d_face_and_grid_mode():
    """A 2-D boundary energy on the x=1 face lowers over the y-span (|Γ|=1)
    and composes with GridTraining energy collocation."""
    import optax

    from neuralpde_tpu import GridTraining, solve
    from neuralpde_tpu import symbols as _symbols

    x, y = _symbols("x y")
    u = DepVar("u")
    Dx, Dy = Differential(x), Differential(y)
    energy = 0.5 * (Dx(u(x, y)) ** 2 + Dy(u(x, y)) ** 2)
    face = 0.5 * u(1.0, y) ** 2 - y * u(1.0, y)
    sys = PDESystem([], [Eq(u(0.0, y), 0.0)],
                    [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                    [x, y], [u(x, y)])
    alg = DeepRitz(mlp([2, 16, 1]), energy, boundary_energies=[face],
                   strategy=GridTraining(1 / 16))
    prob = discretize_ritz(sys, alg)
    res = solve(prob, optax.adam(5e-3), maxiters=200, inner_steps=25)
    assert np.isfinite(float(res.objective))
    assert float(res.objective) < float(res.history[0])

    with pytest.raises(TypeError, match="symbolic Expr"):
        DeepRitz(mlp([1, 8, 1]), u(x) ** 2, boundary_energies=["nope"])
