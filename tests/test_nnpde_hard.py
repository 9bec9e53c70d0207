"""Hard forward-PDE cases from the reference suite: the 4-depvar
heterogeneous system with permuted inputs (nnpde__pde_i_heterogeneous_system.jl)
and 4th-order Kuramoto-Sivashinsky (docs/src/examples/ks.md)."""

import numpy as np
import jax.numpy as jnp
import optax
import pytest

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, GridTraining, Interval, PDESystem,
    PhysicsInformedNN, discretize, mlp, solve, symbols,
)


def test_heterogeneous_system_permuted_inputs():
    """u(x,y,z), v(y,x) [permuted!], h(z), p(x,z) coupled in one equation
    (reference: test/NNPDE1/nnpde__pde_i_heterogeneous_system.jl)."""
    x, y, z = symbols("x y z")
    u, v, h, p = DepVar("u"), DepVar("v"), DepVar("h"), DepVar("p")
    Dz = Differential(z)
    eqs = [
        Eq(u(x, y, z), x + y + z),
        Eq(v(y, x), x**2 + y**2),
        Eq(h(z), npde.cos(z)),
        Eq(p(x, z), npde.exp(x) * npde.exp(z)),
        Eq(u(x, y, z) + v(y, x) * Dz(h(z)) - p(x, z),
           x + y + z - (x**2 + y**2) * npde.sin(z)
           - npde.exp(x) * npde.exp(z)),
    ]
    bcs = [Eq(u(0.0, 0.0, 0.0), 0.0)]
    domains = [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1)),
               Domain(z, Interval(0, 1))]
    system = PDESystem(eqs, bcs, domains, [x, y, z],
                       [u(x, y, z), v(y, x), h(z), p(x, z)])
    chains = [mlp([3, 12, 12, 1]), mlp([2, 12, 12, 1]),
              mlp([1, 12, 12, 1]), mlp([2, 12, 12, 1])]
    disc = PhysicsInformedNN(chains, GridTraining(0.1))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=4000, inner_steps=25)

    pts = np.random.default_rng(0).uniform(0.1, 0.9, size=(3, 50))
    X, Y, Z = pts
    dep = res.u["depvar"]
    pu = np.asarray(disc.phi[0](jnp.asarray(pts), dep["u"])[0])
    pv = np.asarray(disc.phi[1](jnp.asarray(np.stack([Y, X])), dep["v"])[0])
    ph = np.asarray(disc.phi[2](jnp.asarray(Z[None, :]), dep["h"])[0])
    pp = np.asarray(disc.phi[3](jnp.asarray(np.stack([X, Z])), dep["p"])[0])
    assert np.max(np.abs(pu - (X + Y + Z))) < 0.1
    assert np.max(np.abs(pv - (X**2 + Y**2))) < 0.1
    assert np.max(np.abs(ph - np.cos(Z))) < 0.05
    assert np.max(np.abs(pp - np.exp(X) * np.exp(Z))) < 0.25


@pytest.mark.slow
def test_kuramoto_sivashinsky_fourth_order():
    """KS equation with 4th-order spatial derivative, solitary-wave solution
    (reference: docs/src/examples/ks.md): u_t + u·u_x + α u_xx + β u_xxx +
    γ u_xxxx = 0 with exact tanh-profile BCs."""
    a, b, g = 1.0, 4.0, 1.0
    x, t = symbols("x t")
    u = DepVar("u")
    Dt = Differential(t)
    Dx = Differential(x)
    Dx2 = Differential(x) ** 2
    Dx3 = Differential(x) ** 3
    Dx4 = Differential(x) ** 4

    def u_analytic_np(xv, tv):
        zv = -xv / 2 + tv
        th = np.tanh(zv)
        return 11 + 15 * th - 15 * th**2 - 15 * th**3

    def u_analytic_sym(xe, te):
        ze = -xe / 2.0 + te
        th = npde.tanh(ze)
        return 11.0 + 15.0 * th - 15.0 * th**2 - 15.0 * th**3

    def du_sym(xe, te):
        ze = -xe / 2.0 + te
        th = npde.tanh(ze)
        sech2 = 1.0 - th**2
        return 15.0 / 2.0 * (th + 1.0) * (3.0 * th - 1.0) * sech2

    eq = Eq(Dt(u(x, t)) + u(x, t) * Dx(u(x, t)) + a * Dx2(u(x, t))
            + b * Dx3(u(x, t)) + g * Dx4(u(x, t)), 0.0)
    bcs = [
        Eq(u(x, 0.0), u_analytic_sym(x, 0.0)),
        Eq(u(-10.0, t), u_analytic_sym(-10.0, t)),
        Eq(u(10.0, t), u_analytic_sym(10.0, t)),
        Eq(Dx(u(-10.0, t)), du_sym(-10.0, t)),
        Eq(Dx(u(10.0, t)), du_sym(10.0, t)),
    ]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(-10, 10)), Domain(t, Interval(0, 1))],
                       [x, t], [u(x, t)])
    disc = PhysicsInformedNN(mlp([2, 32, 32, 1]), GridTraining([0.4, 0.1]))
    prob = discretize(system, disc)
    # Adam warmup then L-BFGS polish (reference uses BFGS, ks.md)
    res = solve(prob, optax.adam(0.01), maxiters=3000, inner_steps=25)
    res = solve(prob.with_params(res.u), optax.lbfgs(), maxiters=600,
                inner_steps=10)

    xs = np.linspace(-10, 10, 41)
    ts_ = np.linspace(0, 1, 5)
    X, T = np.meshgrid(xs, ts_, indexing="ij")
    cord = jnp.asarray(np.stack([X.ravel(), T.ravel()]))
    pred = np.asarray(disc.phi(cord, res.u["depvar"])[0]).reshape(41, 5)
    want = u_analytic_np(X, T)
    rel = np.sqrt(np.mean((pred - want) ** 2)) / np.sqrt(np.mean(want**2))
    assert rel < 0.2


def test_coupled_first_order_pde_system_2d():
    """Dx(u1) + 4 Dy(u2) = 0, Dx(u2) + 9 Dy(u1) = 0 — the reference's
    canonical system example (src/discretize.jl docstring,
    test/NNPDE1/nnpde__pde_iv_system_of_pdes.jl).  Manufactured plane-wave
    solution u1 = sin(6x + y), u2 = -1.5 sin(6x + y)."""
    x, y = symbols("x y")
    u1, u2 = DepVar("u1"), DepVar("u2")
    Dx = Differential(x)
    Dy = Differential(y)
    eqs = [
        Eq(Dx(u1(x, y)) + 4.0 * Dy(u2(x, y)), 0.0),
        Eq(Dx(u2(x, y)) + 9.0 * Dy(u1(x, y)), 0.0),
    ]

    def s1(a, b):
        return npde.sin(6.0 * a + b)

    bcs = [
        Eq(u1(0.0, y), s1(0.0, y)), Eq(u1(x, 0.0), s1(x, 0.0)),
        Eq(u1(1.0, y), s1(1.0, y)), Eq(u1(x, 1.0), s1(x, 1.0)),
        Eq(u2(0.0, y), -1.5 * s1(0.0, y)), Eq(u2(x, 0.0), -1.5 * s1(x, 0.0)),
        Eq(u2(1.0, y), -1.5 * s1(1.0, y)), Eq(u2(x, 1.0), -1.5 * s1(x, 1.0)),
    ]
    system = PDESystem(eqs, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u1(x, y), u2(x, y)])
    chains = [mlp([2, 24, 24, 1]), mlp([2, 24, 24, 1])]
    disc = PhysicsInformedNN(chains, GridTraining(0.05))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.01), maxiters=6000, inner_steps=25)
    xs = np.linspace(0, 1, 21)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    cord = jnp.asarray(np.stack([X.ravel(), Y.ravel()]))
    p1 = np.asarray(disc.phi[0](cord, res.u["depvar"]["u1"])[0])
    p2 = np.asarray(disc.phi[1](cord, res.u["depvar"]["u2"])[0])
    w1 = np.sin(6 * X + Y).ravel()
    w2 = -1.5 * w1
    assert np.sqrt(np.mean((p1 - w1) ** 2)) < 0.1
    assert np.sqrt(np.mean((p2 - w2) ** 2)) < 0.15


def test_nonlinear_hyperbolic_system():
    """Nonlinear coupled hyperbolic-type system (reference:
    docs/src/examples/nonlinear_hyperbolic.md spirit): manufactured
    u = exp(-t) sin(x), w = exp(-t) cos(x) with nonlinear coupling
    u_t = -u + (u² + w²) - exp(-2t), w_t = -w."""
    x, t = symbols("x t")
    u, w = DepVar("u"), DepVar("w")
    Dt = Differential(t)
    eqs = [
        Eq(Dt(u(x, t)),
           -u(x, t) + (u(x, t) ** 2 + w(x, t) ** 2) - npde.exp(-2.0 * t)),
        Eq(Dt(w(x, t)), -w(x, t)),
    ]
    bcs = [
        Eq(u(x, 0.0), npde.sin(x)),
        Eq(w(x, 0.0), npde.cos(x)),
        Eq(u(0.0, t), 0.0),
        Eq(w(0.0, t), npde.exp(-t)),
    ]
    system = PDESystem(eqs, bcs,
                       [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 1))],
                       [x, t], [u(x, t), w(x, t)])
    chains = [mlp([2, 16, 16, 1]), mlp([2, 16, 16, 1])]
    disc = PhysicsInformedNN(chains, GridTraining(0.1))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=4000, inner_steps=25)
    xs = np.linspace(0, 1, 11)
    ts_ = np.linspace(0, 1, 11)
    X, T = np.meshgrid(xs, ts_, indexing="ij")
    cord = jnp.asarray(np.stack([X.ravel(), T.ravel()]))
    pu = np.asarray(disc.phi[0](cord, res.u["depvar"]["u"])[0])
    pw = np.asarray(disc.phi[1](cord, res.u["depvar"]["w"])[0])
    wu = (np.exp(-T) * np.sin(X)).ravel()
    ww = (np.exp(-T) * np.cos(X)).ravel()
    assert np.sqrt(np.mean((pu - wu) ** 2)) < 0.05
    assert np.sqrt(np.mean((pw - ww) ** 2)) < 0.05


def test_linear_parabolic_system():
    """Coupled linear parabolic system (reference:
    docs/src/examples/linear_parabolic.md): u_t = a u_xx + b1 u + c1 w,
    w_t = a w_xx + b2 u + c2 w, with a manufactured eigenmode solution
    u = e^{λt} cos x, w = μ e^{λt} cos x where λ + a is an eigenvalue of
    [[b1, c1], [b2, c2]] and μ the matching eigenvector ratio."""
    a, b1, c1, b2, c2 = 1.0, 4.0, 3.0, 2.0, 1.0
    m = (5 - np.sqrt(33)) / 2
    lam = m - a
    mu = (m - b1) / c1

    x, t = symbols("x t")
    u, w = DepVar("u"), DepVar("w")
    Dt = Differential(t)
    Dxx = Differential(x) ** 2
    eqs = [Eq(Dt(u(x, t)), a * Dxx(u(x, t)) + b1 * u(x, t) + c1 * w(x, t)),
           Eq(Dt(w(x, t)), a * Dxx(w(x, t)) + b2 * u(x, t) + c2 * w(x, t))]
    bcs = [Eq(u(x, 0.0), npde.cos(x)), Eq(w(x, 0.0), mu * npde.cos(x)),
           Eq(u(0.0, t), npde.exp(lam * t)),
           Eq(w(0.0, t), mu * npde.exp(lam * t)),
           Eq(u(1.0, t), np.cos(1.0) * npde.exp(lam * t)),
           Eq(w(1.0, t), mu * np.cos(1.0) * npde.exp(lam * t))]
    system = PDESystem(eqs, bcs,
                       [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 1))],
                       [x, t], [u(x, t), w(x, t)])
    disc = PhysicsInformedNN([mlp([2, 16, 16, 1]), mlp([2, 16, 16, 1])],
                             GridTraining(0.1))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=4000, inner_steps=25)

    xs = np.linspace(0, 1, 11)
    X, T = np.meshgrid(xs, xs, indexing="ij")
    cord = jnp.asarray(np.stack([X.ravel(), T.ravel()]))
    pu = np.asarray(disc.phi[0](cord, res.u["depvar"]["u"])[0])
    pw = np.asarray(disc.phi[1](cord, res.u["depvar"]["w"])[0])
    wu = (np.exp(lam * T) * np.cos(X)).ravel()
    ww = mu * wu
    assert np.sqrt(np.mean((pu - wu) ** 2)) < 0.02
    assert np.sqrt(np.mean((pw - ww) ** 2)) < 0.02
