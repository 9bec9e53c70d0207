"""More forward-PDE coverage (reference group: test/NNPDE1/): wave equation
with Neumann IC, mixed second derivatives, heat equation."""

import numpy as np
import jax.numpy as jnp
import optax

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, GridTraining, Interval, PDESystem,
    PhysicsInformedNN, discretize, mlp, solve, symbols,
)


def test_1d_wave_equation():
    """u_tt = c² u_xx, u(0,t)=u(1,t)=0, u(x,0)=sin(πx), u_t(x,0)=0
    -> u = sin(πx) cos(cπt) (reference: nnpde__pde_v_2d_wave_equation.jl,
    rtol 0.1)."""
    c = 1.0
    x, t = symbols("x t")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    Dtt = Differential(t) ** 2
    Dt = Differential(t)
    eq = Eq(Dtt(u(x, t)), c**2 * Dxx(u(x, t)))
    bcs = [
        Eq(u(0.0, t), 0.0), Eq(u(1.0, t), 0.0),
        Eq(u(x, 0.0), npde.sin(np.pi * x)),
        Eq(Dt(u(x, 0.0)), 0.0),                 # Neumann-in-time IC
    ]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 1))],
                       [x, t], [u(x, t)])
    disc = PhysicsInformedNN(mlp([2, 16, 16, 1]), GridTraining(0.1))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=6000, inner_steps=25)
    xs = np.linspace(0, 1, 21)
    ts = np.linspace(0, 1, 21)
    X, T = np.meshgrid(xs, ts, indexing="ij")
    cord = jnp.asarray(np.stack([X.reshape(-1), T.reshape(-1)]))
    pred = np.asarray(disc.phi(cord, res.u["depvar"])[0]).reshape(21, 21)
    want = np.sin(np.pi * X) * np.cos(c * np.pi * T)
    assert np.sqrt(np.mean((pred - want) ** 2)) < 0.1


def test_mixed_second_derivative():
    """∂²u/∂x∂y = cos(x)cos(y) with u(x,0)=sin(x)·0?, use manufactured
    u = sin(x) sin(y): u_xy = cos(x)cos(y)
    (reference: NNPDE1 mixed-derivative cases)."""
    x, y = symbols("x y")
    u = DepVar("u")
    eq = Eq(Differential(x)(Differential(y)(u(x, y))),
            npde.cos(x) * npde.cos(y))
    bcs = [Eq(u(x, 0.0), 0.0), Eq(u(0.0, y), 0.0)]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    disc = PhysicsInformedNN(mlp([2, 16, 16, 1]), GridTraining(0.1))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=4000, inner_steps=25)
    xs = np.linspace(0, 1, 15)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    cord = jnp.asarray(np.stack([X.reshape(-1), Y.reshape(-1)]))
    pred = np.asarray(disc.phi(cord, res.u["depvar"])[0]).reshape(15, 15)
    want = np.sin(X) * np.sin(Y)
    assert np.max(np.abs(pred - want)) < 0.05


def test_heat_equation_quadrature():
    """u_t = α u_xx with u(x,0)=sin(πx), Dirichlet 0 -> exp decay
    (heat/Burgers-family config of BASELINE.json)."""
    alpha = 0.1
    x, t = symbols("x t")
    u = DepVar("u")
    eq = Eq(Differential(t)(u(x, t)),
            alpha * (Differential(x) ** 2)(u(x, t)))
    bcs = [Eq(u(x, 0.0), npde.sin(np.pi * x)),
           Eq(u(0.0, t), 0.0), Eq(u(1.0, t), 0.0)]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 1))],
                       [x, t], [u(x, t)])
    disc = PhysicsInformedNN(mlp([2, 16, 16, 1]), GridTraining(0.05))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=4000, inner_steps=25)
    xs = np.linspace(0, 1, 15)
    ts = np.linspace(0, 1, 15)
    X, T = np.meshgrid(xs, ts, indexing="ij")
    cord = jnp.asarray(np.stack([X.reshape(-1), T.reshape(-1)]))
    pred = np.asarray(disc.phi(cord, res.u["depvar"])[0]).reshape(15, 15)
    want = np.sin(np.pi * X) * np.exp(-alpha * np.pi**2 * T)
    assert np.sqrt(np.mean((pred - want) ** 2)) < 0.05


def test_1d_viscous_burgers_quadrature_minimax():
    """1D viscous Burgers u_t + u u_x = ν u_xx with QuadratureTraining +
    MiniMaxAdaptiveLoss (BASELINE.json config 3). Manufactured solution via
    the Cole-Hopf tanh wave: u = -tanh((x - t/2)/(4ν))/2 + 1/2 solves it for
    wave speed 1/2 and amplitude 1/2... use the standing viscous shock
    u(x,t) = -tanh(x/(2ν))·a with a = ν·k matching: take the steady solution
    u(x) = -tanh(x/(2ν)) which satisfies u u_x = ν u_xx."""
    from neuralpde_tpu import MiniMaxAdaptiveLoss, QuadratureTraining

    nu = 0.5
    x, t = symbols("x t")
    u = DepVar("u")
    Dt = Differential(t)
    Dx = Differential(x)
    Dxx = Differential(x) ** 2
    eq = Eq(Dt(u(x, t)) + u(x, t) * Dx(u(x, t)), nu * Dxx(u(x, t)))
    # steady viscous shock: u(x, t) = -tanh(x/(2ν)), time-independent
    bcs = [
        Eq(u(x, 0.0), -npde.tanh(x / (2 * nu))),
        Eq(u(-1.0, t), np.tanh(1.0 / (2 * nu))),
        Eq(u(1.0, t), -np.tanh(1.0 / (2 * nu))),
    ]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(-1, 1)), Domain(t, Interval(0, 1))],
                       [x, t], [u(x, t)])
    disc = PhysicsInformedNN(mlp([2, 16, 16, 1]),
                             QuadratureTraining(order=6, panels=4),
                             adaptive_loss=MiniMaxAdaptiveLoss(100))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=4000, inner_steps=25)
    xs = np.linspace(-1, 1, 21)
    ts = np.linspace(0, 1, 5)
    X, T = np.meshgrid(xs, ts, indexing="ij")
    cord = jnp.asarray(np.stack([X.reshape(-1), T.reshape(-1)]))
    pred = np.asarray(disc.phi(cord, res.u["depvar"])[0]).reshape(21, 5)
    want = -np.tanh(X / (2 * nu))
    assert np.sqrt(np.mean((pred - want) ** 2)) < 0.05
