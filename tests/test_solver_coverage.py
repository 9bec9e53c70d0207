"""Additional solver-family coverage mirroring the breadth of the reference
test suite: NNSDE additive noise, PINO multi-parameter, DGM Black-Scholes,
NNODE vector + tstops, SDEPINN absorbing BCs."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DeepGalerkin, DeepONet, DepVar, Differential, Domain, Eq, GridTraining,
    Interval, NNODE, NNSDE, Normal, ODEProblem, PDESystem, PINOODE,
    SDEPINN, SDEProblem, StochasticTraining, discretize, mlp, solve,
    solve_ode, solve_pino_ode, symbols,
)
from neuralpde_tpu.nn.core import sigmoid
from neuralpde_tpu.solvers.sde import solve_sde
from neuralpde_tpu.solvers.sde_weak import solve_sde_weak


def test_nnsde_additive_noise_ou():
    """OU with additive noise: du = -θu dt + σ dW; E[u(t)] = u0 e^{-θt}
    (reference: test/NNSDE1 additive-noise case)."""
    theta_, sigma_ = 1.2, 0.3
    prob = SDEProblem(f=lambda u, p, t: -theta_ * u,
                      g=lambda u, p, t: sigma_, u0=1.0, tspan=(0.0, 1.0))
    chain = mlp([1 + 3, 16, 16, 1], activation=sigmoid)
    alg = NNSDE(chain, optax.adam(0.02), sub_batch=8, numensemble=40)
    sol = solve_sde(prob, alg, dt=1 / 40, maxiters=1500, abstol=1e-12,
                    inner_steps=25)
    ts = np.asarray(sol.timepoints)
    mean_pred = np.asarray([float(p.mean) for p in sol.estimated_sol[0]])
    want = np.exp(-theta_ * ts)
    assert np.sqrt(np.mean((mean_pred - want) ** 2)) < 0.1


def test_pino_two_parameter_family():
    """du/dt = p1·cos(p2·t) family with a 2-parameter DeepONet branch
    (reference: test/PINOODE multi-parameter tests, rtol 0.1-ish)."""
    prob = ODEProblem(f=lambda u, p, t: p[0] * jnp.cos(p[1] * t), u0=1.0,
                      tspan=(0.0, 1.0))
    chain = DeepONet(mlp([2, 24, 24]), mlp([1, 24, 24]))
    alg = PINOODE(chain, optax.adam(0.01), bounds=[(1.0, np.pi), (1.0, 2.0)],
                  number_of_parameters=60,
                  strategy=StochasticTraining(60))
    sol = solve_pino_ode(prob, alg, maxiters=6000, inner_steps=25)
    p1 = np.linspace(1.2, 3.0, 8)
    p2 = np.linspace(1.1, 1.9, 8)
    ts = np.linspace(0, 1.0, 25)
    P1, P2 = np.meshgrid(p1, p2, indexing="ij")
    ps = jnp.asarray(np.stack([P1.ravel(), P2.ravel()]))
    pred = np.asarray(sol(ps, ts[None, :]))          # (T, P)
    want = 1.0 + (P1.ravel()[None, :] / P2.ravel()[None, :]) * np.sin(
        P2.ravel()[None, :] * ts[:, None])
    rel = np.abs(pred - want) / np.abs(want)
    assert rel.mean() < 0.1


def test_dgm_black_scholes():
    """Black-Scholes terminal-value PDE via DeepGalerkin
    (reference: test/DGM black-scholes case).

    V_t + rS V_S + σ²S²/2 V_SS - rV = 0, V(S,T)=max(S-K,0).  Test against
    the known closed form at t=0 on a band of S."""
    r, sig, K, T = 0.05, 0.2, 1.0, 1.0
    S, t = symbols("S t")
    V = DepVar("V")
    Dt = Differential(t)
    DS = Differential(S)
    DSS = Differential(S) ** 2
    eq = Eq(Dt(V(S, t)) + r * S * DS(V(S, t))
            + 0.5 * sig**2 * S**2 * DSS(V(S, t)), r * V(S, t))
    # smooth terminal payoff via softplus approx of max(S-K, 0)

    def payoff(s):
        return npde.log(1.0 + npde.exp(40.0 * (s - K))) / 40.0

    bcs = [Eq(V(S, T), payoff(S)), Eq(V(0.0, t), 0.0),
           Eq(V(2.0, t), 2.0 - K * npde.exp(-r * (T - t)))]
    system = PDESystem(eq, bcs,
                       [Domain(S, Interval(0, 2)), Domain(t, Interval(0, T))],
                       [S, t], [V(S, t)])
    disc = DeepGalerkin(2, 1, 20, 2, jnp.tanh, jnp.tanh, lambda z: z,
                        GridTraining([0.05, 0.05]))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.01), maxiters=6000, inner_steps=25)

    from math import erf, exp, log, sqrt

    def bs_call(s0):
        if s0 <= 0:
            return 0.0
        d1 = (log(s0 / K) + (r + sig**2 / 2) * T) / (sig * sqrt(T))
        d2 = d1 - sig * sqrt(T)
        N = lambda z: 0.5 * (1 + erf(z / sqrt(2)))
        return s0 * N(d1) - K * exp(-r * T) * N(d2)

    ss = np.linspace(0.6, 1.6, 11)
    cord = jnp.asarray(np.stack([ss, np.zeros_like(ss)]))
    pred = np.asarray(disc.phi(cord, res.u["depvar"])[0])
    want = np.asarray([bs_call(s) for s in ss])
    assert np.max(np.abs(pred - want)) < 0.05


def test_nnode_vector_with_tstops_and_saveat():
    prob = ODEProblem(
        f=lambda u, p, t: jnp.array([u[1], -u[0]]),
        u0=np.array([0.0, 1.0]), tspan=(0.0, 2.0),
        analytic=lambda u0, p, t: np.array([np.sin(t), np.cos(t)]),
    )
    alg = NNODE(mlp([1, 24, 2]), optax.adam(0.02))
    sol = solve_ode(prob, alg, dt=0.05, maxiters=2500, abstol=1e-12,
                    tstops=[0.5, 1.5], saveat=0.25, inner_steps=25)
    assert sol.errors["l2"] < 0.1
    assert len(sol.ts) == 9  # 0, 0.25, ..., 2.0


def test_sdepinn_absorbing_bcs():
    prob = SDEProblem(f=lambda x, p, t: -x, g=lambda x, p, t: 0.4,
                      u0=0.0, tspan=(0.0, 1.0))
    chain = mlp([2, 12, 12, 1], activation=jnp.tanh,
                out_activation=jax.nn.softplus)
    alg = SDEPINN(chain=chain, x_0=-2.0, x_end=2.0, Nt=10, dx=0.2,
                  distrib=Normal(0.0, 0.25), optimalg=optax.adam(0.01),
                  absorbing_bc=True, reflective_bc=False, lambda_norm=5.0)
    res, phi, pinnrep = solve_sde_weak(prob, alg, maxiters=800,
                                       inner_steps=25)
    assert np.isfinite(res.objective)
    # absorbing BC: density ≈ 0 at the boundaries
    cord = jnp.asarray([[-2.0, 2.0], [0.5, 0.5]])
    vals = np.asarray(phi(cord, res.u["depvar"])[0])
    assert np.all(np.abs(vals) < 0.1)


def test_pino_vector_output_system():
    """PINO over an ODE *system* family (MLP operator, vector u):
    du = [u2, -ω² u1] over ω ∈ [1, 2] (beyond the reference's scalar
    examples; MLP mode)."""
    def f(u, p, t):
        return jnp.array([u[1], -p**2 * u[0]])

    prob = ODEProblem(f=f, u0=np.array([1.0, 0.0]), tspan=(0.0, 1.0))
    chain = mlp([2, 32, 32, 2])
    alg = PINOODE(chain, optax.adam(0.01), bounds=[(1.0, 2.0)],
                  number_of_parameters=40, strategy=StochasticTraining(40))
    from neuralpde_tpu import solve_pino_ode as _solve
    sol = _solve(prob, alg, maxiters=6000, inner_steps=25)
    ws = np.linspace(1.1, 1.9, 9)
    ts = np.linspace(0, 1, 21)
    pred = np.asarray(sol(ws[None, :], ts[None, :]))   # (T, 2, P)
    want_u1 = np.cos(ws[None, :] * ts[:, None])
    err = np.abs(pred[:, 0, :] - want_u1)
    assert err.mean() < 0.05


def test_pino_grid_training_branch():
    """PINOODE with GridTraining (reference: get_trainset Grid variants,
    src/pino_ode_solve.jl:198-229)."""
    prob = ODEProblem(f=lambda u, p, t: jnp.cos(p * t), u0=1.0,
                      tspan=(0.0, 1.0))
    chain = DeepONet(mlp([1, 16, 16]), mlp([1, 16, 16]))
    alg = PINOODE(chain, optax.adam(0.01), bounds=[(0.5, 2.0)],
                  number_of_parameters=30,
                  strategy=GridTraining(0.05))
    sol = solve_pino_ode(prob, alg, maxiters=4000, inner_steps=25)
    ps = np.linspace(0.6, 1.9, 10)
    ts = np.linspace(0.0, 1.0, 20)
    pred = np.asarray(sol(ps[None, :], ts[None, :]))
    want = 1.0 + np.sin(ps[None, :] * ts[:, None]) / ps[None, :]
    assert (np.abs(pred - want) / np.abs(want)).mean() < 0.08


def test_lotka_volterra_inverse_nnode():
    """4-parameter Lotka-Volterra inverse with NNODE + Data Quadrature loss
    (reference: nnode parameter-estimation family; BPINN LV tutorial data)."""
    alpha, beta, gamma, delta = 1.5, 1.0, 3.0, 1.0

    def f(u, p, t):
        return jnp.array([p[0] * u[0] - p[1] * u[0] * u[1],
                          -p[2] * u[1] + p[3] * u[0] * u[1]])

    # RK4 ground-truth data
    def fnp(u, p):
        return np.array([p[0] * u[0] - p[1] * u[0] * u[1],
                         -p[2] * u[1] + p[3] * u[0] * u[1]])

    p_true = np.array([alpha, beta, gamma, delta])
    ts = np.linspace(0.0, 2.0, 80)
    us = [np.array([1.0, 1.0])]
    for i in range(len(ts) - 1):
        h = ts[i + 1] - ts[i]
        u_ = us[-1]
        k1 = fnp(u_, p_true); k2 = fnp(u_ + h / 2 * k1, p_true)
        k3 = fnp(u_ + h / 2 * k2, p_true); k4 = fnp(u_ + h * k3, p_true)
        us.append(u_ + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4))
    traj = np.stack(us)
    W = np.full_like(ts, ts[1] - ts[0])
    dataset = [traj[:, 0], traj[:, 1], ts, W]

    prob = ODEProblem(f=f, u0=np.array([1.0, 1.0]), tspan=(0.0, 2.0),
                      p=np.array([1.0, 1.2, 2.0, 1.3]))
    alg = NNODE(mlp([1, 24, 24, 2]), optax.adam(0.01), param_estim=True,
                dataset=dataset, estim_collocate=True)
    sol = solve_ode(prob, alg, dt=0.025, maxiters=6000, abstol=1e-12,
                    inner_steps=25)
    p_est = np.asarray(sol.original.u["p"])
    # reference-style: |p̂ - p| < 0.1 p per parameter
    assert np.all(np.abs(p_est - p_true) < 0.1 * p_true), p_est
