"""NNDAE, DGM, PINOODE, neural_adapter tests (reference groups: test/NNODE
nndae cases, test/DGM/, test/PINOODE/, test/NeuralAdapter/)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DAEProblem, DGM, DeepGalerkin, DeepONet, Domain, Eq, GridTraining,
    Interval, NNDAE, ODEProblem, PDESystem, PINOODE, StochasticTraining,
    DepVar, Differential, discretize, mlp, neural_adapter, solve, solve_dae,
    solve_pino_ode, symbols,
)


def test_nndae_case():
    """DAE: u1' = u1 (differential), 0 = u1 + u2 (algebraic).
    Solution: u1 = e^t, u2 = -e^t (reference: test/NNODE/nndae__dae_case_i.jl
    pattern)."""

    def f(du, u, p, t):
        return jnp.array([du[0] - u[0], u[0] + u[1]])

    prob = DAEProblem(
        f=f, u0=np.array([1.0, -1.0]), du0=np.array([1.0, -1.0]),
        tspan=(0.0, 1.0), differential_vars=[True, False],
        analytic=lambda u0, p, t: np.array([np.exp(t), -np.exp(t)]),
    )
    alg = NNDAE(mlp([1, 16, 2]), optax.adam(0.02))
    sol = solve_dae(prob, alg, dt=0.05, maxiters=2000, abstol=1e-10,
                    inner_steps=25)
    assert sol.errors["l2"] < 0.1


def test_dgm_architecture_shapes():
    net = DGM(2, 1, 10, 3, jnp.tanh, jnp.tanh)
    params = net.init(jax.random.key(0))
    x = jnp.ones((2, 7))
    y = net.apply(params, x)
    assert y.shape == (1, 7)
    # gated params present per reference field names (src/dgm.jl:17-32)
    assert set(params["lstm_0"]) == {"Uz", "Ug", "Ur", "Uh", "Wz", "Wg", "Wr",
                                     "Wh", "bz", "bg", "br", "bh"}


def test_deep_galerkin_poisson_1d():
    """DeepGalerkin on u'' = -π² sin(πx) (reference: test/DGM/ Poisson)."""
    x = symbols("x")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    eq = Eq(Dxx(u(x)), -np.pi**2 * npde.sin(np.pi * x))
    bcs = [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])
    disc = DeepGalerkin(1, 1, 12, 2, jnp.tanh, jnp.tanh, lambda z: z,
                        GridTraining(0.05))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=2500, inner_steps=25)
    xs = np.linspace(0, 1, 21)
    pred = np.asarray(disc.phi(jnp.asarray(xs[None, :]), res.u["depvar"])[0])
    assert np.max(np.abs(pred - np.sin(np.pi * xs))) < 0.1


@pytest.mark.parametrize("use_deeponet", [True, False],
                         ids=["deeponet", "chain"])
def test_pinoode_family(use_deeponet):
    """du/dt = cos(p t) family over p ∈ [0.1, 2] (reference:
    test/PINOODE/pino_ode__example_chain_du_cos_p_t.jl, rtol 0.08)."""
    prob = ODEProblem(f=lambda u, p, t: jnp.cos(p * t), u0=1.0,
                      tspan=(0.0, 1.0))
    if use_deeponet:
        chain = DeepONet(mlp([1, 16, 16]), mlp([1, 16, 16]))
    else:
        chain = mlp([2, 24, 24, 1])
    alg = PINOODE(chain, optax.adam(0.01), bounds=[(0.1, 2.0)],
                  number_of_parameters=40,
                  strategy=StochasticTraining(40 if not use_deeponet else 50))
    sol = solve_pino_ode(prob, alg, maxiters=4000, inner_steps=25)
    ps = np.linspace(0.2, 1.9, 20)
    ts = np.linspace(0.0, 1.0, 30)
    pred = np.asarray(sol(ps[None, :], ts[None, :]))  # (T, P)
    want = 1.0 + np.sin(ps[None, :] * ts[:, None]) / ps[None, :]
    rel = np.abs(pred - want) / np.abs(want)
    assert rel.mean() < 0.08  # reference rtol


def test_neural_adapter_transfer():
    """Train net2 to match a known function via the adapter loss
    (reference: test/NeuralAdapter/ 2D Poisson transfer pattern, simplified)."""
    x = symbols("x")
    u = DepVar("u")
    system = PDESystem([Eq(u(x), 0.0)], [Eq(u(0.0), 0.0)],
                       [Domain(x, Interval(0, 1))], [x], [u(x)])
    net2 = mlp([1, 16, 1])
    params2 = net2.init(jax.random.key(3))

    def target(cord):
        return jnp.sin(2 * cord[0:1])

    def loss(cord, theta):
        return (net2.apply(theta, cord) - target(cord))[0]

    prob = neural_adapter(loss, params2, system, GridTraining(0.02))
    res = solve(prob, optax.adam(0.02), maxiters=1500, inner_steps=25)
    xs = jnp.linspace(0, 1, 50)[None, :]
    pred = np.asarray(net2.apply(res.u, xs)[0])
    assert np.max(np.abs(pred - np.sin(2 * np.asarray(xs[0])))) < 0.05


def test_neural_adapter_domain_decomposition():
    """Array method: one network trained against per-subdomain losses summed
    (reference: src/neural_adapter.jl:91-99, test/NeuralAdapter domain
    decomposition)."""
    x = symbols("x")
    u = DepVar("u")
    sys_left = PDESystem([Eq(u(x), 0.0)], [Eq(u(0.0), 0.0)],
                         [Domain(x, Interval(0.0, 0.5))], [x], [u(x)])
    sys_right = PDESystem([Eq(u(x), 0.0)], [Eq(u(0.0), 0.0)],
                          [Domain(x, Interval(0.5, 1.0))], [x], [u(x)])
    net = mlp([1, 16, 1])
    params0 = net.init(jax.random.key(5))

    def make_loss(target_fn):
        def loss(cord, theta):
            return (net.apply(theta, cord) - target_fn(cord))[0]
        return loss

    # piecewise targets on the two subdomains (e.g. two pre-trained PINNs)
    left = make_loss(lambda c: jnp.sin(2 * c[0:1]))
    right = make_loss(lambda c: jnp.sin(2 * c[0:1]))
    prob = neural_adapter([left, right], params0, [sys_left, sys_right],
                          GridTraining(0.02))
    res = solve(prob, optax.adam(0.02), maxiters=1500, inner_steps=25)
    xs = jnp.linspace(0, 1, 50)[None, :]
    pred = np.asarray(net.apply(res.u, xs)[0])
    assert np.max(np.abs(pred - np.sin(2 * np.asarray(xs[0])))) < 0.05
