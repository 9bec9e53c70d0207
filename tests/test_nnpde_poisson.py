"""PhysicsInformedNN forward-PDE tests (reference test group: test/NNPDE1/),
centered on the 2D Poisson fixture across all strategies
(reference: test/NNPDE1/nnpde__pde_ii_2d_poisson.jl)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, GridTraining, Interval, PDESystem,
    PhysicsInformedNN, QuadratureTraining, QuasiRandomTraining,
    StochasticTraining, discretize, mlp, solve, symbolic_discretize, symbols,
)
from neuralpde_tpu.symbolic.expr import sin


def poisson_system():
    """Δu = -sin(πx)sin(πy) on [0,1]², u=0 on boundary.
    Analytic: u = sin(πx)sin(πy)/(2π²)."""
    x, y = symbols("x y")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    Dyy = Differential(y) ** 2
    eq = Eq(Dxx(u(x, y)) + Dyy(u(x, y)), -sin(np.pi * x) * sin(np.pi * y))
    bcs = [
        Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
        Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0),
    ]
    domains = [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))]
    return PDESystem(eq, bcs, domains, [x, y], [u(x, y)]), (x, y, u)


def analytic_poisson(xs, ys):
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    return np.sin(np.pi * X) * np.sin(np.pi * Y) / (2 * np.pi**2)


def run_poisson(strategy, maxiters=1500, lr=0.02, derivative="jvp"):
    system, (x, y, u) = poisson_system()
    disc = PhysicsInformedNN(mlp([2, 16, 16, 1]), strategy, derivative=derivative)
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(lr), maxiters=maxiters, inner_steps=25)
    xs = ys = np.linspace(0, 1, 21)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    cord = jnp.asarray(np.stack([X.reshape(-1), Y.reshape(-1)]))
    pred = np.asarray(disc.phi(cord, res.u["depvar"])[0]).reshape(21, 21)
    want = analytic_poisson(xs, ys)
    return pred, want, res


STRATEGIES = [
    GridTraining(0.1),
    StochasticTraining(256),
    QuasiRandomTraining(256, sampling_alg="lhs"),
    QuasiRandomTraining(256, sampling_alg="sobol"),
    QuadratureTraining(order=6, panels=4),
]


@pytest.mark.parametrize("strategy", STRATEGIES,
                         ids=lambda s: type(s).__name__ + getattr(s, "sampling_alg", ""))
def test_2d_poisson_all_strategies(strategy):
    pred, want, _ = run_poisson(strategy)
    # reference asserts atol=2.0 (absolute, per point); we check much tighter
    assert np.max(np.abs(pred - want)) < 0.02


def test_2d_poisson_fd_derivative_parity():
    pred, want, _ = run_poisson(GridTraining(0.1), derivative="fd")
    assert np.max(np.abs(pred - want)) < 0.02


def test_symbolic_discretize_introspection():
    system, _ = poisson_system()
    disc = PhysicsInformedNN(mlp([2, 8, 1]), GridTraining(0.1))
    pinnrep = symbolic_discretize(system, disc)
    assert pinnrep.depvars == ["u"]
    assert pinnrep.indvars == ["x", "y"]
    assert pinnrep.dict_depvar_input == {"u": ["x", "y"]}
    assert len(pinnrep.loss_functions.pde_loss_functions) == 1
    assert len(pinnrep.loss_functions.bc_loss_functions) == 4
    # datafree residual is callable on a raw coordinate matrix
    cord = jnp.asarray([[0.3, 0.5], [0.4, 0.6]])
    r = pinnrep.loss_functions.datafree_pde_loss_functions[0](
        cord, pinnrep.flat_init_params)
    assert r.shape == (2,)
    # symbolic ASTs are inspectable
    assert "∂x∂x" in repr(pinnrep.symbolic_pde_loss_functions[0])


def test_system_of_pdes_multioutput():
    """Coupled first-order system (reference: test/NNPDE1 heterogeneous
    system tests): u1' = u2, u2' = -u1 on t ∈ [0, 1] with ICs."""
    t = symbols("t")
    u1, u2 = DepVar("u1"), DepVar("u2")
    Dt = Differential(t)
    eqs = [Eq(Dt(u1(t)), u2(t)), Eq(Dt(u2(t)), -u1(t))]
    bcs = [Eq(u1(0.0), 1.0), Eq(u2(0.0), 0.0)]
    system = PDESystem(eqs, bcs, [Domain(t, Interval(0, 1))], [t],
                       [u1(t), u2(t)])
    chains = [mlp([1, 16, 1]), mlp([1, 16, 1])]
    disc = PhysicsInformedNN(chains, GridTraining(0.05))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=2000, inner_steps=25)
    ts = np.linspace(0, 1, 30)
    cord = jnp.asarray(ts[None, :])
    p1 = np.asarray(disc.phi[0](cord, res.u["depvar"]["u1"])[0])
    p2 = np.asarray(disc.phi[1](cord, res.u["depvar"]["u2"])[0])
    assert np.max(np.abs(p1 - np.cos(ts))) < 0.05
    assert np.max(np.abs(p2 + np.sin(ts))) < 0.05


def test_heterogeneous_inputs():
    """u(x) and v(x, y) mixed in one equation — exercises per-depvar cords
    (reference: heterogeneous system support via dict_depvar_input)."""
    x, y = symbols("x y")
    u, v = DepVar("u"), DepVar("v")
    Dx = Differential(x)
    # ∂x v(x,y) = u(x);  v(0,y)=0 ; u is tied by u(x) = 2x
    eqs = [Eq(Dx(v(x, y)), u(x))]
    bcs = [Eq(v(0.0, y), 0.0), Eq(u(x), 2.0 * x)]
    system = PDESystem(eqs, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x), v(x, y)])
    chains = [mlp([1, 12, 1]), mlp([2, 12, 1])]
    disc = PhysicsInformedNN(chains, GridTraining(0.1))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=1500, inner_steps=25)
    xs = np.linspace(0, 1, 11)
    cord_v = jnp.asarray(np.stack([xs, 0.5 * np.ones_like(xs)]))
    pv = np.asarray(disc.phi[1](cord_v, res.u["depvar"]["v"])[0])
    assert np.max(np.abs(pv - xs**2)) < 0.05  # v = x²


def test_third_order_ode_pde_pipeline():
    """1-D 3rd-order equation (reference: test/NNPDE1 3rd-order ODE test):
    u''' = cos(πx), u(0)=0, u(1)=cos(π)/π³? — use manufactured solution."""
    x = symbols("x")
    u = DepVar("u")
    D3 = Differential(x) ** 3
    # u = sin(πx)/π³ satisfies u''' = -cos(πx)
    eq = Eq(D3(u(x)), -npde.cos(np.pi * x))
    bcs = [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0),
           Eq(Differential(x)(u(0.0)), 1.0 / np.pi**2)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])
    disc = PhysicsInformedNN(mlp([1, 16, 16, 1]), GridTraining(0.05))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.01), maxiters=3000, inner_steps=25)
    xs = np.linspace(0, 1, 21)
    pred = np.asarray(disc.phi(jnp.asarray(xs[None, :]), res.u["depvar"])[0])
    want = np.sin(np.pi * xs) / np.pi**3
    assert np.max(np.abs(pred - want)) < 0.02


def test_residual_adaptive_training():
    """RAD adaptive collocation sampling (beyond-reference strategy from the
    PAPERS.md techniques) on 2D Poisson."""
    from neuralpde_tpu import ResidualAdaptiveTraining

    pred, want, _ = run_poisson(ResidualAdaptiveTraining(256, candidates=1024))
    assert np.max(np.abs(pred - want)) < 0.02


def test_remat_option():
    """jax.checkpoint rematerialization of residuals (memory/FLOP tradeoff
    for very large collocation batches — TPU HBM management)."""
    system, _ = poisson_system()
    disc = PhysicsInformedNN(mlp([2, 8, 1]), GridTraining(0.2), remat=True)
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.05), maxiters=100, inner_steps=25)
    assert np.isfinite(res.objective)


def test_phi_single_point_idiom():
    """phi([x, y], θ) evaluates one point (reference idiom, e.g.
    `first(phi([x, y], res.u))`)."""
    system, _ = poisson_system()
    disc = PhysicsInformedNN(mlp([2, 8, 1]), GridTraining(0.2))
    pinnrep = symbolic_discretize(system, disc)
    theta = pinnrep.flat_init_params["depvar"]
    one = disc.phi([0.3, 0.4], theta)
    assert one.shape == (1, 1)
    batch = disc.phi(jnp.asarray([[0.3], [0.4]]), theta)
    np.testing.assert_allclose(np.asarray(one), np.asarray(batch))


def test_quasirandom_minibatch_mode():
    """resampling=False pre-generates `minibatch` designs and cycles them
    (reference: src/training_strategies.jl:337-343)."""
    pred, want, _ = run_poisson(
        QuasiRandomTraining(256, resampling=False, minibatch=8),
        maxiters=1500)
    assert np.max(np.abs(pred - want)) < 0.02


def test_weighted_interval_rejected_for_pdes():
    from neuralpde_tpu import WeightedIntervalTraining

    system, _ = poisson_system()
    disc = PhysicsInformedNN(mlp([2, 8, 1]),
                             WeightedIntervalTraining([0.5, 0.5], 100))
    with pytest.raises(ValueError, match="ODEs"):
        discretize(system, disc)
