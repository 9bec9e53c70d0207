"""QuadratureTraining tolerance semantics (VERDICT r1 item 2).

The reference honors reltol/abstol/maxiters via h-adaptive cubature
(reference: src/training_strategies.jl:367-436).  Here the tolerances drive
(a) static build-time auto-refinement of the composite GL rule and (b) a
runtime h-adaptive host path for `get_numeric_integral` evaluation parity."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, Integral, Interval, PDESystem,
    PhysicsInformedNN, QuadratureTraining, discretize, mlp, solve, symbols,
)
from neuralpde_tpu.ops.quadrature import adaptive_quad_1d, tensor_rule_box
from neuralpde_tpu.symbolic.expr import sin


# --- adaptive_quad_1d -------------------------------------------------------

def test_adaptive_quad_oscillatory():
    """∫₀¹ sin(40x) dx = (1 - cos 40)/40 — needs refinement beyond one panel."""
    want = (1 - np.cos(40.0)) / 40.0
    val, err = adaptive_quad_1d(lambda x: np.sin(40.0 * x), 0.0, 1.0,
                                reltol=1e-10, abstol=1e-10, maxiters=1000)
    assert abs(float(val) - want) < 1e-8
    assert err < 1e-8


def test_adaptive_quad_tolerance_controls_work():
    """Loose tolerance stops early; tight tolerance refines further."""
    f = lambda x: np.sin(40.0 * x)
    _, err_loose = adaptive_quad_1d(f, 0.0, 1.0, reltol=1e-1, abstol=1e-1)
    _, err_tight = adaptive_quad_1d(f, 0.0, 1.0, reltol=1e-12, abstol=1e-12)
    assert err_tight < err_loose


def test_adaptive_quad_vector_valued():
    val, _ = adaptive_quad_1d(
        lambda x: np.stack([np.sin(x), np.cos(x)]), 0.0, np.pi / 2,
        reltol=1e-10, abstol=1e-10)
    np.testing.assert_allclose(np.asarray(val), [1.0, 1.0], atol=1e-8)


def test_adaptive_quad_maxiters_budget():
    """maxiters caps the subinterval evaluations (reference semantics)."""
    evals = []

    def f(x):
        evals.append(len(x))
        return np.sin(400.0 * x)

    adaptive_quad_1d(f, 0.0, 1.0, reltol=1e-14, abstol=1e-14, maxiters=9)
    assert len(evals) <= 2 * 9 + 2  # <= maxiters panel evals (2 rules each)


# --- static auto-refinement --------------------------------------------------

def _osc_problem(strategy, freq=4.0):
    """u'' = -(freq·π)² sin(freq·π·x) on [0,1] -> u = sin(freq·π·x)."""
    x = symbols("x")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    eq = Eq(Dxx(u(x)), -(freq * np.pi) ** 2 * sin(freq * np.pi * x))
    bcs = [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])
    disc = PhysicsInformedNN(mlp([1, 24, 24, 1]), strategy)
    return discretize(system, disc), disc


def test_resolve_panels_honors_tolerances():
    """Tightening abstol refines the rule; explicit panels pins it."""
    calls = {}

    def make_integral_at(tag):
        def integral_at(p):
            calls.setdefault(tag, []).append(p)
            # mimic a rule converging ~ p^-4 toward 1.0
            return 1.0 + p ** -4.0
        return integral_at

    loose = QuadratureTraining(order=4, abstol=1e-1, reltol=0.0)
    tight = QuadratureTraining(order=4, abstol=1e-8, reltol=0.0,
                               maxiters=10000)
    p_loose = loose.resolve_panels(make_integral_at("l"), dim=1)
    p_tight = tight.resolve_panels(make_integral_at("t"), dim=1)
    assert p_tight > p_loose
    pinned = QuadratureTraining(order=4, panels=3)
    assert pinned.resolve_panels(make_integral_at("p"), dim=1) == 3
    assert "p" not in calls  # pinned skips refinement entirely


def test_resolve_panels_respects_maxiters():
    s = QuadratureTraining(order=8, abstol=0.0, reltol=0.0, maxiters=100)
    # never converges; (8·2p)^1 <= 100 allows doubling up to panels=8... stop
    p = s.resolve_panels(lambda p_: float(p_), dim=1)
    assert (s.order * p) <= 100


def test_quadrature_refinement_on_oscillatory_residual():
    """On the oscillatory Poisson problem, auto-refinement picks more panels
    than the coarse default because the source term demands it."""
    prob, _ = _osc_problem(QuadratureTraining(order=4, abstol=1e-10,
                                              reltol=1e-10, maxiters=2000),
                           freq=8.0)
    # the loss closure exists and uses a refined static rule; probe the
    # decision directly:
    strat = QuadratureTraining(order=4, abstol=1e-10, reltol=1e-10,
                               maxiters=2000)
    residual = prob.pinnrep.loss_functions.datafree_pde_loss_functions[0]
    theta0 = prob.init_params

    def integral_at(p):
        nodes, weights = tensor_rule_box([0.0], [1.0], 4, p)
        n = jnp.asarray(nodes, jnp.float64)
        w = jnp.asarray(weights, jnp.float64)
        return float(jnp.sum(residual(n, theta0) ** 2 * w))

    p_tight = strat.resolve_panels(integral_at, dim=1)
    loose = QuadratureTraining(order=4, abstol=1e6, reltol=1e6)
    p_loose = loose.resolve_panels(integral_at, dim=1)
    assert p_tight > p_loose


def test_quadrature_tolerance_changes_trained_accuracy():
    """VERDICT r1 done-criterion: tightening abstol measurably changes the
    trained accuracy (the loose rule cannot resolve the oscillatory source,
    matching reference h-adaptive behavior)."""
    freq = 4.0

    def run(strategy, seed=0):
        prob, disc = _osc_problem(strategy, freq=freq)
        res = solve(prob, optax.adam(5e-3), maxiters=4000, inner_steps=50,
                    key=jax.random.key(seed))
        xs = np.linspace(0, 1, 101)
        pred = np.asarray(disc.phi(jnp.asarray(xs[None, :]),
                                   res.u["depvar"])[0])
        want = np.sin(freq * np.pi * xs)
        return float(np.sqrt(np.mean((pred - want) ** 2)))

    # loose: tolerance satisfied trivially -> panels=2 with order=2 (4 nodes,
    # blind to the oscillation); tight: refines until the rule resolves it
    l2_loose = run(QuadratureTraining(order=2, abstol=1e8, reltol=1e8))
    l2_tight = run(QuadratureTraining(order=2, abstol=1e-8, reltol=1e-8,
                                      maxiters=2000))
    assert l2_tight < 0.25, f"tight-tolerance run failed to train: {l2_tight}"
    assert l2_tight < 0.5 * l2_loose, (l2_loose, l2_tight)


# --- adaptive get_numeric_integral -------------------------------------------

def test_get_numeric_integral_adaptive_matches_static():
    """Adaptive host evaluation agrees with the dense static rule on a
    parametric-bound integral ∫₀ˣ u(s) ds (IntegroDiff shape)."""
    from neuralpde_tpu.compile.lower import get_numeric_integral
    from neuralpde_tpu.symbolic.expr import IntegralExpr

    x = symbols("x")
    u = DepVar("u")
    prob, disc = _osc_problem(QuadratureTraining(order=8, panels=2))
    ctx_expr = IntegralExpr(u(x), (x,), (0.0,), (x,))
    pinnrep = prob.pinnrep
    from neuralpde_tpu.compile.lower import LoweringContext

    ctx = LoweringContext(
        depvars=pinnrep.depvars, indvars=pinnrep.indvars,
        dict_depvar_input=pinnrep.dict_depvar_input,
        phis=[disc.phi.apply], multioutput=False,
        derivative=pinnrep.derivative, integral_order=24, integral_panels=4)
    theta = prob.init_params
    cord = jnp.asarray(np.linspace(0.1, 1.0, 7)[None, :])

    static = get_numeric_integral(ctx)(ctx_expr, cord, theta, [x])
    adaptive = get_numeric_integral(ctx, adaptive=True, reltol=1e-10,
                                    abstol=1e-10)(ctx_expr, cord, theta, [x])
    np.testing.assert_allclose(np.asarray(adaptive), np.asarray(static),
                               rtol=1e-6, atol=1e-8)


def test_adaptive_quad_nd_peaked_gaussian():
    """∫∫_[0,1]² e^{-50|x-c|²} — sharply peaked: a coarse static tensor rule
    misses it, the h-adaptive box cubature resolves it (VERDICT r2 item 5:
    n-D runtime-adaptive evaluation parity with CubatureJLh)."""
    from neuralpde_tpu.ops.quadrature import adaptive_quad_nd

    from math import erf

    a = 50.0
    f1 = np.sqrt(np.pi / a) * erf(np.sqrt(a) * 0.5)   # ∫₀¹ e^{-a(x-.5)²}dx
    want = f1 * f1

    def f(nodes):
        r2 = (nodes[0] - 0.5) ** 2 + (nodes[1] - 0.5) ** 2
        return np.exp(-a * r2)

    # coarse static rule (one order-4 tensor panel) is far off
    static_nodes, static_w = tensor_rule_box([0, 0], [1, 1], 2, 1)
    coarse = float((f(static_nodes) * static_w).sum())
    assert abs(coarse - want) > 1e-3

    val, err = adaptive_quad_nd(f, [0.0, 0.0], [1.0, 1.0], reltol=1e-9,
                                abstol=1e-12, maxiters=4000)
    assert abs(float(val) - want) < 1e-8, (float(val), want)
    assert err < 1e-6


def test_adaptive_quad_nd_tolerance_and_budget():
    from neuralpde_tpu.ops.quadrature import adaptive_quad_nd

    f = lambda n: np.sin(20.0 * n[0]) * np.cos(20.0 * n[1])
    _, e_loose = adaptive_quad_nd(f, [0, 0], [1, 1], reltol=1e-1, abstol=1e-1)
    _, e_tight = adaptive_quad_nd(f, [0, 0], [1, 1], reltol=1e-10,
                                  abstol=1e-10, maxiters=4000)
    assert e_tight < e_loose
    boxes = []

    def g(n):
        boxes.append(n.shape[1])
        return np.sin(400.0 * n[0])

    adaptive_quad_nd(g, [0, 0], [1, 1], reltol=1e-14, abstol=1e-14,
                     maxiters=9)
    assert len(boxes) <= 2 * 9 + 2


def test_get_numeric_integral_adaptive_2d():
    """2-D adaptive evaluation through the lowering surface: ∫∫ u(x)·u(y)
    ds dt over a parametric box [0,x]² — validated against the dense static
    tensor rule (the reference's 2-input IDE shape, test/IntegroDiff)."""
    from neuralpde_tpu.compile.lower import LoweringContext, get_numeric_integral
    from neuralpde_tpu.symbolic.expr import IntegralExpr

    x = symbols("x")
    s, t = symbols("s t")
    u = DepVar("u")
    prob, disc = _osc_problem(QuadratureTraining(order=8, panels=2))
    pinnrep = prob.pinnrep
    ctx = LoweringContext(
        depvars=pinnrep.depvars, indvars=pinnrep.indvars,
        dict_depvar_input=pinnrep.dict_depvar_input,
        phis=[disc.phi.apply], multioutput=False,
        derivative=pinnrep.derivative, integral_order=24, integral_panels=4)
    expr = IntegralExpr(u(s) * u(t), (s, t), (0.0, 0.0), (x, x))
    theta = prob.init_params
    cord = jnp.asarray(np.linspace(0.2, 1.0, 5)[None, :])

    static = get_numeric_integral(ctx)(expr, cord, theta, [x])
    adaptive = get_numeric_integral(ctx, adaptive=True, reltol=1e-9,
                                    abstol=1e-10, maxiters=4000)(
        expr, cord, theta, [x])
    np.testing.assert_allclose(np.asarray(adaptive), np.asarray(static),
                               rtol=1e-5, atol=1e-8)


# --- the closed adaptivity loop: solve(quad_adapt=True) acts on the recheck -

def _rff_chain():
    from neuralpde_tpu import Chain, Dense, FourierFeatures

    # random-Fourier-feature net: enough spectral headroom to ALIAS between
    # coarse quadrature nodes (a plain tanh MLP is too smooth to go wrong)
    return Chain(FourierFeatures(1, 16, sigma=6.0),
                 Dense(32, 24, jnp.tanh), Dense(24, 1))


def test_quad_adapt_loop_fixes_aliased_solution():
    """A deliberately coarse auto-refined rule (loose reltol, small node
    budget) lets the RFF network train to a WRONG solution (tiny residual at
    the frozen nodes, large in between -> validate_trained fails).  With
    quad_adapt=True the loop re-refines the rule against the trained params,
    warm-starts a re-solve, and both fixes the solution and passes the final
    recheck — the reference's tolerances-on-the-returned-solution semantics
    (reference: src/training_strategies.jl:406-436)."""
    import warnings

    from neuralpde_tpu import sin as nsin

    x = symbols("x")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    eq = Eq(Dxx(u(x)), -np.pi**2 * nsin(np.pi * x))
    bcs = [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])

    def rel(prob, theta):
        xs = np.linspace(0, 1, 301)
        pred = np.asarray(prob.pinnrep.phi(np.asarray(xs)[None, :],
                                           theta["depvar"])).ravel()
        want = np.sin(np.pi * xs)
        return float(np.linalg.norm(pred - want) / np.linalg.norm(want))

    def make():
        strat = QuadratureTraining(order=3, reltol=0.05, abstol=1e-8,
                                   maxiters=400)
        disc = PhysicsInformedNN(_rff_chain(), strat)
        return strat, discretize(system, disc)

    strat1, prob1 = make()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res1 = solve(prob1, optax.adam(1e-3), maxiters=3000, inner_steps=50)
    rep1 = strat1.validate_trained(res1.u, warn=False)
    assert not all(r["ok"] for r in rep1)          # the frozen rule fails
    assert any("no longer meets" in str(w.message) for w in rec)
    rel1 = rel(prob1, res1.u)
    assert rel1 > 0.5, rel1                        # ... and the solution is wrong

    strat2, prob2 = make()
    fired = []
    res2 = solve(prob2, optax.adam(1e-3), maxiters=3000, inner_steps=50,
                 quad_adapt=True, quad_adapt_rounds=2,
                 callback=lambda it, loss, aux: fired.append(it) and False)
    rep2 = strat2.validate_trained(res2.u, warn=False)
    assert all(r["ok"] for r in rep2)              # recheck now passes
    assert rep2[0]["panels"] > rep1[0]["panels"]   # the rule was re-refined
    rel2 = rel(prob2, res2.u)
    assert rel2 < 0.5 * rel1, (rel2, rel1)         # ... and the loop fixed it
    assert res2.iterations == 6000                 # one warm-started re-solve
    # the user callback is threaded through the re-solve (r5 review fix):
    # it fired every inner_steps chunk of BOTH solves
    assert len(fired) == 120, len(fired)


def test_quad_adapt_noop_when_rule_holds():
    """quad_adapt=True must not re-solve when the trained recheck passes
    (smooth problem, adequate rule)."""
    from neuralpde_tpu import sin as nsin

    x = symbols("x")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    eq = Eq(Dxx(u(x)), -np.pi**2 * nsin(np.pi * x))
    bcs = [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])
    strat = QuadratureTraining(order=8, reltol=1e-3, abstol=1e-6,
                               maxiters=1000)
    disc = PhysicsInformedNN(mlp([1, 16, 1]), strat)
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(2e-3), maxiters=1000, inner_steps=50,
                quad_adapt=True)
    assert res.iterations == 1000                  # no re-solve happened
    assert all(r["ok"] for r in strat.validate_trained(res.u, warn=False))
