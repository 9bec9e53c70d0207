"""Integro-differential equation tests (reference group: test/IntegroDiff/),
exercising IntegralExpr lowering: parametric bounds, multi-dim integrals,
infinite-domain transforms (component C13)."""

import numpy as np
import jax.numpy as jnp
import optax

from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, GridTraining, Integral, Interval,
    PDESystem, PhysicsInformedNN, discretize, mlp, solve, symbols,
)
from neuralpde_tpu.nn.core import sigmoid


def test_volterra_ide_parametric_upper_bound():
    """i'(t) + 2 i(t) + 5 ∫₀ᵗ i(s) ds = 1, i(0)=0 ->
    i = e^{-t} sin(2t)/2 (reference: ide__integrodiff_example_1_1d.jl,
    asserts MSE < 0.02)."""
    t = symbols("t")
    i = DepVar("i")
    Di = Differential(t)
    Ii = Integral(t, 0.0, t)   # parametric upper bound
    eq = Eq(Di(i(t)) + 2.0 * i(t) + 5.0 * Ii(i(t)), 1.0)
    bcs = [Eq(i(0.0), 0.0)]
    system = PDESystem(eq, bcs, [Domain(t, Interval(0, 2))], [t], [i(t)])
    disc = PhysicsInformedNN(mlp([1, 15, 1], activation=sigmoid),
                             GridTraining(0.1), integral_order=10)
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=3000, inner_steps=25)
    ts = np.arange(0, 2.0001, 0.01)
    pred = np.asarray(disc.phi(jnp.asarray(ts[None, :]), res.u["depvar"])[0])
    want = 0.5 * np.exp(-ts) * np.sin(2 * ts)
    assert np.mean((pred - want) ** 2) < 0.02


def test_2d_integral_constraint():
    """∫∫_unit square u dx dy = 1/3 with gradient BCs -> u = 1 - x² - y²
    (reference: ide__integrodiff_example_3_2_inputs_1_output.jl, MSE < 1e-3)."""
    x, y = symbols("x y")
    u = DepVar("u")
    Dx = Differential(x)
    Dy = Differential(y)
    Ix = Integral((x, y), (0.0, 0.0), (1.0, 1.0))
    eq = Eq(Ix(u(x, y)), 1.0 / 3.0)
    bcs = [Eq(u(0.0, 0.0), 1.0), Eq(Dx(u(x, y)), -2.0 * x),
           Eq(Dy(u(x, y)), -2.0 * y)]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    disc = PhysicsInformedNN(mlp([2, 15, 1], activation=sigmoid),
                             GridTraining(0.1), integral_order=10)
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=3000, inner_steps=25)
    xs = np.linspace(0, 1, 21)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    cord = jnp.asarray(np.stack([X.reshape(-1), Y.reshape(-1)]))
    pred = np.asarray(disc.phi(cord, res.u["depvar"])[0])
    want = (1 - X**2 - Y**2).reshape(-1)
    assert np.mean((pred - want) ** 2) < 1e-3


def test_infinite_upper_bound():
    """∫₁ˣ u ds = ∫₁^∞ u ds - 1/x, u(1)=1 -> u = 1/x²
    (reference: ide__integrodiff_example_6_infinity.jl, rtol 0.1)."""
    x = symbols("x")
    u = DepVar("u")
    I1 = Integral(x, 1.0, x)
    Iinf = Integral(x, 1.0, np.inf)
    eq = Eq(I1(u(x)), Iinf(u(x)) - 1.0 / x)
    bcs = [Eq(u(1.0), 1.0)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(1, 2))], [x], [u(x)])
    disc = PhysicsInformedNN(mlp([1, 10, 1], activation=sigmoid),
                             GridTraining(0.1), integral_order=12,
                             integral_panels=2)
    prob = discretize(system, disc)
    # moderate fit, like the reference's BFGS maxiters=200: the ε=1/20
    # truncation makes the equation slightly inconsistent, so a very tight
    # fit distorts u (same tradeoff as the reference)
    res = solve(prob, optax.lbfgs(), maxiters=200, inner_steps=10)
    xs = np.arange(1.0, 2.0001, 0.01)
    pred = np.asarray(disc.phi(jnp.asarray(xs[None, :]), res.u["depvar"])[0])
    want = 1.0 / xs**2
    assert np.max(np.abs(pred - want) / np.abs(want)) < 0.15


def test_lbfgs_optimizer_integration():
    """optax.lbfgs path through the train loop (reference tests use BFGS)."""
    t = symbols("t")
    u = DepVar("u")
    eq = Eq(Differential(t)(u(t)), -u(t))
    bcs = [Eq(u(0.0), 1.0)]
    system = PDESystem(eq, bcs, [Domain(t, Interval(0, 1))], [t], [u(t)])
    disc = PhysicsInformedNN(mlp([1, 12, 1]), GridTraining(0.05))
    prob = discretize(system, disc)
    res = solve(prob, optax.lbfgs(), maxiters=200, inner_steps=10)
    ts = np.linspace(0, 1, 20)
    pred = np.asarray(disc.phi(jnp.asarray(ts[None, :]), res.u["depvar"])[0])
    assert np.max(np.abs(pred - np.exp(-ts))) < 0.05


def test_multioutput_integrand_product():
    """∫₁ˣ u·w ds = log(x), w' = -2/x³, u = x -> u=x, w=1/x²
    (reference: ide__integrodiff_example_5_1_input_2_outputs.jl, MSE < 1e-3)."""
    from neuralpde_tpu import log as nlog

    x = symbols("x")
    u, w = DepVar("u"), DepVar("w")
    Dx = Differential(x)
    Ix = Integral(x, 1.0, x)
    eqs = [
        Eq(Ix(u(x) * w(x)), nlog(x)),
        Eq(Dx(w(x)), -2.0 / x**3),
        Eq(u(x), x),
    ]
    bcs = [Eq(u(1.0), 1.0), Eq(w(1.0), 1.0)]
    system = PDESystem(eqs, bcs, [Domain(x, Interval(1, 2))], [x],
                       [u(x), w(x)])
    chains = [mlp([1, 15, 1], activation=sigmoid) for _ in range(2)]
    disc = PhysicsInformedNN(chains, GridTraining(0.1), integral_order=10)
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=3000, inner_steps=25)
    xs = np.arange(1.0, 2.0001, 0.01)
    pu = np.asarray(disc.phi[0](jnp.asarray(xs[None, :]),
                                res.u["depvar"]["u"])[0])
    pw = np.asarray(disc.phi[1](jnp.asarray(xs[None, :]),
                                res.u["depvar"]["w"])[0])
    assert np.mean((pu - xs) ** 2) < 1e-3
    assert np.mean((pw - 1.0 / xs**2) ** 2) < 1e-3


def test_symbolic_lower_bound_to_infinity():
    """∫ₓ^∞ u ds = 1/x, u(1)=1 -> u = 1/x² (reference:
    ide__integrodiff_example_7_infinity.jl, rtol 0.02) — exercises a
    SYMBOLIC lower bound combined with an infinite upper bound."""
    x = symbols("x")
    u = DepVar("u")
    I = Integral(x, x, np.inf)
    eq = Eq(I(u(x)), 1.0 / x)
    bcs = [Eq(u(1.0), 1.0)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(1, 2))], [x], [u(x)])
    disc = PhysicsInformedNN(mlp([1, 12, 1]), GridTraining(0.1),
                             integral_order=12, integral_panels=4)
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=3000, inner_steps=25)
    res = solve(prob.with_params(res.u), optax.lbfgs(), maxiters=800,
                inner_steps=10)
    xs = np.arange(1.0, 2.0001, 0.01)
    pred = np.asarray(disc.phi(jnp.asarray(xs[None, :]), res.u["depvar"])[0])
    want = 1.0 / xs**2
    assert np.max(np.abs(pred - want) / want) < 0.02  # reference rtol


def test_get_numeric_integral_helper():
    """Exported debugging helper evaluates an IntegralExpr directly
    (reference export: get_numeric_integral, src/discretize.jl:332-396)."""
    from neuralpde_tpu import get_numeric_integral
    from neuralpde_tpu.compile.lower import LoweringContext
    from neuralpde_tpu.ops.derivatives import DerivativeEngine

    x = symbols("x")
    u = DepVar("u")
    net = mlp([1, 8, 1])
    params = {"depvar": net.init(__import__("jax").random.key(0))}
    ctx = LoweringContext(
        depvars=["u"], indvars=["x"], dict_depvar_input={"u": ["x"]},
        phis=[net.apply], multioutput=False,
        derivative=DerivativeEngine("jvp"))
    integral = get_numeric_integral(ctx)
    expr = Integral(x, 0.0, 1.0)(u(x))
    cord = jnp.asarray([[0.2, 0.7]])
    vals = integral(expr, cord, params, [x])
    assert vals.shape == (2,)
    # constant bounds -> same integral at both points
    np.testing.assert_allclose(float(vals[0]), float(vals[1]), rtol=1e-10)


def test_integrand_with_coefficient():
    """∫₀ˣ u(s)·cos(s) ds = x³/3 -> u = x²/cos(x)
    (reference: ide__integrodiff_example_2_1d.jl, MSE < 0.02)."""
    x = symbols("x")
    u = DepVar("u")
    from neuralpde_tpu import cos as ncos

    Ix = Integral(x, 0.0, x)
    eq = Eq(Ix(u(x) * ncos(x)), x**3 / 3.0)
    bcs = [Eq(u(0.0), 0.0)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])
    disc = PhysicsInformedNN(mlp([1, 15, 1], activation=sigmoid),
                             GridTraining(0.1), integral_order=10)
    prob = discretize(system, disc)
    # L-BFGS like the reference's BFGS (integral-equation gradients are too
    # diluted for plain Adam here)
    res = solve(prob, optax.lbfgs(), maxiters=400, inner_steps=10)
    xs = np.arange(0, 1.0001, 0.01)
    pred = np.asarray(disc.phi(jnp.asarray(xs[None, :]), res.u["depvar"])[0])
    want = xs**2 / np.cos(xs)
    assert np.mean((pred - want) ** 2) < 0.02


def test_iterated_integral_parametric_inner_bound():
    """∫₀¹∫₀ˣ u dy dx = 5/12 with gradient BCs -> u = x + y²
    (reference: ide__integrodiff_example_4_2_inputs_1_output.jl, MSE < 0.02)
    — the inner bound references the OUTER integration variable (iterated
    integral over a triangular region)."""
    x, y = symbols("x y")
    u = DepVar("u")
    Dy = Differential(y)
    Ix = Integral((x, y), (0.0, 0.0), (1.0, x))
    eq = Eq(Ix(u(x, y)), 5.0 / 12.0)
    bcs = [Eq(u(0.0, 0.0), 0.0), Eq(Dy(u(x, y)), 2.0 * y),
           Eq(u(x, 0.0), x)]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    disc = PhysicsInformedNN(mlp([2, 15, 1], activation=sigmoid),
                             GridTraining(0.1), integral_order=8)
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=3000, inner_steps=25)
    xs = np.linspace(0, 1, 21)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    cord = jnp.asarray(np.stack([X.ravel(), Y.ravel()]))
    pred = np.asarray(disc.phi(cord, res.u["depvar"])[0])
    want = (X + Y**2).ravel()
    assert np.mean((pred - want) ** 2) < 0.02
