"""Finite-basis PINNs (nn/fbpinn.py, beyond reference — the reference's
only decomposition tool is sequential neural_adapter transfer,
src/neural_adapter.jl; FBPINN is Moseley et al. 2023)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, FBPINN, GridTraining, Interval,
    PDESystem, PhysicsInformedNN, cos, discretize, mlp, solve, symbols,
)

PI = float(np.pi)


def test_fbpinn_partition_of_unity_and_shapes():
    net = FBPINN([(0, 1), (-1, 1)], subdivisions=(3, 2), hidden=(8,))
    assert net.n_subdomains == 6
    params = net.init(jax.random.key(0))
    # stacked local-net params: leading (J,) axis
    leaf = jax.tree.leaves(params)[0]
    assert leaf.shape[0] == 6

    x = jnp.stack([jnp.linspace(0, 1, 41), jnp.linspace(-1, 1, 41)])
    w = net._windows(x)
    assert w.shape == (6, 41)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=0)), 1.0,
                               rtol=1e-6)
    assert float(jnp.min(w)) >= 0.0
    y = net.apply(params, x)
    assert y.shape == (1, 41)
    assert np.all(np.isfinite(np.asarray(y)))


def test_fbpinn_validation():
    with pytest.raises(ValueError, match="overlap"):
        FBPINN([(0, 1)], overlap=0.0)
    with pytest.raises(ValueError, match="lo < hi"):
        FBPINN([(1, 0)])
    with pytest.raises(ValueError, match="subdivisions"):
        FBPINN([(0, 1)], subdivisions=0)
    with pytest.raises(ValueError, match="not both"):
        FBPINN([(0, 1)], subdivisions=4, levels=[1, 2])
    with pytest.raises(ValueError, match="non-empty"):
        FBPINN([(0, 1)], levels=[])


def test_fbpinn_multilevel_structure_and_parity():
    """levels=[1,2,4] (Dolean et al. 2024): per-level partition of unity,
    and the hierarchy's output equals the average of single-level FBPINNs
    evaluated with the corresponding parameter stacks."""
    bounds = [(0, 1), (-1, 1)]
    net = FBPINN(bounds, levels=[1, 2, 4], hidden=(8,))
    assert net.n_levels == 3
    assert net.n_subdomains == 1 + 4 + 16
    params = net.init(jax.random.key(3))
    assert isinstance(params["nets"], list) and len(params["nets"]) == 3

    x = jnp.stack([jnp.linspace(0.02, 0.98, 29),
                   jnp.linspace(-0.96, 0.96, 29)])
    for l in range(3):
        w = net._windows(x, l)
        np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=0)), 1.0,
                                   rtol=1e-6)

    y = net.apply(params, x)
    assert y.shape == (1, 29)
    singles = []
    for l, subs in enumerate([1, 2, 4]):
        lvl = FBPINN(bounds, subdivisions=subs, hidden=(8,))
        singles.append(lvl.apply({"nets": params["nets"][l]}, x))
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(sum(singles) / 3), rtol=1e-6)

    # nested-jvp derivatives compose through the hierarchy
    def u(s):
        return net.apply(params, s[:, None])[0, 0]

    g = jax.grad(lambda s: jax.grad(
        lambda t: u(jnp.stack([t, s[1]])))(s[0]))(jnp.array([0.5, 0.5]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_fbpinn_multilevel_gn_residual_parity():
    """The list-of-level-stacks parameter pytree flattens through the
    Gauss-Newton residual machinery: ||r(theta)||^2 == full loss."""
    from neuralpde_tpu import build_residual_vector

    x = symbols("x")
    u = DepVar("u")
    system = PDESystem(
        [Eq(Differential(x)(u(x)), cos(4 * PI * x))], [Eq(u(0.0), 0.0)],
        [Domain(x, Interval(0, 1))], ivs=[x], dvs=[u(x)])
    net = FBPINN([(0, 1)], levels=[1, 3], hidden=(6,))
    prob = discretize(system, PhysicsInformedNN(net, GridTraining(0.05),
                                                dtype=jnp.float64))
    theta = prob.init_params
    r = build_residual_vector(prob.pinnrep)(theta)
    lstate = {"key": jax.random.key(0),
              "adaptive": prob.pinnrep.adaloss.init_state(1, 1, jnp.float64)}
    loss = prob.loss(theta, lstate)[0]
    np.testing.assert_allclose(float(jnp.sum(r ** 2)), float(loss),
                               rtol=1e-9)


def test_fbpinn_windows_are_c2():
    """Second derivative of the blended trial function is continuous across
    a window-support edge (squared-cosine windows): FD-sample u'' on a fine
    line through an edge and check there is no O(1) jump."""
    net = FBPINN([(0, 1)], subdivisions=4, hidden=(8,))
    params = net.init(jax.random.key(1))

    def u(x):
        return net.apply(params, x[None, None])[0, 0]

    d2 = jax.vmap(jax.grad(jax.grad(u)))
    # support edge of subdomain 0: center 0.125 + half 0.1875 = 0.3125
    xs = jnp.linspace(0.3120, 0.3130, 201, dtype=jnp.float64)
    vals = np.asarray(d2(xs))
    assert np.all(np.isfinite(vals))
    assert np.max(np.abs(np.diff(vals))) < 1e-2   # no jump discontinuity


def test_fbpinn_multiscale_ode_beats_plain_mlp():
    """The paper's signature problem: du/dx = cos(omega x), u(0) = 0 with
    omega = 15 over [0, 2pi] — spectral bias makes a single tanh MLP stall
    at this budget while 15 windowed local nets fit their low-frequency
    local pieces."""
    omega = 15.0
    x = symbols("x")
    u = DepVar("u")
    system = PDESystem([Eq(Differential(x)(u(x)), cos(omega * x))],
                       [Eq(u(0.0), 0.0)],
                       [Domain(x, Interval(0, 2 * PI))],
                       ivs=[x], dvs=[u(x)])
    strat = GridTraining(2 * PI / 400)
    budget = dict(maxiters=3000, inner_steps=100)

    def rel_l2(prob, res):
        g = np.linspace(0, 2 * PI, 801)
        pred = np.asarray(prob.pinnrep.phi(g[None, :],
                                           res.u["depvar"])).ravel()
        want = np.sin(omega * g) / omega
        return np.linalg.norm(pred - want) / np.linalg.norm(want)

    fb = FBPINN([(0, 2 * PI)], subdivisions=15, hidden=(16,))
    prob_fb = discretize(system, PhysicsInformedNN(fb, strat,
                                                   dtype=jnp.float64))
    res_fb = solve(prob_fb, optax.adam(5e-3), **budget)
    rel_fb = rel_l2(prob_fb, res_fb)

    prob_mlp = discretize(system, PhysicsInformedNN(
        mlp([1, 64, 64, 1]), strat, dtype=jnp.float64))
    res_mlp = solve(prob_mlp, optax.adam(5e-3), **budget)
    rel_mlp = rel_l2(prob_mlp, res_mlp)

    assert rel_fb < 0.05, rel_fb
    assert rel_fb < rel_mlp / 4, (rel_fb, rel_mlp)


def test_fbpinn_multilevel_trains_two_scale():
    """End-to-end: a [1,2,4] hierarchy trains the two-scale ODE
    u' = 2pi cos(2pi x) + 8pi cos(8pi x), u(0)=0 (hard-constrained) to
    rel L2 < 5e-2 — both the coarse and the fine mode must be fit (exact
    u = sin(2pi x) + sin(8pi x) has equal-amplitude components)."""
    from neuralpde_tpu import Transformed

    x = symbols("x")
    u = DepVar("u")
    f = 2 * PI * cos(2 * PI * x) + 8 * PI * cos(8 * PI * x)
    system = PDESystem([Eq(Differential(x)(u(x)), f)], [Eq(u(0.0), 0.0)],
                       [Domain(x, Interval(0, 1))], ivs=[x], dvs=[u(x)])
    net = Transformed(FBPINN([(0, 1)], levels=[1, 2, 4], hidden=(12,)),
                      lambda c, out: jnp.tanh(8 * PI * c[0:1]) * out)
    prob = discretize(system, PhysicsInformedNN(net, GridTraining(1 / 256),
                                                dtype=jnp.float64))
    res = solve(prob, optax.adam(2e-3), maxiters=4000, inner_steps=200)
    g = np.linspace(0, 1, 801)
    pred = np.asarray(prob.pinnrep.phi(g[None, :], res.u["depvar"])).ravel()
    want = np.sin(2 * PI * g) + np.sin(8 * PI * g)
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 0.05, rel


def test_fbpinn_2d_poisson_and_gauss_newton():
    """2-D composition: a 2x2 FBPINN basis solves the Poisson problem
    through the standard pipeline (boundary weighting matters here: windows
    localize each net, so interior residual can't propagate BC information
    across subdomains — bc_loss_weights=100 was the measured fix, rel L2
    0.63 -> 0.008), and the stacked (J, ...) parameter layout flattens
    through the matrix-free GN driver unchanged."""
    from neuralpde_tpu import NonAdaptiveLoss, sin, solve_gauss_newton

    x, y = symbols("x y")
    u = DepVar("u")
    lap = (Differential(x) ** 2)(u(x, y)) + (Differential(y) ** 2)(u(x, y))
    system = PDESystem(
        [Eq(lap, -2 * PI**2 * sin(PI * x) * sin(PI * y))],
        [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
         Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)],
        [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
        ivs=[x, y], dvs=[u(x, y)])
    net = FBPINN([(0, 1), (0, 1)], subdivisions=2, hidden=(16,))
    prob = discretize(system, PhysicsInformedNN(
        net, GridTraining(0.05), dtype=jnp.float64,
        adaptive_loss=NonAdaptiveLoss(bc_loss_weights=[100.0] * 4)))
    res = solve(prob, optax.adam(2e-2), maxiters=8000, inner_steps=500)
    g = np.linspace(0.0, 1.0, 33)
    cord = jnp.stack([np.repeat(g, 33), np.tile(g, 33)])
    pred = np.asarray(prob.pinnrep.phi(cord, res.u["depvar"])).ravel()
    want = np.sin(PI * np.repeat(g, 33)) * np.sin(PI * np.tile(g, 33))
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 0.1, rel

    gn = solve_gauss_newton(prob.with_params(res.u), maxiters=20)
    assert gn.objective < res.objective * 0.5, (gn.objective, res.objective)
