"""Chebyshev KAN trial functions (nn/kan.py, beyond reference — the
reference's substrate is Lux MLPs, src/NeuralPDE.jl:17-20)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, GridTraining, Interval, KANLayer,
    PDESystem, PhysicsInformedNN, discretize, kan, sin, solve,
    solve_gauss_newton, symbols,
)

PI = float(np.pi)


def test_kan_layer_shapes_and_chebyshev_basis():
    layer = KANLayer(2, 3, degree=4)
    params = layer.init(jax.random.key(0))
    assert params["coef"].shape == (3, 2, 5)
    x = jnp.array([[0.3, -0.8], [1.2, 0.0]])
    y = layer.apply(params, x)
    assert y.shape == (3, 2)
    # manual check: y = sum_ik c_jik T_k(tanh(x_i))
    t = np.tanh(np.asarray(x))
    T = [np.ones_like(t), t]
    for _ in range(3):
        T.append(2 * t * T[-1] - T[-2])
    basis = np.stack(T, axis=1)                   # (in, 5, N)
    want = np.einsum("oik,ikn->on", np.asarray(params["coef"]), basis)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-6)


def test_kan_validation():
    with pytest.raises(ValueError, match="degree"):
        KANLayer(1, 1, degree=0)


def test_kan_fits_function():
    """3-layer KAN regresses a nonsmooth-ish composite target."""
    net = kan([1, 8, 1], degree=6)
    params = net.init(jax.random.key(1))
    xs = jnp.linspace(-1, 1, 256)[None, :]
    ys = jnp.sin(3 * xs) * jnp.exp(-xs**2)

    opt = optax.adam(2e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(
            lambda p: jnp.mean((net.apply(p, xs) - ys) ** 2))(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    for _ in range(400):
        params, state, loss = step(params, state)
    assert float(loss) < 1e-4, float(loss)


def _poisson_system():
    x = symbols("x")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    return PDESystem([Eq(Dxx(u(x)), -PI**2 * sin(PI * x))],
                     [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0)],
                     [Domain(x, Interval(0, 1))], ivs=[x], dvs=[u(x)])


def test_kan_pinn_poisson():
    """KAN chain through the full PINN pipeline (exact nested-jvp second
    derivatives of the Chebyshev-tanh composition)."""
    system = _poisson_system()
    disc = PhysicsInformedNN(kan([1, 8, 1], degree=5), GridTraining(0.05),
                             dtype=jnp.float64)
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(2e-2), maxiters=800, inner_steps=50)
    cord = jnp.linspace(0, 1, 101)[None, :]
    pred = np.asarray(prob.pinnrep.phi(cord, res.u["depvar"])).ravel()
    want = np.sin(PI * np.linspace(0, 1, 101))
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 0.05, rel


def test_kan_gauss_newton_polish():
    """KAN parameters are one flat coefficient tensor per layer — GN's
    matrix-free residual machinery applies unchanged."""
    system = _poisson_system()
    disc = PhysicsInformedNN(kan([1, 6, 1], degree=4), GridTraining(0.1),
                             dtype=jnp.float64)
    prob = discretize(system, disc)
    r0 = solve(prob, optax.adam(2e-2), maxiters=300, inner_steps=50)
    res = solve_gauss_newton(prob.with_params(r0.u), maxiters=30)
    assert res.objective < r0.objective * 0.1, \
        (res.objective, r0.objective)


def test_kan_separable_composition():
    """KAN axis factors inside a SeparableNet: the factorized (SPINN) path
    evaluates Chebyshev-KAN axis nets through Taylor-mode jets — 2-D
    Poisson trains on the tensor grid.  KAN factors converge slower than
    MLP factors on this problem (measured: rel L2 0.085 @ 3000 Adam iters
    vs ~1e-3 for separable_mlp at the same budget), so the CI gate is
    structural: the composition lowers, trains, and improves."""
    from neuralpde_tpu import SeparableNet, SeparableTraining

    x, y = symbols("x y")
    u = DepVar("u")
    lap = (Differential(x) ** 2)(u(x, y)) + (Differential(y) ** 2)(u(x, y))
    system = PDESystem(
        [Eq(lap, -2 * PI**2 * sin(PI * x) * sin(PI * y))],
        [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
         Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)],
        [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
        ivs=[x, y], dvs=[u(x, y)])
    net = SeparableNet([kan([1, 8, 8], degree=5) for _ in range(2)])
    disc = PhysicsInformedNN(net, SeparableTraining(dx=1 / 16),
                             dtype=jnp.float64)
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(1e-2), maxiters=600, inner_steps=50)
    assert np.isfinite(res.objective)
    assert res.objective < res.history[0] * 0.1
    gx = np.linspace(0, 1, 33)
    cord = jnp.stack([np.repeat(gx, 33), np.tile(gx, 33)])
    pred = np.asarray(prob.pinnrep.phi(cord, res.u["depvar"])).ravel()
    want = (np.sin(PI * np.repeat(gx, 33)) * np.sin(PI * np.tile(gx, 33)))
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 0.6, rel
