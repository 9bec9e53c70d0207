"""Hardware-backend smoke group (the reference's test/CUDA analog).

Runs only when NEURALPDE_TEST_PLATFORM=default is set AND a non-CPU backend
is present — e.g.:
    NEURALPDE_TEST_PLATFORM=default python -m pytest tests/test_tpu_group.py
Mirrors test/CUDA/*: ODE + PDE smoke with the same tolerances as the CPU
groups (reference: test/test_groups.toml:55-59)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

needs_hw = pytest.mark.skipif(
    os.environ.get("NEURALPDE_TEST_PLATFORM", "cpu") == "cpu"
    or jax.default_backend() == "cpu",
    reason="hardware smoke group: set NEURALPDE_TEST_PLATFORM=default on a "
           "TPU/GPU host")


@needs_hw
def test_ode_on_hardware():
    from neuralpde_tpu import NNODE, ODEProblem, mlp
    from neuralpde_tpu.solvers.ode import solve_ode

    prob = ODEProblem(f=lambda u, p, t: -u, u0=1.0, tspan=(0.0, 1.0),
                      analytic=lambda u0, p, t: np.exp(-t))
    alg = NNODE(mlp([1, 12, 1]), optax.adam(0.05))
    sol = solve_ode(prob, alg, dt=0.05, maxiters=600, abstol=1e-12,
                    inner_steps=25)
    assert sol.errors["l2"] < 0.05


@needs_hw
def test_2d_pde_on_hardware():
    import neuralpde_tpu as npde
    from neuralpde_tpu import (
        DepVar, Differential, Domain, Eq, GridTraining, Interval, PDESystem,
        PhysicsInformedNN, discretize, mlp, solve, symbols,
    )

    x, y = symbols("x y")
    u = DepVar("u")
    Dxx, Dyy = Differential(x) ** 2, Differential(y) ** 2
    eq = Eq(Dxx(u(x, y)) + Dyy(u(x, y)),
            -npde.sin(np.pi * x) * npde.sin(np.pi * y))
    bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
           Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    disc = PhysicsInformedNN(mlp([2, 16, 16, 1]), GridTraining(0.1))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.02), maxiters=1500, inner_steps=25)
    xs = np.linspace(0, 1, 11)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    cord = jnp.asarray(np.stack([X.ravel(), Y.ravel()]))
    pred = np.asarray(disc.phi(cord, res.u["depvar"])[0]).reshape(11, 11)
    want = np.sin(np.pi * X) * np.sin(np.pi * Y) / (2 * np.pi**2)
    assert np.max(np.abs(pred - want)) < 0.05


@needs_hw
def test_separable_on_hardware():
    """SPINN hardware smoke: hard-constrained 2D Poisson on a 256^2 tensor
    grid trains to rel L2 < 1e-2 in 500 iters on the accelerator."""
    import numpy as np
    import optax

    from neuralpde_tpu import (
        DepVar, Differential, Domain, Eq, Interval, PDESystem,
        PhysicsInformedNN, SeparableNet, SeparableTraining, Transformed,
        discretize, mlp, sin, solve, symbols,
    )

    x, y = symbols("x y")
    u = DepVar("u")
    eq = Eq((Differential(x) ** 2)(u(x, y)) + (Differential(y) ** 2)(u(x, y)),
            -sin(np.pi * x) * sin(np.pi * y))
    system = PDESystem(eq, [],
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    hard = lambda c, o: c * (1 - c) * o
    net = SeparableNet([Transformed(mlp([1, 32, 32, 32]), hard)
                        for _ in range(2)])
    disc = PhysicsInformedNN(net, SeparableTraining(dx=1 / 255),
                             dtype=jnp.float32)
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(2e-3), maxiters=500, inner_steps=100)
    xs = np.linspace(0, 1, 51)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    nodes = jnp.asarray(xs, jnp.float32)
    up = np.asarray(net.grid(res.params["depvar"], [nodes, nodes]))
    ua = np.sin(np.pi * X) * np.sin(np.pi * Y) / (2 * np.pi**2)
    rel = np.linalg.norm(up - ua) / np.linalg.norm(ua)
    assert rel < 1e-2, rel


@needs_hw
def test_matmul_precision_lifts_accuracy_on_hardware():
    """The r3 precision finding, as an on-chip regression: the same 1000-iter
    separable Allen-Cahn stage must train measurably better under
    matmul_precision="highest" than under the default bf16 MXU passes.
    (Full-budget record: 0.0032, examples/allen_cahn_spinn.py / PERF.md.)"""
    import neuralpde_tpu as npde
    from neuralpde_tpu import (
        Chain, DepVar, Differential, Domain, Eq, Interval, NonAdaptiveLoss,
        PDESystem, PeriodicEmbedding, PhysicsInformedNN, SeparableNet,
        SeparableTraining, discretize, mlp, solve, symbols,
    )

    x, t = symbols("x t")
    u = DepVar("u")
    eq = Eq(Differential(t)(u(x, t)),
            1e-4 * (Differential(x) ** 2)(u(x, t))
            + 5.0 * (u(x, t) - u(x, t) ** 3))
    bcs = [Eq(u(x, 0.0), x**2 * npde.cos(np.pi * x))]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(-1, 1)), Domain(t, Interval(0, 1))],
                       [x, t], [u(x, t)])

    def final_loss(mp):
        x_net = Chain(PeriodicEmbedding(1, axis=0, period=2.0, n_modes=6),
                      *mlp([12, 32, 32, 64]).layers)
        net = SeparableNet([x_net, mlp([1, 32, 32, 64])])
        disc = PhysicsInformedNN(
            net, SeparableTraining(dx=[2 / 127, 1 / 127], causal=t,
                                   causal_eps=100.0),
            dtype=jnp.float32, matmul_precision=mp,
            adaptive_loss=NonAdaptiveLoss(bc_loss_weights=[100.0]))
        prob = discretize(system, disc)
        res = solve(prob, optax.adam(1e-3), maxiters=3000, inner_steps=500,
                    key=jax.random.key(0))
        return float(res.objective)

    l_default = final_loss(None)
    l_highest = final_loss("highest")
    assert np.isfinite(l_highest)
    # true-f32 passes must reach a lower training floor on this stiff
    # einsum-heavy program (measured full-budget gap: 0.025 vs 0.0032)
    assert l_highest < l_default, (l_highest, l_default)
