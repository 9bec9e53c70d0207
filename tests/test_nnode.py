"""NNODE end-to-end tests (reference test group: test/NNODE/).

Mirrors the reference accuracy assertions, e.g. linear ODE L2 < 0.5
(test/NNODE/nnode__ode_i.jl:26) — we assert much tighter since the jitted
trainer converges well.
"""

import numpy as np
import jax.numpy as jnp
import optax
import pytest

from neuralpde_tpu import GridTraining, QuadratureTraining, StochasticTraining, mlp
from neuralpde_tpu.strategies import WeightedIntervalTraining, QuasiRandomTraining
from neuralpde_tpu.solvers.ode import NNODE, solve_ode
from neuralpde_tpu.solvers.problems import ODEProblem


def test_linear_ode_scalar_grid():
    # u' = cos(2πt), u(0) = 0 -> u = sin(2πt)/(2π)
    prob = ODEProblem(
        f=lambda u, p, t: jnp.cos(2 * jnp.pi * t),
        u0=0.0, tspan=(0.0, 1.0),
        analytic=lambda u0, p, t: np.sin(2 * np.pi * t) / (2 * np.pi),
    )
    alg = NNODE(mlp([1, 16, 1]), optax.adam(0.05))
    sol = solve_ode(prob, alg, dt=1 / 20.0, maxiters=800, abstol=1e-8, inner_steps=25)
    assert sol.errors["l2"] < 0.05  # reference tolerance: 0.5


def test_linear_decay_stochastic():
    # u' = -u, u(0) = 1
    prob = ODEProblem(
        f=lambda u, p, t: -u, u0=1.0, tspan=(0.0, 2.0),
        analytic=lambda u0, p, t: np.exp(-t),
    )
    alg = NNODE(mlp([1, 16, 1]), optax.adam(0.02),
                strategy=StochasticTraining(64))
    sol = solve_ode(prob, alg, maxiters=1200, abstol=1e-9, inner_steps=25)
    assert sol.errors["l2"] < 0.05


def test_vector_ode_system_grid():
    # harmonic oscillator: u1' = u2, u2' = -u1
    def f(u, p, t):
        return jnp.array([u[1], -u[0]])

    prob = ODEProblem(
        f=f, u0=np.array([1.0, 0.0]), tspan=(0.0, np.pi),
        analytic=lambda u0, p, t: np.array([np.cos(t), -np.sin(t)]),
    )
    alg = NNODE(mlp([1, 24, 24, 2]), optax.adam(0.02))
    sol = solve_ode(prob, alg, dt=np.pi / 40, maxiters=2500, abstol=1e-10, inner_steps=25)
    assert sol.errors["l2"] < 0.1
    assert sol.us.shape[1] == 2


def test_quadrature_training_default():
    prob = ODEProblem(
        f=lambda u, p, t: -u, u0=1.0, tspan=(0.0, 1.0),
        analytic=lambda u0, p, t: np.exp(-t),
    )
    alg = NNODE(mlp([1, 12, 1]), optax.adam(0.05),
                strategy=QuadratureTraining(order=8, panels=2))
    sol = solve_ode(prob, alg, maxiters=800, abstol=1e-12, inner_steps=25)
    assert sol.errors["l2"] < 0.05


def test_weighted_interval_training():
    prob = ODEProblem(
        f=lambda u, p, t: -u, u0=1.0, tspan=(0.0, 1.0),
        analytic=lambda u0, p, t: np.exp(-t),
    )
    alg = NNODE(mlp([1, 12, 1]), optax.adam(0.05),
                strategy=WeightedIntervalTraining([0.7, 0.2, 0.1], 90))
    sol = solve_ode(prob, alg, maxiters=800, abstol=1e-12, inner_steps=25)
    assert sol.errors["l2"] < 0.05


def test_autodiff_time_derivative():
    prob = ODEProblem(
        f=lambda u, p, t: -u, u0=1.0, tspan=(0.0, 1.0),
        analytic=lambda u0, p, t: np.exp(-t),
    )
    alg = NNODE(mlp([1, 12, 1]), optax.adam(0.05), autodiff=True)
    sol = solve_ode(prob, alg, dt=0.05, maxiters=600, abstol=1e-12, inner_steps=25)
    assert sol.errors["l2"] < 0.05


def test_interpolation_dense():
    prob = ODEProblem(f=lambda u, p, t: -u, u0=1.0, tspan=(0.0, 1.0))
    alg = NNODE(mlp([1, 12, 1]), optax.adam(0.05))
    sol = solve_ode(prob, alg, dt=0.05, maxiters=500, abstol=1e-12, inner_steps=25)
    mid = float(sol(0.5))
    assert abs(mid - np.exp(-0.5)) < 0.05


def test_param_estimation_with_dataset():
    # u' = p*u with true p = -1.2; recover p from data
    rng = np.random.default_rng(0)
    ts = np.linspace(0.0, 1.0, 40)
    us = np.exp(-1.2 * ts)
    W = np.full_like(ts, ts[1] - ts[0])
    prob = ODEProblem(f=lambda u, p, t: p[0] * u, u0=1.0, tspan=(0.0, 1.0),
                      p=np.array([-0.5]))
    alg = NNODE(mlp([1, 16, 1]), optax.adam(0.03), param_estim=True,
                dataset=[us, ts, W], estim_collocate=True)
    sol = solve_ode(prob, alg, dt=0.05, maxiters=2500, abstol=1e-12, inner_steps=25)
    p_est = float(sol.original.u["p"][0])
    assert abs(p_est - (-1.2)) < 0.05 * 1.2  # reference: |p̂-p| < 0.05 p


def test_tstops_blending():
    prob = ODEProblem(f=lambda u, p, t: -u, u0=1.0, tspan=(0.0, 1.0),
                      analytic=lambda u0, p, t: np.exp(-t))
    alg = NNODE(mlp([1, 12, 1]), optax.adam(0.05))
    sol = solve_ode(prob, alg, dt=0.1, maxiters=500, abstol=1e-12,
                    tstops=[0.33, 0.66])
    assert sol.errors["l2"] < 0.05


def test_quasirandom_rejected():
    prob = ODEProblem(f=lambda u, p, t: -u, u0=1.0, tspan=(0.0, 1.0))
    alg = NNODE(mlp([1, 8, 1]), optax.adam(0.05),
                strategy=QuasiRandomTraining(32))
    with pytest.raises(ValueError, match="StochasticTraining"):
        solve_ode(prob, alg, maxiters=10)


def test_param_estim_requires_data():
    prob = ODEProblem(f=lambda u, p, t: p[0] * u, u0=1.0, tspan=(0.0, 1.0),
                      p=np.array([1.0]))
    alg = NNODE(mlp([1, 8, 1]), optax.adam(0.05), param_estim=True)
    with pytest.raises(ValueError, match="[Dd]ataset"):
        solve_ode(prob, alg, dt=0.1, maxiters=10)


def test_complex_ode():
    """Complex-valued ODE u' = i·u (reference: SciMLBase.allowscomplex(::NNODE),
    src/ode_solve.jl:363; complex chains in test/NNODE).  complex64 — C128 is
    unsupported on TPU, so x64 is disabled for this test."""
    import jax

    jax.config.update("jax_enable_x64", False)
    try:
        # complex64 matmul is UNIMPLEMENTED on this TPU runtime (and can wedge
        # the device) — run this test on the host CPU backend.
        with jax.default_device(jax.devices("cpu")[0]):
            _run_complex_ode()
    finally:
        jax.config.update("jax_enable_x64", True)


def _run_complex_ode():
    import jax

    net = mlp([1, 16, 1], activation=jnp.tanh)
    p0 = jax.tree.map(lambda x: x.astype(jnp.complex64),
                      net.init(jax.random.key(0)))
    prob = ODEProblem(f=lambda u, p, t: 1j * u,
                      u0=np.complex64(1.0 + 0j), tspan=(0.0, 2.0))
    alg = NNODE(net, optax.adam(0.02), init_params=p0)
    sol = solve_ode(prob, alg, dt=0.05, maxiters=2000, abstol=1e-10,
                    inner_steps=25)
    ts = np.linspace(0, 2, 20, dtype=np.float32)
    pred = np.asarray(sol(jnp.asarray(ts)))
    want = np.exp(1j * ts)
    assert np.abs(pred - want).max() < 0.1
