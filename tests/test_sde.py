"""NNSDE + SDEPINN tests (reference groups: test/NNSDE1/, test/NNSDE2/)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from neuralpde_tpu import Chain, Dense, mlp
from neuralpde_tpu.nn.core import sigmoid
from neuralpde_tpu.solvers.problems import SDEProblem
from neuralpde_tpu.solvers.sde import NNSDE, add_rand_coeff, add_rand_coeff_2, solve_sde
from neuralpde_tpu.solvers.sde_weak import SDEPINN, solve_sde_weak
from neuralpde_tpu.ops.distributions import Normal


def test_rand_coeff_shapes():
    ts = jnp.linspace(0, 1, 5)
    weak = add_rand_coeff(jax.random.key(0), ts, 3, 4, jnp.float64)
    strong = add_rand_coeff_2(jax.random.key(0), ts, 3, 4, jnp.float64)
    assert weak.shape == (4, 5, 4) and strong.shape == (4, 5, 4)
    # strong: same z across timepoints; weak: not
    assert np.allclose(np.asarray(strong[1:, 0, :]), np.asarray(strong[1:, 3, :]))
    assert not np.allclose(np.asarray(weak[1:, 0, :]), np.asarray(weak[1:, 3, :]))


def test_nnsde_gbm_weak_solution():
    """GBM du = 1.2 u dt + 0.2 u dW; E[u(t)] = u0 exp(1.2 t)
    (reference: test/NNSDE1/nn_sde__test_2_gbm_sde.jl pattern)."""
    mu_, sigma_ = 1.2, 0.2
    prob = SDEProblem(f=lambda u, p, t: mu_ * u, g=lambda u, p, t: sigma_ * u,
                      u0=1.0, tspan=(0.0, 1.0))
    n_z = 3
    chain = mlp([1 + n_z, 16, 16, 1], activation=sigmoid)
    alg = NNSDE(chain, optax.adam(0.02), sub_batch=8, numensemble=40)
    sol = solve_sde(prob, alg, dt=1 / 50.0, maxiters=2000, abstol=1e-12,
                    inner_steps=25)
    ts = np.asarray(sol.timepoints)
    mean_pred = np.asarray([float(p.mean) for p in sol.estimated_sol[0]])
    want = np.exp(mu_ * ts)
    rel = np.abs(mean_pred - want) / np.abs(want)
    assert rel.mean() < 0.15


def test_nnsde_strong_training_runs():
    prob = SDEProblem(f=lambda u, p, t: -u, g=lambda u, p, t: 0.1,
                      u0=0.5, tspan=(0.0, 1.0))
    chain = mlp([3, 12, 1], activation=sigmoid)
    alg = NNSDE(chain, optax.adam(0.02), sub_batch=3, strong_loss=True)
    sol = solve_sde(prob, alg, dt=1 / 20.0, maxiters=400, abstol=1e-12,
                    inner_steps=25)
    assert np.isfinite(sol.original.objective)
    assert len(sol.estimated_sol[0]) == len(sol.timepoints)


def test_nnsde_inverse_em_loss():
    """Recover drift parameter from observed paths via the Euler-Maruyama
    moment-matching loss (reference: NNSDE inverse tests)."""
    true_mu = 0.8
    rng = np.random.default_rng(1)
    ts = np.linspace(0.0, 1.0, 80)
    dt = ts[1] - ts[0]
    paths = []
    for _ in range(6):
        x = [1.0]
        for i in range(len(ts) - 1):
            x.append(x[-1] + true_mu * x[-1] * dt
                     + 0.1 * x[-1] * np.sqrt(dt) * rng.standard_normal())
        paths.append(np.asarray(x))
    dataset = [paths, ts]
    prob = SDEProblem(f=lambda u, p, t: p[0] * u,
                      g=lambda u, p, t: 0.1 * u,
                      u0=1.0, tspan=(0.0, 1.0), p=np.array([0.3]))
    chain = mlp([3, 12, 1], activation=sigmoid)
    alg = NNSDE(chain, optax.adam(0.02), sub_batch=4, param_estim=True,
                dataset=dataset)
    sol = solve_sde(prob, alg, dt=1 / 25.0, maxiters=1500, abstol=1e-12,
                    inner_steps=25)
    assert abs(sol.estimated_params[0] - true_mu) < 0.15


def test_sdepinn_fokker_planck_ou():
    """OU process dX = -θX dt + σ dW: stationary density is
    N(0, σ²/(2θ)) (reference: test/NNSDE2/nn_sde_weaksolve__ou_process.jl)."""
    theta_, sigma_ = 1.0, 0.5
    prob = SDEProblem(f=lambda x, p, t: -theta_ * x,
                      g=lambda x, p, t: sigma_,
                      u0=0.0, tspan=(0.0, 3.0))
    chain = mlp([2, 16, 16, 1], activation=jnp.tanh,
                out_activation=lambda z: jax.nn.softplus(z))
    alg = SDEPINN(chain=chain, x_0=-2.0, x_end=2.0, Nt=15, dx=0.1,
                  distrib=Normal(0.0, 0.2), optimalg=optax.adam(0.01),
                  lambda_norm=10.0)
    res, phi, pinnrep = solve_sde_weak(prob, alg, maxiters=2500,
                                       inner_steps=25)
    # late-time density ≈ stationary Gaussian
    xs = np.linspace(-2, 2, 41)
    cord = jnp.asarray(np.stack([xs, np.full_like(xs, 3.0)]))
    dens = np.asarray(phi(cord, res.u["depvar"])[0])
    var_st = sigma_**2 / (2 * theta_)
    want = np.exp(-xs**2 / (2 * var_st)) / np.sqrt(2 * np.pi * var_st)
    # normalized shape comparison (loose: small net, short training)
    dens_n = dens / np.trapezoid(dens, xs)
    assert np.max(np.abs(dens_n - want)) < 0.35


def test_nnsde_tstops_blending():
    prob = SDEProblem(f=lambda u, p, t: -u, g=lambda u, p, t: 0.1,
                      u0=1.0, tspan=(0.0, 1.0))
    chain = mlp([3, 10, 1], activation=sigmoid)
    alg = NNSDE(chain, optax.adam(0.02), sub_batch=4)
    sol = solve_sde(prob, alg, dt=1 / 20, maxiters=300, abstol=1e-12,
                    tstops=[0.33, 0.66], inner_steps=25)
    assert np.isfinite(sol.original.objective)


def test_nnsde_moment_loss_inverse():
    """moment_loss=True path: mean/variance matching against strong
    observations (reference: src/NN_SDE_solve.jl:403-449)."""
    true_mu = 0.8
    rng = np.random.default_rng(2)
    ts = np.linspace(0.0, 1.0, 40)
    dt = ts[1] - ts[0]
    paths = []
    for _ in range(8):
        x = [1.0]
        for i in range(len(ts) - 1):
            x.append(x[-1] + true_mu * x[-1] * dt
                     + 0.1 * x[-1] * np.sqrt(dt) * rng.standard_normal())
        paths.append(np.asarray(x))
    prob = SDEProblem(f=lambda u, p, t: p[0] * u, g=lambda u, p, t: 0.1 * u,
                      u0=1.0, tspan=(0.0, 1.0), p=np.array([0.4]))
    chain = mlp([3, 12, 1], activation=sigmoid)
    alg = NNSDE(chain, optax.adam(0.02), sub_batch=4, param_estim=True,
                dataset=[paths, ts], moment_loss=True)
    sol = solve_sde(prob, alg, dt=1 / 25.0, maxiters=1200, abstol=1e-12,
                    inner_steps=25)
    assert np.isfinite(sol.original.objective)
    assert abs(sol.estimated_params[0] - true_mu) < 0.2


def test_sdepinn_fokker_planck_gbm():
    """GBM Fokker-Planck weak solve: density at t=1 ≈ lognormal
    (reference: test/NNSDE2 GBM weaksolve case)."""
    mu_, s_ = 0.3, 0.25
    prob = SDEProblem(f=lambda x, p, t: mu_ * x, g=lambda x, p, t: s_ * x,
                      u0=1.0, tspan=(0.0, 1.0))
    chain = mlp([2, 16, 16, 1], activation=jnp.tanh,
                out_activation=jax.nn.softplus)
    alg = SDEPINN(chain=chain, x_0=0.2, x_end=3.0, Nt=12, dx=0.07,
                  distrib=Normal(1.0, 0.1), optimalg=optax.adam(0.01),
                  lambda_norm=10.0)
    res, phi, pinnrep = solve_sde_weak(prob, alg, maxiters=3000,
                                       inner_steps=25)
    xs = np.linspace(0.3, 2.8, 40)
    cord = jnp.asarray(np.stack([xs, np.ones_like(xs)]))
    dens = np.asarray(phi(cord, res.u["depvar"])[0])
    m = (mu_ - 0.5 * s_**2) * 1.0
    want = np.exp(-(np.log(xs) - m) ** 2 / (2 * s_**2)) / (
        xs * s_ * np.sqrt(2 * np.pi))
    dens_n = dens / np.trapezoid(dens, xs)
    want_n = want / np.trapezoid(want, xs)
    assert np.max(np.abs(dens_n - want_n)) < 0.25
