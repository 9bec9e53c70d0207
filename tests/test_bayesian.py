"""Bayesian layer tests: HMC/NUTS kernels + BPINN ODE
(reference test groups: test/ODEBPINN/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralpde_tpu import mlp
from neuralpde_tpu.bayesian import hmc
from neuralpde_tpu.bayesian.ode import BNNODE, ahmc_bayesian_pinn_ode, solve_bnnode
from neuralpde_tpu.ops.distributions import Normal
from neuralpde_tpu.solvers.problems import ODEProblem


def test_hmc_gaussian_moments():
    """HMC recovers mean/std of a diagonal Gaussian."""
    mu = jnp.asarray([1.0, -2.0])
    sigma = jnp.asarray([0.5, 2.0])

    def logdensity(q):
        return -0.5 * jnp.sum(((q - mu) / sigma) ** 2)

    res = hmc.sample(logdensity, jnp.zeros(2), jax.random.key(0),
                     draw_samples=4000, kernel="hmc", n_leapfrog=20,
                     init_step_size=0.25)
    tail = np.asarray(res.samples[3000:])  # warmup = first 2/3 of draws
    np.testing.assert_allclose(tail.mean(0), np.asarray(mu), atol=0.3)
    np.testing.assert_allclose(tail.std(0), np.asarray(sigma), rtol=0.3)
    assert res.accept_prob[3000:].mean() > 0.5


def test_nuts_correlated_gaussian():
    """NUTS on a correlated 2-D Gaussian (harder geometry)."""
    # precision for cov [[1, .9], [.9, 1]] (avoid f64 linalg.inv on TPU)
    cov = np.asarray([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def logdensity(q):
        return -0.5 * q @ prec @ q

    res = hmc.sample(logdensity, jnp.zeros(2) + 3.0, jax.random.key(0),
                     draw_samples=2600, kernel="nuts", max_depth=6,
                     init_step_size=0.2)
    tail = np.asarray(res.samples[1750:])
    np.testing.assert_allclose(tail.mean(0), [0.0, 0.0], atol=0.3)
    emp_cov = np.cov(tail.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.4)


def test_bpinn_ode_forward():
    """Forward Bayesian solve of u' = -u (reference: test/ODEBPINN
    forward-solve pattern); ensemble mean tracks exp(-t)."""
    prob = ODEProblem(f=lambda u, p, t: -u, u0=1.0, tspan=(0.0, 1.0))
    chain = mlp([1, 8, 1])
    alg = BNNODE(chain, draw_samples=400, phystd=(0.05,),
                 priorsNNw=(0.0, 3.0), physdt=1 / 20.0, numensemble=150,
                 n_leapfrog=20)
    sol = solve_bnnode(prob, alg)
    mean_curve = np.asarray(sol.ensemblesol[0].mean)
    want = np.exp(-np.asarray(sol.timepoints))
    assert np.sqrt(np.mean((mean_curve - want) ** 2)) < 0.1


def test_bpinn_ode_inverse_parameter_recovery():
    """Inverse: recover decay rate p from noisy data (reference:
    bpinn__bpinn_ode inverse tests, |p̂-p| < 0.05-0.2 p)."""
    true_p = 1.5
    rng = np.random.default_rng(0)
    ts = np.linspace(0.0, 1.5, 60)
    us = np.exp(-true_p * ts) + 0.02 * rng.standard_normal(len(ts))
    dataset = [us, ts, np.full_like(ts, ts[1] - ts[0])]
    prob = ODEProblem(f=lambda u, p, t: -p * u, u0=1.0, tspan=(0.0, 1.5),
                      p=1.0)
    chain = mlp([1, 8, 1])
    samples, stats, ltd = ahmc_bayesian_pinn_ode(
        prob, chain, dataset=dataset, draw_samples=500,
        l2std=(0.05,), phystd=(0.05,), priorsNNw=(0.0, 3.0),
        param=[Normal(2.0, 1.0)], n_leapfrog=20, estim_collocate=True)
    p_est = float(np.mean(np.asarray(samples[-200:, -1])))
    assert abs(p_est - true_p) < 0.2 * true_p


def test_find_good_stepsize_finite():
    def logdensity(q):
        return -0.5 * jnp.sum(q**2)

    eps = hmc.find_good_stepsize(logdensity, jnp.zeros(3), jax.random.key(0))
    assert 1e-6 < eps < 1e3


def test_hmcda_kernel():
    """HMCDA (trajectory-length) kernel sanity on a Gaussian."""
    def logdensity(q):
        return -0.5 * jnp.sum(q**2)

    res = hmc.sample(logdensity, jnp.zeros(2) + 1.5, jax.random.key(0),
                     draw_samples=800, kernel="hmcda", lam=1.0,
                     init_step_size=0.3)
    tail = np.asarray(res.samples[550:])
    np.testing.assert_allclose(tail.mean(0), [0.0, 0.0], atol=0.35)
    np.testing.assert_allclose(tail.std(0), [1.0, 1.0], rtol=0.35)


def test_bnnode_multichain():
    """nchains > 1 returns stacked chains (reference: Threads.@threads
    loop; here sequential/vmappable)."""
    prob = ODEProblem(f=lambda u, p, t: -u, u0=1.0, tspan=(0.0, 1.0))
    chain = mlp([1, 6, 1])
    samples, stats, ltd = ahmc_bayesian_pinn_ode(
        prob, chain, draw_samples=120, phystd=(0.05,), priorsNNw=(0.0, 3.0),
        nchains=2, n_leapfrog=10)
    assert samples.shape[0] == 2 and samples.shape[1] == 120


def test_bnnode_lotka_volterra_inverse():
    """Flagship Bayesian inverse: 4-parameter Lotka-Volterra recovery with
    the Data Quadrature loglikelihood (reference tolerance:
    |p̂-p| < 0.05-0.1 p, bpinn__bpinn_ode_iv_inverse_solve_improvement.jl)."""
    from neuralpde_tpu.bayesian.ode import solve_bnnode
    from neuralpde_tpu.nn.core import sigmoid

    alpha, beta, gamma, delta = 1.5, 1.0, 3.0, 1.0

    def f(u, p, t):
        return jnp.array([p[0] * u[0] - p[1] * u[0] * u[1],
                          -p[2] * u[1] + p[3] * u[0] * u[1]])

    def fnp(u, p):
        return np.array([p[0] * u[0] - p[1] * u[0] * u[1],
                         -p[2] * u[1] + p[3] * u[0] * u[1]])

    p_true = np.array([alpha, beta, gamma, delta])
    ts = np.linspace(0, 2.0, 80)
    us = [np.array([1.0, 1.0])]
    for i in range(len(ts) - 1):
        h = ts[i + 1] - ts[i]
        u_ = us[-1]
        k1 = fnp(u_, p_true); k2 = fnp(u_ + h / 2 * k1, p_true)
        k3 = fnp(u_ + h / 2 * k2, p_true); k4 = fnp(u_ + h * k3, p_true)
        us.append(u_ + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4))
    traj = np.stack(us)
    rng = np.random.default_rng(0)
    noisy = traj + 0.01 * traj.std(0) * rng.standard_normal(traj.shape)
    dataset = [noisy[:, 0], noisy[:, 1], ts, np.full_like(ts, ts[1] - ts[0])]
    prob = ODEProblem(f=f, u0=np.array([1.0, 1.0]), tspan=(0.0, 2.0),
                      p=np.array([1.0, 1.0, 2.0, 1.0]))
    alg = BNNODE(mlp([1, 16, 16, 2], activation=sigmoid), dataset=dataset,
                 draw_samples=1200, l2std=(0.02, 0.02), phystd=(0.05, 0.05),
                 priorsNNw=(0.0, 3.0),
                 param=(Normal(2.0, 1.0), Normal(1.5, 1.0), Normal(2.5, 1.0),
                        Normal(1.5, 1.0)),
                 estim_collocate=True, n_leapfrog=25, numensemble=400)
    sol = solve_bnnode(prob, alg)
    est = np.array([float(p.mean) for p in sol.estimated_de_params])
    assert np.all(np.abs(est - p_true) < 0.05 * p_true), est
