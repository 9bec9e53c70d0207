"""Bayesian PDE PINN tests (reference group: test/PDEBPINN/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from neuralpde_tpu import (
    BayesianPINN, DepVar, Differential, Domain, Eq, GridTraining, Interval,
    Normal, Param, PDESystem, ahmc_bayesian_pinn_pde, mlp, symbols,
)
from neuralpde_tpu.nn.core import sigmoid


def test_bpinn_pde_forward():
    """Forward Bayesian solve of u' = cos(2πt) (reference:
    bpinn_pde forward tests); ensemble mean tracks the analytic solution."""
    t = symbols("t")
    u = DepVar("u")
    Dt = Differential(t)
    eq = Eq(Dt(u(t)), npde_cos(2 * np.pi * t))
    bcs = [Eq(u(0.0), 0.0)]
    system = PDESystem(eq, bcs, [Domain(t, Interval(0, 1))], [t], [u(t)])
    disc = BayesianPINN(mlp([1, 10, 1], activation=sigmoid), GridTraining(0.05))
    sol = ahmc_bayesian_pinn_pde(
        system, disc, draw_samples=350, bcstd=[0.02], phystd=[0.05],
        priorsNNw=(0.0, 3.0), saveats=[0.02], n_leapfrog=20)
    curve = np.asarray(sol.ensemblesol[0].mean)
    ts = np.asarray(sol.timepoints[0][0])
    want = np.sin(2 * np.pi * ts) / (2 * np.pi)
    assert np.sqrt(np.mean((curve - want) ** 2)) < 0.1


def npde_cos(e):
    from neuralpde_tpu import cos
    return cos(e)


def test_bpinn_pde_inverse_parameter_recovery():
    """Inverse: recover decay rate from data (reference:
    bpinn_pde inverse tests, param error < 0.3·true)."""
    t = symbols("t")
    u = DepVar("u")
    lam = Param("lam")
    Dt = Differential(t)
    true_lam = 2.0
    eq = Eq(Dt(u(t)), -lam * u(t))
    bcs = [Eq(u(0.0), 1.0)]
    system = PDESystem(eq, bcs, [Domain(t, Interval(0, 1))], [t], [u(t)],
                       ps=[lam])

    rng = np.random.default_rng(0)
    ts = np.linspace(0.0, 1.0, 40)
    us = np.exp(-true_lam * ts) + 0.02 * rng.standard_normal(len(ts))
    dataset_pde = [np.column_stack([us, ts])]

    disc = BayesianPINN(mlp([1, 10, 1], activation=sigmoid),
                        GridTraining(0.05), dataset=(dataset_pde, None),
                        param_estim=True)
    sol = ahmc_bayesian_pinn_pde(
        system, disc, draw_samples=400, bcstd=[0.02], phystd=[0.05],
        l2std=[0.05], priorsNNw=(0.0, 3.0), param=[Normal(1.0, 1.0)],
        saveats=[0.02], n_leapfrog=20)
    lam_est = float(sol.estimated_de_params[0].mean)
    assert abs(lam_est - true_lam) < 0.3 * true_lam


def test_bpinn_pde_inverse_with_collocation_likelihood():
    """estim_collocate path: dataset-collocation loglikelihood improves
    parameter recovery (reference: Dict_differentials/get_lossy,
    ext/bpinn/PDE_BPINN.jl:29-115; improvement test
    bpinn__bpinn_ode_iv_inverse_solve_improvement.jl pattern)."""
    t = symbols("t")
    u = DepVar("u")
    lam = Param("lam")
    Dt = Differential(t)
    true_lam = 2.0
    eq = Eq(Dt(u(t)), -lam * u(t))
    bcs = [Eq(u(0.0), 1.0)]
    system = PDESystem(eq, bcs, [Domain(t, Interval(0, 1))], [t], [u(t)],
                       ps=[lam])
    rng = np.random.default_rng(1)
    ts = np.linspace(0.0, 1.0, 40)
    us = np.exp(-true_lam * ts) + 0.02 * rng.standard_normal(len(ts))
    dataset_pde = [np.column_stack([us, ts])]
    disc = BayesianPINN(mlp([1, 10, 1], activation=sigmoid),
                        GridTraining(0.05), dataset=(dataset_pde, None),
                        param_estim=True)
    sol = ahmc_bayesian_pinn_pde(
        system, disc, draw_samples=400, bcstd=[0.02], phystd=[0.05],
        l2std=[0.05], phynewstd=[0.05], priorsNNw=(0.0, 3.0),
        param=[Normal(1.0, 1.0)], saveats=[0.02], n_leapfrog=20,
        estim_collocate=True)
    lam_est = float(sol.estimated_de_params[0].mean)
    assert abs(lam_est - true_lam) < 0.15 * true_lam


def test_bpinn_2d_poisson_forward():
    """Bayesian forward solve of the 2D Poisson equation — a genuine
    multi-dimensional PDE through the HMC path (reference:
    test/PDEBPINN 2D cases)."""
    x, y = symbols("x y")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    Dyy = Differential(y) ** 2
    from neuralpde_tpu import sin as nsin

    eq = Eq(Dxx(u(x, y)) + Dyy(u(x, y)),
            -nsin(np.pi * x) * nsin(np.pi * y))
    bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
           Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    disc = BayesianPINN(mlp([2, 10, 1], activation=sigmoid),
                        GridTraining(0.2))
    sol = ahmc_bayesian_pinn_pde(
        system, disc, draw_samples=400, bcstd=[0.01] * 4, phystd=[0.05],
        priorsNNw=(0.0, 2.0), saveats=[0.1, 0.1], n_leapfrog=20)
    mean_curve = np.asarray(sol.ensemblesol[0].mean)
    cord = np.asarray(sol.timepoints[0])
    want = (np.sin(np.pi * cord[0]) * np.sin(np.pi * cord[1])
            / (2 * np.pi**2))
    assert np.sqrt(np.mean((mean_curve - want) ** 2)) < 0.05


def test_bpinn_ode_with_nuts_kernel():
    """NUTS kernel end-to-end through the BPINN ODE driver."""
    t = symbols("t")
    u = DepVar("u")
    Dt = Differential(t)
    eq = Eq(Dt(u(t)), -u(t))
    bcs = [Eq(u(0.0), 1.0)]
    system = PDESystem(eq, bcs, [Domain(t, Interval(0, 1))], [t], [u(t)])
    disc = BayesianPINN(mlp([1, 8, 1], activation=sigmoid), GridTraining(0.1))
    sol = ahmc_bayesian_pinn_pde(
        system, disc, draw_samples=250, bcstd=[0.02], phystd=[0.05],
        priorsNNw=(0.0, 2.0), saveats=[0.05], Kernel="nuts", max_depth=6)
    curve = np.asarray(sol.ensemblesol[0].mean)
    ts = np.asarray(sol.timepoints[0][0])
    assert np.sqrt(np.mean((curve - np.exp(-ts)) ** 2)) < 0.1


@pytest.mark.slow
def test_bpinn_pde_lorenz_inverse():
    """Reference headline PDEBPINN test: Lorenz-system σ inversion,
    Σ|p̂−σ| < 0.3σ (bpinn_pde__bpinn_pde_inv_ii_lorenz_system.jl:73) —
    multioutput Bayesian PDE path with dataset + collocation likelihood."""
    import pytest as _pytest

    sigma_t, rho_t, beta_t = 10.0, 28.0, 8.0 / 3.0
    t = symbols("t")
    X, Y, Z = DepVar("x"), DepVar("y"), DepVar("z")
    sig = Param("sig")
    Dt = Differential(t)
    eqs = [Eq(Dt(X(t)), sig * (Y(t) - X(t))),
           Eq(Dt(Y(t)), X(t) * (rho_t - Z(t)) - Y(t)),
           Eq(Dt(Z(t)), X(t) * Y(t) - beta_t * Z(t))]
    bcs = [Eq(X(0.0), 1.0), Eq(Y(0.0), 0.0), Eq(Z(0.0), 0.0)]
    system = PDESystem(eqs, bcs, [Domain(t, Interval(0, 1))], [t],
                       [X(t), Y(t), Z(t)], ps=[sig])

    def fnp(u):
        return np.array([sigma_t * (u[1] - u[0]),
                         u[0] * (rho_t - u[2]) - u[1],
                         u[0] * u[1] - beta_t * u[2]])

    ts = np.linspace(0, 1.0, 100)
    us = [np.array([1.0, 0.0, 0.0])]
    for i in range(len(ts) - 1):
        h = ts[i + 1] - ts[i]
        u_ = us[-1]
        k1 = fnp(u_); k2 = fnp(u_ + h / 2 * k1)
        k3 = fnp(u_ + h / 2 * k2); k4 = fnp(u_ + h * k3)
        us.append(u_ + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4))
    traj = np.stack(us)
    rng = np.random.default_rng(0)
    noisy = traj + 0.05 * np.abs(traj).mean(0) * rng.standard_normal(traj.shape)
    dataset_pde = [np.column_stack([noisy[:, i], ts]) for i in range(3)]

    chains = [mlp([1, 16, 16, 1], activation=sigmoid) for _ in range(3)]
    disc = BayesianPINN(chains, GridTraining(0.02),
                        dataset=(dataset_pde, None), param_estim=True)
    sol = ahmc_bayesian_pinn_pde(
        system, disc, draw_samples=700, bcstd=[0.5] * 3, phystd=[1.0] * 3,
        l2std=[0.5] * 3, phynewstd=[1.0] * 3, priorsNNw=(0.0, 2.0),
        param=[Normal(12.0, 3.0)], saveats=[0.05], n_leapfrog=25,
        estim_collocate=True)
    est = float(sol.estimated_de_params[0].mean)
    assert abs(est - sigma_t) < 0.3 * sigma_t  # reference tolerance


def test_bpinn_separable_loglik_matches_grid():
    """SeparableTraining physics loglikelihood == GridTraining loglikelihood
    on the same tensor grid (factorized evaluation, bit-parity), and the
    sampler runs end-to-end on the separable path."""
    from neuralpde_tpu import SeparableTraining, separable_mlp
    from neuralpde_tpu.bayesian.pde import PDELogTargetDensity

    x, y = symbols("x y")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    Dyy = Differential(y) ** 2
    from neuralpde_tpu import sin as nsin
    eq = Eq(Dxx(u(x, y)) + Dyy(u(x, y)),
            -nsin(np.pi * x) * nsin(np.pi * y))
    bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0)]
    domains = [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))]
    system = PDESystem(eq, bcs, domains, [x, y], [u(x, y)])

    net = separable_mlp(2, (8, 8), 6)

    def make_ld(strategy):
        disc = BayesianPINN(net, strategy)
        from neuralpde_tpu import symbolic_discretize
        pinnrep = symbolic_discretize(system, disc)
        return PDELogTargetDensity(
            pinnrep, dataset=None, priors_nn=Normal(0.0, 3.0),
            param_priors=[], allstd=([0.05], [0.01, 0.01], []),
            phynewstd=[0.05])

    ld_grid = make_ld(GridTraining(1 / 8))
    ld_sep = make_ld(SeparableTraining(dx=1 / 8))
    theta = ld_grid.init_flat_nn
    lg = float(ld_grid.full_loglikelihood(ld_grid.setparameters(theta)))
    ls = float(ld_sep.full_loglikelihood(ld_sep.setparameters(theta)))
    np.testing.assert_allclose(ls, lg, rtol=1e-10)

    # the sampler runs end-to-end with the factorized likelihood
    disc = BayesianPINN(net, SeparableTraining(dx=1 / 8))
    sol = ahmc_bayesian_pinn_pde(
        system, disc, draw_samples=60, bcstd=[0.05, 0.05], phystd=[0.1],
        priorsNNw=(0.0, 3.0), saveats=[0.25, 0.25], n_leapfrog=10)
    arr = np.asarray([p.mean for p in np.ravel(sol.ensemblesol[0])])
    assert np.all(np.isfinite(arr))


def test_bpinn_non_deterministic_strategy_rejected():
    from neuralpde_tpu import StochasticTraining, symbolic_discretize
    from neuralpde_tpu.bayesian.pde import PDELogTargetDensity

    t = symbols("t")
    u = DepVar("u")
    eq = Eq(Differential(t)(u(t)), -u(t))
    system = PDESystem(eq, [Eq(u(0.0), 1.0)],
                       [Domain(t, Interval(0, 1))], [t], [u(t)])
    disc = BayesianPINN(mlp([1, 8, 1]), StochasticTraining(32))
    pinnrep = symbolic_discretize(system, disc)
    with pytest.raises(ValueError, match="deterministic"):
        PDELogTargetDensity(pinnrep, dataset=None,
                            priors_nn=Normal(0.0, 3.0), param_priors=[],
                            allstd=([0.05], [0.01], []),
                            phynewstd=[0.05])
