"""Second coverage sweep: reference test cases not mirrored elsewhere —
PINO with a data loss (test/PINOODE/pino_ode__example_with_data_du_p_t_2.jl)
and the steady Fokker-Planck equation with a normalization additional loss
(test/NNPDE2/additional_loss__fokker_planck.jl)."""

import numpy as np
import jax.numpy as jnp
import optax

from neuralpde_tpu import (
    DeepONet, DepVar, Differential, Domain, Eq, GridTraining, Interval, PDESystem,
    PhysicsInformedNN, StochasticTraining, discretize, mlp, solve, symbols,
)
from neuralpde_tpu.solvers.pino import PINOODE, solve_pino_ode
from neuralpde_tpu.solvers.problems import ODEProblem


def test_pino_with_data_loss():
    """du/dt = p·t² family (u = u0 + p t³/3) trained with physics + data
    loss (reference: pino_ode__example_with_data_du_p_t_2.jl)."""
    prob = ODEProblem(f=lambda u, p, t: p * t**2, u0=0.5, tspan=(0.0, 1.0))

    # ground-truth observations over a coarse (p, t) grid
    p_data = jnp.asarray(np.linspace(0.2, 1.8, 10)[None, :])
    t_data = jnp.asarray(np.linspace(0.0, 1.0, 12)[None, :])
    u_data = 0.5 + p_data[0][None, :] * t_data[0][:, None] ** 3 / 3.0  # (T, P)

    def data_loss(phi, theta):
        pred = phi((p_data, t_data), theta)           # (T, P)
        return jnp.mean((pred - u_data) ** 2)

    chain = DeepONet(mlp([1, 16, 16]), mlp([1, 16, 16]))
    alg = PINOODE(chain, optax.adam(0.01), bounds=[(0.1, 2.0)],
                  number_of_parameters=40, strategy=StochasticTraining(50),
                  additional_loss=data_loss)
    sol = solve_pino_ode(prob, alg, maxiters=4000, inner_steps=25)

    ps = np.linspace(0.2, 1.9, 20)
    ts = np.linspace(0.0, 1.0, 30)
    pred = np.asarray(sol(ps[None, :], ts[None, :]))  # (T, P)
    want = 0.5 + ps[None, :] * ts[:, None] ** 3 / 3.0
    rel = np.abs(pred - want) / np.abs(want)
    assert rel.mean() < 0.05  # reference uses data+physics, rtol 0.05


def test_fokker_planck_steady_with_normalization_loss():
    """Steady Fokker-Planck for the bistable drift f = αx − βx³:
    d/dx[(αx − βx³) ρ] = (σ²/2) ρ''  on  [-2.2, 2.2], ρ(±2.2) = 0, with the
    normalization constraint ∫ρ = 1 imposed as an additional loss
    (reference: test/NNPDE2/additional_loss__fokker_planck.jl).

    Well-posedness note: the steady equation only fixes ∂x(fρ − Dρ') = 0, so
    fρ − Dρ' = J for ANY constant flux J is an exact zero-residual mode, and
    both the J=0 and J≠0 branches vanish at ±2.2 to ~e⁻¹⁸ — the reference
    formulation is non-unique up to this mode and relies on optimizer bias.
    We pin the physical zero-flux branch with the extra condition ρ'(0) = 0
    (J = −Dρ'(0) since f(0) = 0), which makes training converge to the
    analytic stationary density ρ ∝ exp((αx² − βx⁴/2)/σ²) to ~1e-3."""
    alpha, beta, sigma = 0.3, 0.5, 0.5
    lo, hi = -2.2, 2.2
    x = symbols("x")
    rho = DepVar("rho")
    Dx = Differential(x)
    Dxx = Differential(x) ** 2

    scale = 8.0  # residual scaling: the bare operator is small vs unit density
    eq = Eq(scale * Dx((alpha * x - beta * x**3) * rho(x))
            - scale * (sigma**2 / 2.0) * Dxx(rho(x)), 0.0)
    bcs = [Eq(rho(lo), 0.0), Eq(rho(hi), 0.0), Eq(Dx(rho(0.0)), 0.0)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(lo, hi))], [x],
                       [rho(x)])

    dx = 0.01
    xs_norm = jnp.asarray(np.arange(lo, hi + dx / 2, dx)[None, :])

    def norm_loss(phi, theta, p):
        total = jnp.sum(phi(xs_norm, theta)[0]) * dx
        return 10.0 * (total - 1.0) ** 2

    disc = PhysicsInformedNN(mlp([1, 16, 16, 1]), GridTraining(0.01),
                             additional_loss=norm_loss)
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.01), maxiters=8000, inner_steps=25)
    res = solve(prob.with_params(res.u), optax.lbfgs(), maxiters=1500,
                inner_steps=10)

    xs = np.linspace(lo, hi, 101)
    pred = np.asarray(disc.phi(jnp.asarray(xs[None, :]),
                               res.u["depvar"])[0])
    dens = np.exp((alpha * xs**2 - beta * xs**4 / 2.0) / sigma**2)
    dens = dens / np.trapezoid(dens, xs)
    rel = np.sqrt(np.mean((pred - dens) ** 2)) / np.sqrt(np.mean(dens**2))
    assert rel < 0.05
    assert abs(np.trapezoid(pred, xs) - 1.0) < 0.02


def test_bpinn_third_order_ode():
    """BPINN PDE III analog (reference:
    test/PDEBPINN/bpinn_pde__bpinn_pde_iii_3rd_degree_ode.jl): u''' = cos(πx).
    The reference must decompose into auxiliary first-order variables with
    perturbation-linked BCs; here the jvp derivative engine nests to any
    order, so the 3rd-order equation is solved directly.  Manufactured
    solution u = -sin(πx)/π³ via u(0)=0, u(1)=0, u'(1)=1/π²."""
    import jax
    from neuralpde_tpu import BayesianPINN, cos as npde_cos
    from neuralpde_tpu.bayesian.pde import ahmc_bayesian_pinn_pde
    from neuralpde_tpu.nn import sigmoid

    x = symbols("x")
    u = DepVar("u")
    Dx = Differential(x)
    D3 = Differential(x) ** 3
    pi = np.pi
    eq = Eq(D3(u(x)), npde_cos(pi * x))
    bcs = [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0), Eq(Dx(u(1.0)), 1.0 / pi**2)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])

    disc = BayesianPINN(mlp([1, 10, 1], activation=sigmoid),
                        GridTraining(0.05))
    sol = ahmc_bayesian_pinn_pde(
        system, disc, draw_samples=400, bcstd=[0.01, 0.01, 0.01],
        phystd=[0.01], priorsNNw=(0.0, 3.0), saveats=[0.02], n_leapfrog=20)
    pred = np.asarray(sol.ensemblesol[0].mean)
    xs = np.asarray(sol.timepoints[0][0])
    want = -np.sin(pi * xs) / pi**3
    assert np.sqrt(np.mean((pred - want) ** 2)) < 0.02


def test_dgm_burgers_traveling_wave():
    """DGM on viscous Burgers u_t + u u_x = ν u_xx (reference:
    test/DGM/dgm__burger_s_equation.jl) validated against the exact
    traveling-wave solution u = c − a·tanh(a(x − ct)/2ν)."""
    import neuralpde_tpu as npde
    from neuralpde_tpu import DeepGalerkin

    nu, c, a = 0.2, 1.0, 0.5
    k = a / (2 * nu)

    def exact(xe, te, lib=np):
        return c - a * lib.tanh(k * (xe - c * te))

    x, t = symbols("x t")
    u = DepVar("u")
    Dt, Dx = Differential(t), Differential(x)
    Dxx = Differential(x) ** 2
    eq = Eq(Dt(u(x, t)) + u(x, t) * Dx(u(x, t)), nu * Dxx(u(x, t)))
    bcs = [Eq(u(x, 0.0), exact(x, 0.0, npde)),
           Eq(u(0.0, t), exact(0.0, t, npde)),
           Eq(u(1.0, t), exact(1.0, t, npde))]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 1))],
                       [x, t], [u(x, t)])
    disc = DeepGalerkin(2, 1, 16, 2, jnp.tanh, jnp.tanh, lambda z: z,
                        GridTraining([0.05, 0.05]))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.01), maxiters=3000, inner_steps=25)

    xs = np.linspace(0, 1, 21)
    X, T = np.meshgrid(xs, xs, indexing="ij")
    cord = jnp.asarray(np.stack([X.ravel(), T.ravel()]))
    pred = np.asarray(disc.phi(cord, res.u["depvar"])[0])
    assert np.max(np.abs(pred - exact(X, T).ravel())) < 0.02


def test_nnsde_autodiff_mode():
    """NNSDE with autodiff=True time derivative (reference:
    test/NNSDE1/nn_sde__test_1_solve_autodiff.jl): linear SDE
    du = -u dt + 0.1 dW, weak mean e^{-t}."""
    from neuralpde_tpu.nn import sigmoid
    from neuralpde_tpu.solvers.problems import SDEProblem
    from neuralpde_tpu.solvers.sde import NNSDE, solve_sde

    prob = SDEProblem(f=lambda u, p, t: -u, g=lambda u, p, t: 0.1,
                      u0=1.0, tspan=(0.0, 1.0))
    n_z = 3
    chain = mlp([1 + n_z, 16, 16, 1], activation=sigmoid)
    alg = NNSDE(chain, optax.adam(0.02), sub_batch=8, numensemble=40,
                autodiff=True)
    sol = solve_sde(prob, alg, dt=1 / 50.0, maxiters=1500, abstol=1e-12,
                    inner_steps=25)
    ts = np.asarray(sol.timepoints)
    mean_pred = np.asarray([float(p.mean) for p in sol.estimated_sol[0]])
    want = np.exp(-ts)
    assert np.abs(mean_pred - want).mean() < 0.1


def test_bpinn_with_flax_adapter_chain():
    """Bayesian PINN with an adapted Flax chain (reference:
    bpinn_ode__bpinn_ode_translating_from_flux.jl /
    bpinn_pde__bpinn_pde_translating_from_flux.jl): the sampler works over
    any Module, including framework adapters."""
    import pytest as _pytest
    flax = _pytest.importorskip("flax")
    import flax.linen as fnn
    from neuralpde_tpu import BayesianPINN, cos as npde_cos
    from neuralpde_tpu.bayesian.pde import ahmc_bayesian_pinn_pde
    from neuralpde_tpu.nn.adapters import FlaxAdapter

    t = symbols("t")
    u = DepVar("u")
    Dt = Differential(t)
    eq = Eq(Dt(u(t)), npde_cos(2 * np.pi * t))
    bcs = [Eq(u(0.0), 0.0)]
    system = PDESystem(eq, bcs, [Domain(t, Interval(0, 1))], [t], [u(t)])

    net = FlaxAdapter(fnn.Sequential([fnn.Dense(10), fnn.sigmoid,
                                      fnn.Dense(1)]), in_dim=1, out_dim=1)
    disc = BayesianPINN(net, GridTraining(0.05))
    sol = ahmc_bayesian_pinn_pde(
        system, disc, draw_samples=350, bcstd=[0.02], phystd=[0.05],
        priorsNNw=(0.0, 3.0), saveats=[0.02], n_leapfrog=20)
    curve = np.asarray(sol.ensemblesol[0].mean)
    ts = np.asarray(sol.timepoints[0][0])
    want = np.sin(2 * np.pi * ts) / (2 * np.pi)
    assert np.sqrt(np.mean((curve - want) ** 2)) < 0.1


def test_bpinn_parametric_ks_inverse():
    """Bayesian inversion of the u_xx coefficient α in the
    Kuramoto-Sivashinsky equation from noisy half-domain data (reference:
    bpinn_pde__bpinn_pde_inv_iii_improved_parametric_kuromo_sivashinsky_
    equation_solve.jl; reference tolerance |α̂−α| < 0.8α, ours is 0.5α and
    typically lands within 5%).  Uses the collocation likelihood
    (estim_collocate) with the reference's stds."""
    import jax
    from neuralpde_tpu import BayesianPINN, Param
    from neuralpde_tpu.bayesian.pde import ahmc_bayesian_pinn_pde
    from neuralpde_tpu.ops.distributions import Normal
    import neuralpde_tpu as npde

    def u_exact(xe, te):
        th = np.tanh(-xe / 2.0 + te)
        return 11 + 15 * th - 15 * th**2 - 15 * th**3

    def u_sym(xe, te):
        th = npde.tanh(-xe / 2.0 + te)
        return 11 + 15 * th - 15 * th**2 - 15 * th**3

    def du_sym(xe, te):
        th = npde.tanh(-xe / 2.0 + te)
        return 15 / 2.0 * (th + 1) * (3 * th - 1) * (1 - th**2)

    x, t = symbols("x t")
    u = DepVar("u")
    alpha = Param("alpha")  # true value 1.0
    Dt, Dx = Differential(t), Differential(x)
    Dx2, Dx3, Dx4 = (Differential(x) ** 2, Differential(x) ** 3,
                     Differential(x) ** 4)
    eq = Eq(Dt(u(x, t)) + u(x, t) * Dx(u(x, t)) + alpha * Dx2(u(x, t))
            + 4.0 * Dx3(u(x, t)) + 1.0 * Dx4(u(x, t)), 0.0)
    bcs = [Eq(u(x, 0.0), u_sym(x, 0.0)),
           Eq(u(-10.0, t), u_sym(-10.0, t)), Eq(u(10.0, t), u_sym(10.0, t)),
           Eq(Dx(u(-10.0, t)), du_sym(-10.0, t)),
           Eq(Dx(u(10.0, t)), du_sym(10.0, t))]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(-10, 10)),
                        Domain(t, Interval(0, 1))],
                       [x, t], [u(x, t)], ps=[alpha])

    rng = np.random.default_rng(0)
    xs = np.arange(-10, 0 + 1e-9, 0.4)
    ts = np.arange(0, 1 + 1e-9, 0.1)
    X, T = np.meshgrid(xs, ts, indexing="ij")
    us_noisy = u_exact(X, T).ravel() + 0.8 * rng.standard_normal(X.size)
    dataset_pde = [np.column_stack([us_noisy, X.ravel(), T.ravel()])]

    disc = BayesianPINN(mlp([2, 8, 8, 1], activation=jnp.tanh),
                        GridTraining([0.4, 0.1]),
                        dataset=(dataset_pde, None), param_estim=True)
    sol = ahmc_bayesian_pinn_pde(
        system, disc, draw_samples=150, bcstd=[0.1] * 5, phystd=[0.2],
        l2std=[0.8], phynewstd=[0.4], priorsNNw=(0.0, 1.0),
        param=[Normal(2.0, 2.0)], saveats=[0.4, 0.1], n_leapfrog=30,
        estim_collocate=True)
    a_est = float(sol.estimated_de_params[0].mean)
    assert abs(a_est - 1.0) < 0.5
