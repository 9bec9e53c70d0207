"""NNODE: Lagaris-style ODE PINN solver (reference: src/ode_solve.jl).

The trial function hard-enforces the initial condition:
``phi(t) = u0 + (t - t0) * NN(t)`` (reference: src/ode_solve.jl:123-159).
All strategy losses are pure functions ``(theta, key) -> scalar`` evaluated
batched over the whole time grid — `f` is vmapped over time points instead of
the reference's per-point comprehension (src/ode_solve.jl:195-197).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import default_float
from ..strategies import (
    GridTraining, QuadratureTraining, QuasiRandomTraining, StochasticTraining,
    TrainingStrategy, WeightedIntervalTraining, julia_range,
)
from ..ops.quadrature import composite_gl_unit
from ..train import solve as train_solve
from .problems import ODEProblem, ODESolution, compute_ode_errors


class ODEPhi:
    """phi(t) = u0 + (t - t0) * NN(t) (reference: src/ode_solve.jl:123-159)."""

    def __init__(self, module, t0, u0):
        self.module = module
        self.t0 = float(t0)
        self.u0 = jnp.atleast_1d(jnp.asarray(u0))
        self.scalar_u0 = jnp.ndim(u0) == 0

    def __call__(self, t, theta):
        """t scalar or (N,); returns (n_out,) or (n_out, N)."""
        t_arr = jnp.atleast_1d(jnp.asarray(t))
        out = self.module.apply(theta["depvar"], t_arr[None, :])  # (n_out, N)
        val = self.u0[:, None] + (t_arr[None, :] - self.t0) * out
        if jnp.ndim(t) == 0:
            return val[:, 0]
        return val


def ode_dfdx(phi: ODEPhi, ts, theta, autodiff: bool):
    """du/dt via forward-mode AD or forward difference
    (reference: src/ode_solve.jl:168-175)."""
    if autodiff:
        return jax.jvp(lambda t: phi(t, theta), (ts,), (jnp.ones_like(ts),))[1]
    eps = jnp.sqrt(jnp.finfo(ts.dtype).eps)
    return (phi(ts + eps, theta) - phi(ts, theta)) / eps


def _abs2(z):
    """|z|² — correct for complex residuals (reference uses abs2 throughout;
    NNODE allows complex u, src/ode_solve.jl:363)."""
    return jnp.real(z * jnp.conj(z))


def _batched_f(f):
    return jax.vmap(lambda u, p, t: jnp.atleast_1d(jnp.asarray(f(u, p, t))),
                    in_axes=(1, None, 0), out_axes=1)


def inner_loss(phi, f, autodiff, ts, theta, p, param_estim, scalar_u0):
    """Batched residual MSE at time points ts
    (reference: src/ode_solve.jl:189-201)."""
    p_ = theta["p"] if param_estim else p
    out = phi(ts, theta)  # (n, N)
    u_in = out[0] if scalar_u0 else out
    fs = _batched_f(f)(jnp.atleast_2d(u_in), p_, ts)
    dxdt = ode_dfdx(phi, ts, theta, autodiff)
    return jnp.sum(_abs2(fs - dxdt)) / ts.shape[0]


@dataclass
class NNODE:
    """Neural ODE-PINN algorithm config (reference: src/ode_solve.jl:91-115).

    * chain: a Module with 1-D input
    * opt: optax optimizer (default adam(1e-3))
    * strategy: TrainingStrategy or None (None -> GridTraining(dt) if dt
      given, else QuadratureTraining)
    * autodiff: forward-mode AD for du/dt (vs forward difference)
    * batch: kept for API parity; evaluation is always batched via vmap
    * dataset: [u_1.., t, W] nested list for inverse problems
    * estim_collocate: add the Data Quadrature loss
    """

    chain: Any
    opt: Any = None
    init_params: Any = None
    strategy: TrainingStrategy | None = None
    autodiff: bool = False
    batch: bool = True
    param_estim: bool = False
    additional_loss: Callable | None = None
    dataset: Any = None
    estim_collocate: bool = False
    seed: int = 0


def generate_l2_loss_data(dataset, phi, n_output):
    """Data L2 loss for inverse problems (reference: src/ode_solve.jl:300-309)."""
    if not dataset:
        return None
    t = jnp.asarray(dataset[-2])
    us = [jnp.asarray(dataset[i]) for i in range(n_output)]

    def loss(theta, key=None):
        pred = phi(t, theta)
        return sum(jnp.sum(_abs2(pred[i] - us[i])) for i in range(n_output))

    return loss


def generate_l2_loss_collocate(f, autodiff, dataset, phi, n_output, scalar_u0):
    """Data Quadrature loss (reference: src/ode_solve.jl:314-342)."""
    if not dataset:
        return None
    t = jnp.asarray(dataset[-2])
    w = jnp.asarray(dataset[-1])
    us = jnp.stack([jnp.asarray(dataset[i]) for i in range(n_output)])  # (n, N)

    def loss(theta, key=None):
        dxdt = ode_dfdx(phi, t, theta, autodiff)
        u_in = us[0] if scalar_u0 else us
        fs = _batched_f(f)(jnp.atleast_2d(u_in), theta["p"], t)
        return jnp.sum(_abs2(dxdt - fs) * w[None, :])

    return loss


def _strategy_loss(strategy, phi, f, autodiff, tspan, p, param_estim, scalar_u0,
                   dtype, theta0=None):
    t0, t1 = float(tspan[0]), float(tspan[1])

    if isinstance(strategy, GridTraining):
        ts = jnp.asarray(julia_range(t0, t1, strategy.dx), dtype=dtype)
        return lambda theta, key: inner_loss(
            phi, f, autodiff, ts, theta, p, param_estim, scalar_u0)

    if isinstance(strategy, StochasticTraining):
        n = strategy.points

        def loss(theta, key):
            ts = t0 + (t1 - t0) * jax.random.uniform(key, (n,), dtype=dtype)
            return inner_loss(phi, f, autodiff, ts, theta, p, param_estim, scalar_u0)

        return loss

    if isinstance(strategy, WeightedIntervalTraining):
        ts = jnp.asarray(strategy.sample_times(t0, t1), dtype=dtype)
        return lambda theta, key: inner_loss(
            phi, f, autodiff, ts, theta, p, param_estim, scalar_u0)

    if isinstance(strategy, QuadratureTraining):
        def rule(panels):
            nodes, weights = composite_gl_unit(strategy.order, panels)
            return (jnp.asarray(t0 + (t1 - t0) * nodes, dtype=dtype),
                    jnp.asarray(weights * (t1 - t0), dtype=dtype))

        def make_loss(ts, w):
            def loss(theta, key=None):
                p_ = theta["p"] if param_estim else p
                out = phi(ts, theta)
                u_in = out[0] if scalar_u0 else out
                fs = _batched_f(f)(jnp.atleast_2d(u_in), p_, ts)
                dxdt = ode_dfdx(phi, ts, theta, autodiff)
                pointwise = jnp.sum(_abs2(fs - dxdt), axis=0)  # |residual|²/t
                # reference integrates abs2(inner_loss) (src/ode_solve.jl:212-216)
                return jnp.sum(pointwise**2 * w)

            return loss

        # static auto-refinement honoring reltol/abstol/maxiters (the
        # reference's QuadGKJL h-adaptive semantics at build time)
        integral_at = None
        if theta0 is not None and strategy.panels is None:
            def integral_at(panels):
                return make_loss(*rule(panels))(theta0)

        panels = strategy.resolve_panels(integral_at, dim=1)
        return make_loss(*rule(panels))

    if isinstance(strategy, QuasiRandomTraining):
        raise ValueError(
            "QuasiRandomTraining is not supported by NNODE since it's for high "
            "dimensional spaces only. Use StochasticTraining instead."
        )
    raise TypeError(f"unsupported strategy {type(strategy).__name__}")


class _SimpleProblem:
    def __init__(self, loss, init_params):
        self._loss = loss
        self.init_params = init_params
        self.pinnrep = None

    def loss(self, theta, lstate):
        return self._loss(theta, lstate["key"]), {}


def solve_ode(prob: ODEProblem, alg: NNODE, *, dt=None, abstol: float = 1e-6,
              reltol: float = 1e-3, verbose: bool = False, saveat=None,
              maxiters: int = 1000, tstops=None, save_everystep: bool = True,
              callback=None, key=None, inner_steps: int = 1) -> ODESolution:
    """`solve(ODEProblem, NNODE(...))` (reference: src/ode_solve.jl:365-514)."""
    dtype = default_float()
    t0 = float(prob.tspan[0])
    u0 = prob.u0
    scalar_u0 = jnp.ndim(u0) == 0
    n_output = 1 if scalar_u0 else int(np.prod(np.shape(u0)))
    dataset = alg.dataset or []

    phi = ODEPhi(alg.chain, t0, u0)
    if alg.init_params is None:
        chain_params = alg.chain.init(jax.random.key(alg.seed))
    else:
        chain_params = alg.init_params
    theta0 = {"depvar": chain_params}
    if alg.param_estim:
        if prob.p is None and not dataset:
            raise ValueError("param_estim requires prob.p initial values")
        theta0["p"] = jnp.asarray(prob.p, dtype=dtype)

    strategy = alg.strategy
    if strategy is None:
        strategy = GridTraining(dt) if dt is not None else QuadratureTraining()
    if isinstance(strategy, GridTraining) and strategy.dx is None:
        raise ValueError("GridTraining requires dx (or pass dt to solve)")

    if dataset:
        if len(dataset) < 3:
            raise ValueError(
                "Invalid dataset. Expected [x̂_1, ..., t, W] "
                "(reference: src/ode_solve.jl:417-419)")
    if not dataset and alg.param_estim and alg.additional_loss is None:
        raise ValueError(
            "Dataset or an additional loss is required for inverse problems "
            "performing parameter estimation")
    if not dataset and alg.estim_collocate:
        raise ValueError(
            "Dataset is required for parameter estimation with the Data "
            "Quadrature loss")

    inner_f = _strategy_loss(strategy, phi, prob.f, alg.autodiff, prob.tspan,
                             prob.p, alg.param_estim, scalar_u0, dtype,
                             theta0=theta0)
    l2_data = generate_l2_loss_data(dataset, phi, n_output)
    l2_coll = generate_l2_loss_collocate(prob.f, alg.autodiff, dataset, phi,
                                         n_output, scalar_u0)

    tstops_arr = None if tstops is None else jnp.asarray(tstops, dtype=dtype)

    def total_loss(theta, lkey):
        loss = inner_f(theta, lkey)
        if alg.param_estim and alg.estim_collocate:
            loss = loss + l2_data(theta) + l2_coll(theta)
        elif alg.param_estim and dataset:
            loss = loss + l2_data(theta)
        if alg.additional_loss is not None:
            loss = loss + alg.additional_loss(phi, theta)
        if tstops_arr is not None:
            ts_loss = inner_loss(phi, prob.f, alg.autodiff, tstops_arr, theta,
                                 prob.p, alg.param_estim, scalar_u0)
            n_ts = tstops_arr.shape[0]
            if isinstance(strategy, GridTraining):
                n_orig = len(julia_range(t0, float(prob.tspan[1]), strategy.dx))
            elif isinstance(strategy, (StochasticTraining, WeightedIntervalTraining)):
                n_orig = strategy.points
            else:
                return loss + ts_loss
            loss = (loss * n_orig + ts_loss * n_ts) / (n_orig + n_ts)
        return loss

    opt = alg.opt or optax.adam(1e-3)
    res = train_solve(_SimpleProblem(total_loss, theta0), opt,
                      maxiters=maxiters, abstol=abstol, verbose=verbose,
                      callback=callback, key=key, inner_steps=inner_steps)

    return build_ode_solution(prob, phi, res, dt=dt, saveat=saveat,
                              save_everystep=save_everystep, dtype=dtype)


def build_ode_solution(prob: ODEProblem, phi: ODEPhi, res, *, dt=None,
                       saveat=None, save_everystep: bool = True,
                       dtype=None) -> ODESolution:
    """Dense `ODESolution` from trained parameters ``res.u`` (the save-point
    + interpolation tail of `solve_ode`; reference: src/ode_solve.jl:484-513).
    Shared by the Adam/L-BFGS path and the Gauss-Newton driver."""
    dtype = dtype or default_float()
    u0 = prob.u0
    scalar_u0 = jnp.ndim(u0) == 0
    t0, t1 = float(prob.tspan[0]), float(prob.tspan[1])
    if isinstance(saveat, (int, float)):
        ts = julia_range(t0, t1, float(saveat))
    elif saveat is not None:
        ts = np.asarray(saveat, dtype=np.float64)
    elif dt is not None:
        ts = julia_range(t0, t1, float(dt))
    elif save_everystep:
        ts = np.linspace(t0, t1, 100)
    else:
        ts = np.array([t0, t1])
    ts_j = jnp.asarray(ts, dtype=dtype)
    vals = phi(ts_j, res.u)  # (n_out, N)
    us = np.asarray(vals).T
    if scalar_u0:
        us = us[:, 0]

    def interp(t):
        out = phi(jnp.asarray(t, dtype=dtype), res.u)
        if scalar_u0:
            return out[0]
        return out

    errors = {}
    if prob.analytic is not None:
        exact = np.stack([np.atleast_1d(np.asarray(prob.analytic(u0, prob.p, t)))
                          for t in ts])  # (N, n_out)
        pred = us[:, None] if us.ndim == 1 else us
        errors = compute_ode_errors(pred, exact)

    return ODESolution(ts=ts, us=us, interp=interp, original=res,
                       retcode="Success", errors=errors, k=res)
