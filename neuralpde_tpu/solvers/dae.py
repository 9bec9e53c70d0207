"""NNDAE: DAE PINN solver (reference: src/dae_solve.jl).

DAE form: ``f(du, u, p, t) = 0`` out-of-place; algebraic rows (where
``differential_vars[i] == False``) get a zero derivative in the residual
(reference: src/dae_solve.jl:48-62).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import default_float
from ..strategies import GridTraining, TrainingStrategy, julia_range
from ..train import solve as train_solve
from .ode import ODEPhi, _SimpleProblem
from .problems import ODESolution, compute_ode_errors


@dataclass
class DAEProblem:
    """f(du, u, p, t) = 0 with consistent u0, du0."""

    f: Callable
    u0: Any
    du0: Any
    tspan: tuple
    p: Any = None
    differential_vars: Any = None
    analytic: Callable | None = None

    def remake(self, **kw):
        return replace(self, **kw)


@dataclass
class NNDAE:
    chain: Any
    opt: Any = None
    init_params: Any = None
    autodiff: bool = False
    strategy: TrainingStrategy | None = None
    seed: int = 0


def dae_dfdx(phi: ODEPhi, ts, theta, autodiff: bool, differential_vars):
    """Masked forward-difference du/dt (reference: src/dae_solve.jl:48-62)."""
    if autodiff:
        raise ValueError("autodiff not supported for DAE problem.")
    eps = jnp.sqrt(jnp.finfo(ts.dtype).eps)
    dphi = (phi(ts + eps, theta) - phi(ts, theta)) / eps
    mask = jnp.asarray(differential_vars, dtype=dphi.dtype)[:, None]
    return dphi * mask


def solve_dae(prob: DAEProblem, alg: NNDAE, *, dt=None, abstol: float = 1e-6,
              verbose: bool = False, saveat=None, maxiters: int = 1000,
              save_everystep: bool = True, key=None,
              inner_steps: int = 1) -> ODESolution:
    dtype = default_float()
    t0 = float(prob.tspan[0])
    u0 = jnp.atleast_1d(jnp.asarray(prob.u0))
    dvars = (np.asarray(prob.differential_vars, dtype=bool)
             if prob.differential_vars is not None
             else np.ones(u0.shape[0], dtype=bool))

    phi = ODEPhi(alg.chain, t0, u0)
    chain_params = (alg.chain.init(jax.random.key(alg.seed))
                    if alg.init_params is None else alg.init_params)
    theta0 = {"depvar": chain_params}

    strategy = alg.strategy
    if strategy is None:
        if dt is None:
            raise ValueError("`dt` is not defined")
        strategy = GridTraining(dt)
    if not isinstance(strategy, GridTraining):
        raise ValueError("NNDAE currently supports GridTraining only "
                         "(reference: src/dae_solve.jl:75-82)")

    ts = jnp.asarray(julia_range(t0, float(prob.tspan[1]), strategy.dx),
                     dtype=dtype)
    f_b = jax.vmap(lambda du, u, p, t: jnp.atleast_1d(jnp.asarray(
        prob.f(du, u, p, t))), in_axes=(1, 1, None, 0), out_axes=1)

    def total_loss(theta, lkey):
        out = phi(ts, theta)
        dphi = dae_dfdx(phi, ts, theta, alg.autodiff, dvars)
        res = f_b(dphi, out, prob.p, ts)
        return jnp.sum(res**2) / ts.shape[0]

    opt = alg.opt or optax.adam(1e-3)
    res = train_solve(_SimpleProblem(total_loss, theta0), opt,
                      maxiters=maxiters, abstol=abstol, verbose=verbose,
                      key=key, inner_steps=inner_steps)

    t1 = float(prob.tspan[1])
    if isinstance(saveat, (int, float)):
        ts_out = julia_range(t0, t1, float(saveat))
    elif saveat is not None:
        ts_out = np.asarray(saveat)
    elif dt is not None:
        ts_out = julia_range(t0, t1, float(dt))
    elif save_everystep:
        ts_out = np.linspace(t0, t1, 100)
    else:
        ts_out = np.array([t0, t1])
    ts_j = jnp.asarray(ts_out, dtype=dtype)
    us = np.asarray(phi(ts_j, res.u)).T

    def interp(t):
        return phi(jnp.asarray(t, dtype=dtype), res.u)

    errors = {}
    if prob.analytic is not None:
        exact = np.stack([np.atleast_1d(np.asarray(prob.analytic(prob.u0, prob.p, t)))
                          for t in ts_out])
        errors = compute_ode_errors(us, exact)

    return ODESolution(ts=ts_out, us=us, interp=interp, original=res,
                       retcode="Success", errors=errors, k=res)
