"""PINOODE: physics-informed neural operator for parametric ODE families
(reference: src/pino_ode_solve.jl).

Learns ``u(p, t)`` over parameter bounds with either a DeepONet
(branch = p, trunk = t) or a plain MLP on ``vcat(p, t)``.  The loss is
physics residual MSE + initial-condition MSE over a (parameters × time)
product train set (reference: src/pino_ode_solve.jl:106-196).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import default_float
from ..nn.deeponet import DeepONet
from ..nn.fno import FNO1D
from ..strategies import GridTraining, StochasticTraining, TrainingStrategy, julia_range
from ..train import solve as train_solve
from .ode import _SimpleProblem
from .problems import ODEProblem


@dataclass
class PINOODE:
    """chain: DeepONet or Module (MLP on stacked (p, t));
    bounds: list of (lb, ub) per ODE parameter;
    number_of_parameters: train-set size along the parameter axis."""

    chain: Any
    opt: Any = None
    bounds: Any = None
    number_of_parameters: int = 100
    init_params: Any = None
    strategy: TrainingStrategy | None = None
    additional_loss: Callable | None = None
    seed: int = 0


class PINOPhi:
    """Operator wrapper (reference: src/pino_ode_solve.jl:61-87); no IC shift."""

    def __init__(self, module):
        self.module = module
        # tuple-input operators share the DeepONet calling convention
        # ((p, t) -> (T, P)); plain Modules consume stacked vcat(p, t) columns
        self.is_deeponet = isinstance(module, (DeepONet, FNO1D))
        # an FNO evaluates fields, not points: single-point grids (the IC
        # probe) are ill-defined, so the IC is read off the training grid
        self.is_fno = isinstance(module, FNO1D)

    def __call__(self, x, theta):
        return self.module.apply(theta["depvar"], x)


def _dfdt(phi: PINOPhi, x, theta):
    """Forward-difference du/dt (reference: src/pino_ode_solve.jl:89-104)."""
    if phi.is_deeponet:
        p, t = x
        eps = jnp.sqrt(jnp.finfo(t.dtype).eps)
        return (phi((p, t + eps), theta) - phi((p, t), theta)) / eps
    eps = jnp.sqrt(jnp.finfo(x.dtype).eps)
    shift = jnp.zeros_like(x).at[-1, :].add(eps)
    return (phi(x + shift, theta) - phi(x, theta)) / eps


def _grid_dfdt(u, tt):
    """Second-order FD of a field along its uniform grid axis (axis 0):
    central interior, one-sided second-order at the ends.

    This is the PINO-correct derivative for an FNO: FD through the
    t-coordinate channel (`_dfdt`) measures the network's *coordinate
    sensitivity*, which training can satisfy while the actual node-to-node
    field drifts freely through the spectral path (measured: residual RMS
    0.08 with rel-L2 error growing to 0.44 at t=1).  Differentiating the
    evaluated field itself ties the physics to what the solution returns
    (Li et al. 2021 PINO trains FNOs with exactly grid/spectral
    derivatives of the output field)."""
    h = tt[1] - tt[0]
    interior = (u[2:] - u[:-2]) / (2 * h)
    first = (-3 * u[0:1] + 4 * u[1:2] - u[2:3]) / (2 * h)
    last = (3 * u[-1:] - 4 * u[-2:-1] + u[-3:-2]) / (2 * h)
    return jnp.concatenate([first, interior, last], axis=0)


def _grid_trainset(bounds, n_params, tspan, dt, dtype):
    p_axes = [np.linspace(b[0], b[1], n_params) for b in bounds]
    p = jnp.asarray(np.stack(p_axes), dtype=dtype)           # (n_b, P)
    t = jnp.asarray(julia_range(tspan[0], tspan[1], dt)[None, :], dtype=dtype)
    return p, t


def _stochastic_trainset(key, bounds, n_params, tspan, n_t, dtype):
    kp, kt = jax.random.split(key)
    lb = jnp.asarray([b[0] for b in bounds], dtype=dtype)[:, None]
    ub = jnp.asarray([b[1] for b in bounds], dtype=dtype)[:, None]
    p = lb + (ub - lb) * jax.random.uniform(kp, (len(bounds), n_params), dtype=dtype)
    t = tspan[0] + (tspan[1] - tspan[0]) * jax.random.uniform(kt, (1, n_t), dtype=dtype)
    return p, t


def _residuals(phi: PINOPhi, prob: ODEProblem, p, t, theta):
    """Pointwise (physics, initial-condition) residual fields at trainset
    (p, t) — the least-squares structure behind `_losses`, also consumed by
    the Gauss-Newton driver (gauss_newton.build_pino_residual_vector).

    DeepONet mode: scalar u only (u(p,t) shaped (T, P)).  MLP mode supports
    vector u0 (chain out_dim = n_out): outputs shaped (n_out, P, T)."""
    n_b, P = p.shape
    T = t.shape[1]
    u0_arr = jnp.atleast_1d(jnp.asarray(prob.u0))
    n_out = u0_arr.shape[0]
    scalar_u = jnp.ndim(prob.u0) == 0

    if phi.is_deeponet:
        if n_out != 1:
            raise ValueError("DeepONet PINOODE supports scalar u0; use an "
                             "MLP chain for ODE systems")
        out = phi((p, t), theta)                              # (T, P)
        if phi.is_fno:
            # grid-axis FD of the evaluated field, and the IC read off the
            # first grid row: GridTraining's t grid starts at tspan[0]
            # (julia_range); a 1-point FFT grid would be DC-only
            du = _grid_dfdt(out, t[0])
            u_at_t0 = out[0:1, :]
        else:
            du = _dfdt(phi, (p, t), theta)
            t0 = jnp.full((1, 1), prob.tspan[0], dtype=t.dtype)
            u_at_t0 = phi((p, t0), theta)                     # (1, P)

        def f_one(u_scalar, p_col, t_scalar):
            p_arg = p_col[0] if n_b == 1 else p_col
            return prob.f(u_scalar, p_arg, t_scalar)

        f_pt = jax.vmap(jax.vmap(f_one, in_axes=(0, None, 0)),   # over T
                        in_axes=(1, 1, None), out_axes=1)        # over P
        f_vec = f_pt(out, p, t[0])                                # (T, P)
        return du - f_vec, u_at_t0 - prob.u0

    pp = jnp.repeat(p[:, :, None], T, axis=2)             # (n_b, P, T)
    tt = jnp.broadcast_to(t[0][None, None, :], (1, P, T))
    x = jnp.concatenate([pp, tt], axis=0).reshape(n_b + 1, P * T)
    out = phi(x, theta).reshape(n_out, P, T)              # (n_out, P, T)
    du = _dfdt(phi, x, theta).reshape(n_out, P, T)
    x0 = x.at[-1, :].set(prob.tspan[0])
    u_at_t0 = phi(x0, theta).reshape(n_out, P, T)

    def f_one(u_col, p_col, t_scalar):
        p_arg = p_col[0] if n_b == 1 else p_col
        u_in = u_col[0] if scalar_u else u_col
        return jnp.atleast_1d(jnp.asarray(prob.f(u_in, p_arg, t_scalar)))

    # map over P then T: u_col (n_out,) per (p, t)
    f_pt = jax.vmap(jax.vmap(f_one, in_axes=(1, None, 0), out_axes=1),
                    in_axes=(1, 1, None), out_axes=1)      # (n_out, P, T)
    f_vec = f_pt(out, p, t[0])
    return du - f_vec, u_at_t0 - u0_arr[:, None, None]


def _losses(phi: PINOPhi, prob: ODEProblem, p, t, theta):
    """physics + IC loss at trainset (p, t) (reference:
    src/pino_ode_solve.jl:106-196)."""
    r_phys, r_ic = _residuals(phi, prob, p, t, theta)
    return jnp.mean(r_phys ** 2) + jnp.mean(r_ic ** 2)


def make_pino_interp(phi: "PINOPhi", theta, n_out: int):
    """``interp(p, t)`` for a trained operator — the solution-evaluation
    layout shared by `solve_pino_ode` and `gauss_newton.solve_pino_gauss_newton`
    (DeepONet: (T, P); MLP scalar: (T, P); MLP vector: (T, n_out, P))."""

    def interp(p, t):
        if phi.is_deeponet:
            return phi((p, t), theta)
        P, T = p.shape[1], t.shape[1]
        pp = jnp.repeat(p[:, :, None], T, axis=2)
        tt = jnp.broadcast_to(t[0][None, None, :], (1, P, T))
        x = jnp.concatenate([pp, tt], axis=0).reshape(p.shape[0] + 1, P * T)
        out = phi(x, theta).reshape(n_out, P, T)
        if n_out == 1:
            return out[0].T
        return jnp.moveaxis(out, 2, 0)

    return interp


@dataclass
class PINOODESolution:
    """sol(p, t) dispatches to the trained operator (reference:
    PDETimeSeriesSolution + PINOODEMetadata, src/pino_ode_solve.jl:362-426)."""

    u: Any
    t: Any
    p: Any                     # training-set parameter tensor
    interp: Any
    original: Any
    retcode: str = "Success"

    def __call__(self, p=None, t=None):
        if t is None:          # sol(t): reuse training p
            t, p = p, self.p
        t = jnp.atleast_2d(jnp.asarray(t))
        p = jnp.atleast_2d(jnp.asarray(p))
        return self.interp(p, t)


def solve_pino_ode(prob: ODEProblem, alg: PINOODE, *, dt=None,
                   abstol: float = 1e-8, verbose: bool = False,
                   maxiters: int = 1000, key=None,
                   inner_steps: int = 1) -> PINOODESolution:
    dtype = default_float()
    if alg.bounds is None:
        raise ValueError("PINOODE requires parameter bounds")
    bounds = [tuple(map(float, b)) for b in alg.bounds]
    tspan = (float(prob.tspan[0]), float(prob.tspan[1]))

    phi = PINOPhi(alg.chain)
    chain_params = (alg.chain.init(jax.random.key(alg.seed))
                    if alg.init_params is None else alg.init_params)
    theta0 = {"depvar": chain_params}

    strategy = alg.strategy or StochasticTraining(100)
    if isinstance(alg.chain, FNO1D) and not isinstance(strategy, GridTraining):
        raise ValueError("FNO1D requires GridTraining: the FFT along the "
                         "time axis needs a uniform grid (pass "
                         "strategy=GridTraining(dt))")
    if isinstance(strategy, GridTraining):
        if strategy.dx is None and dt is None:
            raise ValueError("GridTraining requires dx")
        p_tr, t_tr = _grid_trainset(bounds, alg.number_of_parameters, tspan,
                                    strategy.dx or dt, dtype)

        def total_loss(theta, lkey):
            loss = _losses(phi, prob, p_tr, t_tr, theta)
            if alg.additional_loss is not None:
                loss = loss + alg.additional_loss(phi, theta)
            return loss
    elif isinstance(strategy, StochasticTraining):
        def total_loss(theta, lkey):
            p, t = _stochastic_trainset(lkey, bounds, alg.number_of_parameters,
                                        tspan, strategy.points, dtype)
            loss = _losses(phi, prob, p, t, theta)
            if alg.additional_loss is not None:
                loss = loss + alg.additional_loss(phi, theta)
            return loss
    else:
        raise ValueError("Only GridTraining and StochasticTraining strategy "
                         "is supported")

    opt = alg.opt or optax.adam(1e-3)
    res = train_solve(_SimpleProblem(total_loss, theta0), opt,
                      maxiters=maxiters, abstol=abstol, verbose=verbose,
                      key=key, inner_steps=inner_steps)

    # final train set for the solution object
    if isinstance(strategy, GridTraining):
        p_fin, t_fin = p_tr, t_tr
    else:
        p_fin, t_fin = _stochastic_trainset(
            jax.random.key(alg.seed + 1), bounds, alg.number_of_parameters,
            tspan, strategy.points, dtype)

    n_out_sol = 1 if jnp.ndim(prob.u0) == 0 else int(np.prod(np.shape(prob.u0)))
    interp = make_pino_interp(phi, res.u, n_out_sol)
    u = interp(p_fin, t_fin)
    return PINOODESolution(u=u, t=t_fin, p=p_fin, interp=interp, original=res)
