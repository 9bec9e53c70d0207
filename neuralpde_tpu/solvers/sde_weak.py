"""SDEPINN: weak SDE solve via its Fokker-Planck PDE
(reference: src/NN_SDE_weaksolve.jl).

Symbolically constructs ∂t p̂ = -∂x(f p̂) + ½ ∂xx(g² p̂) for the density p̂ and
delegates to the PhysicsInformedNN PDE pipeline (self-hosting consumer), with
reflecting (zero-flux) or absorbing BCs and a PDF-normalization additional
loss via per-timeslice quadrature (reference: src/NN_SDE_weaksolve.jl:113-206).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import jax.numpy as jnp
import optax

from ..compile.discretize import PhysicsInformedNN, discretize
from ..config import default_float
from ..ops.distributions import Normal
from ..ops.quadrature import gauss_legendre
from ..strategies import GridTraining
from ..symbolic.expr import DepVar, Deriv, Differential, Eq, Sym, wrap
from ..symbolic.system import Domain, Interval, PDESystem
from ..train import solve as train_solve


@dataclass
class SDEPINN:
    """Fokker-Planck SDE solver config (reference: src/NN_SDE_weaksolve.jl:1-72)."""

    chain: Any
    x_0: float
    x_end: float
    optimalg: Any = None
    initial_parameters: Any = None
    Nt: int = 20
    dx: float = 0.05
    sigma_var_bc: float = 0.05
    lambda_ic: float = 1.0
    lambda_norm: float = 1.0
    distrib: Any = None          # initial density; default Normal(0.5, 0.01)
    strategy: Any = None
    autodiff: bool = True
    batch: bool = False
    param_estim: bool = False
    dataset: Any = None
    additional_loss: Callable | None = None
    absorbing_bc: bool = False
    reflective_bc: bool = True
    norm_quad_order: int = 24
    seed: int = 0


def solve_sde_weak(prob, alg: SDEPINN, *, maxiters: int = 200,
                   verbose: bool = False, key=None, inner_steps: int = 1):
    """Returns (SolveResult, phi, pinnrep)
    (reference: src/NN_SDE_weaksolve.jl:85-236 returns (res, phi))."""
    dtype = default_float()
    t0, t1 = float(prob.tspan[0]), float(prob.tspan[1])
    u0 = float(prob.u0)
    p = prob.p
    distrib = alg.distrib or Normal(0.5, 0.01)
    dt = (t1 - t0) / alg.Nt
    ts = np.arange(t0, t1 + dt / 2, dt)

    X, T = Sym("X"), Sym("T")
    p_hat = DepVar("p_hat")
    Dx = Differential(X)
    Dxx = Differential(X) ** 2
    Dt = Differential(T)

    f_expr = wrap(prob.f(X, p, T))
    g_expr = wrap(prob.g(X, p, T))

    # probability flux J, product rule applied so no Dx over constants
    # (reference: src/NN_SDE_weaksolve.jl:121-125)
    def J(x_val):
        ph = p_hat(x_val, T)
        dph = Deriv(p_hat(x_val, T), (X,))
        from ..symbolic.expr import expand_derivatives, substitute
        g2 = g_expr * g_expr
        dg2 = expand_derivatives(Deriv(g2, (X,)))
        sub = {X: wrap(x_val)} if not isinstance(x_val, Sym) else {}
        f_at = substitute(f_expr, sub)
        g2_at = substitute(g2, sub)
        dg2_at = substitute(dg2, sub)
        return f_at * ph - 0.5 * (g2_at * dph + ph * dg2_at)

    eq = Eq(Dt(p_hat(X, T)),
            -Dx(f_expr * p_hat(X, T)) + 0.5 * Dxx(g_expr * g_expr * p_hat(X, T)))

    bcs = [Eq(p_hat(u0, t0), float(np.exp(distrib.logpdf(u0))))]
    if alg.absorbing_bc:
        bcs += [Eq(p_hat(alg.x_0, T), 0.0), Eq(p_hat(alg.x_end, T), 0.0)]
    if alg.reflective_bc:
        bcs += [Eq(J(alg.x_0), 0.0), Eq(J(alg.x_end), 0.0)]

    domains = [Domain(X, Interval(alg.x_0, alg.x_end)),
               Domain(T, Interval(t0, t1))]
    system = PDESystem(eq, bcs, domains, [X, T], [p_hat(X, T)])

    # PDF normalization: ∫ p̂(x, t) dx ≈ 1 per timeslice, one batched GL rule
    # (reference loops per-t with adaptive quadrature, :181-194)
    gx, gw = gauss_legendre(alg.norm_quad_order)
    half = (alg.x_end - alg.x_0) / 2.0
    xq = jnp.asarray(alg.x_0 + (gx + 1.0) * half, dtype=dtype)     # (Q,)
    wq = jnp.asarray(gw * half, dtype=dtype)
    ts_j = jnp.asarray(ts, dtype=dtype)
    Q, Tn = xq.shape[0], ts_j.shape[0]
    cord = jnp.stack([jnp.tile(xq, Tn),
                      jnp.repeat(ts_j, Q)])                        # (2, T*Q)

    lam = alg.lambda_norm

    def combined_additional(phi, theta, _p):
        vals = phi(cord, theta["depvar"] if "depvar" in theta else theta)
        integ = jnp.sum(vals[0].reshape(Tn, Q) * wq[None, :], axis=1)
        return lam * jnp.sum((integ - 1.0) ** 2)

    disc = PhysicsInformedNN(
        alg.chain, GridTraining([alg.dx, dt]),
        init_params=alg.initial_parameters,
        additional_loss=combined_additional, seed=alg.seed)
    tprob = discretize(system, disc)
    opt = alg.optimalg or optax.adam(1e-3)
    res = train_solve(tprob, opt, maxiters=maxiters, verbose=verbose,
                      key=key, inner_steps=inner_steps)
    return res, disc.phi, tprob.pinnrep
