"""NNSDE: strong/weak SDE PINN via truncated Karhunen-Loève expansion
(reference: src/NN_SDE_solve.jl).

The Brownian path is represented by its KL expansion on the rescaled span
[0, 1]: dW ≈ √2 Σ_j z_j cos((j-1/2)πt) with z_j ~ N(0,1); the network input is
(t, z_1..z_n) and the trial function is phi = u0 + (t - t0)·NN(t, z)
(reference: src/NN_SDE_solve.jl:180-204,255-354).  Where the reference builds
Vectors of per-timepoint matrices, the TPU-native layout is one dense tensor
(1+n_z, T, S) (T timepoints × S sub-batch samples) evaluated in a single
batched network call.

Weak training (default): fresh z per timepoint, per-timepoint `mean` over
samples.  Strong training: fixed z per path, `sum` aggregation
(reference: src/NN_SDE_solve.jl:365-394,830-837).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import default_float
from ..ops.distributions import Particles
from ..strategies import (
    GridTraining, QuadratureTraining, QuasiRandomTraining, StochasticTraining,
    TrainingStrategy, WeightedIntervalTraining, julia_range,
)
from ..ops.quadrature import composite_gl_unit
from ..train import solve as train_solve
from .ode import _SimpleProblem
from .problems import SDEProblem


class SDEPhi:
    """phi(inp) = u0 + (t - t0)·NN(inp) with inp = (1+n_z, N)
    (reference: src/NN_SDE_solve.jl:180-204)."""

    def __init__(self, module, t0, u0):
        self.module = module
        self.t0 = float(t0)
        self.u0 = jnp.atleast_1d(jnp.asarray(u0))

    def __call__(self, inp, theta):
        inp = jnp.asarray(inp)
        out = self.module.apply(theta["depvar"], inp)  # (n_out, N)
        return self.u0[:, None] + (inp[0][None, :] - self.t0) * out


def du_dt(phi: SDEPhi, inp, theta, autodiff: bool):
    """∂phi/∂t at inputs (1+n_z, N) (reference: src/NN_SDE_solve.jl:225-236)."""
    if autodiff:
        tangent = jnp.zeros_like(inp).at[0, :].set(1.0)
        return jax.jvp(lambda x: phi(x, theta), (inp,), (tangent,))[1]
    eps = jnp.sqrt(jnp.finfo(inp.dtype).eps)
    shifted = inp.at[0, :].add(eps)
    return (phi(shifted, theta) - phi(inp, theta)) / eps


def add_rand_coeff(key, ts, n_z: int, sub_batch: int, dtype):
    """Weak-training inputs: independent z per (timepoint, sample);
    returns (1+n_z, T, S) (reference: src/NN_SDE_solve.jl:365-374)."""
    T = ts.shape[0]
    z = jax.random.normal(key, (n_z, T, sub_batch), dtype=dtype)
    t = jnp.broadcast_to(ts[None, :, None], (1, T, sub_batch))
    return jnp.concatenate([t, z], axis=0)


def add_rand_coeff_2(key, ts, n_z: int, num_samples: int, dtype):
    """Strong-training inputs: fixed z per path across all timepoints
    (reference: src/NN_SDE_solve.jl:384-394)."""
    T = ts.shape[0]
    z = jax.random.normal(key, (n_z, num_samples), dtype=dtype)
    z = jnp.broadcast_to(z[:, None, :], (n_z, T, num_samples))
    t = jnp.broadcast_to(ts[None, :, None], (1, T, num_samples))
    return jnp.concatenate([t, z], axis=0)


def _kl_drive(inp, n_z: int):
    """√2 Σ_j z_j cos((j-1/2)π t) at each column; inp (1+n_z, N) -> (N,)."""
    t = inp[0]
    j = jnp.arange(1, n_z + 1, dtype=inp.dtype)[:, None]
    basis = jnp.cos((j - 0.5) * jnp.pi * t[None, :])  # (n_z, N)
    return jnp.sqrt(jnp.asarray(2.0, inp.dtype)) * jnp.sum(inp[1:] * basis, axis=0)


def inner_sde_loss(phi: SDEPhi, f, g, autodiff, inputs3, theta, p, param_estim,
                   strong: bool, scalar_u0: bool):
    """inputs3: (1+n_z, T, S).  loss = (1/T) Σ_t Σ_out agg_s(residual²),
    agg = sum (strong) / mean (weak) (reference: src/NN_SDE_solve.jl:299-354)."""
    p_ = theta["p"] if param_estim else p
    d, T, S = inputs3.shape
    n_z = d - 1
    inp = inputs3.reshape(d, T * S)
    u = phi(inp, theta)                 # (n_out, T*S)
    drive = _kl_drive(inp, n_z)         # (T*S,)

    def f_one(u_col, t_i):
        u_in = u_col[0] if scalar_u0 else u_col
        fv = jnp.atleast_1d(jnp.asarray(f(u_in, p_, t_i)))
        gv = jnp.atleast_1d(jnp.asarray(g(u_in, p_, t_i)))
        return fv, gv

    fs, gs = jax.vmap(f_one, in_axes=(1, 0), out_axes=1)(u, inp[0])
    rhs = fs + gs * drive[None, :]
    dudt = du_dt(phi, inp, theta, autodiff)
    sq = ((rhs - dudt) ** 2).reshape(-1, T, S)
    agg = jnp.sum(sq, axis=2) if strong else jnp.mean(sq, axis=2)
    return jnp.sum(agg) / T


def generate_em_l2_loss(dataset, f, g, dtype):
    """Euler-Maruyama increment moment matching
    (reference: src/NN_SDE_solve.jl:464-496)."""
    xs = jnp.asarray(np.stack(dataset[0]), dtype=dtype)   # (n_obs, T)
    ts = jnp.asarray(np.asarray(dataset[1]), dtype=dtype)  # (T,)
    dts = ts[1:] - ts[:-1]
    x_inc = xs[:, 1:] - xs[:, :-1]                        # (n_obs, T-1)

    def loss(theta, key=None):
        p = theta["p"]

        def fg(x, t):
            return (jnp.asarray(f(x, p, t)), jnp.asarray(g(x, p, t)))

        fx, gx = jax.vmap(jax.vmap(fg, in_axes=(0, 0)), in_axes=(0, None))(
            xs[:, :-1], ts[:-1])
        fdt = fx * dts[None, :]
        gdt = gx**2 * dts[None, :]
        return (jnp.sum((x_inc - fdt) ** 2)
                + jnp.sum(((x_inc - fdt) ** 2 - gdt) ** 2))

    return loss


def generate_data_moments_loss(dataset, n_z, phi, f, g, autodiff, p,
                               param_estim, data_sub_batch, strong, scalar_u0,
                               dtype, seed=0):
    """Mean/variance matching of the SDEPINN against strong observations
    (reference: src/NN_SDE_solve.jl:403-449)."""
    process = jnp.asarray(np.stack(dataset[0]), dtype=dtype).T  # (T, n_obs)
    ts = jnp.asarray(np.asarray(dataset[1]), dtype=dtype)
    key = jax.random.key(seed)
    mk = add_rand_coeff_2 if strong else add_rand_coeff
    inputs3 = mk(key, ts, n_z, data_sub_batch, dtype)
    d, T, S = inputs3.shape
    inp = inputs3.reshape(d, T * S)

    def loss(theta, lkey=None):
        u = phi(inp, theta)[0].reshape(T, S)
        pred_mean = jnp.mean(u, axis=1)
        data_mean = jnp.mean(process, axis=1)
        mean_term = jnp.sum((data_mean - pred_mean) ** 2) / T
        phys = inner_sde_loss(phi, f, g, autodiff, inputs3, theta, p,
                              param_estim, strong, scalar_u0) ** 2
        data_var = jnp.sum((process - data_mean[:, None]) ** 2, axis=1)
        pred_var = jnp.sum((u - pred_mean[:, None]) ** 2, axis=1)
        var_term = (jnp.sum((data_var - pred_var) ** 2)
                    / (T * max(data_sub_batch - 1, 1) ** 2))
        return mean_term + phys + var_term

    return loss


@dataclass
class NNSDE:
    """SDE PINN algorithm config (reference: src/NN_SDE_solve.jl:131-160)."""

    chain: Any
    opt: Any = None
    init_params: Any = None
    strategy: TrainingStrategy | None = None
    autodiff: bool = False
    batch: bool = True
    sub_batch: int = 1
    strong_loss: bool = False
    moment_loss: bool = False
    param_estim: bool = False
    dataset: Any = None
    data_sub_batch: int = 1
    numensemble: int = 10
    additional_loss: Callable | None = None
    seed: int = 0


@dataclass
class SDEsol:
    """(reference: src/NN_SDE_solve.jl:757-768)"""

    original: Any
    estimated_sol: list        # per-output list of Particles over timepoints
    timepoints: Any
    estimated_params: Any
    ensemble_fits: Any
    ensemble_inputs: Any
    numensemble: int
    training_sets: Any
    interp: Callable

    def __call__(self, inp):
        return self.interp(inp)


def solve_sde(prob: SDEProblem, alg: NNSDE, *, dt=None, abstol: float = 1e-6,
              verbose: bool = False, saveat=None, maxiters: int = 1000,
              tstops=None, save_everystep: bool = True, key=None,
              inner_steps: int = 1) -> SDEsol:
    """`solve(SDEProblem, NNSDE(...))` (reference: src/NN_SDE_solve.jl:770-955)."""
    dtype = default_float()
    # rescale tspan to [0,1] so the KL expansion applies
    # (reference: src/NN_SDE_solve.jl:786-791)
    t_end = float(prob.tspan[1])
    tspan_scale = (float(prob.tspan[0]) / t_end, 1.0)
    if dt is not None:
        # mirror the reference rescale exactly (src/NN_SDE_solve.jl:788-790)
        dt = dt / abs(tspan_scale[1] - tspan_scale[0])
    t0 = tspan_scale[0]

    n_z = alg.chain.in_dim - 1
    u0 = prob.u0
    scalar_u0 = jnp.ndim(u0) == 0
    phi = SDEPhi(alg.chain, t0, u0)
    chain_params = (alg.chain.init(jax.random.key(alg.seed))
                    if alg.init_params is None else alg.init_params)
    theta0 = {"depvar": chain_params}
    if alg.param_estim:
        theta0["p"] = jnp.asarray(prob.p, dtype=dtype)

    strategy = alg.strategy
    if strategy is None:
        strategy = GridTraining(dt) if dt is not None else QuadratureTraining()

    strong = alg.strong_loss
    zkey = jax.random.key(alg.seed + 17)
    training_sets = None

    if isinstance(strategy, GridTraining):
        ts = jnp.asarray(julia_range(t0, 1.0, strategy.dx), dtype=dtype)
        mk = add_rand_coeff_2 if strong else add_rand_coeff
        training_sets = mk(zkey, ts, n_z, alg.sub_batch, dtype)

        def inner_f(theta, lkey):
            return inner_sde_loss(phi, prob.f, prob.g, alg.autodiff,
                                  training_sets, theta, prob.p,
                                  alg.param_estim, strong, scalar_u0)
        n_orig = ts.shape[0]
    elif isinstance(strategy, StochasticTraining):
        n = strategy.points

        def inner_f(theta, lkey):
            k1, k2 = jax.random.split(lkey)
            ts = t0 + (1.0 - t0) * jax.random.uniform(k1, (n,), dtype=dtype)
            mk = add_rand_coeff_2 if strong else add_rand_coeff
            inputs3 = mk(k2, ts, n_z, alg.sub_batch, dtype)
            return inner_sde_loss(phi, prob.f, prob.g, alg.autodiff, inputs3,
                                  theta, prob.p, alg.param_estim, strong,
                                  scalar_u0)
        n_orig = n
    elif isinstance(strategy, WeightedIntervalTraining):
        ts = jnp.asarray(strategy.sample_times(t0, 1.0), dtype=dtype)
        mk = add_rand_coeff_2 if strong else add_rand_coeff
        training_sets = mk(zkey, ts, n_z, alg.sub_batch, dtype)

        def inner_f(theta, lkey):
            return inner_sde_loss(phi, prob.f, prob.g, alg.autodiff,
                                  training_sets, theta, prob.p,
                                  alg.param_estim, strong, scalar_u0)
        n_orig = strategy.points
    elif isinstance(strategy, QuadratureTraining):
        # static_panels: the SDE loss integrand is stochastic in the KL
        # coefficients, so successive-rule agreement is not well-defined —
        # the panel count is pinned (pass `panels=` explicitly to control it)
        nodes, weights = composite_gl_unit(strategy.order,
                                           strategy.static_panels)
        ts = jnp.asarray(t0 + (1.0 - t0) * nodes, dtype=dtype)
        w = jnp.asarray(weights * (1.0 - t0), dtype=dtype)
        mk = add_rand_coeff_2 if strong else add_rand_coeff
        training_sets = mk(zkey, ts, n_z, alg.sub_batch, dtype)

        def inner_f(theta, lkey):
            # per-timepoint |inner residual|² integrated over [t0, 1]
            d, T, S = training_sets.shape
            inp = training_sets.reshape(d, T * S)
            u = phi(inp, theta)
            drive = _kl_drive(inp, n_z)
            p_ = theta["p"] if alg.param_estim else prob.p

            def f_one(u_col, t_i):
                u_in = u_col[0] if scalar_u0 else u_col
                return (jnp.atleast_1d(jnp.asarray(prob.f(u_in, p_, t_i))),
                        jnp.atleast_1d(jnp.asarray(prob.g(u_in, p_, t_i))))

            fs, gs = jax.vmap(f_one, in_axes=(1, 0), out_axes=1)(u, inp[0])
            rhs = fs + gs * drive[None, :]
            dudt = du_dt(phi, inp, theta, alg.autodiff)
            sq = ((rhs - dudt) ** 2).reshape(-1, T, S)
            agg = jnp.sum(sq, axis=2) if strong else jnp.mean(sq, axis=2)
            per_t = jnp.sum(agg, axis=0)  # (T,)
            return jnp.sum(per_t**2 * w)
        n_orig = None
    elif isinstance(strategy, QuasiRandomTraining):
        raise ValueError(
            "QuasiRandomTraining is not supported by NNSDE since it's for "
            "high dimensional spaces only. Use StochasticTraining instead.")
    else:
        raise TypeError(f"unsupported strategy {type(strategy).__name__}")

    dataset = alg.dataset or []
    if not dataset and alg.param_estim and alg.additional_loss is None:
        raise ValueError(
            "Dataset or an additional loss is required for Inverse problems "
            "performing Parameter Estimation.")
    em_loss = moments_loss = None
    if dataset:
        if len(dataset) < 2:
            raise ValueError(
                "Invalid dataset. Expected (x̂, t) with x̂ a list of "
                "observation series")
        em_loss = generate_em_l2_loss(dataset, prob.f, prob.g, dtype)
        if alg.moment_loss:
            dsb = max(alg.data_sub_batch, len(dataset[0]))
            moments_loss = generate_data_moments_loss(
                dataset, n_z, phi, prob.f, prob.g, alg.autodiff, prob.p,
                alg.param_estim, dsb, strong, scalar_u0, dtype, alg.seed)

    tstops_inputs = None
    if tstops is not None:
        # blend extra timepoints into the physics loss (reference intent:
        # src/NN_SDE_solve.jl:659-687; the reference helper references an
        # undefined `ts` — here implemented like the NNODE blending)
        ts_extra = jnp.asarray(np.asarray(tstops, dtype=np.float64) / t_end,
                               dtype=dtype)
        mk = add_rand_coeff_2 if strong else add_rand_coeff
        tstops_inputs = mk(jax.random.key(alg.seed + 29), ts_extra, n_z,
                           alg.sub_batch, dtype)

    def total_loss(theta, lkey):
        loss = inner_f(theta, lkey)
        if tstops_inputs is not None:
            ts_loss = inner_sde_loss(phi, prob.f, prob.g, alg.autodiff,
                                     tstops_inputs, theta, prob.p,
                                     alg.param_estim, strong, scalar_u0)
            n_ts = tstops_inputs.shape[1]
            if n_orig is not None:
                loss = (loss * n_orig + ts_loss * n_ts) / (n_orig + n_ts)
            else:
                loss = loss + ts_loss
        if alg.additional_loss is not None:
            loss = loss + alg.additional_loss(phi, theta)
        if alg.param_estim and em_loss is not None:
            loss = loss + em_loss(theta)
        if alg.param_estim and moments_loss is not None:
            loss = loss + moments_loss(theta)
        return loss

    opt = alg.opt or optax.adam(1e-3)
    res = train_solve(_SimpleProblem(total_loss, theta0), opt,
                      maxiters=maxiters, abstol=abstol, verbose=verbose,
                      key=key, inner_steps=inner_steps)

    # --- ensemble weak solution over saveat (rescaled) timepoints ----------
    if isinstance(saveat, (int, float)):
        ts_out = julia_range(t0, 1.0, float(saveat) / t_end)
    elif saveat is not None:
        ts_out = np.asarray(saveat) / t_end
    elif dt is not None:
        ts_out = julia_range(t0, 1.0, float(dt))
    elif save_everystep:
        ts_out = np.linspace(t0, 1.0, 100)
    else:
        ts_out = np.array([t0, 1.0])
    ts_j = jnp.asarray(ts_out, dtype=dtype)
    val_inputs = add_rand_coeff(jax.random.key(alg.seed + 23), ts_j, n_z,
                                alg.numensemble, dtype)
    d, T, S = val_inputs.shape
    u_val = phi(val_inputs.reshape(d, T * S), res.u).reshape(-1, T, S)
    n_out = u_val.shape[0]
    estimated_sol = [[Particles(u_val[j, i, :]) for i in range(T)]
                     for j in range(n_out)]
    est_params = (np.asarray(res.u["p"]).tolist() if alg.param_estim else None)

    def interp(inp):
        return phi(jnp.asarray(inp, dtype=dtype), res.u)

    return SDEsol(original=res, estimated_sol=estimated_sol,
                  timepoints=np.asarray(ts_out) * t_end,
                  estimated_params=est_params, ensemble_fits=u_val,
                  ensemble_inputs=val_inputs, numensemble=alg.numensemble,
                  training_sets=training_sets, interp=interp)
