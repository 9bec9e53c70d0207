"""Bayesian ODE PINN: ahmc_bayesian_pinn_ode + BNNODE
(reference: ext/bpinn/advancedHMC_MCMC.jl, ext/bpinn/BPINN_ode.jl).

logdensity(θ) = physics loglikelihood + priors + data L2 loglikelihood
(+ Data Quadrature loglikelihood when estim_collocate)
(reference: ext/bpinn/advancedHMC_MCMC.jl:43-47), sampled with the pure-JAX
HMC/NUTS kernels in `neuralpde_tpu.bayesian.hmc`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..config import default_float
from ..ops.distributions import Normal, Particles, mvnormal_diag_logpdf
from ..strategies import (
    GridTraining, QuadratureTraining, StochasticTraining,
    WeightedIntervalTraining, julia_range,
)
from ..utils.pytree import parameters_to_vector
from . import hmc
from ..solvers.problems import ODEProblem


class LogTargetDensity:
    """Flat-vector log-density (LogDensityProblems analog,
    reference: ext/bpinn/advancedHMC_MCMC.jl:1-52)."""

    def __init__(self, prob: ODEProblem, chain, init_nn_params, strategy,
                 dataset, priors_nn: Normal, param_priors, phystd, phynewstd,
                 l2std, autodiff: bool, physdt: float, estim_collocate: bool):
        self.prob = prob
        self.chain = chain
        self.strategy = strategy
        self.dataset = dataset or []
        self.priors_nn = priors_nn
        self.param_priors = list(param_priors)
        self.extraparams = len(self.param_priors)
        self.phystd = np.asarray(phystd, dtype=np.float64)
        self.phynewstd = phynewstd
        self.l2std = np.asarray(l2std, dtype=np.float64)
        self.autodiff = autodiff
        self.physdt = physdt
        self.estim_collocate = estim_collocate

        flat, unravel = parameters_to_vector(init_nn_params)
        self.n_nn = flat.shape[0]
        self.unravel = unravel
        self.init_flat_nn = flat
        self.dim = self.n_nn + self.extraparams

        u0 = jnp.atleast_1d(jnp.asarray(prob.u0))
        self.u0 = u0
        self.n_out = u0.shape[0]
        t0 = float(prob.tspan[0])
        self.t0 = t0

        dtype = default_float()
        ts = julia_range(t0, float(prob.tspan[1]),
                         strategy.dx if isinstance(strategy, GridTraining)
                         else physdt)
        if isinstance(strategy, GridTraining):
            phys_t = ts
        elif isinstance(strategy, WeightedIntervalTraining):
            phys_t = strategy.sample_times(t0, float(prob.tspan[1]))
        elif isinstance(strategy, (StochasticTraining, QuadratureTraining)):
            # static-shape physics grid: stochastic resampling inside HMC
            # would make the density non-deterministic; use the grid of
            # equivalent size (documented deviation)
            n = getattr(strategy, "points", len(ts))
            phys_t = np.linspace(t0, float(prob.tspan[1]), n)
        else:
            raise TypeError(f"unsupported strategy {type(strategy).__name__}")
        if self.dataset:
            phys_t = np.concatenate([phys_t, np.asarray(self.dataset[-2])])
        self.phys_t = jnp.asarray(phys_t, dtype=dtype)
        if self.dataset:
            self.data_t = jnp.asarray(self.dataset[-2], dtype=dtype)
            self.data_u = jnp.stack([jnp.asarray(self.dataset[i], dtype=dtype)
                                     for i in range(self.n_out)])
            self.data_w = jnp.asarray(self.dataset[-1], dtype=dtype)

    # --- NN trial function ------------------------------------------------
    def phi(self, t, theta_nn_vec):
        params = self.unravel(theta_nn_vec)
        out = self.chain.apply(params, t[None, :])
        return self.u0[:, None] + (t[None, :] - self.t0) * out

    def _dfdx(self, t, theta_nn_vec):
        if self.autodiff:
            return jax.jvp(lambda tt: self.phi(tt, theta_nn_vec), (t,),
                           (jnp.ones_like(t),))[1]
        eps = jnp.sqrt(jnp.finfo(t.dtype).eps)
        return (self.phi(t + eps, theta_nn_vec) - self.phi(t, theta_nn_vec)) / eps

    def _split(self, theta):
        return theta[:self.n_nn], theta[self.n_nn:]

    def _ode_params(self, extra):
        if self.extraparams == 0:
            if self.prob.p is None:
                return None
            return self.prob.p
        return extra

    def _f_batched(self, u, p, t):
        def f_one(u_col, t_i):
            u_in = u_col[0] if (self.n_out == 1 and jnp.ndim(self.prob.u0) == 0) \
                else u_col
            return jnp.atleast_1d(jnp.asarray(self.prob.f(u_in, p, t_i)))

        return jax.vmap(f_one, in_axes=(1, 0), out_axes=1)(u, t)

    # --- loglikelihood terms (reference names) ----------------------------
    def physloglikelihood(self, theta):
        nn, extra = self._split(theta)
        p = self._ode_params(extra)
        t = self.phys_t
        out = self.phi(t, nn)
        physsol = self._f_batched(out, p, t)
        nnsol = self._dfdx(t, nn)
        total = 0.0
        for i in range(self.n_out):
            total = total + mvnormal_diag_logpdf(
                nnsol[i] - physsol[i], 0.0, jnp.asarray(self.phystd[i]))
        return total

    def priorweights(self, theta):
        nn, extra = self._split(theta)
        lp = jnp.sum(self.priors_nn.logpdf(nn))
        for i, pr in enumerate(self.param_priors):
            lp = lp + pr.logpdf(extra[i])
        return lp

    def L2LossData(self, theta):
        if not self.dataset:
            return 0.0
        nn, _ = self._split(theta)
        pred = self.phi(self.data_t, nn)
        total = 0.0
        for i in range(self.n_out):
            total = total + mvnormal_diag_logpdf(
                pred[i], self.data_u[i], jnp.asarray(self.l2std[i]))
        return total

    def L2loss2(self, theta):
        if not (self.estim_collocate and self.dataset):
            return 0.0
        nn, extra = self._split(theta)
        p = self._ode_params(extra)
        nnsol = self._dfdx(self.data_t, nn)
        physsol = self._f_batched(self.data_u, p, self.data_t)
        std = self.phynewstd(p)
        total = 0.0
        for i in range(self.n_out):
            total = total + mvnormal_diag_logpdf(
                (nnsol[i] - physsol[i]) * self.data_w, 0.0,
                jnp.asarray(std[i]))
        return total

    def __call__(self, theta):
        return (self.physloglikelihood(theta) + self.priorweights(theta)
                + self.L2LossData(theta) + self.L2loss2(theta))


def ahmc_bayesian_pinn_ode(
        prob: ODEProblem, chain, *, strategy=None, dataset=None,
        init_params=None, draw_samples: int = 1000, physdt: float = 1 / 20.0,
        l2std=(0.05,), phystd=(0.05,), phynewstd=None, priorsNNw=(0.0, 2.0),
        param=(), nchains: int = 1, autodiff: bool = False, Kernel: str = "hmc",
        n_leapfrog: int = 30, target_accept: float = 0.8, max_depth: int = 10,
        lam: float = 1.0, estim_collocate: bool = False, seed: int = 0,
        mesh=None, progress: bool = False, verbose: bool = False):
    """Reference: ext/bpinn/advancedHMC_MCMC.jl:390-581.  Returns
    (samples (chains kept as axis when nchains>1), sampler_stats, ltd)."""
    dataset = dataset or []
    if not dataset and len(param) > 0:
        raise ValueError(
            "Dataset is Required for Inverse problems performing Parameter "
            "Estimation.")
    if not dataset and estim_collocate:
        raise ValueError(
            "Dataset is Required for using the Data Quadrature loglikelihood "
            "term.")
    if dataset:
        if estim_collocate and len(dataset) < 3:
            raise ValueError(
                "Invalid dataset for Inverse solve with Data Quadrature loss; "
                "expected (x̂, t, W)")
        if len(dataset) < 2:
            raise ValueError("Invalid dataset; expected (x̂, t)")
        if len(dataset) < 3:
            dataset = list(dataset) + [np.ones(len(dataset[-1]))]

    strategy = strategy if strategy is not None else GridTraining(physdt)
    phynewstd = phynewstd or (lambda p: list(phystd))
    init_nn = chain.init(jax.random.key(seed)) if init_params is None \
        else init_params
    priors_nn = Normal(float(priorsNNw[0]), float(priorsNNw[1]))

    ltd = LogTargetDensity(
        prob, chain, init_nn, strategy, dataset, priors_nn, param,
        list(phystd), phynewstd, list(l2std), autodiff, physdt,
        estim_collocate)

    theta0 = jnp.concatenate(
        [ltd.init_flat_nn,
         jnp.asarray([pr.mean for pr in param], dtype=ltd.init_flat_nn.dtype)]
    ) if param else ltd.init_flat_nn

    if verbose:
        print(f"Current Physics Log-likelihood: "
              f"{float(ltd.physloglikelihood(theta0)):g}")
        print(f"Current Prior Log-likelihood: {float(ltd.priorweights(theta0)):g}")
        print(f"Current SSE against dataset Log-likelihood: "
              f"{float(ltd.L2LossData(theta0)):g}")

    key = jax.random.key(seed + 1)
    if nchains > 1:
        q0s = []
        for i in range(nchains):
            k = jax.random.key(seed + 100 + i)
            q0s.append(jnp.concatenate([
                jax.random.normal(k, (ltd.n_nn,)), theta0[ltd.n_nn:]]))
        samples = hmc.sample_chains(ltd, jnp.stack(q0s), key, draw_samples,
                                    kernel=Kernel, n_leapfrog=n_leapfrog,
                                    target_accept=target_accept, lam=lam,
                                    max_depth=max_depth, mesh=mesh)
        return samples, None, ltd
    res = hmc.sample(ltd, theta0, key, draw_samples, kernel=Kernel,
                     n_leapfrog=n_leapfrog, target_accept=target_accept,
                     lam=lam, max_depth=max_depth)
    if verbose:
        print("Sampling Complete.")
        print(f"Final Physics Log-likelihood: "
              f"{float(ltd.physloglikelihood(res.samples[-1])):g}")
    return res.samples, res.stats, ltd


@dataclass
class BPINNstats:
    mcmc_chain: Any
    samples: Any
    statistics: Any


@dataclass
class BPINNsolution:
    """Ensemble solution (reference: src/bpinn_types.jl:141-163)."""

    original: BPINNstats
    ensemblesol: list          # list of Particles over timeseries per output
    estimated_nn_params: Any
    estimated_de_params: list
    timepoints: Any

    def diagnostics(self, discard: int | None = None) -> dict:
        """ESS / split-R̂ / mean / std per flat parameter from this
        solution's chain (the reference's MCMCChains summary analog;
        `bayesian.diagnostics`).  ``discard`` drops warmup draws (default
        2/3).  For multi-chain R̂, stack the chains yourself:
        ``split_rhat(np.stack([s.original.samples for s in sols]))``."""
        import numpy as np

        from .diagnostics import summarize

        draws = np.asarray(self.original.samples)
        n = draws.shape[0]
        discard = (2 * n) // 3 if discard is None else discard
        return summarize(draws[discard:])


@dataclass
class BNNODE:
    """High-level Bayesian NNODE algorithm (reference: ext/bpinn/BPINN_ode.jl)."""

    chain: Any
    Kernel: str = "hmc"
    strategy: Any = None
    draw_samples: int = 1000
    priorsNNw: tuple = (0.0, 2.0)
    param: tuple = ()
    l2std: tuple = (0.05,)
    phystd: tuple = (0.05,)
    phynewstd: Callable | None = None
    dataset: Any = None
    physdt: float = 1 / 20.0
    nchains: int = 1
    autodiff: bool = False
    init_params: Any = None
    numensemble: int = 500
    estim_collocate: bool = False
    n_leapfrog: int = 30
    max_depth: int = 10
    seed: int = 0
    verbose: bool = False


def solve_bnnode(prob: ODEProblem, alg: BNNODE, *, saveat=None,
                 maxiters=None) -> BPINNsolution:
    """`solve(ODEProblem, BNNODE)` (reference: ext/bpinn/BPINN_ode.jl:26-109)."""
    samples, stats, ltd = ahmc_bayesian_pinn_ode(
        prob, alg.chain, strategy=alg.strategy, dataset=alg.dataset,
        init_params=alg.init_params, draw_samples=alg.draw_samples,
        physdt=alg.physdt, l2std=alg.l2std, phystd=alg.phystd,
        phynewstd=alg.phynewstd, priorsNNw=alg.priorsNNw, param=alg.param,
        nchains=alg.nchains, autodiff=alg.autodiff, Kernel=alg.Kernel,
        n_leapfrog=alg.n_leapfrog, max_depth=alg.max_depth,
        estim_collocate=alg.estim_collocate, seed=alg.seed,
        verbose=alg.verbose)
    if alg.nchains > 1:
        samples = samples[0]  # first chain for the ensemble (reference behavior)

    numensemble = min(alg.numensemble, alg.draw_samples)
    tail = samples[-numensemble:]

    t0, t1 = float(prob.tspan[0]), float(prob.tspan[1])
    if saveat is None:
        saveat = 1.0 / 50.0
    ts = np.arange(t0, t1 + saveat / 2, saveat)
    ts_j = jnp.asarray(ts, dtype=default_float())

    curves = jax.vmap(lambda th: ltd.phi(ts_j, th[:ltd.n_nn]))(tail)
    ensemble = [Particles(curves[:, i, :]) for i in range(ltd.n_out)]

    est_nn = ltd.unravel(jnp.mean(tail[:, :ltd.n_nn], axis=0))
    est_de = [Particles(tail[:, ltd.n_nn + i]) for i in range(ltd.extraparams)]

    return BPINNsolution(
        original=BPINNstats(None, samples, stats),
        ensemblesol=ensemble, estimated_nn_params=est_nn,
        estimated_de_params=est_de, timepoints=ts)
