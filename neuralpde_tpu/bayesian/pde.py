"""Bayesian PDE PINN: ahmc_bayesian_pinn_pde (reference: ext/bpinn/PDE_BPINN.jl).

The physics loglikelihood reuses the PDE pipeline's datafree residuals as
Gaussian (SSE) loglikelihoods over grid/data points
(reference: src/training_strategies.jl:50-128, src/discretize.jl:651-755);
the flat HMC vector maps onto the per-depvar parameter pytrees
(`setparameters`, reference: ext/bpinn/PDE_BPINN.jl:117-139).

The reference's `Dict_differentials` symbolic-collocation likelihood is
provided via ``estim_collocate=True`` — no user-supplied differential mask is
needed since the IR distinguishes Deriv nodes structurally, and the per-row
codegen of the reference becomes one batched residual evaluation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..compile.discretize import BayesianPINN, symbolic_discretize
from ..ops.distributions import Normal, Particles, mvnormal_diag_logpdf
from ..strategies import GridTraining, generate_training_sets, julia_range
from ..utils.pytree import parameters_to_vector
from . import hmc
from .ode import BPINNsolution, BPINNstats


def _subst_plain_depvars(expr, mapping):
    """Replace *plain* dependent-variable calls by placeholder Syms, leaving
    Deriv subtrees intact — the masking step of the reference's `get_lossy`
    (ext/bpinn/PDE_BPINN.jl:29-80), done structurally on the IR instead of
    via Dict_differentials round-trip substitution."""
    from ..symbolic.expr import Call, DepVarCall, Deriv, IntegralExpr

    if isinstance(expr, DepVarCall) and expr.name in mapping:
        return mapping[expr.name]
    if isinstance(expr, Deriv):
        return expr
    if isinstance(expr, Call):
        return Call(expr.op, tuple(_subst_plain_depvars(a, mapping)
                                   for a in expr.args))
    if isinstance(expr, IntegralExpr):
        return IntegralExpr(_subst_plain_depvars(expr.integrand, mapping),
                            expr.ivars, expr.lb, expr.ub)
    return expr


def build_data_collocation_logliks(pinnrep, dataset):
    """Per-equation dataset-collocation loglikelihoods: equations with plain
    depvar calls replaced by the observed data values, evaluated at the
    dataset coordinates.

    The reference compiles one RuntimeGeneratedFunction per dataset ROW per
    equation (ext/bpinn/PDE_BPINN.jl:385-441); here each equation lowers
    ONCE with placeholder symbols bound to extra cord rows holding the data
    values, and all rows evaluate in a single batched call.
    """
    from ..compile.lower import LoweringContext, build_residual_function
    from ..symbolic.expr import Eq, Sym

    dtype = pinnrep.dtype
    depvars = pinnrep.depvars
    placeholders = {name: Sym(f"_data_{name}") for name in depvars}
    ddi = pinnrep.dict_depvar_input

    # data values per depvar (column 0), shared coordinate count assumed
    # (reference indexes all depvars by dataset[1]'s rows)
    values = {name: np.asarray(dataset[i])[:, 0]
              for i, name in enumerate(depvars)}

    ctx = LoweringContext(
        depvars=depvars, indvars=pinnrep.indvars,
        dict_depvar_input=ddi,
        phis=[(p.apply if hasattr(p, "apply") else p)
              for p in (pinnrep.phi if pinnrep.multioutput else [pinnrep.phi])],
        multioutput=pinnrep.multioutput,
        derivative=pinnrep.derivative, eq_params=pinnrep.eq_params,
        param_estim=pinnrep.param_estim)

    logliks = []
    for eq, args in zip(pinnrep.eqs, pinnrep.pde_args):
        masked = Eq(_subst_plain_depvars(eq.lhs, placeholders),
                    _subst_plain_depvars(eq.rhs, placeholders))
        arg_syms = [a for a in args if isinstance(a, Sym)]
        layout = list(arg_syms) + [placeholders[n] for n in depvars]
        residual = build_residual_function(masked, layout, ctx,
                                           pinnrep.default_p)
        # coordinates: the dataset of the depvar whose inputs match the args
        coord_rows = None
        for i, name in enumerate(depvars):
            if ddi[name] == [a.name for a in arg_syms]:
                coord_rows = np.asarray(dataset[i])[:, 1:].T
                break
        if coord_rows is None:
            logliks.append(None)
            continue
        data_rows = np.stack([values[n] for n in depvars])
        cord = jnp.asarray(np.vstack([coord_rows, data_rows]), dtype=dtype)

        def loglik(theta, std, residual=residual, cord=cord):
            r = residual(cord, theta)
            return mvnormal_diag_logpdf(r, 0.0, jnp.asarray(std))

        logliks.append(loglik)
    return logliks


class PDELogTargetDensity:
    """(reference: ext/bpinn/PDE_BPINN.jl:1-26)"""

    def __init__(self, pinnrep, dataset, priors_nn: Normal, param_priors,
                 allstd, phynewstd, estim_collocate: bool = False):
        self.pinnrep = pinnrep
        self.dataset = dataset
        self.priors_nn = priors_nn
        self.param_priors = list(param_priors)
        self.extraparams = len(self.param_priors)
        self.phystd, self.bcstd, self.l2std = allstd
        self.phynewstd = phynewstd
        self.names = pinnrep.depvars
        self.multioutput = pinnrep.multioutput
        dtype = pinnrep.dtype

        # flat layout: per-depvar NN params (declaration order) + inv params
        init = pinnrep.init_params
        if self.multioutput:
            self.unravels = []
            sizes = []
            for name in self.names:
                flat, unr = parameters_to_vector(init[name])
                self.unravels.append(unr)
                sizes.append(flat.shape[0])
            self.sizes = sizes
            self.init_flat_nn = jnp.concatenate(
                [parameters_to_vector(init[n])[0] for n in self.names])
        else:
            flat, unr = parameters_to_vector(init)
            self.unravels = [unr]
            self.sizes = [flat.shape[0]]
            self.init_flat_nn = flat
        self.n_nn = int(sum(self.sizes))
        self.dim = self.n_nn + self.extraparams

        strategy = pinnrep.strategy
        lf = pinnrep.loss_functions
        # pointwise residuals are always kept for the dataset-point terms
        self.data_residuals = lf.datafree_pde_loss_functions
        if isinstance(strategy, GridTraining):
            self.pde_residuals = lf.datafree_pde_loss_functions
            self.bc_residuals = lf.datafree_bc_loss_functions
            self.pde_sets = generate_training_sets(
                pinnrep.domains, strategy.dx, pinnrep.pde_args, dtype)
            self.bc_sets = generate_training_sets(
                pinnrep.domains, strategy.dx, pinnrep.bc_args, dtype)
        else:
            from ..compile.separable import (
                SeparableTraining, build_separable_residual)

            if not (isinstance(strategy, SeparableTraining)
                    and strategy.dx is not None):
                raise ValueError(
                    "BayesianPINN supports GridTraining or static-grid "
                    "SeparableTraining(dx=...) (the Bayesian loglikelihood "
                    "needs a deterministic point set)")
            # factorized physics loglikelihood: grid residuals flattened —
            # bit-parity with the pointwise evaluation on the same tensor
            # grid (tests/test_separable.py), at N·d axis-eval cost
            from ..compile.lower import LoweringContext
            from ..symbolic.system import infimum, supremum

            phis_ = pinnrep.phi if self.multioutput else [pinnrep.phi]
            nets = {n: ph.module
                    for n, ph in zip(pinnrep.depvars, phis_)}
            ctx = LoweringContext.from_pinnrep(pinnrep)
            dxs = (list(strategy.dx)
                   if isinstance(strategy.dx, (list, tuple))
                   else [strategy.dx] * len(pinnrep.domains))
            nodes_of = {d.variables.name: julia_range(
                float(infimum(d.domain)), float(supremum(d.domain)), h)
                for d, h in zip(pinnrep.domains, dxs)}

            def sep_adapter(eq):
                residual, axes = build_separable_residual(
                    eq, ctx, nets, dtype, pinnrep.default_p)
                nodes = [jnp.asarray(nodes_of[a.name], dtype) for a in axes]

                def res(_set, theta):
                    return jnp.ravel(residual(nodes, theta))

                return res, nodes

            pde_pairs = [sep_adapter(eq) for eq in pinnrep.eqs]
            bc_pairs = [sep_adapter(bc) for bc in pinnrep.bcs]
            self.pde_residuals = [r for r, _ in pde_pairs]
            self.bc_residuals = [r for r, _ in bc_pairs]
            self.pde_sets = [s for _, s in pde_pairs]
            self.bc_sets = [s for _, s in bc_pairs]

        # dataset-point physics sets (reference: src/training_strategies.jl:18-47)
        self.data_pde_sets = None
        if dataset is not None:
            ddi = pinnrep.dict_depvar_input
            sets = []
            for args in pinnrep.pde_args:
                arg_names = [a.name for a in args if hasattr(a, "name")]
                chosen = None
                for i, name in enumerate(self.names):
                    if ddi[name] == arg_names:
                        chosen = jnp.asarray(
                            np.asarray(dataset[i])[:, 1:].T, dtype=dtype)
                        break
                sets.append(chosen)
            self.data_pde_sets = sets
            self.data_mats = [jnp.asarray(np.asarray(m), dtype=dtype)
                              for m in dataset]
        self.colloc_logliks = None
        if estim_collocate and dataset is not None:
            self.colloc_logliks = build_data_collocation_logliks(
                pinnrep, dataset)

    def setparameters(self, theta):
        nn = theta[:self.n_nn]
        if self.multioutput:
            parts = {}
            i = 0
            for name, unr, s in zip(self.names, self.unravels, self.sizes):
                parts[name] = unr(nn[i:i + s])
                i += s
            out = {"depvar": parts}
        else:
            out = {"depvar": self.unravels[0](nn)}
        if self.extraparams > 0:
            out["p"] = theta[self.n_nn:]
        return out

    # --- likelihood terms -------------------------------------------------
    def full_loglikelihood(self, theta_struct):
        total = 0.0
        for i, (res, s) in enumerate(zip(self.pde_residuals, self.pde_sets)):
            r = res(s, theta_struct)
            total = total + mvnormal_diag_logpdf(
                r, 0.0, jnp.asarray(self.phystd[i]))
        for j, (res, s) in enumerate(zip(self.bc_residuals, self.bc_sets)):
            r = res(s, theta_struct)
            total = total + mvnormal_diag_logpdf(
                r, 0.0, jnp.asarray(self.bcstd[j]))
        if self.data_pde_sets is not None:
            # dataset points are arbitrary coordinates -> always pointwise
            for i, (res, s) in enumerate(zip(self.data_residuals,
                                             self.data_pde_sets)):
                if s is None:
                    continue
                r = res(s, theta_struct)
                total = total + mvnormal_diag_logpdf(
                    r, 0.0, jnp.asarray(self.phystd[i]))
        return total

    def L2LossData(self, theta_struct):
        if self.dataset is None or self.extraparams <= 0:
            return 0.0
        phis = (self.pinnrep.phi if self.multioutput
                else [self.pinnrep.phi])
        dep = theta_struct["depvar"]
        total = 0.0
        for i, name in enumerate(self.names):
            mat = self.data_mats[i]
            params = dep[name] if self.multioutput else dep
            pred = phis[i](mat[:, 1:].T, params)[0]
            total = total + mvnormal_diag_logpdf(
                pred, mat[:, 0], jnp.asarray(self.l2std[i]))
        return total

    def priorlogpdf(self, theta):
        nn = theta[:self.n_nn]
        lp = jnp.sum(self.priors_nn.logpdf(nn))
        for i, pr in enumerate(self.param_priors):
            lp = lp + pr.logpdf(theta[self.n_nn + i])
        return lp

    def L2_loss2(self, theta_struct):
        """Dataset-collocation loglikelihood (reference: ext/bpinn/
        PDE_BPINN.jl:422-440 `L2_loss2`)."""
        if not self.colloc_logliks:
            return 0.0
        total = 0.0
        for i, ll in enumerate(self.colloc_logliks):
            if ll is None:
                continue
            total = total + ll(theta_struct, self.phynewstd[i])
        return total

    def __call__(self, theta):
        ts = self.setparameters(theta)
        out = (self.full_loglikelihood(ts) + self.priorlogpdf(theta)
               + self.L2LossData(ts))
        if self.colloc_logliks:
            out = out + self.L2_loss2(ts)
        return out


def inference(samples, pinnrep, saveats, numensemble, ltd):
    """Ensemble predictions on the saveats grid
    (reference: ext/bpinn/PDE_BPINN.jl:222-312)."""
    dtype = pinnrep.dtype
    ranges = {d.variables.name: julia_range(d.domain.lo, d.domain.hi, dx)
              for d, dx in zip(pinnrep.domains, saveats)}
    phis = pinnrep.phi if pinnrep.multioutput else [pinnrep.phi]
    tail = samples[-numensemble:]
    ensemblecurves, timepoints = [], []
    for j, name in enumerate(pinnrep.depvars):
        axes = [ranges[v] for v in pinnrep.dict_depvar_input[name]]
        grid = np.meshgrid(*axes, indexing="ij")
        cord = jnp.asarray(np.stack([g.reshape(-1) for g in grid]), dtype=dtype)

        def predict(th):
            ts = ltd.setparameters(th)
            dep = ts["depvar"]
            params = dep[name] if pinnrep.multioutput else dep
            return phis[j](cord, params)[0]

        preds = jax.vmap(predict)(tail)         # (numensemble, n_points)
        ensemblecurves.append(Particles(preds))
        timepoints.append(cord)

    est_nn = ltd.setparameters(jnp.mean(tail, axis=0))["depvar"]
    est_params = [Particles(tail[:, ltd.n_nn + i])
                  for i in range(ltd.extraparams)]
    return ensemblecurves, est_nn, est_params, timepoints


def ahmc_bayesian_pinn_pde(
        pde_system, discretization: BayesianPINN, *, draw_samples: int = 1000,
        bcstd=(0.01,), l2std=(0.05,), phystd=(0.05,), phynewstd=(0.05,),
        priorsNNw=(0.0, 2.0), param=(), nchains: int = 1, Kernel: str = "hmc",
        n_leapfrog: int = 30, target_accept: float = 0.8, max_depth: int = 10,
        saveats=(1 / 10.0,), numensemble: int | None = None, seed: int = 0,
        estim_collocate: bool = False, mesh=None,
        progress: bool = False, verbose: bool = False) -> BPINNsolution:
    """(reference: ext/bpinn/PDE_BPINN.jl:371-635).

    ``estim_collocate=True`` enables the dataset-collocation loglikelihood —
    the reference's Dict_differentials path, which here needs no user-supplied
    differential mask (the IR distinguishes Deriv nodes structurally)."""
    pinnrep = symbolic_discretize(pde_system, discretization)
    dataset_pde, dataset_bc = discretization.dataset

    if dataset_pde is None and dataset_bc is None:
        dataset = None
    elif dataset_bc is None:
        dataset = dataset_pde
    elif dataset_pde is None:
        dataset = dataset_bc
    else:
        dataset = [np.vstack([np.asarray(dataset_pde[i]),
                              np.asarray(dataset_bc[i])])
                   for i in range(len(dataset_pde))]

    if discretization.param_estim and not param:
        raise ValueError("param priors required when param_estim=True")
    if discretization.param_estim and dataset is None:
        raise ValueError("dataset required when param_estim=True")
    if discretization.param_estim and len(l2std) != len(pinnrep.depvars):
        raise ValueError("L2 stds length must match number of dependant "
                         "variables")
    if len(pinnrep.domains) != len(saveats):
        raise ValueError("Number of independent variables must match saveat "
                         "inference discretization steps")

    numensemble = numensemble or draw_samples // 3
    priors_nn = Normal(float(priorsNNw[0]), float(priorsNNw[1]))
    ltd = PDELogTargetDensity(pinnrep, dataset, priors_nn, param,
                              [list(phystd), list(bcstd), list(l2std)],
                              list(phynewstd), estim_collocate=estim_collocate)

    theta0 = ltd.init_flat_nn
    if param:
        theta0 = jnp.concatenate([
            theta0, jnp.asarray([pr.mean for pr in param], dtype=theta0.dtype)])

    if verbose:
        ts0 = ltd.setparameters(theta0)
        print(f"Current Physics Log-likelihood : "
              f"{float(ltd.full_loglikelihood(ts0)):g}")
        print(f"Current Prior Log-likelihood : {float(ltd.priorlogpdf(theta0)):g}")
        print(f"Current SSE against dataset Log-likelihood : "
              f"{float(ltd.L2LossData(ts0)):g}")

    key = jax.random.key(seed + 1)
    if nchains > 1:
        # all chains sample in ONE vmapped XLA program (the reference runs
        # Threads.@threads per chain, ext/bpinn/PDE_BPINN.jl:548); ``mesh``
        # shards the chain axis over devices
        q0s = jnp.stack([
            jnp.concatenate([jax.random.normal(jax.random.key(seed + 100 + i),
                                               (ltd.n_nn,)),
                             theta0[ltd.n_nn:]])
            for i in range(nchains)])
        chains = hmc.sample_chains(ltd, q0s, key, draw_samples, kernel=Kernel,
                                   n_leapfrog=n_leapfrog,
                                   target_accept=target_accept,
                                   max_depth=max_depth, mesh=mesh)
        sols = []
        for i in range(nchains):
            curves, est_nn, est_p, tp = inference(chains[i], pinnrep,
                                                  saveats, numensemble, ltd)
            sols.append(BPINNsolution(BPINNstats(None, chains[i], None),
                                      curves, est_nn, est_p, tp))
        return sols

    res = hmc.sample(ltd, theta0, key, draw_samples, kernel=Kernel,
                     n_leapfrog=n_leapfrog, target_accept=target_accept,
                     max_depth=max_depth)
    if verbose:
        tsf = ltd.setparameters(res.samples[-1])
        print("Sampling Complete.")
        print(f"Final Physics Log-likelihood : "
              f"{float(ltd.full_loglikelihood(tsf)):g}")
    curves, est_nn, est_p, tp = inference(res.samples, pinnrep, saveats,
                                          numensemble, ltd)
    return BPINNsolution(BPINNstats(None, res.samples, res.stats),
                         curves, est_nn, est_p, tp)
