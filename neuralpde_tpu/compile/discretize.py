"""`symbolic_discretize` / `discretize` pipeline (reference: src/discretize.jl).

Transforms a symbolic `PDESystem` + `PhysicsInformedNN` into an inspectable
`PINNRepresentation` whose `loss_functions` are pure JAX objectives, and wraps
them into a `TrainingProblem` for `neuralpde_tpu.train.solve`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..adaptive import AbstractAdaptiveLoss, NonAdaptiveLoss
from ..config import default_float
from ..logging_utils import LogOptions
from ..nn.core import Module
from ..ops.derivatives import DerivativeEngine
from ..strategies import QuadratureTraining, TrainingStrategy
from ..symbolic.expr import Call, Sym, expand_derivatives
from ..symbolic.system import PDESystem
from .lower import (
    LoweringContext, build_residual_function, get_argument,
    get_integration_variables, get_variables,
)


class Phi:
    """Trial-function wrapper over a network (reference: src/pinn_types.jl:57-68).

    Call as ``phi(cord, params)`` with cord shaped (in_dim, N); returns
    (out_dim, N).  ``apply(params, cord)`` is the flipped-arg form used
    internally by the lowering.

    ``matmul_precision`` (inherited from the discretization's
    `PhysicsInformedNN(matmul_precision=...)`) makes EVALUATION run under
    the same `jax.default_matmul_precision` as training — a bf16-pass
    forward pass alone floors predictions at ~1e-3 relative (PERF.md r3).
    """

    def __init__(self, module: Module, matmul_precision: str | None = None):
        self.module = module
        self.matmul_precision = matmul_precision

    def _apply(self, params, cord):
        if self.matmul_precision is None:
            return self.module.apply(params, cord)
        with jax.default_matmul_precision(self.matmul_precision):
            return self.module.apply(params, cord)

    def __call__(self, cord, params):
        cord = jnp.asarray(cord)
        if cord.ndim == 1:
            # single point given as a flat vector (the reference's
            # `phi([x, y], θ)` idiom) -> one column
            cord = cord[:, None]
        return self._apply(params, cord)

    def apply(self, params, cord):
        return self._apply(params, cord)


class PhysicsInformedNN:
    """Discretizer config (reference: src/pinn_types.jl:123-187).

    * chain: a `Module` (single output) or a list of Modules (one per depvar)
    * strategy: a TrainingStrategy
    * init_params: optional parameter pytree(s)
    * derivative: "jvp" (default, exact nested forward-mode) | "fd"
      (reference-parity finite-difference stencils) | a DerivativeEngine
    * param_estim: append PDE parameters to θ as θ["p"] for inverse problems
    * additional_loss: fn(phi, theta, p) added to the total loss
    * adaptive_loss: an AbstractAdaptiveLoss (default NonAdaptiveLoss)
    * logger / log_options: logging hook protocol
    * seed: PRNG seed for default parameter initialization
    * gradient_enhanced: gPINN weight w (Yu et al. 2022) — each PDE residual
      additionally penalizes √w·∂residual/∂x_i for every independent
      variable (beyond the reference)
    * matmul_precision: trace-time `jax.default_matmul_precision` for every
      generated loss ("highest" = true-f32 MXU passes — the TPU accuracy
      lever, PERF.md r3; None inherits)
    """

    def __init__(self, chain, strategy: TrainingStrategy | None, *,
                 init_params=None, derivative="jvp", param_estim: bool = False,
                 additional_loss: Callable | None = None,
                 adaptive_loss: AbstractAdaptiveLoss | None = None,
                 logger=None, log_options: LogOptions | None = None,
                 seed: int = 0, integral_order: int = 20, integral_panels: int = 1,
                 dtype=None, remat: bool = False, loss_accum_dtype=None,
                 gradient_enhanced: float | None = None,
                 matmul_precision: str | None = None):
        self.multioutput = isinstance(chain, (list, tuple))
        self.chain = list(chain) if self.multioutput else chain
        self.strategy = strategy
        self.init_params = init_params
        if isinstance(derivative, DerivativeEngine):
            self.derivative = derivative
        else:
            self.derivative = DerivativeEngine(derivative)
        self.param_estim = param_estim
        self.additional_loss = additional_loss
        self.adaptive_loss = adaptive_loss or NonAdaptiveLoss()
        self.logger = logger
        self.log_options = log_options or LogOptions()
        self.seed = seed
        self.integral_order = integral_order
        self.integral_panels = integral_panels
        self.dtype = dtype
        # rematerialize residual activations in the backward pass — trades
        # FLOPs for HBM at very large collocation batches
        self.remat = remat
        # f32 network evals with a wider (e.g. jnp.float64) loss reduction:
        # the stiff-inverse-problem mitigation for TPU, where end-to-end f64
        # is software-emulated (SURVEY hard-part #4; measured in PERF.md)
        self.loss_accum_dtype = loss_accum_dtype
        # gPINN residual-gradient weight (None = off); see symbolic_discretize
        self.gradient_enhanced = gradient_enhanced
        # trace-time jax.default_matmul_precision for every generated loss:
        # "highest" = true-f32 MXU passes.  THE TPU accuracy lever (PERF.md
        # r3): default bf16-pass matmuls floor sharp-front separable
        # Allen-Cahn at rel L2 0.025; "highest" reaches 0.0039 at
        # comparable wall-clock.  None inherits the ambient precision.
        self.matmul_precision = matmul_precision
        chains = self.chain if self.multioutput else [self.chain]
        # phi inherits the precision so user-facing EVALUATION matches the
        # trained numerics (bf16-pass inference floors at ~1e-3, PERF.md)
        self.phi = ([Phi(c, matmul_precision) for c in chains]
                    if self.multioutput else Phi(self.chain, matmul_precision))


class BayesianPINN(PhysicsInformedNN):
    """PhysicsInformedNN + dataset for HMC posterior sampling
    (reference: src/pinn_types.jl:207-221)."""

    def __init__(self, chain, strategy=None, *, dataset=None, **kwargs):
        super().__init__(chain, strategy, **kwargs)
        self.dataset = dataset if dataset is not None else (None, None)


@dataclass
class PINNLossFunctions:
    """Generated loss functions (reference: src/pinn_types.jl:390-416)."""

    bc_loss_functions: list
    pde_loss_functions: list
    full_loss_function: Callable
    additional_loss_function: Callable | None
    datafree_pde_loss_functions: list
    datafree_bc_loss_functions: list


@dataclass
class PINNRepresentation:
    """Internal representation returned by symbolic_discretize
    (reference: src/pinn_types.jl:233-379)."""

    eqs: list
    bcs: list
    domains: list
    eq_params: list
    defaults: dict
    default_p: Any
    param_estim: bool
    additional_loss: Callable | None
    adaloss: AbstractAdaptiveLoss
    depvars: list
    indvars: list
    dict_indvars: dict
    dict_depvars: dict
    dict_depvar_input: dict
    logger: Any
    multioutput: bool
    init_params: Any
    flat_init_params: Any
    phi: Any
    derivative: DerivativeEngine
    strategy: TrainingStrategy
    pde_indvars: list
    bc_indvars: list
    pde_integration_vars: list
    bc_integration_vars: list
    # TPU-native extras
    pde_args: list = field(default_factory=list)
    bc_args: list = field(default_factory=list)
    dtype: Any = None
    loss_accum_dtype: Any = None
    remat: bool = False
    gradient_enhanced: float | None = None
    integral_order: int = 20
    integral_panels: int = 1
    log_options: LogOptions = field(default_factory=LogOptions)
    integral: Any = None
    symbolic_pde_loss_functions: list = field(default_factory=list)
    symbolic_bc_loss_functions: list = field(default_factory=list)
    loss_functions: PINNLossFunctions | None = None
    matmul_precision: str | None = None


@dataclass
class TrainingProblem:
    """OptimizationProblem analog returned by `discretize`
    (reference: src/discretize.jl:774-778)."""

    loss: Callable            # (theta, key) -> (total, aux-dict)
    init_params: Any
    pinnrep: PINNRepresentation

    def with_params(self, params):  # `remake(prob, u0=...)` analog
        return TrainingProblem(self.loss, params, self.pinnrep)


def _get_vars(pde_system: PDESystem):
    depvars = [d.name for d in pde_system.dvs]
    indvars = [v.name for v in pde_system.ivs]
    dict_depvar_input = {}
    for d in pde_system.dvs:
        names = []
        for a in d.args:
            if not isinstance(a, Sym):
                raise TypeError(f"declared depvar {d!r} must have Sym arguments")
            names.append(a.name)
        dict_depvar_input[d.name] = names
    dict_indvars = {n: i for i, n in enumerate(indvars)}
    dict_depvars = {n: i for i, n in enumerate(depvars)}
    return depvars, indvars, dict_indvars, dict_depvars, dict_depvar_input


def symbolic_discretize(pde_system: PDESystem,
                        discretization: PhysicsInformedNN) -> PINNRepresentation:
    depvars, indvars, dict_indvars, dict_depvars, dict_depvar_input = \
        _get_vars(pde_system)
    dtype = discretization.dtype or default_float()
    multioutput = discretization.multioutput
    chains = discretization.chain if multioutput else [discretization.chain]
    if multioutput and len(chains) != len(depvars):
        raise ValueError(f"{len(depvars)} dependent variables but {len(chains)} chains")

    # --- initial parameters (reference: src/discretize.jl:430-470) ---------
    if discretization.init_params is None:
        key = jax.random.key(discretization.seed)
        keys = jax.random.split(key, len(chains))
        inits = [c.init(k) for c, k in zip(chains, keys)]
        init_params = ({d: p for d, p in zip(depvars, inits)} if multioutput
                       else inits[0])
    else:
        init_params = discretization.init_params
    # enforce the discretization dtype on (float) parameters — the
    # reference's EltypeAdaptor semantics (src/eltype_matching.jl:1-18):
    # params, training sets, and residual math share one eltype, so
    # PhysicsInformedNN(dtype=jnp.float32) really is f32 end-to-end even
    # under jax_enable_x64
    init_params = jax.tree.map(
        lambda a: (jnp.asarray(a).astype(dtype)
                   if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                   else jnp.asarray(a)),
        init_params)

    eq_params = [p.name for p in pde_system.ps]
    default_p = None
    if pde_system.ps:
        missing = [p.name for p in pde_system.ps if p not in pde_system.defaults]
        if missing and not discretization.param_estim:
            raise ValueError(f"parameters {missing} need defaults (or param_estim=True)")
        default_p = np.array([float(pde_system.defaults.get(p, 0.0))
                              for p in pde_system.ps])

    flat_init_params = {"depvar": init_params}
    if discretization.param_estim:
        flat_init_params["p"] = jnp.asarray(default_p, dtype=dtype)

    # --- per-equation layouts ---------------------------------------------
    eqs, bcs = pde_system.eqs, pde_system.bcs
    pde_args = [get_argument(eq, depvars) for eq in eqs]
    bc_args = [get_argument(bc, depvars) for bc in bcs]
    is_quadrature = isinstance(discretization.strategy, QuadratureTraining)
    if is_quadrature:
        # quadrature cord rows = symbol args only (reference: src/discretize.jl:118-124)
        pde_layouts = [[a for a in args if isinstance(a, Sym)] for args in pde_args]
        bc_layouts = [[a for a in args if isinstance(a, Sym)] for args in bc_args]
        pde_indvars, bc_indvars = pde_args, bc_args
    else:
        pde_layouts = [[a if isinstance(a, Sym) else None for a in args]
                       for args in pde_args]
        bc_layouts = [[a if isinstance(a, Sym) else None for a in args]
                      for args in bc_args]
        pde_indvars = [get_variables(eq, depvars) for eq in eqs]
        bc_indvars = [get_variables(bc, depvars) for bc in bcs]

    phis = discretization.phi if multioutput else [discretization.phi]
    ctx = LoweringContext(
        depvars=depvars, indvars=indvars, dict_depvar_input=dict_depvar_input,
        phis=[p.apply for p in phis], multioutput=multioutput,
        derivative=discretization.derivative, eq_params=eq_params,
        param_estim=discretization.param_estim,
        integral_order=discretization.integral_order,
        integral_panels=discretization.integral_panels,
    )

    pinnrep = PINNRepresentation(
        eqs=eqs, bcs=bcs, domains=pde_system.domains, eq_params=eq_params,
        defaults=pde_system.defaults, default_p=default_p,
        param_estim=discretization.param_estim,
        additional_loss=discretization.additional_loss,
        adaloss=discretization.adaptive_loss, depvars=depvars, indvars=indvars,
        dict_indvars=dict_indvars, dict_depvars=dict_depvars,
        dict_depvar_input=dict_depvar_input, logger=discretization.logger,
        multioutput=multioutput, init_params=init_params,
        flat_init_params=flat_init_params, phi=discretization.phi,
        derivative=discretization.derivative, strategy=discretization.strategy,
        pde_indvars=pde_indvars, bc_indvars=bc_indvars,
        pde_integration_vars=[get_integration_variables(eq) for eq in eqs],
        bc_integration_vars=[get_integration_variables(bc) for bc in bcs],
        pde_args=pde_args, bc_args=bc_args, dtype=dtype,
        loss_accum_dtype=discretization.loss_accum_dtype,
        remat=discretization.remat,
        gradient_enhanced=discretization.gradient_enhanced,
        integral_order=discretization.integral_order,
        integral_panels=discretization.integral_panels,
        log_options=discretization.log_options,
    )

    # inspectable expanded residual expressions (symbolic AST parity)
    pinnrep.symbolic_pde_loss_functions = [
        Call("-", (expand_derivatives(eq.lhs), expand_derivatives(eq.rhs)))
        for eq in eqs]
    pinnrep.symbolic_bc_loss_functions = [
        Call("-", (expand_derivatives(bc.lhs), expand_derivatives(bc.rhs)))
        for bc in bcs]

    datafree_pde = [build_residual_function(eq, lay, ctx, default_p)
                    for eq, lay in zip(eqs, pde_layouts)]
    datafree_bc = [build_residual_function(bc, lay, ctx, default_p)
                   for bc, lay in zip(bcs, bc_layouts)]
    ge = discretization.gradient_enhanced
    if ge:
        # gPINN (Yu, Lu, Meng & Karniadakis 2022): also penalize the spatial
        # gradient of the residual, which must vanish wherever the residual
        # does.  Each PDE residual grows extra rows √w·∂f/∂x_i (one exact
        # forward-mode jvp per Sym argument), so every strategy's
        # mean-square reduction sees (L_res + w·ΣL_grad)/(1+n_axes) — same
        # minimizers, one static-shape program, composes with every
        # strategy/adaptive scheme.  BCs are left untouched.
        sqrt_w = float(np.sqrt(ge))

        def ge_wrap(f, args):
            axes = [i for i, a in enumerate(args) if isinstance(a, Sym)]

            def g(cord, theta):
                rows = [jnp.atleast_2d(f(cord, theta))]
                for i in axes:
                    tang = jnp.zeros_like(cord).at[i, :].set(1.0)
                    rows.append(sqrt_w * jnp.atleast_2d(jax.jvp(
                        lambda c: f(c, theta), (cord,), (tang,))[1]))
                return jnp.concatenate(rows, axis=0)

            return g

        datafree_pde = [ge_wrap(f, a) for f, a in zip(datafree_pde, pde_args)]
    if discretization.remat:
        datafree_pde = [jax.checkpoint(f) for f in datafree_pde]
        datafree_bc = [jax.checkpoint(f) for f in datafree_bc]

    mp = discretization.matmul_precision
    pinnrep.matmul_precision = mp
    if mp is not None:
        datafree_pde = [_wrap_precision(f, mp) for f in datafree_pde]
        datafree_bc = [_wrap_precision(f, mp) for f in datafree_bc]

    pinnrep.loss_functions = _assemble_loss_functions(pinnrep, datafree_pde,
                                                      datafree_bc)
    return pinnrep


def _wrap_precision(fn, mp):
    if mp is None:
        return fn

    def wrapped(*a, **k):
        with jax.default_matmul_precision(mp):
            return fn(*a, **k)

    return wrapped


def _assemble_loss_functions(pinnrep, datafree_pde,
                             datafree_bc) -> PINNLossFunctions:
    """Strategy build + weighted-sum total loss, from datafree residual
    functions.  Factored out of `symbolic_discretize` so the quadrature-
    adaptivity loop (`solve(quad_adapt=True)`) can REBUILD the strategy's
    rules against trained parameters (the reference trains against
    h-adaptive cubature that tracks the evolving solution,
    src/training_strategies.jl:406-436; we refine at bounded re-solve
    boundaries instead — see `rebuild_strategy_losses`)."""
    mp = pinnrep.matmul_precision
    dtype = pinnrep.dtype

    pde_loss_functions, bc_loss_functions = pinnrep.strategy.build(
        pinnrep, datafree_pde, datafree_bc)
    if mp is not None:
        pde_loss_functions = [_wrap_precision(f, mp)
                              for f in pde_loss_functions]
        bc_loss_functions = [_wrap_precision(f, mp) for f in bc_loss_functions]

    additional_loss = pinnrep.additional_loss
    phi_for_user = pinnrep.phi
    param_estim = pinnrep.param_estim
    n_pde, n_bc = len(pde_loss_functions), len(bc_loss_functions)

    def full_loss_function(theta, lstate):
        """(theta, {"key", "adaptive"}) -> (total, aux).

        Mirrors the deterministic weighted-sum loss
        (reference: src/discretize.jl:564-649); weights come from the adaptive
        state and are gradient-blocked.
        """
        key = lstate["key"]
        pde_keys = jax.random.split(jax.random.fold_in(key, 0), max(n_pde, 1))
        bc_keys = jax.random.split(jax.random.fold_in(key, 1), max(n_bc, 1))
        pde_losses = jnp.stack([f(theta, k) for f, k in
                                zip(pde_loss_functions, pde_keys)]) if n_pde \
            else jnp.zeros((0,), dtype)
        bc_losses = jnp.stack([f(theta, k) for f, k in
                               zip(bc_loss_functions, bc_keys)]) if n_bc \
            else jnp.zeros((0,), dtype)
        ada = lstate["adaptive"]
        w_pde = jax.lax.stop_gradient(ada["pde_weights"])
        w_bc = jax.lax.stop_gradient(ada["bc_weights"])
        weighted_pde = w_pde * pde_losses
        weighted_bc = w_bc * bc_losses
        total = jnp.sum(weighted_pde) + jnp.sum(weighted_bc)
        aux = {"pde_losses": pde_losses, "bc_losses": bc_losses,
               "weighted_pde_losses": weighted_pde, "weighted_bc_losses": weighted_bc}
        if additional_loss is not None:
            theta_ = theta["depvar"]
            p_ = theta.get("p") if param_estim else None
            add = additional_loss(phi_for_user, theta_, p_)
            w_add = jax.lax.stop_gradient(ada["additional_weights"])[0]
            total = total + w_add * add
            aux["additional_loss"] = add
        aux["full_weighted_loss"] = total
        return total, aux

    if mp is not None:
        full_loss_function = _wrap_precision(full_loss_function, mp)

    return PINNLossFunctions(
        bc_loss_functions=bc_loss_functions,
        pde_loss_functions=pde_loss_functions,
        full_loss_function=full_loss_function,
        additional_loss_function=additional_loss,
        datafree_pde_loss_functions=datafree_pde,
        datafree_bc_loss_functions=datafree_bc,
    )


def rebuild_strategy_losses(pinnrep, at_params=None) -> Callable:
    """Re-run the training strategy's `build` — rule auto-refinement
    included — with `pinnrep.flat_init_params` set to ``at_params`` (e.g.
    TRAINED parameters), and reassemble the total loss.

    This is the quadrature-adaptivity rebuild step: an auto-refined
    `QuadratureTraining` rule was tuned on the initial-params integrand;
    when `validate_trained` finds the trained residual outruns it, this
    re-refines every equation's rule against the trained solution (the
    reference's always-adaptive semantics, src/training_strategies.jl:406-436,
    delivered at re-solve boundaries — XLA needs static shapes inside the
    step).  Mutates ``pinnrep.loss_functions`` (and ``flat_init_params``);
    returns the new full loss for a warm-started `TrainingProblem`."""
    if at_params is not None:
        pinnrep.flat_init_params = at_params
    lf = pinnrep.loss_functions
    pinnrep.loss_functions = _assemble_loss_functions(
        pinnrep, lf.datafree_pde_loss_functions,
        lf.datafree_bc_loss_functions)
    return pinnrep.loss_functions.full_loss_function


def discretize(pde_system: PDESystem,
               discretization: PhysicsInformedNN) -> TrainingProblem:
    """PDESystem -> TrainingProblem (reference: src/discretize.jl:774-778)."""
    pinnrep = symbolic_discretize(pde_system, discretization)
    return TrainingProblem(
        loss=pinnrep.loss_functions.full_loss_function,
        init_params=pinnrep.flat_init_params,
        pinnrep=pinnrep,
    )
