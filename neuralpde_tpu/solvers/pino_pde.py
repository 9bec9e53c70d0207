"""PINOPDE: physics-informed neural operator for parametric PDE families
(beyond reference — the reference's PINO surface is ODE-only,
src/pino_ode_solve.jl; this extends the same calling conventions to
`PDESystem` problems with an FNO backbone).

Learns the solution operator of a symbolic `PDESystem` over a family of
problem instances.  The family can be parametrized two ways (combinable):

* **scalar parameters** — `PDESystem.ps` entries ranging over `bounds`
  (e.g. a viscosity family), each an FNO input channel broadcast over the
  grid;
* **input functions** — dependent-variable-like fields that are *given*,
  not solved for (e.g. the initial condition in the classic
  `u0 -> u(x, t)` operator-learning benchmark, Li et al. 2021 §5), sampled
  from a user distribution (`GaussianRandomField` or any callable) and fed
  to the FNO as function-valued channels.

One FNO evaluation produces the whole solution field on the training
tensor grid for every family sample at once; the symbolic equations and
boundary conditions lower onto that field through `compile/fieldgrid.py`
(grid-axis FD derivatives, boundary slices).  The loss is the mean-square
of every equation's residual field — a single XLA program over
``(N1, ..., Nd, P)`` tensors, all MXU matmuls around XLA FFTs.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import default_float
from ..compile.fieldgrid import FieldGridContext, build_field_residual
from ..parallel.mesh import BATCH_AXIS, get_mesh
from ..nn.deeponet import DeepONetPDE
from ..nn.fno import FNO1D, FNO2D, FNO3D
from ..strategies import GridTraining, TrainingStrategy, julia_range
from ..symbolic.system import PDESystem, infimum, supremum
from ..train import solve as train_solve
from .ode import _SimpleProblem


class GaussianRandomField:
    """Sampler of smooth random fields for input-function families:
    squared-exponential-filtered white noise on the (periodized) grid,
    normalized to standard deviation `variance**0.5` and shifted by `mean`.

    ``sampler(key, axis_grids, n)`` returns ``(*axis_sizes, n)`` values on
    the given uniform grids (any dimension).  Periodic by construction —
    the first and last node of every axis carry the same value (grids
    include both endpoints); non-periodic families can pass any custom
    callable with the same signature instead.
    """

    def __init__(self, length_scale: float = 0.1, variance: float = 1.0,
                 mean: float = 0.0):
        self.length_scale = float(length_scale)
        self.variance = float(variance)
        self.mean = float(mean)

    def __call__(self, key, axis_grids, n: int):
        # grid geometry must stay host-side/static: under resample=True this
        # runs inside the jitted loss, where the grids are concrete closure
        # constants but any jnp op on them would be staged into a tracer
        grids = [np.ravel(np.asarray(g)) for g in axis_grids]
        sizes = [g.shape[0] - 1 for g in grids]          # periodic reduced
        if any(s < 2 for s in sizes):
            raise ValueError("GaussianRandomField needs >= 3 nodes per axis")
        spans = [float(g[-1] - g[0]) for g in grids]
        white = jax.random.normal(key, (*sizes, n), default_float())
        wh = jnp.fft.rfftn(white, axes=tuple(range(len(sizes))))
        k2 = 0.0
        for ax, (m, span) in enumerate(zip(sizes, spans)):
            freq = (np.fft.rfftfreq(m) if ax == len(sizes) - 1
                    else np.fft.fftfreq(m))
            k = 2 * np.pi * freq * m / span
            shape = [1] * (len(sizes) + 1)
            shape[ax] = k.shape[0]
            k2 = k2 + jnp.asarray(k.reshape(shape) ** 2, default_float())
        wh = wh * jnp.exp(-k2 * self.length_scale**2 / 4.0)
        f = jnp.fft.irfftn(wh, s=sizes, axes=tuple(range(len(sizes))))
        f = f / (jnp.std(f) + 1e-12) * self.variance**0.5 + self.mean
        # append the periodic wrap node on every axis (grids have endpoints)
        for ax in range(len(sizes)):
            first = jax.lax.slice_in_dim(f, 0, 1, axis=ax)
            f = jnp.concatenate([f, first], axis=ax)
        return f


@dataclass
class PINOPDE:
    """chain: `FNO3D`/`FNO2D`/`FNO1D` matching the system's
    independent-variable count, or a `DeepONetPDE` (mesh-free trunk;
    scalar-parameter families only);
    bounds: list of (lb, ub) per `PDESystem.ps` parameter, declaration
    order; number_of_parameters: train-set size along the family axis.
    input_functions: {declared_call: sampler} for function-valued family
    inputs — e.g. ``{f0(x): GaussianRandomField(0.1)}`` with `f0` a
    `DepVar` NOT listed in `PDESystem.dvs`; the sampler is called as
    ``sampler(key, axis_grids, n)`` -> ``(*axis_sizes, n)``.
    resample: draw a FRESH family every training step inside the jitted
    loss (scalar parameters uniform over `bounds`, input functions from
    their samplers — samplers must then be JAX-traceable, as
    `GaussianRandomField` is) instead of training on the fixed build-time
    family; the StochasticTraining analog for operator learning.
    causal_eps: causal (time-marching) weighting of the interior residual
    fields (Wang et al. 2022): per time node k on `causal_time_var`
    (default: the last independent variable), the slice loss L_k is
    weighted exp(-eps * Δt * Σ_{j<k} L_j) with gradient-blocked weights —
    the dt-normalized continuous form shared with
    `SeparableTraining(causal=...)`, so eps is node-count-independent.
    Slice means are taken over the GLOBAL family (pmean under the mesh).
    Boundary conditions stay unweighted.
    matmul_precision: dot-precision context for the loss (the round-3
    finding: TPU default f32 matmuls run bf16 passes; "highest" restores
    true-f32 accuracy floors).
    spectral_axes: independent variables (Syms or names) along which field
    derivatives are computed by exact FFT differentiation instead of the
    2nd-order FD stencils (Li et al. 2021 train PINO with spectral
    derivatives of the output).  Use for PERIODIC axes only — the training
    grid must span one full period (wrap node included); the FNO is
    already FFT-dominated, so this is nearly free."""

    chain: Any
    opt: Any = None
    bounds: Any = None
    number_of_parameters: int = 50
    init_params: Any = None
    strategy: TrainingStrategy | None = None
    additional_loss: Callable | None = None
    input_functions: Any = None
    resample: bool = False
    causal_eps: float | None = None
    causal_time_var: Any = None
    matmul_precision: str | None = None
    spectral_axes: Any = None
    seed: int = 0


@dataclass
class PINOPDESolution:
    """``sol(p, grids, input_values)`` evaluates the trained operator at
    parameter columns ``(n_ps, P)`` and/or input-function values on the
    training grid or on any uniform grids over the same domains (FNO
    discretization transfer)."""

    u: Any                     # field(s) on the training grid
    grids: Any                 # training grid node arrays, ivs order
    p: Any                     # training parameter columns (n_ps, P)
    input_samples: Any         # {name: (*axis_sizes, P)} training samples
    depvars: Any
    interp: Any
    original: Any
    input_axes: Any = None     # {name: [grid-axis indices]} (export needs it)
    loss_fn: Any = None        # the trained objective (theta, key) -> loss,
    retcode: str = "Success"   # exposed for diagnostics / polish drivers

    def __call__(self, p=None, grids=None, input_values=None):
        p = self.p if p is None else jnp.atleast_2d(jnp.asarray(p))
        gs = (self.grids if grids is None else
              [jnp.ravel(jnp.asarray(g)) for g in grids])
        if input_values is None:
            if grids is not None and self.input_samples:
                raise ValueError(
                    "evaluating on new grids requires input_values for the "
                    f"input functions {sorted(self.input_samples)} (sampled "
                    "values live on the training grid)")
            input_values = self.input_samples
        return self.interp(p, gs, input_values)


def _validate(pde_system: PDESystem, alg: PINOPDE, input_fns: dict):
    ivs = [v.name for v in pde_system.ivs]
    if isinstance(alg.chain, DeepONetPDE):
        if alg.chain.grid_ndim != len(ivs):
            raise ValueError(f"DeepONetPDE(grid_ndim={alg.chain.grid_ndim}) "
                             f"but the system has {len(ivs)} independent "
                             f"variables ({ivs})")
        if input_fns:
            raise ValueError(
                "DeepONetPDE takes scalar parameter families only — "
                "function-valued operator inputs (input_functions=) need an "
                "FNO backbone (FNO1D/2D/3D)")
    elif isinstance(alg.chain, FNO3D):
        if len(ivs) != 3:
            raise ValueError(f"FNO3D expects 3 independent variables, the "
                             f"system has {len(ivs)} ({ivs})")
    elif isinstance(alg.chain, FNO2D):
        if len(ivs) != 2:
            raise ValueError(f"FNO2D expects 2 independent variables, the "
                             f"system has {len(ivs)} ({ivs})")
    elif isinstance(alg.chain, FNO1D):
        if len(ivs) != 1:
            raise ValueError(f"FNO1D expects 1 independent variable, the "
                             f"system has {len(ivs)} ({ivs})")
    else:
        raise ValueError("PINOPDE requires an FNO chain (FNO3D/FNO2D/FNO1D "
                         "matching the independent-variable count) or a "
                         "DeepONetPDE; for pointwise networks use "
                         "PhysicsInformedNN")
    for d in pde_system.dvs:
        args = [a.name for a in d.args]
        if args != ivs:
            raise ValueError(
                f"field depvar {d.name} must be declared on all independent "
                f"variables in order ({ivs}); got {args}")
    for call in input_fns:
        names = [a.name for a in call.args]
        if any(n not in ivs for n in names) or \
                names != [n for n in ivs if n in names]:
            raise ValueError(
                f"input function {call.name} must be declared on a subset "
                f"of the independent variables in grid order ({ivs}); got "
                f"{names}")
        if call.name in {d.name for d in pde_system.dvs}:
            raise ValueError(
                f"input function {call.name} is also a solved depvar; "
                "input functions are given, not solved for")
    if not pde_system.ps and not input_fns:
        raise ValueError("PINOPDE learns a parametric family: the PDESystem "
                         "needs `ps` parameters (with PINOPDE bounds) "
                         "and/or PINOPDE input_functions")
    if pde_system.ps and (alg.bounds is None
                          or len(alg.bounds) != len(pde_system.ps)):
        raise ValueError(f"PINOPDE requires one (lb, ub) bound per system "
                         f"parameter ({len(pde_system.ps)})")
    n_in = len(pde_system.ps) + len(input_fns)
    if alg.chain.in_dim != n_in:
        raise ValueError(f"chain in_channels ({alg.chain.in_dim}) must equal "
                         f"n_parameters + n_input_functions ({n_in})")
    if alg.chain.out_dim != len(pde_system.dvs):
        raise ValueError(f"chain out_channels ({alg.chain.out_dim}) must "
                         f"equal the number of depvars ({len(pde_system.dvs)})")


def _build(pde_system: PDESystem, alg: PINOPDE):
    """Shared lowering for `solve_pino_pde` and the Gauss-Newton driver:
    validates, builds the training grids/family, the field evaluator, the
    per-equation residual closures, and the total loss.  Returns a
    namespace (see the attribute assignments at the end)."""
    dtype = default_float()
    input_fns = dict(alg.input_functions or {})
    _validate(pde_system, alg, input_fns)
    ivs = [v.name for v in pde_system.ivs]
    depvars = [d.name for d in pde_system.dvs]
    ndim = len(ivs)

    strategy = alg.strategy
    if not isinstance(strategy, GridTraining) or strategy.dx is None:
        raise ValueError("PINOPDE requires GridTraining(dx): the field-grid "
                         "residual FD stencils (and the FNO FFT axes) need "
                         "a uniform tensor grid")
    dxs = (list(strategy.dx) if isinstance(strategy.dx, (list, tuple))
           else [strategy.dx] * len(ivs))
    dom = {d.variables.name: d.domain for d in pde_system.domains}
    grids = [jnp.asarray(julia_range(infimum(dom[n]), supremum(dom[n]), h),
                         dtype=dtype) for n, h in zip(ivs, dxs)]

    n_fam = alg.number_of_parameters
    if pde_system.ps:
        bounds = [tuple(map(float, b)) for b in alg.bounds]
        p_tr = jnp.asarray(np.stack([np.linspace(b[0], b[1], n_fam)
                                     for b in bounds]), dtype=dtype)
    else:
        p_tr = jnp.zeros((0, n_fam), dtype)

    # sample the input-function family on the training grid
    fn_names = [call.name for call in input_fns]
    fn_axes = {call.name: [ivs.index(a.name) for a in call.args]
               for call in input_fns}
    skey = jax.random.key(alg.seed ^ 0x5EED)
    input_samples = {}
    for call, sampler in input_fns.items():
        skey, sub = jax.random.split(skey)
        axes = fn_axes[call.name]
        vals = jnp.asarray(sampler(sub, [grids[a] for a in axes], n_fam),
                           dtype=dtype)
        want = tuple(grids[a].shape[0] for a in axes) + (n_fam,)
        if vals.shape != want:
            raise ValueError(f"sampler for {call.name} returned shape "
                             f"{vals.shape}, expected {want}")
        input_samples[call.name] = vals

    def _full_rank(name, vals, gs):
        """(*axis_sizes, P) -> (N1(or 1), ..., Nd(or 1), P)."""
        axes = fn_axes[name]
        shape = [1] * ndim + [vals.shape[-1]]
        for i, a in enumerate(axes):
            shape[a] = vals.shape[i]
        return jnp.reshape(vals, shape)

    spectral = frozenset(getattr(v, "name", str(v))
                         for v in (alg.spectral_axes or ()))
    ctx = FieldGridContext(
        iv_names=ivs, grids=grids,
        dict_depvar_input={**{d.name: [a.name for a in d.args]
                              for d in pde_system.dvs},
                           **{call.name: [a.name for a in call.args]
                              for call in input_fns}},
        eq_params=[p.name for p in pde_system.ps],
        spectral_axes=spectral)
    residuals = [build_field_residual(eq, ctx)
                 for eq in pde_system.eqs + pde_system.bcs]

    chain = alg.chain
    n_dv = len(depvars)

    def operator_input(p_cols, gs, input_values):
        """Stack scalar-parameter and input-function channels into the FNO
        input: (C, N1, ..., Nd, P) when function channels are present,
        plain parameter columns (C, P) otherwise."""
        if not fn_names:
            return p_cols
        ns = tuple(jnp.ravel(g).shape[0] for g in gs)
        n_p = next(iter(input_values.values())).shape[-1]
        chans = [jnp.broadcast_to(
            p_cols.reshape((p_cols.shape[0],) + (1,) * ndim + (-1,)),
            (p_cols.shape[0], *ns, n_p))] if p_cols.shape[0] else []
        for name in fn_names:
            chans.append(jnp.broadcast_to(
                _full_rank(name, input_values[name], gs)[None],
                (1, *ns, n_p)))
        return jnp.concatenate(chans, axis=0)

    def eval_fields(theta, p_cols, gs, input_values):
        op_in = operator_input(p_cols, gs, input_values)
        if isinstance(chain, FNO1D):
            x_in = (op_in, gs[0][None, :])
        else:
            x_in = (op_in, tuple(gs))
        out = chain.apply(theta, x_in)
        fields = ({depvars[0]: out} if n_dv == 1
                  else {name: out[i] for i, name in enumerate(depvars)})
        for name in fn_names:
            fields[name] = _full_rank(name, input_values[name], gs)
        return fields

    prec = (jax.default_matmul_precision(alg.matmul_precision)
            if alg.matmul_precision is not None else contextlib.nullcontext())

    def _draw_family(lkey):
        """Fresh family sample inside the jitted loss (resample=True)."""
        kp, kf = jax.random.split(lkey)
        if pde_system.ps:
            lo = jnp.asarray([b[0] for b in bounds], dtype)[:, None]
            hi = jnp.asarray([b[1] for b in bounds], dtype)[:, None]
            p_cols = lo + (hi - lo) * jax.random.uniform(
                kp, (len(bounds), n_fam), dtype)
        else:
            p_cols = p_tr
        samples = {}
        for call, sampler in input_fns.items():
            kf, sub = jax.random.split(kf)
            axes = fn_axes[call.name]
            samples[call.name] = jnp.asarray(
                sampler(sub, [grids[a] for a in axes], n_fam), dtype)
        return p_cols, samples

    n_eq = len(pde_system.eqs)
    if alg.causal_eps is not None:
        causal_name = (ivs[-1] if alg.causal_time_var is None
                       else getattr(alg.causal_time_var, "name",
                                    str(alg.causal_time_var)))
        if causal_name not in ivs:
            raise ValueError(f"causal_time_var {causal_name!r} is not an "
                             f"independent variable ({ivs})")
        t_ax = ivs.index(causal_name)
        if grids[t_ax].shape[0] < 2:
            raise ValueError("causal weighting needs >= 2 time nodes")
        dt_node = float(grids[t_ax][1] - grids[t_ax][0])

    def _family_loss(theta_dv, p_cols, samples, mesh_axis=None):
        fields = eval_fields(theta_dv, p_cols, grids, samples)
        rows = [r(fields, p_cols) for r in residuals]
        if alg.causal_eps is None:
            return fields, sum(jnp.mean(r ** 2) for r in rows)
        loss = 0.0
        for i, r in enumerate(rows):
            if i < n_eq and r.ndim == ndim + 1 and r.shape[t_ax] > 1:
                other = tuple(a for a in range(r.ndim) if a != t_ax)
                L = jnp.mean(r ** 2, axis=other)            # (T,)
                if mesh_axis is not None:
                    L = jax.lax.pmean(L, mesh_axis)         # global family
                csum = jnp.cumsum(L) - L                    # exclusive
                w = jax.lax.stop_gradient(
                    jnp.exp(-alg.causal_eps * dt_node * csum))
                loss = loss + jnp.mean(w * L)
            else:
                loss = loss + jnp.mean(r ** 2)
        return fields, loss

    # family-axis data parallelism: under an active mesh the trailing (P)
    # axis of the parameter columns / input samples shards over devices
    # via shard_map — each device evaluates its own family members
    # locally (FFTs included; a with_sharding_constraint formulation
    # measured an all-gather of the family axis around every XLA FFT),
    # and the per-shard means pmean into the global loss (equal shards).
    mesh = get_mesh()
    use_smap = (mesh is not None and n_fam % mesh.shape[BATCH_AXIS] == 0
                and alg.additional_loss is None)
    if use_smap:
        from jax import shard_map
        from jax.sharding import PartitionSpec as PSpec

        def _shard_loss(theta_dv, p_cols, samples):
            # causal slice-means pmean inside (global family); the final
            # pmean is a no-op on those rows and averages the BC rows
            _, loss = _family_loss(theta_dv, p_cols, samples,
                                   mesh_axis=BATCH_AXIS)
            return jax.lax.pmean(loss, BATCH_AXIS)

        def _smap(p_cols, samples, theta_dv):
            pspec = PSpec(*([None] * (p_cols.ndim - 1)), BATCH_AXIS)
            sspecs = {n: PSpec(*([None] * (v.ndim - 1)), BATCH_AXIS)
                      for n, v in samples.items()}
            # check_vma=False: XLA FFT's vjp produces a cotangent marked
            # varying over the mesh axis while the primal output is not,
            # which the varying-manual-axes checker rejects (correctness is
            # covered by the sharded-vs-unsharded parity test)
            return shard_map(_shard_loss, mesh=mesh,
                             in_specs=(PSpec(), pspec, sspecs),
                             out_specs=PSpec(),
                             check_vma=False)(theta_dv, p_cols, samples)

    def total_loss(theta, lkey):
        with prec:
            if alg.resample:
                p_cols, samples = _draw_family(lkey)
            else:
                p_cols, samples = p_tr, input_samples
            if use_smap:
                return _smap(p_cols, samples, theta["depvar"])
            fields, loss = _family_loss(theta["depvar"], p_cols, samples)
            if alg.additional_loss is not None:
                loss = loss + alg.additional_loss(fields, theta)
        return loss

    chain_params = (chain.init(jax.random.key(alg.seed))
                    if alg.init_params is None else alg.init_params)

    class _Built:
        pass

    b = _Built()
    b.total_loss = total_loss
    b.family_loss = _family_loss
    b.chain_params = chain_params
    b.grids = grids
    b.p_tr = p_tr
    b.input_samples = input_samples
    b.fn_axes = fn_axes
    b.fn_names = fn_names
    b.depvars = depvars
    b.n_dv = n_dv
    b.eval_fields = eval_fields
    b.residuals = residuals
    b.prec = prec
    b.dtype = dtype
    return b


def _make_solution(b, theta_trained, res) -> PINOPDESolution:
    # jit, not eager: the axon TPU backend leaves some eagerly dispatched
    # complex/FFT primitives UNIMPLEMENTED (measured: eager FNO3D eval
    # crashes post-training), and compiled evaluation is what serving uses
    # anyway.  Hoisted out of interp so repeated evaluations reuse one
    # wrapper (and its trace cache) instead of re-wrapping per call.
    jit_eval = jax.jit(b.eval_fields)

    def interp(p_cols, gs, input_values):
        vals = {n: jnp.asarray(v, b.dtype)
                for n, v in (input_values or {}).items()}
        missing = set(b.fn_names) - set(vals)
        if missing:
            raise ValueError(f"missing input_values for {sorted(missing)}")
        with b.prec:
            fields = jit_eval(theta_trained, p_cols, gs, vals)
        if b.n_dv == 1:
            return fields[b.depvars[0]]
        return jnp.stack([fields[n] for n in b.depvars])

    u = interp(b.p_tr, b.grids, b.input_samples)
    return PINOPDESolution(u=u, grids=b.grids, p=b.p_tr,
                           input_samples=b.input_samples,
                           input_axes=dict(b.fn_axes), depvars=b.depvars,
                           interp=interp, original=res,
                           loss_fn=b.total_loss)


@dataclass
class PINOEnsembleResult:
    """Deep ensemble over a PINOPDE operator family: N independent FNO (or
    DeepONetPDE) initializations trained as ONE vmapped program, member axis
    shardable over the mesh (ensemble parallelism — same mechanics as
    `parallel.ensemble.solve_ensemble`, VERDICT r4 item 5).

    `best` is a full `PINOPDESolution` for the lowest-loss member (the
    seed-lottery fix); `mean_and_std` gives the deep-ensemble epistemic UQ
    over family predictions (Lakshminarayanan et al. 2017) — the UQ story
    the pointwise solvers already have, extended to operator learning."""

    members: Any               # {"depvar": pytree}, leaves (n_ensemble, ...)
    losses: Any                # (n_ensemble,) final per-member objectives
    iterations: int
    history: list
    _b: Any = None             # the shared _build namespace
    _jit_eval_members: Any = None

    @property
    def n_ensemble(self) -> int:
        return int(jax.tree.leaves(self.members)[0].shape[0])

    @property
    def best_index(self) -> int:
        import numpy as _np
        l = _np.asarray(self.losses)
        return int(_np.nanargmin(_np.where(_np.isfinite(l), l, _np.nan)))

    @property
    def best(self) -> PINOPDESolution:
        return self.member_solution(self.best_index)

    def member_solution(self, i: int) -> PINOPDESolution:
        """Full `PINOPDESolution` for member i (same surface as a solo
        `solve_pino_pde`, including discretization transfer + export)."""
        theta_i = jax.tree.map(lambda x: x[i], self.members)["depvar"]
        from ..train import SolveResult
        res = SolveResult(u={"depvar": theta_i},
                          objective=float(self.losses[i]),
                          iterations=self.iterations, aux={}, history=[])
        return _make_solution(self._b, theta_i, res)

    def _eval_args(self, p, grids, input_values):
        b = self._b
        p = b.p_tr if p is None else jnp.atleast_2d(jnp.asarray(p))
        gs = (b.grids if grids is None
              else [jnp.ravel(jnp.asarray(g)) for g in grids])
        if input_values is None:
            if grids is not None and b.input_samples:
                raise ValueError(
                    "evaluating on new grids requires input_values for the "
                    f"input functions {sorted(b.fn_names)}")
            input_values = b.input_samples
        vals = {n: jnp.asarray(v, b.dtype) for n, v in input_values.items()}
        missing = set(b.fn_names) - set(vals)
        if missing:
            raise ValueError(f"missing input_values for {sorted(missing)}")
        return p, gs, vals

    def predict(self, p=None, grids=None, input_values=None):
        """Every member's family prediction: (n_ensemble, [n_dv,] N1..Nd, P).
        Defaults evaluate on the training family/grids; new grids/values
        follow the `PINOPDESolution.__call__` contract."""
        b = self._b
        p, gs, vals = self._eval_args(p, grids, input_values)
        with b.prec:
            fields = self._jit_eval_members(self.members["depvar"],
                                            p, gs, vals)
        if b.n_dv == 1:
            return fields[b.depvars[0]]
        return jnp.stack([fields[n] for n in b.depvars], axis=1)

    def mean_and_std(self, p=None, grids=None, input_values=None):
        """Deep-ensemble predictive mean and epistemic std over members."""
        preds = self.predict(p, grids, input_values)
        return jnp.mean(preds, axis=0), jnp.std(preds, axis=0)


def solve_pino_pde_ensemble(pde_system: PDESystem, alg: PINOPDE, *,
                            n_ensemble: int = 8, maxiters: int = 1000,
                            key=None, inner_steps: int = 1, mesh=None,
                            abstol: float | None = None,
                            verbose: bool = False, callback=None,
                            checkpoint_path: str | None = None,
                            checkpoint_every: int | None = None
                            ) -> PINOEnsembleResult:
    """Train `n_ensemble` independent operator initializations as one
    vmapped program; member m's init and loss-key stream come from
    `fold_in(key, m)`, so member m reproduces a solo
    ``solve_pino_pde(system, replace(alg, init_params=chain.init(
    fold_in(key, m))), key=fold_in(key, m))`` exactly (parity-tested).

    ``mesh`` shards the MEMBER axis (ensemble parallelism): pass
    ``make_mesh(axis_name="ensemble")``.  The family-axis shard_map of the
    solo path is disabled during the build — members own the device axis;
    use one or the other."""
    from ..parallel.ensemble import solve_ensemble
    from ..parallel.mesh import no_mesh

    if alg.init_params is not None:
        raise ValueError("solve_pino_pde_ensemble draws per-member inits; "
                         "init_params= would make the members identical")
    # build the loss WITHOUT family-axis shard_map: the ensemble member axis
    # owns the mesh (two shard_maps over the same devices would conflict)
    with no_mesh():
        b = _build(pde_system, alg)
    chain = alg.chain
    prob = _SimpleProblem(b.total_loss, {"depvar": b.chain_params})
    res = solve_ensemble(prob, alg.opt or optax.adam(1e-3),
                         maxiters=maxiters, n_ensemble=n_ensemble, key=key,
                         inner_steps=inner_steps, mesh=mesh, abstol=abstol,
                         verbose=verbose, callback=callback,
                         checkpoint_path=checkpoint_path,
                         checkpoint_every=checkpoint_every,
                         member_init=lambda k: {"depvar": chain.init(k)})
    jit_eval = jax.jit(jax.vmap(b.eval_fields, in_axes=(0, None, None, None)))
    return PINOEnsembleResult(members=res.members, losses=res.losses,
                              iterations=res.iterations, history=res.history,
                              _b=b, _jit_eval_members=jit_eval)


def solve_pino_pde(pde_system: PDESystem, alg: PINOPDE, *,
                   abstol: float = 1e-8, verbose: bool = False,
                   maxiters: int = 1000, key=None, inner_steps: int = 1,
                   callback=None, checkpoint_dir: str | None = None,
                   checkpoint_every: int = 1000,
                   profile_dir: str | None = None) -> PINOPDESolution:
    b = _build(pde_system, alg)
    opt = alg.opt or optax.adam(1e-3)
    res = train_solve(_SimpleProblem(b.total_loss,
                                     {"depvar": b.chain_params}),
                      opt, maxiters=maxiters, abstol=abstol, verbose=verbose,
                      key=key, inner_steps=inner_steps, callback=callback,
                      checkpoint_dir=checkpoint_dir,
                      checkpoint_every=checkpoint_every,
                      profile_dir=profile_dir)
    return _make_solution(b, res.u["depvar"], res)
