"""Factorized tensor-grid lowering for separable trial functions (SPINN).

Lowers the same symbolic equations as `compile.lower` but evaluates them on a
tensor-product grid: every dependent-variable call and derivative term becomes
an einsum contraction of per-axis feature matrices

    u-grid            = Σ_r Π_a F_a[:, r]          F_a = f_a(nodes_a)   (N_a, rank)
    ∂^k u/∂x_a^k grid = Σ_r F_a^(k) Π_{b≠a} F_b    F^(k) = jet order-k features

so an ``N^d``-point residual costs ``N·d`` axis-net evaluations instead of the
dense pipeline's ``N^d`` full-network evaluations (reference pointwise engine:
src/pinn_types.jl:421-458).  All contraction FLOPs are MXU matmuls; the only
``N^d``-sized arrays are the residual grids themselves.

Selected by the `SeparableTraining` strategy; every chain must be a
`neuralpde_tpu.nn.SeparableNet`.  Integro-differential terms with constant
(or infinite — transformed) bounds factorize too: each integration variable
becomes a temporary quadrature grid axis that is contracted away
(`_integral_grid`); only bounds that reference grid axes need a dense
strategy.
"""

from __future__ import annotations

import string
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..nn.separable import SeparableNet
from ..parallel.mesh import shard_axis_nodes
from ..strategies import (
    TrainingStrategy, _mean_sq_loss, _msq, generate_training_sets, julia_range,
)
from ..symbolic.expr import (
    PRIMITIVES, Call, DepVarCall, Deriv, Eq, Expr, IntegralExpr, Num, Param,
    Sym, _simplify, expand_derivatives, symbolic_diff,
)
from ..symbolic.system import infimum, supremum
from .lower import LoweringContext, get_argument

_AXIS_LETTERS = string.ascii_lowercase[:10]

# error texts that mean "this equation cannot factorize" (vs a genuinely
# malformed problem): SeparableTraining.build routes these equations to a
# dense pointwise fallback instead of failing the whole problem
_FACTORIZATION_ERROR_MARKS = ("separable fast path",)

# dense-fallback tensor grids beyond this size would materialize the full
# N^d pointwise evaluation the factorized path exists to avoid
_DENSE_FALLBACK_MAX_POINTS = 1 << 22


def _is_factorization_error(e: BaseException) -> bool:
    return (isinstance(e, (ValueError, NotImplementedError))
            and any(m in str(e) for m in _FACTORIZATION_ERROR_MARKS))


@dataclass
class _GridContext:
    """Per-equation evaluation context on a tensor grid."""

    ctx: LoweringContext          # shared symbolic context (theta_for, params)
    nets: dict                    # depvar name -> SeparableNet
    nodes: list                   # per grid axis: (N_i,) 1-D node array
    k: int                        # number of grid axes
    dtype: object


def _grid_env(gctx: _GridContext, axes) -> dict:
    """Bind each grid-axis Sym to its nodes, broadcast-shaped (1,…,N_i,…,1)."""
    env = {}
    for i, s in enumerate(axes):
        shape = [1] * gctx.k
        shape[i] = gctx.nodes[i].shape[0]
        env[s.name] = gctx.nodes[i].reshape(shape)
    return env


def _slot_nodes(arg, env, theta, p, gctx: _GridContext):
    """Evaluate one depvar-call argument -> (grid axis or None, (N,) nodes).

    A `Num`/constant maps to a single-node axis (shape (1,)); a value varying
    along exactly one grid axis maps to that axis; anything coupling two axes
    cannot factorize and raises.
    """
    if isinstance(arg, Num):
        return None, jnp.full((1,), float(arg.value), gctx.dtype)
    val = jnp.asarray(_gev(arg, env, theta, p, gctx))
    if val.ndim == 0:
        return None, val.reshape(1)
    if val.ndim != gctx.k:
        val = val.reshape((1,) * (gctx.k - val.ndim) + val.shape)
    nz = [d for d in range(gctx.k) if val.shape[d] != 1]
    if len(nz) == 0:
        return None, val.reshape(1)
    if len(nz) == 1:
        return nz[0], val.reshape(-1)
    raise ValueError(
        "separable fast path: a dependent-variable argument couples several "
        "grid axes and cannot factorize — under SeparableTraining this "
        "equation auto-routes to a dense pointwise evaluation; elsewhere "
        "use a dense training strategy")


def _depvar_grid(call: DepVarCall, orders: dict, env, theta, p,
                 gctx: _GridContext):
    """Grid tensor of a (derivative of a) depvar call.

    ``orders[slot]`` is the per-input-slot derivative order (0 if absent).
    """
    net = gctx.nets[call.name]
    params = gctx.ctx.theta_for(call.name, theta)
    want = len(gctx.ctx.dict_depvar_input[call.name])
    if len(call.args) != want:
        raise ValueError(
            f"{call.name} called with {len(call.args)} args, declared with {want}")

    by_axis: dict = {}        # grid axis -> (rank, N_i) combined features
    const = None              # (rank,) product of constant-slot features
    for slot, arg in enumerate(call.args):
        axis, nodes = _slot_nodes(arg, env, theta, p, gctx)
        F = net.axis_features(params, slot, nodes, orders.get(slot, 0))
        if axis is None:
            vec = F[:, 0]
            const = vec if const is None else const * vec
        elif axis in by_axis:
            by_axis[axis] = by_axis[axis] * F   # two slots fed the same axis
        else:
            by_axis[axis] = F

    if not by_axis:                              # fully pinned call, e.g. u(0, 0)
        return jnp.sum(const)
    terms, ops, out = [], [], ""
    if const is not None:
        terms.append("z")
        ops.append(const)
    for axis in sorted(by_axis):
        terms.append("z" + _AXIS_LETTERS[axis])
        ops.append(by_axis[axis])
        out += _AXIS_LETTERS[axis]
    val = jnp.einsum(",".join(terms) + "->" + out, *ops)
    shape = [1] * gctx.k
    for j, axis in enumerate(sorted(by_axis)):
        shape[axis] = val.shape[j]
    return val.reshape(shape)


def _gev(expr: Expr, env: dict, theta, p, gctx: _GridContext):
    """Recursive grid evaluator (the tensor-grid analog of lower._ev)."""
    ctx = gctx.ctx
    if isinstance(expr, Num):
        return expr.value
    if isinstance(expr, Sym):
        try:
            return env[expr.name]
        except KeyError:
            raise KeyError(
                f"variable {expr.name!r} is unbound in this equation's "
                f"grid layout {sorted(env)}") from None
    if isinstance(expr, Param):
        idx = ctx.eq_params.index(expr.name)
        if ctx.param_estim:
            return theta["p"][idx]
        if p is None:
            raise ValueError(f"parameter {expr.name!r} has no default value")
        return p[idx]
    if isinstance(expr, Call):
        vals = [_gev(a, env, theta, p, gctx) for a in expr.args]
        return PRIMITIVES[expr.op](*vals)
    if isinstance(expr, DepVarCall):
        return _depvar_grid(expr, {}, env, theta, p, gctx)
    if isinstance(expr, Deriv):
        target = expr.target
        if not isinstance(target, DepVarCall):
            raise ValueError(
                f"derivative target {target!r} is not a dependent-variable "
                "call; run expand_derivatives first")
        inputs = ctx.dict_depvar_input[target.name]
        orders: dict = {}
        for w in expr.wrt:
            if w.name not in inputs:
                return jnp.zeros((), gctx.dtype)   # ∂u/∂z, z not an input of u
            slot = inputs.index(w.name)
            orders[slot] = orders.get(slot, 0) + 1
        return _depvar_grid(target, orders, env, theta, p, gctx)
    if isinstance(expr, IntegralExpr):
        return _integral_grid(expr, env, theta, p, gctx)
    raise TypeError(f"cannot lower {type(expr).__name__}")


def _integral_grid(expr: IntegralExpr, env, theta, p, gctx: _GridContext):
    """Integral terms on the factorized grid: each integration variable
    becomes a TEMPORARY extra grid axis of static Gauss-Legendre nodes, the
    integrand evaluates through the same factorized machinery on the
    extended tensor grid, and the quadrature contraction removes the extra
    axes again.  Constant (or infinite — transformed) bounds only; bounds
    referencing grid axes couple axes and need a dense strategy."""
    from ..ops.quadrature import composite_gl_unit
    from .transform_inf import transform_inf_integral

    expr = transform_inf_integral(expr)
    if any(isinstance(b, Expr) and not isinstance(b, Num)
           for b in expr.lb + expr.ub):
        raise NotImplementedError(
            "integro-differential terms with symbolic/parametric bounds "
            "cannot factorize on the separable fast path (the bound couples "
            "grid axes); under SeparableTraining such equations auto-route "
            "to a dense pointwise evaluation (other equations stay "
            "factorized) — or use GridTraining/StochasticTraining/"
            "QuadratureTraining for the whole problem")
    lbs = [b.value if isinstance(b, Num) else float(b) for b in expr.lb]
    ubs = [b.value if isinstance(b, Num) else float(b) for b in expr.ub]
    nu, wu = composite_gl_unit(gctx.ctx.integral_order,
                               gctx.ctx.integral_panels)
    m = len(expr.ivars)
    k0 = gctx.k

    env2 = {}
    for name, v in env.items():
        arr = jnp.asarray(v)
        if arr.ndim:
            arr = arr.reshape(arr.shape + (1,) * m)
        env2[name] = arr
    nodes2 = list(gctx.nodes)
    for d, iv in enumerate(expr.ivars):
        qn = jnp.asarray(lbs[d] + (ubs[d] - lbs[d]) * nu, gctx.dtype)
        nodes2.append(qn)
        shape = [1] * (k0 + m)
        shape[k0 + d] = qn.shape[0]
        env2[iv.name] = qn.reshape(shape)

    gctx2 = _GridContext(ctx=gctx.ctx, nets=gctx.nets, nodes=nodes2,
                         k=k0 + m, dtype=gctx.dtype)
    val = jnp.asarray(_gev(expr.integrand, env2, theta, p, gctx2))
    if val.ndim == 0:
        val = val.reshape((1,) * (k0 + m))
    # no broadcast_to: a size-1 temp axis (ivar-independent integrand)
    # contracts against the weights (Σw = 1) without materializing the
    # full extended grid, and the caller broadcasts the outer axes
    w = jnp.asarray(wu, gctx.dtype)
    for d in reversed(range(m)):
        val = jnp.sum(val * w, axis=-1) * (ubs[d] - lbs[d])
    return val


def _expr_residual(expr: Expr, axes, ctx: LoweringContext, nets: dict, dtype,
                   default_p=None):
    """Lower one (already-expanded) Expr to ``fn(nodes_list, theta) -> grid``
    over the given ordered ``axes``."""
    p_arr = None if default_p is None else jnp.asarray(default_p)

    def residual(nodes_list, theta):
        gctx = _GridContext(ctx=ctx, nets=nets,
                            nodes=[jnp.asarray(n, dtype) for n in nodes_list],
                            k=len(axes), dtype=dtype)
        env = _grid_env(gctx, axes)
        out = _gev(expr, env, theta, p_arr, gctx)
        grid_shape = tuple(n.shape[0] for n in gctx.nodes)
        return jnp.broadcast_to(jnp.asarray(out), grid_shape)

    return residual


def build_separable_residual(eq: Eq, ctx: LoweringContext, nets: dict, dtype,
                             default_p=None):
    """Lower one equation to ``residual(nodes_list, theta) -> grid array``.

    Returns ``(residual, axes)`` where ``axes`` is the ordered list of grid
    Syms (get_argument order); ``nodes_list`` supplies the per-axis 1-D node
    arrays in that order and the result has shape ``(N_1, …, N_k)``.
    """
    expr = Call("-", (expand_derivatives(eq.lhs), expand_derivatives(eq.rhs)))
    axes = [a for a in get_argument(eq, ctx.depvars) if isinstance(a, Sym)]
    return _expr_residual(expr, axes, ctx, nets, dtype, default_p), axes


class SeparableTraining(TrainingStrategy):
    """Tensor-product-grid training for `SeparableNet` chains (SPINN).

    * ``dx``: grid spacing (scalar or per-domain list) — static Julia-range
      nodes per axis, like GridTraining (reference:
      src/training_strategies.jl:13-15) but factorized.
    * ``points``: per-axis node count with ``resample=True`` drawing fresh
      uniform axis nodes every optimizer step (the stochastic variant —
      the collocation *grid* is the product of the per-axis draws).
    * ``causal``: a time variable (Sym or name) switches equations whose
      grid contains that axis to causality-respecting weighting (Wang,
      Sankaran & Perdikaris 2022, as in `CausalTraining`): every time NODE
      is a slab — its mean-square residual over the other axes L_i gets
      weight ``exp(-causal_eps·Δt·Σ_{j<i} L_j)`` (gradient-blocked), so
      late times only count once early times are resolved.  ``causal_eps=0``
      reduces exactly to the unweighted loss.  NOTE: the Δt factor makes
      eps node-count-independent (it discretizes ``exp(-eps·∫₀ᵗ L dt)``);
      `CausalTraining` uses the paper's raw ``Σ L_j`` exponent, so the
      same eps value means different things — here ``eps =
      causal_training_eps / Δt`` for matched slabbing.

    * ``rad_candidates`` (resampling mode only): residual-adaptive AXIS
      sampling — each step draws that many uniform candidates per axis,
      evaluates the (gradient-blocked) residual on the candidate tensor
      grid, and categorical-resamples the ``points`` axis nodes from the
      per-axis marginals ``mean_other|r|^rad_k + rad_c·mean`` (the
      factorized analog of `ResidualAdaptiveTraining`'s RAD scheme —
      beyond reference).  Nodes concentrate where the residual mass lives
      along each axis; BCs keep plain uniform resampling.

    Builds its own factorized losses directly from the symbolic equations;
    the pointwise datafree closures remain available on the representation
    for parity checks.  `PhysicsInformedNN(gradient_enhanced=w)` lowers
    the gPINN rows symbolically onto the factorized grid (the residual
    must be symbolically differentiable) and ``remat=True`` checkpoints
    each grid residual.
    """

    def __init__(self, dx=None, *, points=None, resample: bool = False,
                 causal=None, causal_eps: float = 1.0,
                 rad_candidates: int | None = None, rad_k: float = 1.0,
                 rad_c: float = 1.0):
        if (dx is None) == (points is None):
            raise ValueError("give exactly one of dx= or points=")
        if points is not None and not resample:
            raise ValueError("points= requires resample=True (use dx= for a "
                             "static grid)")
        if rad_candidates is not None and points is None:
            raise ValueError("rad_candidates= needs the resampling mode "
                             "(points=..., resample=True)")
        self.dx = dx
        self.points = points
        self.resample = resample
        self.causal = (causal.name if isinstance(causal, Sym) else causal)
        self.causal_eps = causal_eps
        self.rad_candidates = rad_candidates
        self.rad_k = rad_k
        self.rad_c = rad_c
        self._weight_fns = []

    def build(self, pinnrep, datafree_pde, datafree_bc):
        # factorized path lowers its own losses; the pointwise datafree
        # closures back the dense fallback for non-factorizable equations
        dtype = pinnrep.dtype
        acc = pinnrep.loss_accum_dtype
        phis = pinnrep.phi if pinnrep.multioutput else [pinnrep.phi]
        nets = {}
        for name, phi in zip(pinnrep.depvars, phis):
            if not isinstance(phi.module, SeparableNet):
                raise TypeError(
                    f"SeparableTraining requires every chain to be a "
                    f"SeparableNet; chain for {name!r} is "
                    f"{type(phi.module).__name__}")
            nets[name] = phi.module

        ctx = LoweringContext.from_pinnrep(pinnrep)

        spans = {d.variables.name: (float(infimum(d.domain)),
                                    float(supremum(d.domain)))
                 for d in pinnrep.domains}
        if self.dx is not None:
            dxs = (list(self.dx) if isinstance(self.dx, (list, tuple))
                   else [self.dx] * len(pinnrep.domains))
            static_nodes = {
                d.variables.name: julia_range(spans[d.variables.name][0],
                                              spans[d.variables.name][1], h)
                for d, h in zip(pinnrep.domains, dxs)}
        else:
            static_nodes = None

        eps = self.causal_eps

        def causal_reduce(r, t_pos, dt):
            """Per-t-node causal weighting of a grid residual: one slab per
            grid node, with the exponent discretizing the paper's continuous
            form w(t) = exp(-eps·∫₀ᵗ L) as ``Σ_{j<i} L_j·Δt`` so eps is
            independent of the node count (``mean(w·L)`` == plain
            mean-square when eps == 0)."""
            sq = r * r
            if acc is not None:
                sq = sq.astype(acc)
            other = tuple(d for d in range(sq.ndim) if d != t_pos)
            L = jnp.mean(sq, axis=other) if other else sq
            csum = (jnp.cumsum(L) - L) * dt
            w = jax.lax.stop_gradient(jnp.exp(-eps * csum))
            return jnp.mean(w * L), w

        ge = getattr(pinnrep, "gradient_enhanced", None)
        remat = getattr(pinnrep, "remat", False)

        theta0 = getattr(pinnrep, "flat_init_params", None)

        def make_loss(eq, eq_tag, allow_causal):
            residual, axes = build_separable_residual(
                eq, ctx, nets, dtype, pinnrep.default_p)
            for a in axes:
                if a.name not in spans:
                    raise ValueError(
                        f"equation variable {a.name!r} has no domain")
            stacked = False
            if allow_causal and ge:
                # gPINN on the factorized path: the residual-gradient rows
                # ∂f/∂x_a come from SYMBOLIC differentiation of the expanded
                # residual expression (the grid evaluator then factorizes
                # them like any other term), stacked as leading rows so the
                # reduction matches the dense ge_wrap row-concatenation
                # semantics exactly (compile/discretize.py ge_wrap).
                expr = Call("-", (expand_derivatives(eq.lhs),
                                  expand_derivatives(eq.rhs)))
                sqrt_w = float(ge) ** 0.5
                try:
                    grad_res = [
                        _expr_residual(_simplify(symbolic_diff(expr, a)),
                                       axes, ctx, nets, dtype,
                                       pinnrep.default_p)
                        for a in axes]
                except ValueError as e:
                    raise ValueError(
                        "gradient_enhanced with SeparableTraining needs a "
                        "symbolically differentiable residual; "
                        f"lowering d/dx of {eq!r} failed: {e}") from e
                base = residual

                def residual(nodes, theta, base=base, grad_res=grad_res,
                             sqrt_w=sqrt_w):
                    rows = [base(nodes, theta)] + [
                        sqrt_w * g(nodes, theta) for g in grad_res]
                    return jnp.stack(rows)

                stacked = True
            if remat:
                residual = jax.checkpoint(residual)
            if theta0 is not None:
                # abstract probe: factorization failures (axis-coupling
                # arguments, parametric integral bounds) otherwise only
                # surface at first trace — raise them HERE so build() can
                # route this equation to the dense fallback
                jax.eval_shape(residual,
                               [jnp.zeros((2,), dtype) for _ in axes],
                               theta0)
            t_axis = None   # index into the grid-axis list (node sorting)
            t_pos = None    # index into the residual array dims (reduction)
            if allow_causal and self.causal is not None:
                names = [a.name for a in axes]
                if self.causal in names:
                    t_axis = names.index(self.causal)
                    t_pos = t_axis + (1 if stacked else 0)

            if static_nodes is not None:
                nodes = [jnp.asarray(static_nodes[a.name], dtype) for a in axes]

                def make_nodes(key, nodes=nodes):
                    del key
                    # re-annotate in-trace: closed-over arrays bake in as
                    # replicated constants under jit (see mesh.shard_batch)
                    return ([shard_axis_nodes(nodes[0])] + list(nodes[1:])
                            if nodes else list(nodes))
            else:
                bounds = [spans[a.name] for a in axes]

                def make_nodes(key, bounds=bounds, eq_tag=eq_tag,
                               t_axis=t_axis):
                    ns = []
                    for i, (lb, ub) in enumerate(bounds):
                        k = jax.random.fold_in(jax.random.fold_in(key, eq_tag), i)
                        draw = lb + (ub - lb) * jax.random.uniform(
                            k, (self.points,), dtype)
                        if i == t_axis:
                            draw = jnp.sort(draw)   # causal cumsum needs order
                        ns.append(draw)
                    if ns:
                        ns[0] = shard_axis_nodes(ns[0])
                    return ns

            use_rad = (static_nodes is None and self.rad_candidates
                       and allow_causal and axes)
            if use_rad:
                n_cand = int(self.rad_candidates)
                rad_k, rad_c = float(self.rad_k), float(self.rad_c)
                bounds_r = [spans[a.name] for a in axes]
                offset = 1 if stacked else 0

                def nodes_of(key, theta, bounds=bounds_r, eq_tag=eq_tag,
                             t_axis=t_axis, residual=residual):
                    # axis-factorized RAD (beyond reference; the per-axis
                    # marginalization of the RAD scheme in
                    # ResidualAdaptiveTraining): candidate tensor grid ->
                    # |r|^k marginals per axis -> categorical per-axis
                    # resample, all gradient-blocked and in-graph
                    kb = jax.random.fold_in(key, eq_tag)
                    cand = []
                    for i, (lb, ub) in enumerate(bounds):
                        k = jax.random.fold_in(jax.random.fold_in(kb, 7), i)
                        cand.append(lb + (ub - lb) * jax.random.uniform(
                            k, (n_cand,), dtype))
                    r = jax.lax.stop_gradient(residual(cand, theta))
                    w = jnp.abs(r) ** rad_k
                    ns = []
                    for i in range(len(bounds)):
                        other = tuple(d for d in range(w.ndim)
                                      if d != i + offset)
                        marg = jnp.mean(w, axis=other) if other else w
                        marg = marg + rad_c * jnp.mean(marg)
                        ki = jax.random.fold_in(jax.random.fold_in(kb, 8), i)
                        idx = jax.random.categorical(
                            ki, jnp.log(marg + 1e-30), shape=(self.points,))
                        draw = cand[i][idx]
                        if i == t_axis:
                            draw = jnp.sort(draw)
                        ns.append(draw)
                    ns[0] = shard_axis_nodes(ns[0])
                    return ns
            else:
                def nodes_of(key, theta, make_nodes=make_nodes):
                    del theta
                    return make_nodes(key)

            if t_pos is None:
                def loss(theta, key, residual=residual, nodes_of=nodes_of):
                    return _msq(residual(nodes_of(key, theta), theta), acc)
            else:
                lo, hi = spans[self.causal]
                n_t = (len(static_nodes[self.causal])
                       if static_nodes is not None else self.points)
                dt = (hi - lo) / max(n_t - 1, 1)

                def loss(theta, key, residual=residual, nodes_of=nodes_of,
                         t_pos=t_pos, dt=dt):
                    return causal_reduce(residual(nodes_of(key, theta), theta),
                                         t_pos, dt)[0]

                self._weight_fns.append(
                    lambda theta, key, residual=residual,
                    nodes_of=nodes_of, t_pos=t_pos, dt=dt:
                    causal_reduce(residual(nodes_of(key, theta), theta),
                                  t_pos, dt)[1])
            return loss

        def dense_fallback(df, args, eq_tag, eq, why):
            """Pointwise evaluation of one non-factorizable equation on the
            SAME tensor grid the factorized equations train on (auto-hybrid
            routing; the reference's single dense pipeline handles every
            such equation, src/discretize.jl:332-396).  Causal/RAD
            weighting does not apply to routed equations."""
            import warnings

            sym_args = [a for a in args if isinstance(a, Sym)]
            if self.dx is not None:
                dxs = (list(self.dx) if isinstance(self.dx, (list, tuple))
                       else [self.dx] * len(pinnrep.domains))
                axis_len = {d.variables.name: len(julia_range(
                    spans[d.variables.name][0], spans[d.variables.name][1],
                    h)) for d, h in zip(pinnrep.domains, dxs)}
                n_total = 1
                for a in sym_args:
                    n_total *= axis_len[a.name]
            else:
                n_total = self.points ** len(sym_args) if sym_args else 1
            if n_total > _DENSE_FALLBACK_MAX_POINTS:
                raise ValueError(
                    f"equation {eq!r} cannot factorize ({why}) and its dense "
                    f"fallback tensor grid has {n_total} points (> "
                    f"{_DENSE_FALLBACK_MAX_POINTS}) — coarsen the grid for "
                    "this problem or use a dense training strategy") from None
            warnings.warn(
                f"SeparableTraining: equation {eq!r} cannot factorize "
                f"({why}); evaluating it densely on the {n_total}-point "
                "tensor grid (remaining equations stay on the factorized "
                "fast path; causal/RAD weighting does not apply to this "
                "equation)", stacklevel=2)
            if self.dx is not None:
                train_set = generate_training_sets(
                    pinnrep.domains, self.dx, [args], dtype)[0]
                return _mean_sq_loss(df, train_set, acc)

            bounds = [spans[a.name] if isinstance(a, Sym) else None
                      for a in args]

            def loss(theta, key, df=df, bounds=bounds, args=args,
                     eq_tag=eq_tag):
                cols = []
                for j, (a, b) in enumerate(zip(args, bounds)):
                    if b is None:
                        cols.append(jnp.full((1,), float(a), dtype))
                    else:
                        k = jax.random.fold_in(
                            jax.random.fold_in(key, eq_tag), j)
                        cols.append(b[0] + (b[1] - b[0]) * jax.random.uniform(
                            k, (self.points,), dtype))
                grids = jnp.meshgrid(*cols, indexing="ij")
                cord = jnp.stack([g.reshape(-1) for g in grids])
                return _msq(df(cord, theta), acc)

            return loss

        def route(eq, df, args, eq_tag, allow_causal):
            try:
                return make_loss(eq, eq_tag, allow_causal)
            except (ValueError, NotImplementedError) as e:
                if not _is_factorization_error(e):
                    raise
                return dense_fallback(df, args, eq_tag, eq, str(e))

        self._weight_fns = []
        pde_args, bc_args = pinnrep.pde_args, pinnrep.bc_args
        pde_losses = [route(eq, df, args, i, True)
                      for i, (eq, df, args) in enumerate(
                          zip(pinnrep.eqs, datafree_pde, pde_args))]
        bc_losses = [route(bc, df, args, 1000 + i, False)
                     for i, (bc, df, args) in enumerate(
                         zip(pinnrep.bcs, datafree_bc, bc_args))]
        return pde_losses, bc_losses

    def causal_weights(self, theta, key):
        """Per-time-node causal weights of each time-dependent equation (the
        paper's convergence monitor: done when the last weight ≈ 1)."""
        if not self._weight_fns:
            raise ValueError(
                "causal_weights requires a discretized problem built with "
                "causal=<time var> (and at least one time-dependent equation)")
        return [f(theta, key) for f in self._weight_fns]
