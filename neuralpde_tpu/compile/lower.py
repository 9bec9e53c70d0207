"""Lowering: symbolic equations -> pure JAX residual functions.

This replaces the reference's runtime metaprogramming pipeline
(`transform_expression` -> Julia `Expr` -> `@RuntimeGeneratedFunction`,
reference: src/symbolic_utilities.jl:83-331, src/discretize.jl:28-173) with a
direct recursive evaluator over the expression IR.  The produced residual
closure is pure and traces once under `jit`:

    residual(cord, theta, p) -> (N,) residual values

where ``cord`` is the `(rows, N)` collocation matrix whose row layout is the
equation's argument list (`get_argument` semantics, reference:
src/symbolic_utilities.jl:495-526).

Dependent-variable calls build their own network-input matrix from their call
arguments in canonical positional order, which natively supports heterogeneous
systems (`u(x)`, `v(x, y)` mixed) and constant boundary arguments (`u(0, y)`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.derivatives import DerivativeEngine
from ..ops.quadrature import composite_gl_unit, tensor_rule_unit
from ..symbolic.expr import (
    PRIMITIVES, Call, DepVarCall, Deriv, Eq, Expr, IntegralExpr, Num, Param,
    Sym, expand_derivatives,
)
from .transform_inf import transform_inf_integral


@dataclass
class LoweringContext:
    """Static compile context shared by all equations of a system."""

    depvars: list            # depvar names, declaration order
    indvars: list            # indvar names, declaration order
    dict_depvar_input: dict  # depvar name -> list of canonical input var names
    phis: list               # per-depvar apply: (params, cord) -> (1, N)
    multioutput: bool
    derivative: DerivativeEngine
    eq_params: list = field(default_factory=list)  # Param names, order of ps
    param_estim: bool = False
    integral_order: int = 20
    integral_panels: int = 1

    def theta_for(self, name, theta):
        dep = theta["depvar"]
        return dep[name] if self.multioutput else dep

    def phi_for(self, name):
        return self.phis[self.depvars.index(name)]

    @classmethod
    def from_pinnrep(cls, pinnrep) -> "LoweringContext":
        """Rebuild the compile context of an existing `PINNRepresentation`
        (the separable/Gauss-Newton/BPINN/Ritz re-lowering entry point)."""
        phis = pinnrep.phi if pinnrep.multioutput else [pinnrep.phi]
        return cls(
            depvars=pinnrep.depvars, indvars=pinnrep.indvars,
            dict_depvar_input=pinnrep.dict_depvar_input,
            phis=[p.apply for p in phis], multioutput=pinnrep.multioutput,
            derivative=pinnrep.derivative, eq_params=pinnrep.eq_params,
            param_estim=pinnrep.param_estim,
            integral_order=pinnrep.integral_order,
            integral_panels=pinnrep.integral_panels)


# ---------------------------------------------------------------------------
# Equation analysis (get_argument / get_variables analogs)
# ---------------------------------------------------------------------------

def _walk(expr: Expr):
    yield expr
    if isinstance(expr, Call):
        for a in expr.args:
            yield from _walk(a)
    elif isinstance(expr, Deriv):
        yield from _walk(expr.target)
    elif isinstance(expr, DepVarCall):
        for a in expr.args:
            yield from _walk(a)
    elif isinstance(expr, IntegralExpr):
        yield from _walk(expr.integrand)
        for b in expr.lb + expr.ub:
            if isinstance(b, Expr):
                yield from _walk(b)


def _eq_expr(eq: Eq) -> Expr:
    return Call("-", (eq.lhs, eq.rhs))


def first_depvar_calls(eq: Eq, depvars: Sequence[str]) -> list:
    """First call of each depvar appearing in the equation, depvar order
    (mirrors get_argument's find_thing_in_expr pass, reference:
    src/symbolic_utilities.jl:502-526)."""
    calls = {}
    for node in _walk(_eq_expr(eq)):
        if isinstance(node, DepVarCall) and node.name not in calls:
            calls[node.name] = node
    return [calls[d] for d in depvars if d in calls]


def get_argument(eq: Eq, depvars: Sequence[str]) -> list:
    """Training-set column layout: call args of each depvar, symbols deduped
    (first occurrence), numbers kept (reference: src/symbolic_utilities.jl:502-526)."""
    args = []
    seen = set()
    for call in first_depvar_calls(eq, depvars):
        for a in call.args:
            if isinstance(a, Sym):
                if a.name not in seen:
                    seen.add(a.name)
                    args.append(a)
            elif isinstance(a, Num):
                args.append(a.value)
            else:
                # computed argument (e.g. transformed integration var): its
                # free symbols are collected instead
                for sub in _walk(a):
                    if isinstance(sub, Sym) and sub.name not in seen:
                        seen.add(sub.name)
                        args.append(sub)
    return args


def get_variables(eq: Eq, depvars: Sequence[str]) -> list:
    """Symbols of get_argument (reference: src/symbolic_utilities.jl:465-468)."""
    return [a for a in get_argument(eq, depvars) if isinstance(a, Sym)]


def get_integration_variables(eq: Eq) -> list:
    out = []
    for node in _walk(_eq_expr(eq)):
        if isinstance(node, IntegralExpr):
            out.extend(v for v in node.ivars if v not in out)
    return out


def free_symbols(eq: Eq) -> list:
    out = []
    for node in _walk(_eq_expr(eq)):
        if isinstance(node, Sym) and node not in out:
            out.append(node)
    return out


# ---------------------------------------------------------------------------
# Recursive evaluator
# ---------------------------------------------------------------------------

def _ev(expr: Expr, env: dict, theta, p, ctx: LoweringContext, N: int):
    if isinstance(expr, Num):
        return expr.value
    if isinstance(expr, Sym):
        try:
            return env[expr.name]
        except KeyError:
            raise KeyError(
                f"variable {expr.name!r} is unbound in this equation's "
                f"collocation layout {sorted(env)}"
            ) from None
    if isinstance(expr, Param):
        idx = ctx.eq_params.index(expr.name)
        if ctx.param_estim:
            return theta["p"][idx]
        if p is None:
            raise ValueError(f"parameter {expr.name!r} has no default value")
        return p[idx]
    if isinstance(expr, Call):
        vals = [_ev(a, env, theta, p, ctx, N) for a in expr.args]
        return PRIMITIVES[expr.op](*vals)
    if isinstance(expr, DepVarCall):
        cord_u = _depvar_cord(expr, env, theta, p, ctx, N)
        phi = ctx.phi_for(expr.name)
        return phi(ctx.theta_for(expr.name, theta), cord_u)[0]
    if isinstance(expr, Deriv):
        return _ev_deriv(expr, env, theta, p, ctx, N)
    if isinstance(expr, IntegralExpr):
        return _ev_integral(expr, env, theta, p, ctx, N)
    raise TypeError(f"cannot lower {type(expr).__name__}")


def _depvar_cord(call: DepVarCall, env, theta, p, ctx, N):
    """Network-input matrix (dim_u, N) from call args in canonical order
    (the `cordᵢ = vcat(...)` header, reference: src/discretize.jl:111-115)."""
    want = len(ctx.dict_depvar_input[call.name])
    if len(call.args) != want:
        raise ValueError(
            f"{call.name} called with {len(call.args)} args, declared with {want}"
        )
    rows = []
    for a in call.args:
        v = _ev(a, env, theta, p, ctx, N)
        rows.append(jnp.broadcast_to(jnp.asarray(v), (N,)))
    # EltypeAdaptor semantics (reference: src/eltype_matching.jl): network
    # inputs follow the parameter eltype.  Without this, a CONSTANT call
    # argument (u(0.0, y)) materializes as weak-f64 under jax_enable_x64 and
    # silently promotes an f32 problem's residual to f64.
    leaves = jax.tree.leaves(ctx.theta_for(call.name, theta))
    if leaves:
        dt = jnp.asarray(leaves[0]).dtype
        if jnp.issubdtype(dt, jnp.floating):
            rows = [r.astype(dt) if jnp.issubdtype(r.dtype, jnp.floating)
                    else r for r in rows]
    return jnp.stack(rows, axis=0)


def _ev_deriv(expr: Deriv, env, theta, p, ctx, N):
    target = expr.target
    if not isinstance(target, DepVarCall):
        raise ValueError(
            f"derivative target {target!r} is not a dependent-variable call; "
            "run expand_derivatives first"
        )
    inputs = ctx.dict_depvar_input[target.name]
    var_indices = []
    for w in expr.wrt:
        if w.name not in inputs:
            return jnp.zeros((N,))  # ∂u/∂z with z not an input of u
        var_indices.append(inputs.index(w.name))
    # The derivative is wrt the network's input slot; the call argument at that
    # position may be a constant (Neumann BC `Dx(u(0, y))`) or any expression —
    # the stencil/jvp shifts the evaluated row (reference semantics: the FD
    # engine shifts the bound cord row, src/pinn_types.jl:421-458).
    cord_u = _depvar_cord(target, env, theta, p, ctx, N)
    phi = ctx.phi_for(target.name)
    theta_u = ctx.theta_for(target.name, theta)

    def u_fn(c):
        return phi(theta_u, c)

    return ctx.derivative(u_fn, cord_u, var_indices, len(inputs))[0]


def _ev_integral(expr: IntegralExpr, env, theta, p, ctx, N):
    """Integral terms -> batched static-shape Gauss-Legendre quadrature.

    The reference solves one adaptive IntegralProblem per collocation column in
    a host loop (src/discretize.jl:387-394); here every column's integral is
    evaluated in one batched XLA computation.
    """
    expr = transform_inf_integral(expr)
    ndims = len(expr.ivars)

    if ndims == 1:
        nu, wu = composite_gl_unit(ctx.integral_order, ctx.integral_panels)
        Q = len(nu)
        lb = jnp.broadcast_to(jnp.asarray(_ev(expr.lb[0], env, theta, p, ctx, N)
                                          if isinstance(expr.lb[0], Expr) else expr.lb[0]), (N,))
        ub = jnp.broadcast_to(jnp.asarray(_ev(expr.ub[0], env, theta, p, ctx, N)
                                          if isinstance(expr.ub[0], Expr) else expr.ub[0]), (N,))
        scale = ub - lb                                   # (N,)
        nodes = lb[:, None] + scale[:, None] * jnp.asarray(nu)[None, :]  # (N, Q)
        env_flat = {k: jnp.broadcast_to(jnp.asarray(v)[..., None], (N, Q)).reshape(-1)
                    for k, v in env.items()}
        env_flat[expr.ivars[0].name] = nodes.reshape(-1)
        vals = _ev(expr.integrand, env_flat, theta, p, ctx, N * Q)
        vals = jnp.broadcast_to(jnp.asarray(vals), (N * Q,)).reshape(N, Q)
        return jnp.sum(vals * jnp.asarray(wu)[None, :], axis=-1) * scale

    # n-D with parametric bounds: rewrite as iterated 1-D integrals
    # (outermost = first ivar; inner bounds may reference outer ivars,
    # reference: ProductDomain(UnitInterval(), ClosedInterval(0, x)) in
    # ide__integrodiff_example_4)
    if any(isinstance(b, Expr) and not isinstance(b, Num)
           for b in expr.lb + expr.ub):
        inner = IntegralExpr(expr.integrand, expr.ivars[1:],
                             expr.lb[1:], expr.ub[1:])
        outer = IntegralExpr(inner, expr.ivars[:1], expr.lb[:1], expr.ub[:1])
        return _ev_integral(outer, env, theta, p, ctx, N)

    # n-D, static numeric bounds: tensor rule on the unit cube
    lbs = np.array([b.value if isinstance(b, Num) else float(b) for b in expr.lb])
    ubs = np.array([b.value if isinstance(b, Num) else float(b) for b in expr.ub])
    nodes_u, weights_u = tensor_rule_unit(ndims, ctx.integral_order, ctx.integral_panels)
    Q = nodes_u.shape[1]
    vol = float(np.prod(ubs - lbs))
    env_flat = {k: jnp.broadcast_to(jnp.asarray(v)[..., None], (N, Q)).reshape(-1)
                for k, v in env.items()}
    for d, iv in enumerate(expr.ivars):
        nd = lbs[d] + (ubs[d] - lbs[d]) * nodes_u[d]      # (Q,)
        env_flat[iv.name] = jnp.broadcast_to(jnp.asarray(nd)[None, :], (N, Q)).reshape(-1)
    vals = _ev(expr.integrand, env_flat, theta, p, ctx, N * Q)
    vals = jnp.broadcast_to(jnp.asarray(vals), (N * Q,)).reshape(N, Q)
    return jnp.sum(vals * jnp.asarray(weights_u)[None, :], axis=-1) * vol


# ---------------------------------------------------------------------------
# Public entry: build the residual closure for one equation
# ---------------------------------------------------------------------------

def get_numeric_integral(ctx: LoweringContext, default_p=None, *,
                         adaptive: bool = False, reltol: float = 1e-6,
                         abstol: float = 1e-3, maxiters: int = 1000):
    """Debugging helper (reference export: src/discretize.jl:332-396): returns
    ``integral(expr, cord, theta, env_syms)`` evaluating an IntegralExpr at the
    columns of ``cord`` (rows bound to ``env_syms`` in order).

    ``adaptive=True`` switches to the runtime h-adaptive host path honoring
    reltol/abstol/maxiters — per-column adaptive solves exactly as the
    reference's per-column IntegralProblem loop (src/discretize.jl:387-394):
    QuadGKJL-style interval bisection for 1-D integrals, CubatureJLh-style
    box bisection (`ops.quadrature.adaptive_quad_nd`) for n-D.  Host-side
    and gradient-opaque: use for evaluation parity, not inside a jitted
    loss."""
    from ..ops.quadrature import adaptive_quad_1d, adaptive_quad_nd

    p_arr = None if default_p is None else jnp.asarray(default_p)

    def integral(expr: IntegralExpr, cord, theta, env_syms: Sequence[Sym]):
        cord = jnp.atleast_2d(jnp.asarray(cord))
        N = cord.shape[1]
        if not adaptive:
            env = {s.name: cord[i] for i, s in enumerate(env_syms)}
            return _ev_integral(expr, env, theta, p_arr, ctx, N)

        expr_t = transform_inf_integral(expr)
        ivars = [v.name for v in expr_t.ivars]
        outs = []

        def bound(b, env_j):
            return (float(_ev(b, env_j, theta, p_arr, ctx, 1))
                    if isinstance(b, Expr) else float(b))

        for j in range(N):
            env_j = {s.name: cord[i, j] for i, s in enumerate(env_syms)}
            lbs = [bound(b, env_j) for b in expr_t.lb]
            ubs = [bound(b, env_j) for b in expr_t.ub]

            if len(ivars) == 1:
                def f1(nodes, env_j=env_j):
                    e = dict(env_j)
                    e[ivars[0]] = jnp.asarray(nodes)
                    v = _ev(expr_t.integrand, e, theta, p_arr, ctx,
                            len(nodes))
                    return np.asarray(jnp.broadcast_to(jnp.asarray(v),
                                                       (len(nodes),)))

                val, _err = adaptive_quad_1d(f1, lbs[0], ubs[0],
                                             reltol=reltol, abstol=abstol,
                                             maxiters=maxiters)
            else:
                def fn(nodes, env_j=env_j):
                    e = dict(env_j)
                    for d, name in enumerate(ivars):
                        e[name] = jnp.asarray(nodes[d])
                    v = _ev(expr_t.integrand, e, theta, p_arr, ctx,
                            nodes.shape[1])
                    return np.asarray(jnp.broadcast_to(jnp.asarray(v),
                                                       (nodes.shape[1],)))

                val, _err = adaptive_quad_nd(fn, lbs, ubs, reltol=reltol,
                                             abstol=abstol,
                                             maxiters=maxiters)
            outs.append(val)
        return jnp.asarray(np.stack(outs))

    return integral


def build_residual_function(eq: Eq, row_layout: Sequence, ctx: LoweringContext,
                            default_p=None) -> Callable:
    """Lower one equation into ``residual(cord, theta) -> (N,)``.

    ``row_layout`` gives, per cord row, the Sym bound to that row (or None for
    constant rows kept only for train-set shape parity with the reference).
    ``default_p`` is closed over for non-estimated parameters
    (reference: src/discretize.jl:172 binds default_p the same way).
    """
    expr = Call("-", (expand_derivatives(eq.lhs), expand_derivatives(eq.rhs)))
    sym_rows = [(i, s) for i, s in enumerate(row_layout) if isinstance(s, Sym)]
    p_arr = None if default_p is None else jnp.asarray(default_p)

    def residual(cord, theta):
        N = cord.shape[1]
        env = {s.name: cord[i] for i, s in sym_rows}
        out = _ev(expr, env, theta, p_arr, ctx, N)
        return jnp.broadcast_to(jnp.asarray(out), (N,))

    return residual


# reference export-name alias (src/NeuralPDE.jl:90-116 exports build_loss_function)
build_loss_function = build_residual_function
