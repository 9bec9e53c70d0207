"""Field-grid lowering: symbolic equations -> residual fields on a uniform
tensor grid (the PINO-PDE backend; beyond reference — the reference's PINO
surface is ODE-only, src/pino_ode_solve.jl).

`compile/lower.py` treats each dependent variable as a pointwise network
evaluated per collocation column.  Here each dependent variable is a FIELD:
one array over the whole tensor grid ``(N1, ..., Nd, P)`` produced by a
single operator evaluation (FNO).  That changes the lowering rules:

* **Derivatives are finite differences of the evaluated field along grid
  axes** (second-order central interior, one-sided second-order ends) — the
  PINO-correct derivative.  FD through a coordinate *channel* measures the
  network's coordinate sensitivity, which training can satisfy while the
  actual node-to-node field drifts freely through the spectral path
  (measured: solvers/pino.py::_grid_dfdt docstring); differentiating the
  output field ties the physics to what the solution returns (Li et al.
  2021 trains PINO with exactly grid/spectral derivatives of the output).
* **Boundary conditions lower to slices.**  A constant call argument on a
  grid node (``u(0, t)``) pins that axis to the matching node index,
  producing a size-1 axis that broadcasts against the rest of the
  expression.  Each call resolves its own pins, so periodic pairs
  (``u(0, t) ~ u(1, t)``) and boundary-derivative conditions
  (``Dx(u(0, t))`` — full-axis FD, then slice) need no region analysis.
* **Equation parameters are operator inputs**: a `Param` broadcasts its
  training column ``(P,)`` over the grid axes, exactly like the constant
  channels the FNO consumes.

Everything is dense array slicing/broadcasting on static shapes — one XLA
program per loss, no per-point vmap.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np
import jax.numpy as jnp

from ..symbolic.expr import (
    PRIMITIVES, Call, DepVarCall, Deriv, Eq, Expr, IntegralExpr, Num, Param,
    Sym, expand_derivatives,
)


def grid_diff(u, h, axis: int, order: int):
    """Finite difference of a field along one grid axis: second-order
    central interior with one-sided second-order ends (the boundary rows
    stay usable for boundary-condition slices).  ``order`` 1 or 2 directly;
    higher orders compose (``order=3`` -> second then first, etc.)."""
    if order >= 3:
        return grid_diff(grid_diff(u, h, axis, 2), h, axis, order - 2)
    u = jnp.moveaxis(u, axis, 0)
    n = u.shape[0]
    if order == 1:
        if n < 3:
            raise ValueError(f"first derivative needs >= 3 grid nodes, got {n}")
        interior = (u[2:] - u[:-2]) / (2 * h)
        first = (-3 * u[0:1] + 4 * u[1:2] - u[2:3]) / (2 * h)
        last = (3 * u[-1:] - 4 * u[-2:-1] + u[-3:-2]) / (2 * h)
    elif order == 2:
        if n < 4:
            raise ValueError(f"second derivative needs >= 4 grid nodes, got {n}")
        interior = (u[2:] - 2 * u[1:-1] + u[:-2]) / h**2
        first = (2 * u[0:1] - 5 * u[1:2] + 4 * u[2:3] - u[3:4]) / h**2
        last = (2 * u[-1:] - 5 * u[-2:-1] + 4 * u[-3:-2] - u[-4:-3]) / h**2
    else:
        raise ValueError(f"derivative order must be >= 1, got {order}")
    return jnp.moveaxis(jnp.concatenate([first, interior, last], axis=0),
                        0, axis)


def grid_diff_spectral(u, span: float, axis: int, order: int):
    """Spectral (FFT) derivative of a PERIODIC field along one grid axis
    whose nodes include BOTH endpoints: the wrap node is dropped for the
    FFT and re-appended, so the output layout matches `grid_diff`.

    This is the derivative Li et al. 2021 train PINO with on periodic axes
    (exact for band-limited fields, vs `grid_diff`'s O(h²) truncation — the
    FNO output IS band-limited by its spectral truncation, so the residual
    sees no discretization error at all).  ``span`` is the period
    (grid[-1] - grid[0]).  The Nyquist mode is zeroed for odd orders (its
    derivative is not representable on the real grid)."""
    u = jnp.moveaxis(u, axis, 0)
    m = u.shape[0] - 1                               # wrap node dropped
    if m < 2:
        raise ValueError(f"spectral derivative needs >= 3 grid nodes, got "
                         f"{u.shape[0]}")
    uh = jnp.fft.rfft(u[:-1], axis=0)
    k = 2.0 * np.pi * np.fft.rfftfreq(m) * m / span  # angular wavenumbers
    factor = (1j * k) ** order
    if order % 2 == 1 and m % 2 == 0:
        factor[-1] = 0.0                             # odd-order Nyquist
    if order % 2 == 0:
        factor = factor.real                         # (ik)^even is real
    shape = (k.shape[0],) + (1,) * (u.ndim - 1)
    du = jnp.fft.irfft(uh * jnp.asarray(factor.reshape(shape)), n=m, axis=0)
    du = du.astype(u.dtype)
    du = jnp.concatenate([du, du[0:1]], axis=0)      # re-append wrap node
    return jnp.moveaxis(du, 0, axis)


@dataclass
class FieldGridContext:
    """Static lowering context: the grid layout shared by all equations.

    * iv_names: grid-axis variable names, axis order
    * grids: per-axis 1-D node arrays (uniform spacing)
    * dict_depvar_input: depvar name -> canonical input names (must equal
      iv_names for every field depvar; validated by the solver)
    * eq_params: Param names in the order of the parameter-column rows
    * spectral_axes: names of PERIODIC axes whose field derivatives use
      exact FFT differentiation (`grid_diff_spectral`) instead of the
      second-order FD stencils — the caller asserts periodicity (the grid
      must span one full period, wrap node included)
    """

    iv_names: list
    grids: list
    dict_depvar_input: dict
    eq_params: list
    spectral_axes: frozenset = frozenset()

    def __post_init__(self):
        self.spacings = [float(g[1] - g[0]) if len(g) > 1 else 1.0
                         for g in self.grids]
        self.spans = [float(g[-1] - g[0]) if len(g) > 1 else 1.0
                      for g in self.grids]
        self._node_vals = [[float(v) for v in g] for g in self.grids]
        unknown = set(self.spectral_axes) - set(self.iv_names)
        if unknown:
            raise ValueError(f"spectral_axes {sorted(unknown)} are not grid "
                             f"axes ({self.iv_names})")

    @property
    def ndim(self) -> int:
        return len(self.iv_names)

    def axis_of(self, name: str) -> int:
        return self.iv_names.index(name)

    def node_index(self, axis: int, value: float) -> int:
        """Nearest grid node of a constant call argument; raises if the
        constant is not (numerically) a node — boundary conditions must sit
        on the training grid."""
        nodes = self._node_vals[axis]
        idx = min(range(len(nodes)), key=lambda i: abs(nodes[i] - value))
        span = abs(nodes[-1] - nodes[0]) or 1.0
        if abs(nodes[idx] - value) > 1e-6 * span:
            raise ValueError(
                f"constant argument {value!r} of grid axis "
                f"{self.iv_names[axis]!r} is not a grid node (nearest: "
                f"{nodes[idx]!r}); field-grid lowering evaluates boundary "
                "conditions by slicing the training grid")
        return idx


def _axis_shape(ctx: FieldGridContext, axis: int, n: int):
    """Broadcast shape placing `n` values on grid axis `axis`:
    (1, ..., n, ..., 1, 1) with the trailing 1 the parameter axis."""
    shape = [1] * (ctx.ndim + 1)
    shape[axis] = n
    return tuple(shape)


def _resolve_call(call: DepVarCall, ctx: FieldGridContext):
    """Full-rank slice index for one depvar call: per grid axis,
    `slice(None)` when the field's argument there is the canonical grid
    variable (or the field is not declared on that axis — its stored array
    has a broadcastable size-1 axis), or a pinned node index when the
    argument is a constant.  Fields declared on a SUBSET of the grid axes
    (input-function channels like ``f0(x)`` in a 2-D problem) are stored
    full-rank with size-1 absent axes."""
    inputs = ctx.dict_depvar_input[call.name]
    if len(call.args) != len(inputs):
        raise ValueError(f"{call.name} called with {len(call.args)} args, "
                         f"declared with {len(inputs)}")
    idx = [slice(None)] * ctx.ndim
    for slot, (canon, a) in enumerate(zip(inputs, call.args)):
        axis = ctx.axis_of(canon)
        if isinstance(a, Sym):
            if a.name != canon:
                raise ValueError(
                    f"field-grid lowering requires canonical call arguments: "
                    f"{call.name} slot {slot} is declared {canon!r}, got "
                    f"{a.name!r}")
        elif isinstance(a, Num):
            i = ctx.node_index(axis, a.value)
            idx[axis] = slice(i, i + 1)       # keepdims: broadcastable
        else:
            raise ValueError(
                f"field-grid lowering supports grid variables and constants "
                f"as call arguments; {call.name} got {a!r}")
    return tuple(idx)


def _ev_field(expr: Expr, fields: dict, p_cols, ctx: FieldGridContext):
    """Recursive evaluator; every result broadcasts to (N1, ..., Nd, P)."""
    if isinstance(expr, Num):
        return expr.value
    if isinstance(expr, Sym):
        axis = ctx.axis_of(expr.name)
        g = ctx.grids[axis]
        return jnp.reshape(g, _axis_shape(ctx, axis, g.shape[0]))
    if isinstance(expr, Param):
        row = ctx.eq_params.index(expr.name)
        return jnp.reshape(p_cols[row], (1,) * ctx.ndim + (-1,))
    if isinstance(expr, Call):
        vals = [_ev_field(a, fields, p_cols, ctx) for a in expr.args]
        return PRIMITIVES[expr.op](*vals)
    if isinstance(expr, DepVarCall):
        return fields[expr.name][(*_resolve_call(expr, ctx), slice(None))]
    if isinstance(expr, Deriv):
        target = expr.target
        if not isinstance(target, DepVarCall):
            raise ValueError(
                f"derivative target {target!r} is not a dependent-variable "
                "call; run expand_derivatives first")
        inputs = ctx.dict_depvar_input[target.name]
        if any(w.name not in inputs for w in expr.wrt):
            return 0.0                        # ∂u/∂z with z not an input of u
        counts = {}
        for w in expr.wrt:
            counts[w.name] = counts.get(w.name, 0) + 1
        u = fields[target.name]
        for name, k in counts.items():
            axis = ctx.axis_of(name)
            if name in ctx.spectral_axes:
                u = grid_diff_spectral(u, ctx.spans[axis], axis, k)
            else:
                u = grid_diff(u, ctx.spacings[axis], axis, k)
        return u[(*_resolve_call(target, ctx), slice(None))]
    if isinstance(expr, IntegralExpr):
        raise NotImplementedError(
            "integral terms are not supported on the field-grid (PINO) path; "
            "use PhysicsInformedNN for integro-differential equations")
    raise TypeError(f"cannot lower {type(expr).__name__} on the field grid")


def build_field_residual(eq: Eq, ctx: FieldGridContext) -> Callable:
    """Lower one equation into ``residual(fields, p_cols) -> array`` whose
    shape is the broadcast of the equation's slices: the full grid
    ``(N1, ..., Nd, P)`` for interior equations, size-1 pinned axes for
    boundary conditions."""
    expr = Call("-", (expand_derivatives(eq.lhs), expand_derivatives(eq.rhs)))

    def residual(fields, p_cols):
        return jnp.asarray(_ev_field(expr, fields, p_cols, ctx))

    return residual
