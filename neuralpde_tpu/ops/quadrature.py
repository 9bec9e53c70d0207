"""Static-shape quadrature rules (Integrals.jl/Cubature replacement).

The reference uses h-adaptive Cubature (CubatureJLh / QuadGKJL) for both
QuadratureTraining and integro-differential terms (reference:
src/training_strategies.jl:406-436, src/discretize.jl:332-396).  Runtime
h-adaptivity implies dynamic shapes, which is hostile to XLA, so the
TPU-native design uses composite fixed-order Gauss-Legendre tensor rules:
`panels**dim` sub-boxes, each integrated with an `order`-point GL rule per
axis.  Accuracy is controlled statically by (order, panels); the
IntegroDiff test suite validates parity with the reference tolerances.
"""

from __future__ import annotations

import itertools
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


@lru_cache(maxsize=None)
def gauss_legendre(order: int):
    """Nodes/weights on [-1, 1] (host-side static)."""
    x, w = np.polynomial.legendre.leggauss(order)
    return x, w


@lru_cache(maxsize=None)
def composite_gl_unit(order: int, panels: int):
    """Composite GL rule on [0, 1]: (nodes, weights), each shape (order*panels,)."""
    x, w = gauss_legendre(order)
    h = 1.0 / panels
    nodes = np.concatenate([(x + 1.0) / 2.0 * h + i * h for i in range(panels)])
    weights = np.concatenate([w / 2.0 * h for _ in range(panels)])
    return nodes, weights


def tensor_rule_unit(dim: int, order: int, panels: int = 1):
    """Tensor-product rule on the unit cube [0,1]^dim.

    Returns (nodes (dim, Q), weights (Q,)) as static numpy arrays.
    """
    n1, w1 = composite_gl_unit(order, panels)
    grids = list(itertools.product(*[range(len(n1))] * dim))
    idx = np.array(grids, dtype=np.int64).T  # (dim, Q)
    nodes = n1[idx]
    weights = np.prod(w1[idx], axis=0)
    return nodes, weights


def tensor_rule_box(lb, ub, order: int, panels: int = 1):
    """Tensor rule on the box [lb, ub] (static numpy bounds)."""
    lb = np.asarray(lb, dtype=np.float64)
    ub = np.asarray(ub, dtype=np.float64)
    nodes_u, weights_u = tensor_rule_unit(len(lb), order, panels)
    scale = ub - lb
    nodes = nodes_u * scale[:, None] + lb[:, None]
    weights = weights_u * np.prod(scale)
    return nodes, weights


def integrate_box(f, lb, ub, order: int = 10, panels: int = 1, dtype=None):
    """∫_[lb,ub] f(x) dx with f: (dim, Q) -> (out, Q). Static bounds."""
    nodes, weights = tensor_rule_box(lb, ub, order, panels)
    x = jnp.asarray(nodes, dtype=dtype)
    w = jnp.asarray(weights, dtype=dtype)
    return jnp.sum(f(x) * w[None, :], axis=-1)


def adaptive_quad_1d(f, a: float, b: float, *, reltol: float = 1e-6,
                     abstol: float = 1e-3, maxiters: int = 1000,
                     order_low: int = 7, order_high: int = 15):
    """h-adaptive 1-D quadrature with an embedded Gauss pair error estimate.

    The runtime-adaptivity escape hatch promised for parity with the
    reference's QuadGKJL/CubatureJLh path (reference:
    src/training_strategies.jl:406-436, src/discretize.jl:359-360): intervals
    are bisected greedily (worst error first) until the global error estimate
    |I_high − I_low| meets ``max(abstol, reltol·|I|)`` or ``maxiters``
    subinterval evaluations are spent.  Runs on the HOST (eager) — use for
    evaluation/debugging (`get_numeric_integral(..., adaptive=True)`), not
    inside a jitted training loss (that is what the static auto-refined rules
    are for).

    ``f(nodes)`` maps a (Q,) node vector to (..., Q) integrand values.
    Returns (integral (...,), error_estimate: float).
    """
    import heapq

    xl, wl = gauss_legendre(order_low)
    xh, wh = gauss_legendre(order_high)

    def panel(a0, b0):
        mid, half = 0.5 * (a0 + b0), 0.5 * (b0 - a0)
        fh = np.asarray(f(mid + half * xh))
        fl = np.asarray(f(mid + half * xl))
        i_h = (fh * wh).sum(-1) * half
        i_l = (fl * wl).sum(-1) * half
        return i_h, float(np.max(np.abs(i_h - i_l)))

    total_i, total_err = panel(a, b)
    heap = [(-total_err, 0, a, b, total_i, total_err)]
    counter, evals = 1, 1
    while evals < maxiters:
        tol = max(abstol, reltol * float(np.max(np.abs(total_i))))
        if total_err <= tol:
            break
        _, _, a0, b0, i0, e0 = heapq.heappop(heap)
        m = 0.5 * (a0 + b0)
        i1, e1 = panel(a0, m)
        i2, e2 = panel(m, b0)
        total_i = total_i - i0 + i1 + i2
        total_err = total_err - e0 + e1 + e2
        heapq.heappush(heap, (-e1, counter, a0, m, i1, e1))
        heapq.heappush(heap, (-e2, counter + 1, m, b0, i2, e2))
        counter += 2
        evals += 2
    return total_i, total_err


def adaptive_quad_nd(f, lb, ub, *, reltol: float = 1e-6, abstol: float = 1e-3,
                     maxiters: int = 1000, order_low: int = 4,
                     order_high: int = 7):
    """h-adaptive n-D cubature over the box [lb, ub] (the n-D analog of
    `adaptive_quad_1d`, covering the reference's CubatureJLh evaluation path
    for multi-variable integrals, reference: src/discretize.jl:332-396).

    Each box is integrated with an embedded tensor Gauss-Legendre pair
    (order_high vs order_low) giving the local error estimate; the
    worst-error box is bisected along its LONGEST edge (the h-adaptive
    CubatureJLh strategy) until the global estimate meets
    ``max(abstol, reltol·|I|)`` or ``maxiters`` box evaluations are spent.
    Host-side (eager) — for evaluation/debugging, not jitted losses.

    ``f(nodes)`` maps a (dim, Q) node matrix to (..., Q) integrand values.
    Returns (integral (...,), error_estimate: float).
    """
    import heapq

    lb = np.asarray(lb, dtype=np.float64)
    ub = np.asarray(ub, dtype=np.float64)
    dim = lb.shape[0]
    nh, wh = tensor_rule_unit(dim, order_high)
    nl, wl = tensor_rule_unit(dim, order_low)

    def box(a, b):
        scale = b - a
        vol = float(np.prod(scale))
        fh = np.asarray(f(a[:, None] + scale[:, None] * nh))
        fl = np.asarray(f(a[:, None] + scale[:, None] * nl))
        i_h = (fh * wh).sum(-1) * vol
        i_l = (fl * wl).sum(-1) * vol
        return i_h, float(np.max(np.abs(i_h - i_l)))

    total_i, total_err = box(lb, ub)
    heap = [(-total_err, 0, lb, ub, total_i, total_err)]
    counter, evals = 1, 1
    while evals < maxiters:
        tol = max(abstol, reltol * float(np.max(np.abs(total_i))))
        if total_err <= tol:
            break
        _, _, a0, b0, i0, e0 = heapq.heappop(heap)
        axis = int(np.argmax(b0 - a0))
        m = 0.5 * (a0[axis] + b0[axis])
        b1 = b0.copy(); b1[axis] = m
        a2 = a0.copy(); a2[axis] = m
        i1, e1 = box(a0, b1)
        i2, e2 = box(a2, b0)
        total_i = total_i - i0 + i1 + i2
        total_err = total_err - e0 + e1 + e2
        heapq.heappush(heap, (-e1, counter, a0, b1, i1, e1))
        heapq.heappush(heap, (-e2, counter + 1, a2, b0, i2, e2))
        counter += 2
        evals += 2
    return total_i, total_err


def integrate_parametric_1d(f, lb: Array, ub: Array, order: int = 10, panels: int = 1):
    """Batched 1-D integrals with per-column bounds.

    ``lb``/``ub`` have shape (N,); ``f(nodes)`` maps (N, Q) node matrix ->
    (out, N, Q) integrand values.  Returns (out, N).  Used for
    integro-differential terms with parametric limits (reference:
    src/discretize.jl:332-396 evaluates these per-column in a host loop;
    here it is one batched XLA computation).
    """
    nu, wu = composite_gl_unit(order, panels)
    nu = jnp.asarray(nu, dtype=lb.dtype)
    wu = jnp.asarray(wu, dtype=lb.dtype)
    scale = (ub - lb)  # (N,)
    nodes = lb[:, None] + scale[:, None] * nu[None, :]  # (N, Q)
    vals = f(nodes)  # (out, N, Q)
    return jnp.sum(vals * wu[None, None, :], axis=-1) * scale[None, :]
