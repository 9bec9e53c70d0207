"""Derivative engines for trial functions.

Two interchangeable backends:

* ``numeric_derivative`` — the reference's central finite-difference stencils
  with step ``eps(T)^(1/(2+order))`` per-axis masks (reference:
  src/pinn_types.jl:421-458, src/symbolic_utilities.jl:98-103).  Exact stencils
  to order 4, recursive splitting above / for mixed partials.
* ``jvp_derivative`` — nested forward-mode `jax.jvp` along unit coordinate
  directions.  This is the TPU-native default: it is exact (no FD truncation
  error), fuses into one XLA program, and differentiates cleanly in reverse
  mode for the outer training gradient.

`u` is a callable ``u(x) -> (out, N)`` over a coordinate matrix ``x`` of shape
``(dim, N)`` (θ is already closed over by the lowering).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


def fd_step(dtype, order: int) -> float:
    """ε = eps(T)^(1/(2+order)) — reference: src/symbolic_utilities.jl:98-103."""
    return float(np.finfo(np.dtype(dtype)).eps ** (1.0 / (2.0 + order)))


def eps_masks(dim: int, var_indices: Sequence[int], dtype) -> np.ndarray:
    """Static per-order ε masks for a mixed partial.

    ``var_indices`` lists, per derivative application (length == total order),
    the coordinate axis being differentiated.  Mirrors the ``εs_dnv``
    construction in the reference (src/symbolic_utilities.jl:161-201): every
    mask uses the *total*-order step size.
    """
    order = len(var_indices)
    step = None
    masks = np.zeros((order, dim))
    for k, vi in enumerate(var_indices):
        if step is None:
            step = fd_step(dtype, order)
        masks[k, vi] = step
    return masks


def numeric_derivative(u: Callable[[Array], Array], x: Array,
                       masks: np.ndarray, order: int) -> Array:
    """Reference-parity FD stencils (src/pinn_types.jl:421-458).

    ``masks`` is the static ``(order, dim)`` ε-mask array from ``eps_masks``.
    Uses the fused stencil when every mask is identical (pure partial),
    otherwise recursively splits the outermost derivative.
    """
    eps_vec = masks[order - 1]
    inv_eps = 1.0 / eps_vec[eps_vec != 0.0][0]
    e = jnp.asarray(eps_vec, dtype=x.dtype)[:, None]

    same = bool(np.all(masks == masks[0]))
    if order > 4 or not same:
        sub = masks[: order - 1]
        return (
            numeric_derivative(u, x + e, sub, order - 1)
            - numeric_derivative(u, x - e, sub, order - 1)
        ) * inv_eps / 2.0
    if order == 4:
        return (
            u(x + 2 * e) - 4 * u(x + e) + 6 * u(x) - 4 * u(x - e) + u(x - 2 * e)
        ) * inv_eps**4
    if order == 3:
        return (u(x + 2 * e) - 2 * u(x + e) + 2 * u(x - e) - u(x - 2 * e)) * inv_eps**3 / 2.0
    if order == 2:
        return (u(x + e) + u(x - e) - 2 * u(x)) * inv_eps**2
    if order == 1:
        return (u(x + e) - u(x - e)) * inv_eps / 2.0
    raise ValueError(f"invalid derivative order {order}")


def jet_derivative(u: Callable[[Array], Array], x: Array,
                   var_index: int, order: int) -> Array:
    """Pure k-th partial via Taylor-mode AD (jax.experimental.jet).

    One jet evaluation propagates the whole truncated Taylor series, sharing
    the primal across orders — cheaper than `order` nested jvps for pure
    (single-direction) partials of order ≥ 2.
    """
    from jax.experimental import jet

    tangent = jnp.zeros_like(x).at[var_index, :].set(1.0)
    series = [tangent] + [jnp.zeros_like(x) for _ in range(order - 1)]
    _, coeffs = jet.jet(u, (x,), (series,))
    return coeffs[order - 1]


def jvp_derivative(u: Callable[[Array], Array], x: Array,
                   var_indices: Sequence[int], dim: int) -> Array:
    """Exact mixed partial via nested forward-mode AD.

    ``var_indices`` lists the coordinate axis per derivative application,
    e.g. ``[0, 0]`` for ∂²/∂x², ``[0, 1]`` for ∂²/∂x∂y.
    """
    if len(var_indices) == 0:
        return u(x)
    vi = var_indices[-1]

    def inner(y):
        return jvp_derivative(u, y, var_indices[:-1], dim)

    tangent = jnp.zeros_like(x).at[vi, :].set(1.0)
    return jax.jvp(inner, (x,), (tangent,))[1]


class DerivativeEngine:
    """Pluggable derivative backend shared by the lowering pipeline.

    ``mode`` ∈ {"jvp", "fd", "jet"}.  The lowering calls
    ``engine(u, x, var_indices, dim)`` where ``u`` already closes over θ.
    "jet" uses Taylor-mode AD for pure partials (shares the primal across
    orders) and falls back to nested jvp for mixed partials.
    """

    def __init__(self, mode: str = "jvp"):
        if mode not in ("jvp", "fd", "jet"):
            raise ValueError(f"unknown derivative mode {mode!r}")
        self.mode = mode

    def __call__(self, u, x, var_indices, dim):
        var_indices = tuple(var_indices)
        if (self.mode == "jet" and len(set(var_indices)) == 1
                and len(var_indices) >= 2):
            return jet_derivative(u, x, var_indices[0], len(var_indices))
        if self.mode in ("jvp", "jet"):
            return jvp_derivative(u, x, var_indices, dim)
        masks = eps_masks(dim, var_indices, x.dtype)
        return numeric_derivative(u, x, masks, len(var_indices))
