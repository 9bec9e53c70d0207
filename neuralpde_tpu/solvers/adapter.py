"""neural_adapter: transfer learning / domain decomposition
(reference: src/neural_adapter.jl).

Trains a new network to match an existing prediction.  ``loss(cord, theta)``
is user-provided (e.g. ``mean((phi2(cord, θ) - phi1(cord, θ1))**2)`` residual
form returning per-point values); the strategy supplies collocation points
over the *full* domain product (no per-equation argument analysis — the
reference uses the raw domain spans, src/neural_adapter.jl:1-23).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import default_float
from ..ops import sampling
from ..ops.quadrature import tensor_rule_box
from ..strategies import (
    GridTraining, QuadratureTraining, QuasiRandomTraining, StochasticTraining,
    julia_range,
)
from ..symbolic.system import infimum, supremum


class _AdapterProblem:
    """TrainingProblem-shaped wrapper accepted by `neuralpde_tpu.solve`."""

    def __init__(self, loss, init_params):
        self._loss = loss
        self.init_params = init_params
        self.pinnrep = None

    def loss(self, theta, lstate):
        return self._loss(theta, lstate["key"]), {}


def _full_grid(domains, dx, dtype):
    dxs = dx if isinstance(dx, (list, tuple)) else [dx] * len(domains)
    spans = [julia_range(infimum(d.domain), supremum(d.domain), h)
             for d, h in zip(domains, dxs)]
    grid = np.meshgrid(*spans, indexing="ij")
    return jnp.asarray(np.stack([g.reshape(-1) for g in grid]), dtype=dtype)


def _domain_bounds(domains, dtype):
    lb = jnp.asarray([infimum(d.domain) for d in domains], dtype=dtype)
    ub = jnp.asarray([supremum(d.domain) for d in domains], dtype=dtype)
    return lb, ub


def _loss_for_strategy(loss, pde_system, strategy, dtype, theta0=None):
    domains = pde_system.domains
    if isinstance(strategy, GridTraining):
        pts = _full_grid(domains, strategy.dx, dtype)
        return lambda theta, key: jnp.mean(loss(pts, theta) ** 2)
    if isinstance(strategy, StochasticTraining):
        lb, ub = _domain_bounds(domains, dtype)

        def sloss(theta, key):
            pts = sampling.uniform_random(key, strategy.points, lb, ub, dtype=dtype)
            return jnp.mean(loss(pts, theta) ** 2)

        return sloss
    if isinstance(strategy, QuasiRandomTraining):
        lb, ub = _domain_bounds(domains, dtype)
        if strategy.sampling_alg == "sobol":
            base = sampling.sobol_bits(strategy.points, lb.shape[0])

            def qloss(theta, key):
                pts = sampling.sobol_sample(base, lb, ub, key=key, dtype=dtype)
                return jnp.mean(loss(pts, theta) ** 2)
        else:
            def qloss(theta, key):
                pts = sampling.latin_hypercube(key, strategy.points, lb, ub,
                                               dtype=dtype)
                return jnp.mean(loss(pts, theta) ** 2)
        return qloss
    if isinstance(strategy, QuadratureTraining):
        lb = [infimum(d.domain) for d in domains]
        ub = [supremum(d.domain) for d in domains]
        area = float(np.prod(np.asarray(ub) - np.asarray(lb)))

        def rule(panels):
            nodes, weights = tensor_rule_box(lb, ub, strategy.order, panels)
            return (jnp.asarray(nodes, dtype=dtype),
                    jnp.asarray(weights / area, dtype=dtype))

        integral_at = None
        if theta0 is not None and strategy.panels is None:
            def integral_at(panels):
                n, w_ = rule(panels)
                return jnp.sum(loss(n, theta0) ** 2 * w_)

        nodes, w = rule(strategy.resolve_panels(integral_at, len(domains)))
        return lambda theta, key: jnp.sum(loss(nodes, theta) ** 2 * w)
    raise TypeError(f"unsupported strategy {type(strategy).__name__}")


def neural_adapter(loss, init_params, pde_system, strategy):
    """Single system (reference: src/neural_adapter.jl:82-89).  Returns a
    problem for `neuralpde_tpu.solve`."""
    dtype = default_float()
    if isinstance(loss, (list, tuple)):
        systems = pde_system
        fns = [_loss_for_strategy(l, s, strategy, dtype, theta0=init_params)
               for l, s in zip(loss, systems)]

        def total(theta, key):
            keys = jax.random.split(key, len(fns))
            return sum(f(theta, k) for f, k in zip(fns, keys))

        return _AdapterProblem(total, init_params)
    fn = _loss_for_strategy(loss, pde_system, strategy, dtype,
                            theta0=init_params)
    return _AdapterProblem(fn, init_params)
