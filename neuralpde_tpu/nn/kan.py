"""Kolmogorov-Arnold networks (Chebyshev parameterization) as PINN trial
functions — beyond reference (the reference's network substrate is Lux MLPs,
src/NeuralPDE.jl:17-20; KAN-PINNs are the post-2024 architecture line:
Liu et al. 2024 "KAN", SS-KAN/ChebyKAN variants for PINNs).

A KAN layer learns a univariate function per (input, output) edge and sums
over inputs: ``y_j = Σ_i φ_{ij}(x_i)``.  Here each φ is a degree-D Chebyshev
expansion of ``tanh(x_i)`` (ChebyKAN): tanh squashes into Chebyshev's
[-1, 1] domain, the T_k recurrence is D fused elementwise ops, and the whole
layer contracts as ONE einsum over (input, degree) pairs — an
``(out, in·(D+1)) @ (in·(D+1), N)`` matmul on the MXU.  No B-spline grids,
no scatter/gather, no dynamic shapes: the TPU-native KAN parameterization.

Smoothness: T_k(tanh(x)) is analytic, so exact nested-jvp PINN derivatives
(`derivative="jvp"`/"jet") compose to any order.

Usage (anywhere an `mlp` chain goes):
    disc = PhysicsInformedNN(kan([2, 8, 8, 1], degree=5), GridTraining(0.1))
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from ..config import default_float
from .core import Chain, Module


class KANLayer(Module):
    """Chebyshev KAN layer: ``y_j = Σ_i Σ_k c_{jik} T_k(tanh(x_i))``.

    Parameters are one (out, in, degree+1) coefficient tensor.  Init scales
    ~ 1/(in·(degree+1)) variance so the summed edge functions start O(1)
    (the ChebyKAN reference init).
    """

    def __init__(self, in_dim: int, out_dim: int, degree: int = 5):
        if degree < 1:
            raise ValueError(f"degree must be >= 1, got {degree}")
        self._in = in_dim
        self._out = out_dim
        self.degree = degree

    @property
    def in_dim(self):
        return self._in

    @property
    def out_dim(self):
        return self._out

    def init(self, key):
        std = 1.0 / math.sqrt(self._in * (self.degree + 1))
        coef = std * jax.random.normal(
            key, (self._out, self._in, self.degree + 1), default_float())
        return {"coef": coef}

    def apply(self, params, x):
        # x: (in, N) -> t: (in, N) in [-1, 1]
        t = jnp.tanh(x)
        # Chebyshev recurrence, stacked basis (in, degree+1, N)
        polys = [jnp.ones_like(t), t]
        for _ in range(self.degree - 1):
            polys.append(2.0 * t * polys[-1] - polys[-2])
        basis = jnp.stack(polys[: self.degree + 1], axis=1)
        # one MXU contraction over (input, degree) pairs
        return jnp.einsum("oik,ikn->on", params["coef"], basis,
                          preferred_element_type=x.dtype)


def kan(sizes: Sequence[int], degree: int = 5) -> Chain:
    """Convenience constructor mirroring `mlp`: ``kan([2, 8, 8, 1])`` is a
    3-layer Chebyshev KAN.  No activations between layers — each layer IS
    a learned nonlinearity (the tanh squash renormalizes between layers)."""
    return Chain(*[KANLayer(sizes[i], sizes[i + 1], degree)
                   for i in range(len(sizes) - 1)])
