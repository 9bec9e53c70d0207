"""Separable (factorized) trial functions — the SPINN architecture.

``u(x_1, …, x_d) = Σ_r Π_a f_a_r(x_a)`` with one small per-axis network
``f_a : R -> R^rank`` (Cho et al. 2023, "Separable Physics-Informed Neural
Networks").  On a tensor-product collocation grid of ``N^d`` points the
trial function and all its partial derivatives are assembled from ``N·d``
axis-network evaluations plus einsum contractions — every FLOP is a large
MXU matmul, and each ∂^k/∂x_a^k needs only the k-th Taylor coefficients of
the 1-D axis net (one `jax.experimental.jet` call per axis, exact).

This is a beyond-reference capability: the reference evaluates every
collocation point through the full network (pointwise FD engine,
reference: src/pinn_types.jl:421-458), which costs O(N^d) network
evaluations per step; the separable path costs O(N·d) for the same grid.

``SeparableNet`` is also a regular `Module`: ``apply(params, cord)`` with
``cord`` shaped ``(d, N)`` evaluates pointwise (used for solution
evaluation and for parity against the dense pipeline).  The factorized
grid evaluation lives in `neuralpde_tpu.compile.separable` and is selected
by the `SeparableTraining` strategy.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.derivatives import jet_derivative
from .core import Module, mlp, tanh

Array = jax.Array


class SeparableNet(Module):
    """Rank-``r`` separable trial function from per-axis networks.

    * ``axis_nets``: one `Module` per coordinate axis, each mapping
      ``(1, N) -> (rank, N)``; all must share the same output rank.
    * pointwise value: ``u(x) = Σ_r Π_a f_a_r(x_a)``.
    """

    def __init__(self, axis_nets: Sequence[Module]):
        nets = tuple(axis_nets)
        if not nets:
            raise ValueError("SeparableNet needs at least one axis network")
        ranks = {n.out_dim for n in nets}
        if len(ranks) != 1:
            raise ValueError(
                f"axis networks must share one output rank, got {sorted(ranks)}")
        for i, n in enumerate(nets):
            if n.in_dim != 1:
                raise ValueError(
                    f"axis network {i} must take a single scalar input "
                    f"(in_dim 1), got {n.in_dim}")
        self.axis_nets = nets
        self.rank = ranks.pop()

    @property
    def in_dim(self):
        return len(self.axis_nets)

    @property
    def out_dim(self):
        return 1

    def init(self, key):
        keys = jax.random.split(key, len(self.axis_nets))
        return {f"axis_{a}": n.init(k)
                for a, (n, k) in enumerate(zip(self.axis_nets, keys))}

    def axis_features(self, params, a: int, nodes, order: int = 0) -> Array:
        """``(rank, N)`` features of axis ``a`` at 1-D ``nodes``; ``order`` > 0
        returns the exact ∂^order features via Taylor-mode AD."""
        net = self.axis_nets[a]
        p = params[f"axis_{a}"]
        x = jnp.asarray(nodes)[None, :]
        if order == 0:
            return net.apply(p, x)
        return jet_derivative(lambda c: net.apply(p, c), x, 0, order)

    def apply(self, params, x):
        x = jnp.asarray(x)
        prod = None
        for a in range(len(self.axis_nets)):
            f = self.axis_features(params, a, x[a], 0)       # (rank, N)
            prod = f if prod is None else prod * f
        return jnp.sum(prod, axis=0, keepdims=True)          # (1, N)

    def grid(self, params, nodes_list) -> Array:
        """Evaluate on the tensor-product grid of per-axis 1-D ``nodes_list``
        via one rank contraction — (N_1, …, N_d) for the cost of N·d axis
        evaluations (the factorized fast path, for solution fields)."""
        if len(nodes_list) != len(self.axis_nets):
            raise ValueError(
                f"{len(self.axis_nets)} axes but {len(nodes_list)} node arrays")
        letters = "abcdefghij"[: len(nodes_list)]
        feats = [self.axis_features(params, a, jnp.asarray(n), 0)
                 for a, n in enumerate(nodes_list)]
        terms = ",".join(f"z{l}" for l in letters)
        return jnp.einsum(f"{terms}->{letters}", *feats)


def separable_mlp(n_axes: int, hidden: Sequence[int] = (32, 32),
                  rank: int = 32, activation=tanh, *,
                  fourier_features: int | None = None,
                  fourier_sigma: float = 1.0) -> SeparableNet:
    """Convenience constructor: one ``[1, *hidden, rank]`` MLP per axis.

    ``fourier_features`` prepends a fixed random Fourier embedding to each
    axis net (helps exactly as in the dense case; jet-differentiable).
    """
    nets = [mlp([1, *hidden, rank], activation,
                fourier_features=fourier_features,
                fourier_sigma=fourier_sigma)
            for _ in range(n_axes)]
    return SeparableNet(nets)
