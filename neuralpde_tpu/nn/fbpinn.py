"""Finite-basis PINNs (FBPINN): overlapping-subdomain partition-of-unity
trial functions — beyond reference (the reference's only decomposition
tool is `neural_adapter` sequential transfer, src/neural_adapter.jl; FBPINN
is Moseley, Markham & Nissen-Meyer 2023, "Finite basis physics-informed
neural networks").

``u(x) = Σ_j w_j(x) · f_j((x - c_j) / h_j)`` over a tensor grid of J
overlapping box subdomains: each subdomain carries a SMALL local network
``f_j`` seeing normalized-to-[-1,1] coordinates, and the smooth windows
``w_j`` (cosine bumps, normalized to a partition of unity) blend them.
Large/multi-scale domains stop being one hard global fit — each net only
learns its local, effectively low-frequency piece (the paper's spectral-
bias fix).

TPU mapping: all J local nets share one architecture, so the whole basis
evaluates as ONE vmapped batched-matmul stack ``(J, ...)`` — no Python
loop over subdomains, no ragged work; windows are closed-form elementwise
ops that fuse into the surrounding kernels.  The composition is smooth
(cosine windows are C^1; their derivative vanishes at the support edge, and
outside-support contributions are exactly zero), so nested-jvp PINN
derivatives compose — FBPINN is just a `Module`, usable anywhere an `mlp`
goes.  Windows are squared-cosine bumps (C^2 at the support edge), so
second-order residuals are continuous too.  The trial function's support
is the global box: evaluating outside every window (beyond the bounds plus
the overlap margin) divides 0/0 — keep collocation and evaluation inside
the declared domain.

Usage:
    net = FBPINN([(0, 1)], subdivisions=15, hidden=(16,))
    disc = PhysicsInformedNN(net, StochasticTraining(1024))
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_float
from .core import Module, mlp, tanh


class FBPINN(Module):
    """Partition-of-unity basis of vmapped local MLPs on a subdomain grid.

    * ``bounds``: [(lo, hi)] per coordinate axis (the global box).
    * ``subdivisions``: subdomain count per axis (int or one per axis);
      the basis has ``prod(subdivisions)`` local nets.
    * ``overlap``: fraction of the subdomain half-width shared with each
      neighbor (0 < overlap <= 1); windows of adjacent subdomains overlap
      so the partition of unity stays smooth — at 0 the cover would have
      gaps (rejected).
    * ``hidden``: hidden-layer sizes of every local net (they share one
      architecture; parameters are stacked on a leading (J,) axis).
    """

    def __init__(self, bounds: Sequence, subdivisions=4, *,
                 overlap: float = 0.5, hidden: Sequence[int] = (16,),
                 out_dim: int = 1, activation=tanh):
        bounds = [tuple(map(float, b)) for b in bounds]
        if not bounds or any(hi <= lo for lo, hi in bounds):
            raise ValueError(f"bounds must be non-empty (lo < hi): {bounds}")
        if not 0.0 < overlap <= 1.0:
            raise ValueError(f"overlap must be in (0, 1], got {overlap}")
        d = len(bounds)
        subs = ([int(subdivisions)] * d if np.isscalar(subdivisions)
                else [int(s) for s in subdivisions])
        if len(subs) != d or any(s < 1 for s in subs):
            raise ValueError(f"subdivisions {subs} must be >= 1 per axis")
        self.bounds = bounds
        self.subs = subs
        self.overlap = float(overlap)
        self._out = out_dim
        self.net = mlp([d, *hidden, out_dim], activation)

        # subdomain centers (J, d) and half-widths (d,): axis a is split
        # into subs[a] cells; each window spans its cell plus `overlap`
        # half-cells into the neighbors
        centers_1d, half = [], []
        for (lo, hi), n in zip(bounds, subs):
            cell = (hi - lo) / n
            centers_1d.append(lo + cell * (np.arange(n) + 0.5))
            half.append(cell / 2 * (1.0 + self.overlap))
        grids = np.meshgrid(*centers_1d, indexing="ij")
        self._centers = np.stack([g.ravel() for g in grids], axis=1)  # (J, d)
        self._half = np.asarray(half)                                  # (d,)
        self.n_subdomains = self._centers.shape[0]

    @property
    def in_dim(self):
        return len(self.bounds)

    @property
    def out_dim(self):
        return self._out

    def init(self, key):
        keys = jax.random.split(key, self.n_subdomains)
        return {"nets": jax.vmap(self.net.init)(keys)}

    def _windows(self, x):
        """Normalized partition of unity at x (d, N) -> (J, N)."""
        dtype = x.dtype
        c = jnp.asarray(self._centers, dtype)                  # (J, d)
        h = jnp.asarray(self._half, dtype)                     # (d,)
        s = (x[None, :, :] - c[:, :, None]) / h[None, :, None]  # (J, d, N)
        # squared-cosine bump: support |s| < 1 with value, slope AND
        # curvature 0 at the edge (C^2) — second-order PDE residuals see no
        # jump where a window's support ends
        w = jnp.prod(jnp.where(jnp.abs(s) < 1.0,
                               (0.5 * (1.0 + jnp.cos(math.pi * s))) ** 2,
                               0.0), axis=1)                    # (J, N)
        return w / jnp.sum(w, axis=0, keepdims=True)

    def apply(self, params, x):
        x = jnp.asarray(x)
        dtype = x.dtype
        c = jnp.asarray(self._centers, dtype)
        h = jnp.asarray(self._half, dtype)
        xs = (x[None, :, :] - c[:, :, None]) / h[None, :, None]  # (J, d, N)
        ys = jax.vmap(self.net.apply)(params["nets"], xs)        # (J, out, N)
        w = self._windows(x)                                     # (J, N)
        return jnp.sum(w[:, None, :] * ys, axis=0)               # (out, N)
