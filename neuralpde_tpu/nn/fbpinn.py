"""Finite-basis PINNs (FBPINN): overlapping-subdomain partition-of-unity
trial functions — beyond reference (the reference's only decomposition
tool is `neural_adapter` sequential transfer, src/neural_adapter.jl; FBPINN
is Moseley, Markham & Nissen-Meyer 2023, "Finite basis physics-informed
neural networks"; the multilevel hierarchy is Dolean, Heinlein, Mishra &
Moseley 2024, "Multilevel domain decomposition-based architectures for
physics-informed neural networks").

``u(x) = (1/L) Σ_l Σ_j w_lj(x) · f_lj((x - c_lj) / h_lj)`` over L *levels*
of tensor grids of overlapping box subdomains: each subdomain carries a
SMALL local network ``f_lj`` seeing normalized-to-[-1,1] coordinates, and
the smooth windows ``w_lj`` (cosine bumps, normalized to a partition of
unity *per level*) blend them.  Large/multi-scale domains stop being one
hard global fit — each net only learns its local, effectively low-frequency
piece (the paper's spectral-bias fix).  A flat (single-level) FBPINN still
struggles when the solution ALSO has components spanning many subdomains
(coarse modes must be assembled from many local nets communicating only
through overlaps); the multilevel hierarchy gives every scale a level whose
subdomain size matches it, the neural analogue of multigrid/multilevel
Schwarz (Dolean et al. 2024 §3).

TPU mapping: all local nets of a level share one architecture, so each
level evaluates as ONE vmapped batched-matmul stack ``(J_l, ...)`` — no
Python loop over subdomains, no ragged work; windows are closed-form
elementwise ops that fuse into the surrounding kernels.  The composition is
smooth (squared-cosine windows are C^2 at the support edge: value, slope
and curvature vanish, and outside-support contributions are exactly zero),
so nested-jvp PINN derivatives compose — FBPINN is just a `Module`, usable
anywhere an `mlp` goes.  The trial function's support is the global box:
evaluating outside every window (beyond the bounds plus the overlap margin)
divides 0/0 — keep collocation and evaluation inside the declared domain.

Usage:
    net = FBPINN([(0, 1)], subdivisions=15, hidden=(16,))          # flat
    net = FBPINN([(0, 1)] * 2, levels=[1, 4, 16], hidden=(16,))    # multilevel
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


def _per_axis_subs(subdivisions, d):
    subs = ([int(subdivisions)] * d if np.isscalar(subdivisions)
            else [int(s) for s in subdivisions])
    if len(subs) != d or any(s < 1 for s in subs):
        raise ValueError(f"subdivisions {subs} must be >= 1 per axis")
    return subs


class FBPINN(Module):
    """Partition-of-unity basis of vmapped local MLPs on subdomain grids.

    * ``bounds``: [(lo, hi)] per coordinate axis (the global box).
    * ``subdivisions``: subdomain count per axis (int or one per axis);
      the basis has ``prod(subdivisions)`` local nets.
    * ``levels``: instead of one ``subdivisions``, a list of per-level
      subdivision counts (each an int or per-axis tuple), e.g.
      ``levels=[1, 4, 16]`` — a 3-level hierarchy whose output is the
      *average* of the per-level partition-of-unity blends (averaging keeps
      the output magnitude independent of the level count, so optimizer
      defaults transfer from the flat case).  Mutually exclusive with
      ``subdivisions``.
    * ``overlap``: fraction of the subdomain half-width shared with each
      neighbor (0 < overlap <= 1); windows of adjacent subdomains overlap
      so the partition of unity stays smooth — at 0 the cover would have
      gaps (rejected).
    * ``hidden``: hidden-layer sizes of every local net (all levels share
      one architecture; parameters are stacked on a leading (J_l,) axis per
      level).
    """

    def __init__(self, bounds: Sequence, subdivisions=None, *,
                 levels: Sequence | None = None,
                 overlap: float = 0.5, hidden: Sequence[int] = (16,),
                 out_dim: int = 1, activation=tanh):
        bounds = [tuple(map(float, b)) for b in bounds]
        if not bounds or any(hi <= lo for lo, hi in bounds):
            raise ValueError(f"bounds must be non-empty (lo < hi): {bounds}")
        if not 0.0 < overlap <= 1.0:
            raise ValueError(f"overlap must be in (0, 1], got {overlap}")
        if levels is not None and subdivisions is not None:
            raise ValueError("pass subdivisions OR levels, not both")
        if levels is None:
            levels = [4 if subdivisions is None else subdivisions]
        if len(levels) < 1:
            raise ValueError("levels must be non-empty")
        d = len(bounds)
        self.bounds = bounds
        self.level_subs = [_per_axis_subs(s, d) for s in levels]
        self.subs = self.level_subs[0]          # back-compat (flat case)
        self.overlap = float(overlap)
        self._out = out_dim
        self.net = mlp([d, *hidden, out_dim], activation)

        # per level: subdomain centers (J_l, d) and half-widths (d,).
        # Axis a is split into subs[a] cells; each window spans its cell
        # plus `overlap` half-cells into the neighbors.
        self._centers, self._halfs = [], []
        for subs in self.level_subs:
            centers_1d, half = [], []
            for (lo, hi), n in zip(bounds, subs):
                cell = (hi - lo) / n
                centers_1d.append(lo + cell * (np.arange(n) + 0.5))
                half.append(cell / 2 * (1.0 + self.overlap))
            grids = np.meshgrid(*centers_1d, indexing="ij")
            self._centers.append(np.stack([g.ravel() for g in grids], axis=1))
            self._halfs.append(np.asarray(half))
        self.n_levels = len(self.level_subs)
        self.n_subdomains = sum(c.shape[0] for c in self._centers)

    @property
    def in_dim(self):
        return len(self.bounds)

    @property
    def out_dim(self):
        return self._out

    def init(self, key):
        stacks = []
        for c in self._centers:
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, c.shape[0])
            stacks.append(jax.vmap(self.net.init)(keys))
        if self.n_levels == 1:
            return {"nets": stacks[0]}
        return {"nets": stacks}

    def _windows(self, x, level: int = 0):
        """Level-`level` normalized partition of unity at x (d, N) -> (J_l, N)."""
        dtype = x.dtype
        c = jnp.asarray(self._centers[level], dtype)            # (J, d)
        h = jnp.asarray(self._halfs[level], dtype)              # (d,)
        s = (x[None, :, :] - c[:, :, None]) / h[None, :, None]  # (J, d, N)
        # squared-cosine bump: support |s| < 1 with value, slope AND
        # curvature 0 at the edge (C^2) — second-order PDE residuals see no
        # jump where a window's support ends
        w = jnp.prod(jnp.where(jnp.abs(s) < 1.0,
                               (0.5 * (1.0 + jnp.cos(math.pi * s))) ** 2,
                               0.0), axis=1)                    # (J, N)
        return w / jnp.sum(w, axis=0, keepdims=True)

    def _apply_level(self, stack, x, level):
        dtype = x.dtype
        c = jnp.asarray(self._centers[level], dtype)
        h = jnp.asarray(self._halfs[level], dtype)
        xs = (x[None, :, :] - c[:, :, None]) / h[None, :, None]  # (J, d, N)
        ys = jax.vmap(self.net.apply)(stack, xs)                 # (J, out, N)
        w = self._windows(x, level)                              # (J, N)
        return jnp.sum(w[:, None, :] * ys, axis=0)               # (out, N)

    def apply(self, params, x):
        x = jnp.asarray(x)
        stacks = params["nets"]
        if self.n_levels == 1:
            return self._apply_level(stacks, x, 0)
        total = self._apply_level(stacks[0], x, 0)
        for l in range(1, self.n_levels):
            total = total + self._apply_level(stacks[l], x, l)
        return total / self.n_levels
