"""DeepONet (NeuralOperators.jl replacement for PINOODE,
reference: src/NeuralPDE.jl:19, src/pino_ode_solve.jl).

u(p, t) = Σ_k branch_k(p) · trunk_k(t): branch consumes the parameter vector,
trunk the query coordinate; the output is their inner product over the latent
basis, shaped (T, P) to match the reference's `out[j, i]` indexing
(src/pino_ode_solve.jl:106-132).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import default_float
from .core import Module, mlp, tanh


class DeepONet(Module):
    def __init__(self, branch: Module, trunk: Module):
        if branch.out_dim != trunk.out_dim:
            raise ValueError(
                f"branch/trunk latent dims differ: {branch.out_dim} vs {trunk.out_dim}"
            )
        self.branch = branch
        self.trunk = trunk

    @property
    def in_dim(self):
        return self.branch.in_dim

    @property
    def out_dim(self):
        return 1

    def init(self, key):
        kb, kt = jax.random.split(key)
        return {"branch": self.branch.init(kb), "trunk": self.trunk.init(kt)}

    def apply(self, params, x):
        """x = (p, t): p (n_params, P), t (1, T) -> (T, P)."""
        p, t = x
        b = self.branch.apply(params["branch"], p)   # (K, P)
        tr = self.trunk.apply(params["trunk"], t)    # (K, T)
        return tr.T @ b                              # (T, P)


class DeepONetPDE(Module):
    """Physics-informed DeepONet backbone for `solve_pino_pde` (beyond
    reference — the reference's DeepONet surface is ODE-only,
    src/pino_ode_solve.jl; this is the PI-DeepONet shape of Wang, Wang &
    Perdikaris 2021 for parametric PDE families).

    ``u_o(x; p) = Σ_k W_ok · branch_k(p) · trunk_k(x) + b_o``: the branch
    consumes the scalar parameter columns ``(n_params, P)``, the trunk the
    d-dimensional grid coordinates, and each output field is a weighted
    inner product over the latent basis.  The P×N field grid materializes
    as ONE ``(K, N) x (K, P)`` contraction on the MXU — the same
    factorization win as the ODE DeepONet (PERF.md "PINO").

    vs `FNO2D/3D`: the trunk is pointwise in the coordinates, so the
    trained operator is mesh-free — it evaluates on ANY grid (uniform or
    not, `sol(p=..., grids=...)`) with no FFT resampling caveats.  The
    trade: no function-valued input channels (a sampled field has no fixed
    finite parameter vector for the branch; use the FNO backbones for
    `input_functions=`).

    ``apply(params, (p, grids))`` with ``p`` ``(n_params, P)`` and
    ``grids`` the d coordinate arrays; returns ``(N1..Nd, P)`` when
    ``out_channels == 1`` else ``(out_channels, N1..Nd, P)`` — the
    `solve_pino_pde` field convention.
    """

    def __init__(self, in_channels: int, grid_ndim: int, *,
                 latent: int = 64, branch_sizes=(64,), trunk_sizes=(64, 64),
                 out_channels: int = 1, activation=tanh):
        if in_channels < 1:
            raise ValueError("DeepONetPDE needs at least one scalar "
                             "parameter channel (function-valued inputs "
                             "need an FNO backbone)")
        self._in = in_channels
        self._out = out_channels
        self.grid_ndim = grid_ndim
        self.latent = latent
        self.branch = mlp([in_channels, *branch_sizes, latent], activation)
        self.trunk = mlp([grid_ndim, *trunk_sizes, latent], activation,
                         out_activation=activation)

    @property
    def in_dim(self):
        return self._in

    @property
    def out_dim(self):
        return self._out

    def init(self, key):
        kb, kt, kw = jax.random.split(key, 3)
        dtype = default_float()
        scale = 1.0 / jnp.sqrt(jnp.asarray(float(self.latent), dtype))
        return {
            "branch": self.branch.init(kb),
            "trunk": self.trunk.init(kt),
            "head": scale * jax.random.normal(
                kw, (self._out, self.latent), dtype),
            "bias": jnp.zeros((self._out,), dtype),
        }

    def apply(self, params, x):
        p, grids = x
        if p.ndim != 2:
            raise ValueError(
                "DeepONetPDE takes scalar parameter columns (n_params, P); "
                f"got ndim={p.ndim} — function-valued operator inputs need "
                "an FNO backbone (FNO1D/2D/3D)")
        gs = [jnp.ravel(jnp.asarray(g)) for g in grids]
        if len(gs) != self.grid_ndim:
            raise ValueError(f"DeepONetPDE(grid_ndim={self.grid_ndim}) got "
                             f"{len(gs)} grid axes")
        mesh = jnp.meshgrid(*gs, indexing="ij")
        cord = jnp.stack([jnp.ravel(m) for m in mesh])      # (d, N)
        b = self.branch.apply(params["branch"], p)           # (K, P)
        t = self.trunk.apply(params["trunk"], cord)          # (K, N)
        # y[o, n, p] = sum_k head[o, k] t[k, n] b[k, p] + bias[o]
        y = jnp.einsum("ok,kn,kp->onp", params["head"], t, b,
                       preferred_element_type=b.dtype)
        y = y + params["bias"][:, None, None]
        shape = (self._out,) + tuple(g.shape[0] for g in gs) + (p.shape[1],)
        y = y.reshape(shape)
        return y[0] if self._out == 1 else y
