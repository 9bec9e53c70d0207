"""DeepONet (NeuralOperators.jl replacement for PINOODE,
reference: src/NeuralPDE.jl:19, src/pino_ode_solve.jl).

u(p, t) = Σ_k branch_k(p) · trunk_k(t): branch consumes the parameter vector,
trunk the query coordinate; the output is their inner product over the latent
basis, shaped (T, P) to match the reference's `out[j, i]` indexing
(src/pino_ode_solve.jl:106-132).
"""

from __future__ import annotations

import jax

from .core import Module


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
