"""Train a PINN, export the solution network as portable StableHLO, reload
and serve it without the framework.

Run: python examples/export_serving.py
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, GridTraining, Interval, PDESystem,
    PhysicsInformedNN, discretize, mlp, solve, symbols,
)
from neuralpde_tpu.utils.export import export_phi, load_exported, save_exported

t = symbols("t")
u = DepVar("u")
eq = Eq(Differential(t)(u(t)), -u(t))
system = PDESystem(eq, [Eq(u(0.0), 1.0)], [Domain(t, Interval(0, 1))],
                   [t], [u(t)])
disc = PhysicsInformedNN(mlp([1, 16, 1]), GridTraining(0.05))
prob = discretize(system, disc)
res = solve(prob, optax.adam(5e-2), maxiters=1500, inner_steps=25)

from neuralpde_tpu import default_float
dtype = default_float()
blob, call = export_phi(disc.phi, res.u["depvar"], in_dim=1, batch=64,
                        dtype=dtype)
save_exported("/tmp/solution.stablehlo", blob)
serve = load_exported("/tmp/solution.stablehlo")
ts = jnp.linspace(0, 1, 64, dtype=dtype)[None, :]
out = serve(ts)
print("serving max err vs exp(-t):",
      float(jnp.max(jnp.abs(out[0] - jnp.exp(-ts[0])))))
