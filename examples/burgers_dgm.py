"""Viscous Burgers with the Deep Galerkin Method + MiniMax adaptive loss.

Run: python examples/burgers_dgm.py
"""
import numpy as np
import jax.numpy as jnp
import optax

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DeepGalerkin, Differential, DepVar, Domain, Eq, Interval,
    MiniMaxAdaptiveLoss, PDESystem, QuasiRandomTraining, discretize, solve,
    symbols,
)

nu = 0.05
x, t = symbols("x t")
u = DepVar("u")
Dt, Dx, Dxx = Differential(t), Differential(x), Differential(x) ** 2

eq = Eq(Dt(u(x, t)) + u(x, t) * Dx(u(x, t)), nu * Dxx(u(x, t)))
bcs = [Eq(u(x, 0.0), -npde.sin(np.pi * x)),
       Eq(u(-1.0, t), 0.0), Eq(u(1.0, t), 0.0)]
system = PDESystem(eq, bcs,
                   [Domain(x, Interval(-1, 1)), Domain(t, Interval(0, 1))],
                   [x, t], [u(x, t)])

disc = DeepGalerkin(2, 1, 24, 3, jnp.tanh, jnp.tanh, lambda z: z,
                    QuasiRandomTraining(512, sampling_alg="sobol"),
                    adaptive_loss=MiniMaxAdaptiveLoss(100))
prob = discretize(system, disc)
res = solve(prob, optax.adam(1e-2), maxiters=5000, inner_steps=25)
print(f"final loss {res.objective:.3e}")
