"""2D Poisson with PhysicsInformedNN (the reference's flagship tutorial).

Run: python examples/poisson_2d.py
"""
import numpy as np
import optax

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, GridTraining, Interval, PDESystem,
    PhysicsInformedNN, discretize, mlp, solve, symbols,
)

x, y = symbols("x y")
u = DepVar("u")
Dxx, Dyy = Differential(x) ** 2, Differential(y) ** 2

eq = Eq(Dxx(u(x, y)) + Dyy(u(x, y)), -npde.sin(np.pi * x) * npde.sin(np.pi * y))
bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
       Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)]
system = PDESystem(eq, bcs,
                   [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                   [x, y], [u(x, y)])

disc = PhysicsInformedNN(mlp([2, 16, 16, 1]), GridTraining(0.05))
prob = discretize(system, disc)
res = solve(prob, optax.adam(2e-2), maxiters=3000, inner_steps=25, verbose=False)

import jax.numpy as jnp
xs = np.linspace(0, 1, 21)
X, Y = np.meshgrid(xs, xs, indexing="ij")
cord = jnp.asarray(np.stack([X.ravel(), Y.ravel()]))
pred = np.asarray(disc.phi(cord, res.u["depvar"])[0]).reshape(21, 21)
want = np.sin(np.pi * X) * np.sin(np.pi * Y) / (2 * np.pi**2)
print(f"final loss {res.objective:.3e}   max abs error {np.abs(pred - want).max():.4f}")
