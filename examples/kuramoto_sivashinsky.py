"""Kuramoto-Sivashinsky (4th-order PDE) against its solitary-wave solution.

Run: python examples/kuramoto_sivashinsky.py
"""
import numpy as np
import jax.numpy as jnp
import optax

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, GridTraining, Interval, PDESystem,
    PhysicsInformedNN, discretize, mlp, solve, symbols,
)

a, b, g = 1.0, 4.0, 1.0
x, t = symbols("x t")
u = DepVar("u")
Dt, Dx = Differential(t), Differential(x)
Dx2, Dx3, Dx4 = Differential(x) ** 2, Differential(x) ** 3, Differential(x) ** 4


def u_exact(xe, te, lib=np):
    th = lib.tanh(-xe / 2.0 + te)
    return 11 + 15 * th - 15 * th**2 - 15 * th**3


def du_exact(xe, te, lib=np):
    th = lib.tanh(-xe / 2.0 + te)
    return 15 / 2 * (th + 1) * (3 * th - 1) * (1 - th**2)


eq = Eq(Dt(u(x, t)) + u(x, t) * Dx(u(x, t)) + a * Dx2(u(x, t))
        + b * Dx3(u(x, t)) + g * Dx4(u(x, t)), 0.0)
bcs = [Eq(u(x, 0.0), u_exact(x, 0.0, npde)),
       Eq(u(-10.0, t), u_exact(-10.0, t, npde)),
       Eq(u(10.0, t), u_exact(10.0, t, npde)),
       Eq(Dx(u(-10.0, t)), du_exact(-10.0, t, npde)),
       Eq(Dx(u(10.0, t)), du_exact(10.0, t, npde))]
system = PDESystem(eq, bcs,
                   [Domain(x, Interval(-10, 10)), Domain(t, Interval(0, 1))],
                   [x, t], [u(x, t)])

disc = PhysicsInformedNN(mlp([2, 32, 32, 1]), GridTraining([0.4, 0.1]))
prob = discretize(system, disc)
res = solve(prob, optax.adam(1e-2), maxiters=3000, inner_steps=25)
res = solve(prob.with_params(res.u), optax.lbfgs(), maxiters=600, inner_steps=10)

xs = np.linspace(-10, 10, 41)
ts_ = np.linspace(0, 1, 5)
X, T = np.meshgrid(xs, ts_, indexing="ij")
cord = jnp.asarray(np.stack([X.ravel(), T.ravel()]))
pred = np.asarray(disc.phi(cord, res.u["depvar"])[0]).reshape(41, 5)
rel = np.sqrt(np.mean((pred - u_exact(X, T)) ** 2)) / np.sqrt(np.mean(u_exact(X, T) ** 2))
print(f"final loss {res.objective:.3e}   relative L2 {rel:.3f}")
