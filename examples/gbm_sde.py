"""Weak SDE solution of geometric Brownian motion with NNSDE.

Run: python examples/gbm_sde.py
"""
import numpy as np
import optax

from neuralpde_tpu import NNSDE, SDEProblem, mlp
from neuralpde_tpu.nn.core import sigmoid
from neuralpde_tpu.solvers.sde import solve_sde

mu, sigma = 1.2, 0.2
prob = SDEProblem(f=lambda u, p, t: mu * u, g=lambda u, p, t: sigma * u,
                  u0=1.0, tspan=(0.0, 1.0))
chain = mlp([1 + 3, 16, 16, 1], activation=sigmoid)   # n_z = 3 KL modes
alg = NNSDE(chain, optax.adam(2e-2), sub_batch=8, numensemble=50)
sol = solve_sde(prob, alg, dt=1 / 50, maxiters=2000, inner_steps=25)

ts = np.asarray(sol.timepoints)
mean_pred = np.asarray([float(p.mean) for p in sol.estimated_sol[0]])
print("E[u(1)] predicted:", mean_pred[-1], " analytic:", np.exp(mu))
