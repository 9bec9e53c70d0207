"""Bayesian parameter estimation for Lotka-Volterra from noisy data
(the reference's Lotka_Volterra_BPINNs tutorial).

Run: python examples/lotka_volterra_bpinn.py
"""
import numpy as np
import jax.numpy as jnp

from neuralpde_tpu import BNNODE, Normal, ODEProblem, mlp
from neuralpde_tpu.bayesian.ode import solve_bnnode

alpha, beta, gamma, delta = 1.5, 1.0, 3.0, 1.0


def f(u, p, t):
    x, y = u[0], u[1]
    return jnp.array([p[0] * x - p[1] * x * y, -p[2] * y + p[3] * x * y])


# synthetic data from RK4
def rk4(u0, ts):
    us = [np.asarray(u0)]
    p = np.array([alpha, beta, gamma, delta])
    fnp = lambda u, t: np.array([p[0]*u[0]-p[1]*u[0]*u[1], -p[2]*u[1]+p[3]*u[0]*u[1]])
    for i in range(len(ts) - 1):
        h = ts[i+1]-ts[i]; u = us[-1]
        k1 = fnp(u, ts[i]); k2 = fnp(u+h/2*k1, ts[i]+h/2)
        k3 = fnp(u+h/2*k2, ts[i]+h/2); k4 = fnp(u+h*k3, ts[i]+h)
        us.append(u + h/6*(k1+2*k2+2*k3+k4))
    return np.stack(us)


ts = np.linspace(0, 2, 80)
traj = rk4([1.0, 1.0], ts)
rng = np.random.default_rng(0)
noisy = traj + 0.01 * traj.std(0) * rng.standard_normal(traj.shape)
dataset = [noisy[:, 0], noisy[:, 1], ts, np.full_like(ts, ts[1] - ts[0])]

prob = ODEProblem(f=f, u0=np.array([1.0, 1.0]), tspan=(0.0, 2.0),
                  p=np.array([1.0, 1.0, 2.0, 1.0]))
alg = BNNODE(mlp([1, 16, 16, 2]), dataset=dataset, draw_samples=1200,
             l2std=(0.02, 0.02), phystd=(0.05, 0.05), priorsNNw=(0.0, 3.0),
             param=(Normal(2.0, 1.0), Normal(1.5, 1.0), Normal(2.5, 1.0),
                    Normal(1.5, 1.0)),
             estim_collocate=True, n_leapfrog=25)
sol = solve_bnnode(prob, alg)
est = [float(p.mean) for p in sol.estimated_de_params]
print("true params:", [alpha, beta, gamma, delta])
print("estimated:  ", [round(v, 3) for v in est])

# convergence diagnostics (MCMCChains-summary analog): the DE-parameter
# entries are the last four flat coordinates
d = sol.diagnostics()
print("param split-Rhat:", np.round(d["split_rhat"][-4:], 3),
      " ESS:", np.round(d["ess"][-4:], 0))
