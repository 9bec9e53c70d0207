"""Allen-Cahn via causal training — the classic stiff-PDE PINN failure case.

    u_t = 1e-4 u_xx + 5(u - u^3),  x in [-1,1] periodic,  t in [0,1]
    u(x,0) = x^2 cos(pi x)

A plain PINN fits the trivial late-time dynamics before the initial state
propagates and lands at relative L2 ~ 1.0 (total failure; Wang, Sankaran &
Perdikaris 2022).  The cure is the same recipe the paper uses, all built in:

  * CausalTraining with epsilon annealing (1 -> 10 -> 100)
  * an exactly-periodic trial function (PeriodicEmbedding in x)
  * 100x initial-condition weight (NonAdaptiveLoss(bc_loss_weights=...))

Measured on one TPU v5e chip (100k Adam iters total):

  | config                                   | rel L2  |
  |------------------------------------------|---------|
  | plain StochasticTraining                  | 1.007   |
  | CausalTraining eps=1                      | 0.65    |
  | anneal + random Fourier features + IC wt  | 0.0143  |
  | anneal + PeriodicEmbedding + IC wt (this) | 0.00747 |

Ground truth: spectral FFT-in-x + RK4-in-t on a 512-point grid (computed
below in a few seconds).

Run: python examples/allen_cahn_causal.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import neuralpde_tpu as npde
from neuralpde_tpu import (
    CausalTraining, Chain, DepVar, Differential, Domain, Eq, Interval,
    NonAdaptiveLoss, PDESystem, PeriodicEmbedding, PhysicsInformedNN,
    discretize, mlp, symbols, solve,
)

# --- ground truth: spectral method of lines -------------------------------
N = 512
xg = -1 + 2 * np.arange(N) / N
k = np.pi * np.fft.fftfreq(N, d=1.0 / N)
ug = xg**2 * np.cos(np.pi * xg)


def rhs(v):
    vxx = np.real(np.fft.ifft(-(k**2) * np.fft.fft(v)))
    return 1e-4 * vxx + 5.0 * (v - v**3)


snaps = [ug.copy()]
dt = 5e-4
for i in range(2000):
    k1 = rhs(ug)
    k2 = rhs(ug + 0.5 * dt * k1)
    k3 = rhs(ug + 0.5 * dt * k2)
    k4 = rhs(ug + dt * k3)
    ug = ug + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    if (i + 1) % 20 == 0:
        snaps.append(ug.copy())
U = np.stack(snaps)                      # (101, 512)
ts = np.linspace(0, 1, len(snaps))
X, T = np.meshgrid(xg, ts, indexing="ij")
cord = jnp.asarray(np.stack([X.ravel(), T.ravel()]), jnp.float32)
want = jnp.asarray(U.T.reshape(-1), jnp.float32)

# --- PINN ------------------------------------------------------------------
x, t = symbols("x t")
u = DepVar("u")
Dt, Dx = Differential(t), Differential(x)
Dxx = Differential(x) ** 2
eq = Eq(Dt(u(x, t)), 1e-4 * Dxx(u(x, t)) + 5.0 * (u(x, t) - u(x, t) ** 3))
bcs = [Eq(u(x, 0.0), x**2 * npde.cos(np.pi * x)),       # IC
       Eq(u(-1.0, t), u(1.0, t)),                       # periodic value
       Eq(Dx(u(-1.0, t)), Dx(u(1.0, t)))]               # periodic slope
system = PDESystem(eq, bcs,
                   [Domain(x, Interval(-1, 1)), Domain(t, Interval(0, 1))],
                   [x, t], [u(x, t)])

# exactly periodic in x (10 harmonics) + passthrough t -> 21 inputs; the
# periodic BC losses vanish identically, so only IC + physics remain live
net = Chain(PeriodicEmbedding(2, axis=0, period=2.0, n_modes=10),
            *mlp([21, 128, 128, 128, 128, 1]).layers)

theta = None
t0 = time.perf_counter()
for eps, iters, lr in [(1.0, 30000, 1e-3), (10.0, 30000, 5e-4),
                       (100.0, 40000, 2e-4)]:
    strat = CausalTraining(8192, t, bcs_points=1024, n_slabs=32,
                           causal_eps=eps)
    disc = PhysicsInformedNN(net, strat, derivative="jet",
                             adaptive_loss=NonAdaptiveLoss(
                                 bc_loss_weights=[100.0, 1.0, 1.0]))
    prob = discretize(system, disc)
    if theta is not None:
        prob = prob.with_params(theta)
    res = solve(prob, optax.adam(lr), maxiters=iters, inner_steps=1000)
    theta = res.u
    pred = disc.phi(cord, theta["depvar"])[0]
    rel = float(jnp.linalg.norm(pred - want) / jnp.linalg.norm(want))
    print(f"eps={eps:>5}: rel L2 = {rel:.4f}  "
          f"(t = {time.perf_counter() - t0:.1f}s)")
