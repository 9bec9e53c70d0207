"""Taylor-Green vortex with a separable PINN: 2.1M-point grids, rel L2 0.0029.

Same unsteady incompressible Navier-Stokes setup as
`examples/taylor_green_ns.py` (three coupled equations, double spatial
periodicity, pressure gauge pin), but the three fields are separable trial
functions u(x,y,t) = sum_r f_r(x) g_r(y) h_r(t) with PeriodicEmbedding x/y
axis nets — so every step evaluates the residual on a FULL 128^3 = 2.1M
point tensor grid (vs the dense example's 8192-point stochastic batches)
for 3x128x3 axis-net evaluations.

Measured on one TPU v5e chip (40k Adam iters, causal eps 3 -> 30,
dt-normalized):

    rel L2 of (u, v) at t in {0.25, 0.5, 1.0}: **0.0029**
    (dense + causal example: 0.0037) — ~3 min wall incl. compiles.

Run: python examples/taylor_green_spinn.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neuralpde_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import optax

import neuralpde_tpu as npde
from neuralpde_tpu import (
    Chain, DepVar, Dense, Differential, Domain, Eq, Interval,
    NonAdaptiveLoss, PDESystem, PeriodicEmbedding, PhysicsInformedNN,
    SeparableNet, SeparableTraining, discretize, mlp, solve, symbols, tanh,
)

NU = 0.1
PI2 = 2 * np.pi
RANK = 64

x, y, t = symbols("x y t")
u, v, p = DepVar("u"), DepVar("v"), DepVar("p")
Dt, Dx, Dy = Differential(t), Differential(x), Differential(y)
Dxx, Dyy = Differential(x) ** 2, Differential(y) ** 2
U, V, P = u(x, y, t), v(x, y, t), p(x, y, t)
eqs = [
    Eq(Dt(U) + U * Dx(U) + V * Dy(U) + Dx(P), NU * (Dxx(U) + Dyy(U))),
    Eq(Dt(V) + U * Dx(V) + V * Dy(V) + Dy(P), NU * (Dxx(V) + Dyy(V))),
    Eq(Dx(U) + Dy(V), 0.0),
]
bcs = [
    Eq(u(x, y, 0.0), -npde.cos(x) * npde.sin(y)),
    Eq(v(x, y, 0.0), npde.sin(x) * npde.cos(y)),
    Eq(p(x, y, 0.0), -0.25 * (npde.cos(2.0 * x) + npde.cos(2.0 * y))),
    Eq(p(0.0, 0.0, t), -0.5 * npde.exp(-4.0 * NU * t)),  # gauge pin
]
domains = [Domain(x, Interval(0, PI2)), Domain(y, Interval(0, PI2)),
           Domain(t, Interval(0, 1))]
system = PDESystem(eqs, bcs, domains, [x, y, t], [U, V, P])


def axis_net(periodic: bool):
    if periodic:
        return Chain(PeriodicEmbedding(1, axis=0, period=PI2, n_modes=6),
                     Dense(12, 64, tanh), Dense(64, 64, tanh),
                     Dense(64, RANK))
    return mlp([1, 64, 64, RANK])


def make_net():
    return SeparableNet([axis_net(True), axis_net(True), axis_net(False)])


def main():
    nets = [make_net(), make_net(), make_net()]
    theta = None
    t0 = time.perf_counter()
    for eps, iters, lr in [(3.0, 20000, 1e-3), (30.0, 20000, 5e-4)]:
        strat = SeparableTraining(dx=[PI2 / 127, PI2 / 127, 1 / 127],
                                  causal=t, causal_eps=eps)
        disc = PhysicsInformedNN(
            nets, strat, dtype=jnp.float32,
            adaptive_loss=NonAdaptiveLoss(
                bc_loss_weights=[100.0, 100.0, 100.0, 10.0]))
        prob = discretize(system, disc)
        if theta is not None:
            prob = prob.with_params(theta)
        res = solve(prob, optax.adam(lr), maxiters=iters, inner_steps=1000)
        theta = res.u

        xs = np.linspace(0, PI2, 64)
        rels = []
        for tv in (0.25, 0.5, 1.0):
            X, Y = np.meshgrid(xs, xs, indexing="ij")
            dec = np.exp(-2 * NU * tv)
            ua = -np.cos(X) * np.sin(Y) * dec
            va = np.sin(X) * np.cos(Y) * dec
            nx = jnp.asarray(xs, jnp.float32)
            nt = jnp.asarray([tv], jnp.float32)
            up = np.asarray(nets[0].grid(theta["depvar"]["u"],
                                         [nx, nx, nt]))[:, :, 0]
            vp = np.asarray(nets[1].grid(theta["depvar"]["v"],
                                         [nx, nx, nt]))[:, :, 0]
            rels.append(np.sqrt(
                (np.linalg.norm(up - ua) ** 2 + np.linalg.norm(vp - va) ** 2)
                / (np.linalg.norm(ua) ** 2 + np.linalg.norm(va) ** 2)))
        print(f"eps={eps}: mean rel L2(u,v) = {np.mean(rels):.4f} "
              f"(t = {time.perf_counter() - t0:.1f} s)")
    return float(np.mean(rels))


if __name__ == "__main__":
    main()
