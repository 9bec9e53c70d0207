"""Allen-Cahn with a separable (SPINN) trial function + causal training.

The sharp-interface stress test for the factorized ansatz
(`docs/src/tutorials/separable.md`): u_t = 1e-4 u_xx + 5(u - u^3),
x in [-1,1] periodic, t in [0,1], u(x,0) = x^2 cos(pi x).

Recipe: per-axis nets with an exactly-periodic x-axis embedding, a static
tensor grid, causal weighting in t with epsilon continuation (the
dt-normalized separable exponent), 100x IC weight, and — decisive on TPU
(r3 finding, PERF.md) — true-f32 MXU passes via
`jax.default_matmul_precision("highest")` for both training and
evaluation.

Run: python examples/allen_cahn_spinn.py [--precision default|highest]
     [--rank R] [--nodes N]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import neuralpde_tpu as npde
from neuralpde_tpu import (
    Chain, DepVar, Differential, Domain, Eq, Interval, NonAdaptiveLoss,
    PDESystem, PeriodicEmbedding, PhysicsInformedNN, SeparableNet,
    SeparableTraining, discretize, mlp, symbols, solve,
)


def ground_truth():
    """Spectral FFT-in-x + RK4-in-t reference on a 512-point grid."""
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
    return xg, np.linspace(0, 1, len(snaps)), np.stack(snaps)  # (101, 512)


def build_net(rank: int, hidden=(64, 64, 64), n_modes: int = 10):
    x_net = Chain(PeriodicEmbedding(1, axis=0, period=2.0, n_modes=n_modes),
                  *mlp([2 * n_modes, *hidden, rank]).layers)
    t_net = mlp([1, *hidden, rank])
    return SeparableNet([x_net, t_net])


DEFAULT_STAGES = ((100.0, 1e-3), (1e3, 5e-4), (1e4, 2e-4), (1e5, 1e-4))


def run(rank: int = 256, nodes: int = 256, iters: int = 75000,
        precision: str = "highest", stages=DEFAULT_STAGES,
        verbose: bool = True) -> dict:
    """The full eps-continuation recipe as a callable (bench.py
    --accuracy-full runs this at the headline budget).  Returns
    {"rel_l2", "wall_s", "per_stage": [(eps, rel), ...]}."""
    xg, ts, U = ground_truth()
    X, T = np.meshgrid(xg, ts, indexing="ij")
    cord = jnp.asarray(np.stack([X.ravel(), T.ravel()]), jnp.float32)
    want = jnp.asarray(U.T.reshape(-1), jnp.float32)

    x, t = symbols("x t")
    u = DepVar("u")
    Dt = Differential(t)
    Dxx = Differential(x) ** 2
    eq = Eq(Dt(u(x, t)),
            1e-4 * Dxx(u(x, t)) + 5.0 * (u(x, t) - u(x, t) ** 3))
    # the periodic x-axis net satisfies periodicity exactly; only the IC
    # remains as a boundary loss
    bcs = [Eq(u(x, 0.0), x**2 * npde.cos(np.pi * x))]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(-1, 1)), Domain(t, Interval(0, 1))],
                       [x, t], [u(x, t)])

    net = build_net(rank)
    dx = 2.0 / (nodes - 1)
    dt_ = 1.0 / (nodes - 1)

    mp = "highest" if precision == "highest" else None
    theta = None
    per_stage = []
    rel = float("nan")
    t0 = time.perf_counter()
    for eps, lr in stages:
        strat = SeparableTraining(dx=[dx, dt_], causal=t, causal_eps=eps)
        disc = PhysicsInformedNN(
            net, strat, dtype=jnp.float32, matmul_precision=mp,
            adaptive_loss=NonAdaptiveLoss(bc_loss_weights=[100.0]))
        prob = discretize(system, disc)
        if theta is not None:
            prob = prob.with_params(theta)
        res = solve(prob, optax.adam(lr), maxiters=iters,
                    inner_steps=1000)
        theta = res.u
        # evaluation ALWAYS under true-f32 passes: the reported number is a
        # property of the params, not of bf16 inference noise (PERF.md)
        with jax.default_matmul_precision("highest"):
            pred = net.apply(theta["depvar"], cord)[0]
        rel = float(jnp.linalg.norm(pred - want) / jnp.linalg.norm(want))
        per_stage.append((eps, rel))
        if verbose:
            print(f"eps={eps:>7} rank={rank} nodes={nodes} "
                  f"prec={precision}: rel L2 = {rel:.4f}  "
                  f"(t = {time.perf_counter() - t0:.1f}s)", flush=True)
    return {"rel_l2": rel, "wall_s": round(time.perf_counter() - t0, 1),
            "per_stage": per_stage}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="highest",
                    choices=["default", "highest"])
    ap.add_argument("--rank", type=int, default=256)
    ap.add_argument("--nodes", type=int, default=256)
    ap.add_argument("--iters", type=int, default=75000,
                    help="iters per continuation stage")
    args = ap.parse_args()
    run(rank=args.rank, nodes=args.nodes, iters=args.iters,
        precision=args.precision)


if __name__ == "__main__":
    main()
