"""FBPINN at its paper's scale — many-period 1-D multi-scale ODE and the
2-D multi-scale Laplace benchmark, vs an equal-budget single MLP.

Beyond reference (the reference has no domain-decomposition trial
functions; its only decomposition tool is sequential `neural_adapter`
transfer, src/neural_adapter.jl).  Two measured benchmarks:

1. **50-period multi-scale ODE** (Moseley, Markham & Nissen-Meyer 2023
   fig. 7, scaled from their omega2=15 to omega2=25 on [-2pi, 2pi] = 50
   fast periods):

       du/dx = omega1 cos(omega1 x) + omega2 cos(omega2 x),   u(0) = 0
       exact: u = sin(omega1 x) + sin(omega2 x)

   Both models use the paper's hard-constraint ansatz
   u = tanh(omega2 x) * NN(x), so the comparison is purely about fitting
   the 50-period interior physics.  The FBPINN gets 50 windowed local
   nets (each sees ~1 period of the fast component after its coordinate
   is normalized to [-1, 1]); the single MLP gets MORE parameters and the
   same budget, and stalls on spectral bias.

2. **2-D multi-scale Laplace** (Dolean, Heinlein, Mishra & Moseley 2024
   §5 shape):

       -Lap(u) = f on [0,1]^2, u|_boundary = 0,
       exact: u = (1/L) sum_{l=1..L} sin(2^l pi x) sin(2^l pi y),  L = 4

   The finest mode (omega = 16pi) forces a fine subdomain grid, but the
   coarsest mode (omega = 2pi) then spans many subdomains, which a FLAT
   FBPINN must assemble from local pieces communicating only through
   window overlaps — the regime where Dolean et al. show flat FBPINNs
   degrade and a multilevel hierarchy (levels = [1, 2, 4, 8, 16], the
   neural analogue of multigrid) recovers every scale at once.  All rows
   share the hard constraint u = 16 x(1-x) y(1-y) * NN.

Run:  python examples/fbpinn_multiscale.py [--part ode|laplace|all]
      [--iters N] [--quick]

Measured results live in PERF.md ("FBPINN at paper scale").
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, FBPINN, GridTraining, Interval,
    PDESystem, PhysicsInformedNN, Transformed, cos, discretize, mlp,
    solve, symbols,
)

PI = float(np.pi)


def n_params(tree):
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))


def run_row(name, system, net, strategy, *, iters, lr, rel_l2,
            dtype=jnp.float32, precision="highest", inner=500):
    disc = PhysicsInformedNN(net, strategy, dtype=dtype,
                             matmul_precision=precision)
    prob = discretize(system, disc)
    t0 = time.perf_counter()
    res = solve(prob, optax.adam(lr), maxiters=iters, inner_steps=inner)
    wall = time.perf_counter() - t0
    rel = rel_l2(prob, res)
    print(f"  {name:34s}  params={n_params(res.u['depvar']):7d}  "
          f"iters={iters:6d}  wall={wall:8.1f} s  rel L2={rel:.4f}",
          flush=True)
    return dict(name=name, params=n_params(res.u["depvar"]), iters=iters,
                wall=wall, rel_l2=float(rel))


def equal_wall_iters(row_ref, row_cheap, inner=500, cap=20):
    """Iteration count giving the cheap model ~the reference row's wall
    (rounded to inner_steps, capped at cap x the fixed-step budget)."""
    rate = row_cheap["iters"] / max(row_cheap["wall"], 1e-9)
    its = int(rate * row_ref["wall"] / inner) * inner
    return max(inner, min(its, cap * row_cheap["iters"]))


# --------------------------------------------------------------- part 1
def part_ode(iters):
    """50-period multi-scale ODE on [-2pi, 2pi]."""
    w1, w2 = 1.0, 25.0
    lo, hi = -2 * PI, 2 * PI
    x = symbols("x")
    u = DepVar("u")
    system = PDESystem(
        [Eq(Differential(x)(u(x)), w1 * cos(w1 * x) + w2 * cos(w2 * x))],
        [Eq(u(0.0), 0.0)],
        [Domain(x, Interval(lo, hi))],
        ivs=[x], dvs=[u(x)])
    # ~24 grid points per fast period
    strat = GridTraining((hi - lo) / 1200)

    g = np.linspace(lo, hi, 4001)
    want = np.sin(w1 * g) + np.sin(w2 * g)

    def rel_l2(prob, res):
        pred = np.asarray(prob.pinnrep.phi(
            jnp.asarray(g[None, :], jnp.float32),
            res.u["depvar"])).ravel()
        return np.linalg.norm(pred - want) / np.linalg.norm(want)

    def hard(base):
        # the paper's ansatz: u = tanh(w2 x) * NN — u(0)=0 exactly, the
        # constraint saturates within the first fast period
        return Transformed(base, lambda c, out: jnp.tanh(w2 * c[0:1]) * out)

    print(f"[ode] du/dx two-scale (w1={w1}, w2={w2}), 50 fast periods, "
          f"grid 1201, hard-constrained u(0)=0")
    fb = run_row("FBPINN 50 subdomains",
                 system, hard(FBPINN([(lo, hi)], subdivisions=50,
                                     hidden=(16,))),
                 strat, iters=iters, lr=1e-3, rel_l2=rel_l2)
    mlp_row = run_row("single MLP [1,64,64,64,1]",
                      system, hard(mlp([1, 64, 64, 64, 1])),
                      strat, iters=iters, lr=1e-3, rel_l2=rel_l2)
    rows = [fb, mlp_row,
            # the FBPINN step is ~J x costlier (every net sees every
            # point): give the MLP the FBPINN's WALL budget too
            run_row("single MLP, equal WALL",
                    system, hard(mlp([1, 64, 64, 64, 1])), strat,
                    iters=equal_wall_iters(fb, mlp_row),
                    lr=1e-3, rel_l2=rel_l2),
            run_row("RFF MLP m=64 sigma=10",
                    system, hard(mlp([1, 64, 64, 1], fourier_features=64,
                                     fourier_sigma=10.0)),
                    strat, iters=iters, lr=1e-3, rel_l2=rel_l2)]
    return rows


# --------------------------------------------------------------- part 2
def part_laplace(iters, L=4):
    """2-D multi-scale Laplace: u = (1/L) sum sin(2^l pi x) sin(2^l pi y).

    L=4 (modes up to 16pi) trains on a 129^2 grid with a 16x16 finest
    decomposition; L=5 (up to 32pi) moves to stochastic 16384-point
    batches with eval on 257^2 and a 32x32 finest grid — the scale
    separation where Dolean et al. report flat FBPINNs failing."""
    omegas = [2.0 ** l for l in range(1, L + 1)]       # 2, 4, ..., 2^L
    x, y = symbols("x y")
    u = DepVar("u")
    lap = (Differential(x) ** 2)(u(x, y)) + (Differential(y) ** 2)(u(x, y))
    f = sum((2 * (w * PI) ** 2 / L) * npde.sin(w * PI * x) *
            npde.sin(w * PI * y) for w in omegas)
    system = PDESystem(
        [Eq(-lap, f)],
        [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
         Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)],
        [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
        ivs=[x, y], dvs=[u(x, y)])
    if L <= 4:
        strat = GridTraining(1 / 128)   # 129^2 nodes: ~16 per finest period
    else:
        from neuralpde_tpu import StochasticTraining
        strat = StochasticTraining(16384, bcs_points=64)

    g = np.linspace(0, 1, 257)
    X, Y = np.meshgrid(g, g, indexing="ij")
    want = sum(np.sin(w * PI * X) * np.sin(w * PI * Y) for w in omegas) / L
    cord = jnp.asarray(np.stack([X.ravel(), Y.ravel()]), jnp.float32)

    def rel_l2(prob, res):
        pred = np.asarray(prob.pinnrep.phi(cord, res.u["depvar"])).ravel()
        return (np.linalg.norm(pred - want.ravel())
                / np.linalg.norm(want.ravel()))

    def hard(base):
        return Transformed(base, lambda c, out: 16.0 * c[0:1] * (1 - c[0:1])
                           * c[1:2] * (1 - c[1:2]) * out)

    finest = 2 ** L
    levels = [2 ** l for l in range(L + 1)]            # 1, 2, ..., 2^L
    print(f"[laplace] -Lap u = f, u = (1/{L}) sum sin(2^l pi x) sin(2^l pi y)"
          f" l=1..{L}, hard-constrained boundary")
    ml = run_row(f"multilevel FBPINN {levels}",
                 system, hard(FBPINN([(0, 1), (0, 1)],
                                     levels=levels, hidden=(16,))),
                 strat, iters=iters, lr=1e-3, rel_l2=rel_l2)
    flat = run_row(f"flat FBPINN {finest}x{finest}",
                   system, hard(FBPINN([(0, 1), (0, 1)], subdivisions=finest,
                                       hidden=(16,))),
                   strat, iters=iters, lr=1e-3, rel_l2=rel_l2)
    mlp_row = run_row("single MLP [2,128,128,128,1]",
                      system, hard(mlp([2, 128, 128, 128, 1])),
                      strat, iters=iters, lr=1e-3, rel_l2=rel_l2)
    rows = [ml, flat, mlp_row,
            run_row("single MLP, equal WALL",
                    system, hard(mlp([2, 128, 128, 128, 1])), strat,
                    iters=equal_wall_iters(ml, mlp_row),
                    lr=1e-3, rel_l2=rel_l2)]
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="all",
                    choices=["ode", "laplace", "laplace5", "all"])
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--quick", action="store_true",
                    help="reduced budget smoke run")
    a = ap.parse_args()
    iters = 600 if a.quick else a.iters
    out = {}
    if a.part in ("ode", "all"):
        out["ode"] = part_ode(iters)
    if a.part in ("laplace", "all"):
        out["laplace"] = part_laplace(iters)
    if a.part == "laplace5":
        out["laplace5"] = part_laplace(iters, L=5)
    import json
    print(json.dumps(out))
