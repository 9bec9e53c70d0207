"""Wall-clock-to-ACCURACY A/B for hp-VPINN weak training vs strong-form
collocation (one TPU chip).

`measure_weak_tpu.py` proved the 5.65x per-STEP win at ibp=2; this script
answers the question that actually matters: at EQUAL WALL-CLOCK, which form
reaches the lower rel L2?  Two problems, same network (2-64-64-1, jet
derivatives), matched residual-node counts per problem:

* smooth 2-D Poisson  u* = sin(pi x) sin(pi y)    (the headline geometry)
* front 2-D Poisson   u* = tanh(S(x-0.7)) sin(pi y), S=60  (mesh-bound
  front: the regime h-refinement exists for)

Configs: strong GridTraining on the weak node tensor grid; WeakTraining at
ibp = 0 / 1 / 2; and (front problem) ibp=1 + the `solve_weak_adaptive`
hp-driver under the SAME total wall budget.

Accounting: every distinct XLA program gets one untimed warm-up call
(compile time excluded for every config alike); the budget clock covers all
timed training chunks, host round-trips, and (for the adaptive row) the
refine_weak scoring + re-lowering between rounds.

Run: python scripts/measure_weak_accuracy_tpu.py [--budget 20] [--seeds 3]
Emits one JSON line per (problem, config, seed) plus a summary table.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_problem(kind, strategy, seed):
    import neuralpde_tpu as npde
    from neuralpde_tpu import (
        DepVar, Differential, Domain, Eq, Interval, PDESystem,
        PhysicsInformedNN, discretize, mlp, symbols,
    )

    x, y = symbols("x y")
    u = DepVar("u")
    Dxx, Dyy = Differential(x) ** 2, Differential(y) ** 2
    if kind == "smooth":
        eq = Eq(Dxx(u(x, y)) + Dyy(u(x, y)),
                -2 * np.pi**2 * npde.sin(np.pi * x) * npde.sin(np.pi * y))
        bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
               Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)]
        exact = lambda X, Y: np.sin(np.pi * X) * np.sin(np.pi * Y)
    else:                                   # tanh front at x0 = 0.7
        S, X0 = 60.0, 0.7
        th = lambda e: npde.tanh(S * (e - X0))
        f = ((-2 * S**2) * th(x) * (1.0 - th(x) ** 2) * npde.sin(np.pi * y)
             - np.pi**2 * th(x) * npde.sin(np.pi * y))
        eq = Eq(Dxx(u(x, y)) + Dyy(u(x, y)), f)
        bcs = [Eq(u(0.0, y), float(np.tanh(-S * X0)) * npde.sin(np.pi * y)),
               Eq(u(1.0, y),
                  float(np.tanh(S * (1 - X0))) * npde.sin(np.pi * y)),
               Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)]
        exact = lambda X, Y: np.tanh(S * (X - X0)) * np.sin(np.pi * Y)
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    disc = PhysicsInformedNN(mlp([2, 64, 64, 1]), strategy,
                             derivative="jet", seed=seed)
    return system, disc, discretize(system, disc), exact


def rel_l2(prob, theta, exact):
    import jax.numpy as jnp

    xs = np.linspace(0, 1, 201)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    cord = jnp.asarray(np.stack([X.ravel(), Y.ravel()]))
    pred = np.asarray(prob.pinnrep.phi(cord, theta["depvar"])).ravel()
    want = exact(X, Y).ravel()
    return float(np.linalg.norm(pred - want) / np.linalg.norm(want))


def timed_train(prob, budget, lr, chunk=100, seed=0):
    """Train until `budget` seconds of WARM wall: one untimed warm-up call,
    then timed `chunk`-step scans.  Returns (theta, steps, warm_wall)."""
    import jax
    import jax.numpy as jnp
    import optax

    from neuralpde_tpu.train import make_step

    opt = optax.adam(lr)
    lf = prob.pinnrep.loss_functions
    step = make_step(prob.loss, opt, prob.pinnrep.adaloss,
                     lf.pde_loss_functions, lf.bc_loss_functions)
    theta = prob.init_params
    n_pde = len(lf.pde_loss_functions)
    n_bc = len(lf.bc_loss_functions)
    ada = prob.pinnrep.adaloss.init_state(n_pde, n_bc, prob.pinnrep.dtype)
    carry = (theta, opt.init(theta), ada, jnp.asarray(0, jnp.int32))
    key = jax.random.key(seed)

    def multi(carry, key):
        def body(c, _):
            return step(c, key)
        carry, (losses, _) = jax.lax.scan(body, carry, None, length=chunk)
        return carry, losses[-1]

    jm = jax.jit(multi)
    carry, loss = jm(carry, key)          # warm-up (compile, untimed)
    jax.block_until_ready(loss)
    steps, wall = chunk, 0.0
    while wall < budget:
        t0 = time.perf_counter()
        carry, loss = jm(carry, key)
        jax.block_until_ready(loss)
        wall += time.perf_counter() - t0
        steps += chunk
    return carry[0], steps, wall, float(loss)


def run_fixed(kind, strategy_fn, budget, lr, seed):
    system, disc, prob, exact = build_problem(kind, strategy_fn(), seed)
    theta, steps, wall, loss = timed_train(prob, budget, lr, seed=seed)
    return {"rel_l2": rel_l2(prob, theta, exact), "steps": steps,
            "wall_s": round(wall, 2), "final_loss": loss}


def run_adaptive(kind, strategy_fn, budget, lr, rounds, seed):
    """solve_weak_adaptive under the same TOTAL warm wall budget: each round
    gets budget/rounds of timed training; refine/relower time between rounds
    is charged against the budget (compiles still excluded, as everywhere)."""
    from neuralpde_tpu import PhysicsInformedNN, discretize, mlp, refine_weak

    system, disc, prob, exact = build_problem(kind, strategy_fn(), seed)
    per_round = budget / rounds
    total_steps, total_wall = 0, 0.0
    theta = None
    for r in range(rounds):
        theta, steps, wall, loss = timed_train(prob, per_round, lr, seed=seed)
        total_steps += steps
        total_wall += wall
        if r == rounds - 1:
            break
        t0 = time.perf_counter()
        strat2 = refine_weak(prob, theta, frac=0.3, mode="hp")
        host = time.perf_counter() - t0     # scoring incl. its compile
        total_wall += host
        disc2 = PhysicsInformedNN(mlp([2, 64, 64, 1]), strat2,
                                  derivative="jet", seed=seed)
        prob = discretize(system, disc2).with_params(theta)
    return {"rel_l2": rel_l2(prob, theta, exact), "steps": total_steps,
            "wall_s": round(total_wall, 2), "final_loss": loss}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=20.0,
                    help="warm wall-clock seconds per config")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--out", default=None, help="write JSON rows here too")
    args = ap.parse_args()

    from neuralpde_tpu import GridTraining, WeakTraining

    # matched residual-node counts per problem: weak E*q nodes/axis == grid
    GEOM = {"smooth": dict(E=16, K=8, q=12),    # 192/axis
            "front": dict(E=8, K=8, q=12)}      # 96/axis (mesh-bound front)

    def cfgs(kind):
        g = GEOM[kind]
        n = g["E"] * g["q"]
        out = [("strong", lambda: GridTraining(1.0 / (n - 1)), run_fixed)]
        for ibp in (0, 1, 2):
            out.append((f"weak ibp={ibp}",
                        lambda ibp=ibp: WeakTraining(
                            elements=g["E"], n_test=g["K"], quad=g["q"],
                            ibp=ibp), run_fixed))
        if kind == "front":
            out.append(("weak ibp=1 + hp-adaptive (3 rounds)",
                        lambda: WeakTraining(elements=g["E"], n_test=g["K"],
                                             quad=g["q"], ibp=1),
                        lambda *a: run_adaptive(*a[:4], 3, a[4])))
        return out

    rows = []
    for kind in ("smooth", "front"):
        for label, sf, runner in cfgs(kind):
            rels = []
            for seed in range(args.seeds):
                r = runner(kind, sf, args.budget, args.lr, seed)
                r.update(problem=kind, config=label, seed=seed)
                rows.append(r)
                rels.append(r["rel_l2"])
                print(json.dumps(r), flush=True)
            print(f"## {kind:6s} {label:34s} median rel L2 "
                  f"{float(np.median(rels)):.4g}  (n={len(rels)})",
                  flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
