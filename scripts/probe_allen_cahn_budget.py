"""Probe: Allen-Cahn separable recipe at reduced iteration budgets, and the
clean default-vs-highest per-iteration cost (PERF.md anomaly: the r2/r3 A/B
showed 'highest' FASTER in wall — rerun with warm compiles + fixed budgets).

Prints one line per (precision, stage) with wall + rel L2.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/neuralpde_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")
from allen_cahn_spinn import build_net, ground_truth

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, Interval, NonAdaptiveLoss, PDESystem,
    PhysicsInformedNN, SeparableTraining, discretize, solve, symbols,
)


def run(precision, iters_per_stage, stages, rank=256, nodes=256):
    xg, ts, U = ground_truth()
    X, T = np.meshgrid(xg, ts, indexing="ij")
    cord = jnp.asarray(np.stack([X.ravel(), T.ravel()]), jnp.float32)
    want = jnp.asarray(U.T.reshape(-1), jnp.float32)

    x, t = symbols("x t")
    u = DepVar("u")
    eq = Eq(Differential(t)(u(x, t)),
            1e-4 * (Differential(x) ** 2)(u(x, t))
            + 5.0 * (u(x, t) - u(x, t) ** 3))
    bcs = [Eq(u(x, 0.0), x**2 * npde.cos(np.pi * x))]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(-1, 1)), Domain(t, Interval(0, 1))],
                       [x, t], [u(x, t)])
    net = build_net(rank)
    dx = 2.0 / (nodes - 1)
    dt_ = 1.0 / (nodes - 1)
    mp = "highest" if precision == "highest" else None

    theta = None
    # warm all stage compiles outside the timed region
    for eps, lr in stages:
        strat = SeparableTraining(dx=[dx, dt_], causal=t, causal_eps=eps)
        disc = PhysicsInformedNN(net, strat, dtype=jnp.float32,
                                 matmul_precision=mp,
                                 adaptive_loss=NonAdaptiveLoss(
                                     bc_loss_weights=[100.0]))
        prob = discretize(system, disc)
        solve(prob, optax.adam(lr), maxiters=1000, inner_steps=1000)

    t0 = time.perf_counter()
    for eps, lr in stages:
        strat = SeparableTraining(dx=[dx, dt_], causal=t, causal_eps=eps)
        disc = PhysicsInformedNN(net, strat, dtype=jnp.float32,
                                 matmul_precision=mp,
                                 adaptive_loss=NonAdaptiveLoss(
                                     bc_loss_weights=[100.0]))
        prob = discretize(system, disc)
        if theta is not None:
            prob = prob.with_params(theta)
        res = solve(prob, optax.adam(lr), maxiters=iters_per_stage,
                    inner_steps=1000)
        theta = res.u
        with jax.default_matmul_precision("highest"):
            pred = net.apply(theta["depvar"], cord)[0]
        rel = float(jnp.linalg.norm(pred - want) / jnp.linalg.norm(want))
        print(f"prec={precision} iters/stage={iters_per_stage} eps={eps}: "
              f"rel L2={rel:.4f} t={time.perf_counter()-t0:.1f}s", flush=True)
    return rel


if __name__ == "__main__":
    stages = [(100.0, 1e-3), (1e3, 5e-4), (1e4, 2e-4), (1e5, 1e-4)]
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 15000
    for prec in ("highest", "default"):
        run(prec, iters, stages)
