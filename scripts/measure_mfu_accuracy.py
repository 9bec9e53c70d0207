"""Where the MFU story and an accuracy story meet (VERDICT r4 item 6).

PERF.md's roofline table shows sustained MFU rising with dense width
(w64 17% -> w128 33% -> w256 52% at each width's own microbatch sweet
spot), but every ACCURACY recipe ships at w64-w128 — no artifact reports
rel L2 + wall + MFU for one run.  This script closes that gap on the
flagship dense recipe (Allen-Cahn causal-continuation, the
examples/allen_cahn_causal.py setup) by training each width at EQUAL
WALL-CLOCK and reporting all three columns per row:

  row = (hidden width w, collocation batch)
      -> rel L2 vs spectral truth, train wall, sustained TFLOP/s, MFU

Protocol:
* per row, the warm step time is calibrated first (two short solves; the
  second hits the persistent compile cache), then the row's iteration
  budget is set to the shared wall target and split 30/30/40 over the
  eps = 1 -> 10 -> 100 causal-continuation stages (warm-starting params
  across stages, fresh Adam per stage — the recipe's own schedule);
* FLOPs/step come from XLA cost analysis of the un-scanned jitted
  value_and_grad of the stage-1 loss (the optimizer update is negligible);
  sustained TFLOP/s = FLOPs/step x executed steps / measured train wall;
  MFU divides by the measured 123-TFLOP/s default-precision matmul ceiling
  (scripts/probe_matmul_peak.py) - the same convention as bench.py;
* all rows share seed, truth grid, and eval protocol.

The question answered: does the flagship accuracy recipe benefit from
moving into the high-MFU width regime at a fixed time budget, or do narrow
nets converge better per FLOP?  Either answer ships in PERF.md with these
numbers.

Run: python scripts/measure_mfu_accuracy.py [--budget 240] [--rows ...]
Emits one JSON line per row + a summary table.
"""
from __future__ import annotations

import argparse
import faulthandler
import json
import os
import signal
import sys
import time

import numpy as np

faulthandler.register(signal.SIGUSR1)   # kill -USR1 <pid> dumps all stacks


def _log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MEASURED_MATMUL_TFLOPS = 123.0   # scripts/probe_matmul_peak.py (PERF.md)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=240.0,
                    help="train wall target per row, seconds")
    ap.add_argument("--rows", default="64:8192,128:8192,256:8192,256:65536",
                    help="comma list of width:batch rows")
    ap.add_argument("--inner", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/neuralpde_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import neuralpde_tpu as npde
    from neuralpde_tpu import (
        CausalTraining, Chain, DepVar, Differential, Domain, Eq, Interval,
        NonAdaptiveLoss, PDESystem, PeriodicEmbedding, PhysicsInformedNN,
        discretize, mlp, solve, symbols,
    )
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from allen_cahn_spinn import ground_truth

    _log("computing spectral ground truth")
    xg, ts, U = ground_truth()
    _log("ground truth done")
    Xg, Tg = np.meshgrid(xg, ts, indexing="ij")
    cord = jnp.asarray(np.stack([Xg.ravel(), Tg.ravel()]), jnp.float32)
    want = jnp.asarray(U.T.reshape(-1), jnp.float32)

    x, t = symbols("x t")
    u = DepVar("u")
    Dt, Dx = Differential(t), Differential(x)
    eq = Eq(Dt(u(x, t)), 1e-4 * (Dx ** 2)(u(x, t))
            + 5.0 * (u(x, t) - u(x, t) ** 3))
    bcs = [Eq(u(x, 0.0), x ** 2 * npde.cos(np.pi * x)),
           Eq(u(-1.0, t), u(1.0, t)),
           Eq(Dx(u(-1.0, t)), Dx(u(1.0, t)))]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(-1, 1)), Domain(t, Interval(0, 1))],
                       [x, t], [u(x, t)])

    stages = [(1.0, 1e-3, 0.3), (10.0, 5e-4, 0.3), (100.0, 2e-4, 0.4)]

    def make_disc(width, batch, eps):
        net = Chain(PeriodicEmbedding(2, axis=0, period=2.0, n_modes=10),
                    *mlp([21, width, width, width, width, 1]).layers)
        strat = CausalTraining(batch, t, bcs_points=1024, n_slabs=32,
                               causal_eps=eps)
        return PhysicsInformedNN(net, strat, derivative="jet",
                                 adaptive_loss=NonAdaptiveLoss(
                                     bc_loss_weights=[100.0, 1.0, 1.0]))

    def flops_per_step(prob):
        """XLA cost analysis of one un-scanned value_and_grad of the loss."""
        theta = prob.init_params
        lf = prob.pinnrep.loss_functions
        ada = prob.pinnrep.adaloss.init_state(
            len(lf.pde_loss_functions), len(lf.bc_loss_functions),
            prob.pinnrep.dtype)
        lstate = {"key": jax.random.key(0), "adaptive": ada}

        def step(th):
            (l, _), g = jax.value_and_grad(prob.loss, has_aux=True)(th, lstate)
            return l, g

        try:
            ca = jax.jit(step).lower(theta).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            f = float(ca["flops"])
            return f if f > 0 else None
        except Exception:
            return None

    inner = args.inner
    results = []
    for spec in args.rows.split(","):
        width, batch = (int(v) for v in spec.split(":"))
        # --- calibrate warm step time on the stage-1 program -------------
        # two-point chunk differencing: each solve() builds a fresh jit
        # closure (compile/cache-lookup cost is NOT reliably zero on the
        # second call), so time a 1-chunk and a 3-chunk run and difference
        # them — the per-call constant cancels
        _log(f"row w{width} b{batch}: compiling + warming stage-1 program")
        disc = make_disc(width, batch, stages[0][0])
        prob = discretize(system, disc)
        solve(prob, optax.adam(1e-3), maxiters=inner, inner_steps=inner)
        _log("warm; calibrating step time")
        t0 = time.perf_counter()
        solve(prob, optax.adam(1e-3), maxiters=inner, inner_steps=inner)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        solve(prob, optax.adam(1e-3), maxiters=3 * inner, inner_steps=inner)
        t_long = time.perf_counter() - t0
        dt_iter = max(t_long - t_short, 1e-9) / (2 * inner)
        _log(f"step {dt_iter*1e6:.1f} us; running XLA cost analysis")
        fps = flops_per_step(prob)
        _log(f"flops/step {fps}")

        total_iters = max(3 * inner,
                          int(args.budget / dt_iter / inner) * inner)
        # --- train: eps continuation, budget split 30/30/40 --------------
        theta, executed, wall = None, 0, 0.0
        for eps, lr, frac in stages:
            its = max(inner, int(total_iters * frac / inner) * inner)
            _log(f"stage eps={eps} lr={lr}: {its} iters")
            disc = make_disc(width, batch, eps)
            prob = discretize(system, disc)
            if theta is not None:
                prob = prob.with_params(theta)
            # warm the stage program untimed with the SAME scan length as the
            # timed chunks (a shorter scan is a different program — the stage
            # compile would otherwise land inside the timed wall); the warm
            # run's params are discarded
            solve(prob, optax.adam(lr), maxiters=inner, inner_steps=inner)
            t0 = time.perf_counter()
            theta = solve(prob, optax.adam(lr), maxiters=its,
                          inner_steps=inner).u
            wall += time.perf_counter() - t0
            executed += its
        pred = disc.phi(cord, theta["depvar"])[0]
        rel = float(jnp.linalg.norm(pred - want) / jnp.linalg.norm(want))
        tflops = (fps * executed / wall / 1e12) if fps else None
        row = {"width": width, "batch": batch, "iters": executed,
               "wall_s": round(wall, 1), "rel_l2": round(rel, 5),
               "step_us": round(dt_iter * 1e6, 1),
               "flops_per_step": fps,
               "tflops": round(tflops, 2) if tflops else None,
               "mfu_pct": round(100 * tflops / MEASURED_MATMUL_TFLOPS, 1)
               if tflops else None}
        print(json.dumps(row), flush=True)
        results.append(row)

    print("\nwidth  batch   iters    wall     rel L2   TFLOP/s   MFU%")
    for r in results:
        print(f"{r['width']:5d}  {r['batch']:6d}  {r['iters']:6d}  "
              f"{r['wall_s']:6.1f}s  {r['rel_l2']:.5f}  "
              f"{r['tflops'] or float('nan'):7.2f}  "
              f"{r['mfu_pct'] or float('nan'):5.1f}")


if __name__ == "__main__":
    main()
