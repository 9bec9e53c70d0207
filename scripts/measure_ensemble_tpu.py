"""TPU cost measurement for deep-ensemble training (`solve_ensemble`):
does training N members as one vmapped program really cost ~one member's
wall-clock on a single chip while the batch is small, and where does it
cross over?

Measures, on one chip (2-D Poisson, MLP 2x64x64x1, GridTraining 64^2):
  * solo `solve` warm per-step time
  * `solve_ensemble` warm per-step time at n = 2, 4, 8, 16
  * the per-member efficiency n * t_solo / t_ensemble(n)

Small PINN steps are dispatch/HBM-bound, so vmapped members should ride
along nearly free until the fused batch fills the chip.

Run: python scripts/measure_ensemble_tpu.py
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neuralpde_tpu_jax_cache")
# threshold 0: every call to solve()/solve_ensemble() builds a FRESH jit
# closure (new cache entry, full recompile) — caching even fast-compiling
# programs lets repeat calls hit the disk cache so the two-point timing
# below measures steps, not trace/compile
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import optax

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, GridTraining, Interval, PDESystem,
    PhysicsInformedNN, discretize, mlp, solve, solve_ensemble, symbols,
)


def poisson_prob():
    x, y = symbols("x y")
    u = DepVar("u")
    eq = Eq((Differential(x) ** 2)(u(x, y)) + (Differential(y) ** 2)(u(x, y)),
            -npde.sin(np.pi * x) * npde.sin(np.pi * y))
    bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
           Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    return discretize(system,
                      PhysicsInformedNN(mlp([2, 64, 64, 1]),
                                        GridTraining(1 / 63)))


CHUNK = 100


def per_step(run, reps=3, small=CHUNK, big=6 * CHUNK):
    """Two-point timing: each run() builds a fresh jit closure, so a single
    call pays trace + (cached) compile + dispatch no matter how many steps
    it scans.  Timing small- and big-iteration runs of the SAME chunked
    program shape (inner_steps fixed -> identical HLO, persistent-cache
    hit) and differencing cancels that per-call constant:
    t_step = (T(big) - T(small)) / (big - small)."""
    run(small)                               # compile + fill the disk cache
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(small)
        t1 = time.perf_counter()
        run(big)
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (big - small))
    return float(np.median(ts))


def main():
    print("devices:", jax.devices(), flush=True)
    prob = poisson_prob()
    t_solo = per_step(lambda it: solve(prob, optax.adam(1e-3), maxiters=it,
                                       inner_steps=CHUNK))
    print(f"solo: {t_solo*1e3:.3f} ms/step", flush=True)
    for n in (2, 4, 8, 16):
        t_ens = per_step(lambda it: solve_ensemble(
            prob, optax.adam(1e-3), maxiters=it, inner_steps=CHUNK,
            n_ensemble=n))
        eff = n * t_solo / t_ens
        print(f"n={n:2d}: {t_ens*1e3:.3f} ms/step  "
              f"({t_ens/t_solo:.2f}x solo; per-member efficiency "
              f"{eff:.1f}x)", flush=True)


if __name__ == "__main__":
    main()
