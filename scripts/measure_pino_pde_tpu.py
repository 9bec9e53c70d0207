"""TPU wall/throughput measurement for the PINOPDE operator families
(fills the PERF.md rows deferred when the round-4 session lost the TPU
tunnel).  Measures, on one chip:

  * heat family (FNO2D w16 m6 d2, 17x17 grid x 10 params): train wall to
    the PERF accuracy row's budget (800 iters) + warm per-step time +
    family-points/sec (grid points x params per optimizer step).
  * 2-D heat family (FNO3D w12 m5 d2, 9x9x9 x 6): same, 400 iters.
  * large-family throughput probe: heat operator at 65x65 x 256 params —
    the serving-scale shape (one step trains the whole family at once).

Each timing excludes compile (one warm-up step chunk first), then times
`inner_steps`-length scanned chunks, reporting the median of 5.

Run: python scripts/measure_pino_pde_tpu.py
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neuralpde_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import optax

from neuralpde_tpu import FNO2D, FNO3D, GridTraining, PDESystem, PINOPDE, \
    solve_pino_pde
from neuralpde_tpu.symbolic import expr as E
from neuralpde_tpu.symbolic.system import Domain, Interval

PI = float(np.pi)


def heat_system():
    x, t = E.Sym("x"), E.Sym("t")
    nu, u = E.Param("nu"), E.DepVar("u")
    eq = E.Eq(E.Deriv(u(x, t), (t,)), nu * E.Deriv(u(x, t), (x, x)))
    bcs = [E.Eq(u(x, E.Num(0.0)), E.sin(E.Num(PI) * x)),
           E.Eq(u(E.Num(0.0), t), E.Num(0.0)),
           E.Eq(u(E.Num(1.0), t), E.Num(0.0))]
    return PDESystem(eq, bcs,
                     [Domain(x, Interval(0.0, 1.0)),
                      Domain(t, Interval(0.0, 1.0))],
                     ivs=[x, t], dvs=[u(x, t)], ps=[nu])


def heat2d_system():
    x, y, t = E.Sym("x"), E.Sym("y"), E.Sym("t")
    nu, u = E.Param("nu"), E.DepVar("u")
    U = u(x, y, t)
    eq = E.Eq(E.Deriv(U, (t,)),
              nu * (E.Deriv(U, (x, x)) + E.Deriv(U, (y, y))))
    bcs = [E.Eq(u(x, y, E.Num(0.0)),
                E.sin(E.Num(PI) * x) * E.sin(E.Num(PI) * y)),
           E.Eq(u(E.Num(0.0), y, t), E.Num(0.0)),
           E.Eq(u(E.Num(1.0), y, t), E.Num(0.0)),
           E.Eq(u(x, E.Num(0.0), t), E.Num(0.0)),
           E.Eq(u(x, E.Num(1.0), t), E.Num(0.0))]
    return PDESystem(eq, bcs,
                     [Domain(x, Interval(0.0, 1.0)),
                      Domain(y, Interval(0.0, 1.0)),
                      Domain(t, Interval(0.0, 1.0))],
                     ivs=[x, y, t], dvs=[U], ps=[nu])


def run(name, sysd, alg, maxiters, inner, grid_pts, n_params, accuracy=None):
    t0 = time.time()
    sol = solve_pino_pde(sysd, alg, maxiters=inner, inner_steps=inner)
    compile_and_first = time.time() - t0
    # warm per-chunk timing on the SAME program shape
    t0 = time.time()
    sol = solve_pino_pde(sysd, alg, maxiters=maxiters, inner_steps=inner)
    train_wall = time.time() - t0
    chunks = []
    for _ in range(5):
        t0 = time.time()
        solve_pino_pde(sysd, alg, maxiters=inner, inner_steps=inner)
        chunks.append(time.time() - t0)
    per_step = float(np.median(chunks)) / inner
    fam_pts = grid_pts * n_params / per_step
    line = (f"{name}: first-chunk(incl compile) {compile_and_first:.1f} s, "
            f"train({maxiters} it) {train_wall:.1f} s warm, "
            f"per-step {per_step*1e3:.2f} ms, "
            f"family-points/s {fam_pts/1e6:.1f}M")
    if accuracy is not None:
        line += f", rel L2 {accuracy(sol):.4f}"
    print(line, flush=True)
    return sol


def heat_accuracy(sol):
    gx, gt = np.linspace(0, 1, 33), np.linspace(0, 1, 33)
    ps = np.linspace(0.1, 0.45, 7)
    pred = np.asarray(sol(p=ps[None, :], grids=[gx, gt]))
    want = (np.exp(-ps[None, None, :] * PI**2 * gt[None, :, None])
            * np.sin(PI * gx[:, None, None]))
    return np.linalg.norm(pred - want) / np.linalg.norm(want)


def main():
    print("devices:", jax.devices(), flush=True)
    sysd = heat_system()

    alg = PINOPDE(chain=FNO2D(1, width=16, modes=6, depth=2),
                  opt=optax.adam(3e-3), bounds=[(0.05, 0.5)],
                  number_of_parameters=10, strategy=GridTraining(1 / 16))
    run("heat 17^2 x10 (PERF accuracy budget)", sysd, alg, 800, 25,
        17 * 17, 10, accuracy=heat_accuracy)

    alg3 = PINOPDE(chain=FNO3D(1, width=12, modes=5, depth=2),
                   opt=optax.adam(3e-3), bounds=[(0.05, 0.3)],
                   number_of_parameters=6, strategy=GridTraining(1 / 8))
    run("2-D heat 9^3 x6 (FNO3D)", heat2d_system(), alg3, 400, 25,
        9 * 9 * 9, 6)

    big = PINOPDE(chain=FNO2D(1, width=16, modes=6, depth=2),
                  opt=optax.adam(3e-3), bounds=[(0.05, 0.5)],
                  number_of_parameters=256, strategy=GridTraining(1 / 64))
    run("heat 65^2 x256 (serving-scale)", sysd, big, 100, 25,
        65 * 65, 256)


if __name__ == "__main__":
    main()
