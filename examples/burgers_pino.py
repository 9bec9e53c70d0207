"""Parametric viscous Burgers with PINOPDE: one FNO2D learns the viscosity
family (beyond reference — the reference's PINO surface is ODE-only,
src/pino_ode_solve.jl).

    u_t + u u_x = nu u_xx,  x in [0,1] periodic,  t in [0, 0.5]
    u(x, 0) = sin(2 pi x),  nu in [0.05, 0.3]

The operator maps the scalar viscosity to the full space-time solution
field; the physics loss lowers the symbolic system onto the training
tensor grid through `compile/fieldgrid.py` (grid-axis FD of the evaluated
field, periodic pair + periodic-derivative pair as boundary slices).
Ground truth per test viscosity comes from an in-script Fourier
pseudo-spectral RK4 solver (256 modes, dt 2e-4).

Evaluation: rel L2 over 7 held-out viscosities in [0.07, 0.27] on a
257x65 grid (2x the training resolution in each axis) against the
spectral reference.

Run: python examples/burgers_pino.py [--iters 8000] [--cpu]
"""
import argparse
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neuralpde_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def reference_burgers(nu, xs, ts, n_modes=256, substeps=32):
    """Fourier pseudo-spectral integrating-factor RK4 on [0, 1):
    u_t = -(u^2/2)_x + nu u_xx, diffusion integrated exactly in Fourier
    space (Trefethen's IF-RK4 scheme), 2/3-rule dealiasing.  `ts` must be
    uniformly spaced; each output interval is split into `substeps` RK4
    steps."""
    n = n_modes
    xg = np.arange(n) / n
    k = 2 * np.pi * np.fft.rfftfreq(n, d=1.0 / n)
    dealias = (k <= (2 / 3) * np.pi * n).astype(float)
    dt = (ts[1] - ts[0]) / substeps
    E = np.exp(-nu * k**2 * dt / 2)
    E2 = E * E

    def Nh(v):
        u = np.fft.irfft(v, n=n)
        return -0.5j * k * dealias * np.fft.rfft(u * u) * dt

    v = np.fft.rfft(np.sin(2 * np.pi * xg))
    out = []
    for i in range(len(ts)):
        if i > 0:
            for _ in range(substeps):
                a = Nh(v)
                b = Nh(E * (v + a / 2))
                c = Nh(E * v + b / 2)
                d = Nh(E2 * v + E * c)
                v = E2 * v + (E2 * a + 2 * E * (b + c) + d) / 6
        u = np.fft.irfft(v, n=n)
        out.append(np.interp(xs, np.append(xg, 1.0), np.append(u, u[0])))
    return np.stack(out, axis=1)        # (X, T)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import optax
    from neuralpde_tpu import (
        Differential, Domain, Eq, FNO2D, GridTraining, Interval, PDESystem,
        PINOPDE, parameters, solve_pino_pde, symbols,
    )
    import neuralpde_tpu as npde

    x, t = symbols("x t")
    nu = parameters("nu")
    u = npde.DepVar("u")
    Dt, Dx, Dxx = Differential(t), Differential(x), Differential(x) ** 2
    U = u(x, t)
    eq = Eq(Dt(U) + U * Dx(U), nu * Dxx(U))
    bcs = [
        Eq(u(x, 0.0), npde.sin(2 * np.pi * x)),
        Eq(u(0.0, t), u(1.0, t)),                 # periodic pair
        Eq(Dx(u(0.0, t)), Dx(u(1.0, t))),         # periodic derivative pair
    ]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)),
                        Domain(t, Interval(0, 0.5))],
                       ivs=[x, t], dvs=[U], ps=[nu])

    alg = PINOPDE(chain=FNO2D(1, width=32, modes=(16, 10), depth=4),
                  opt=optax.adam(2e-3), bounds=[(0.05, 0.3)],
                  number_of_parameters=24,
                  strategy=GridTraining([1 / 128, 1 / 64]))
    t0 = time.time()
    sol = solve_pino_pde(system, alg, maxiters=args.iters, inner_steps=50,
                         verbose=True)
    wall = time.time() - t0
    print(f"train wall {wall:.1f} s   final loss "
          f"{float(sol.original.objective):.3e}")

    # held-out viscosities, 2x-transferred evaluation grid
    xs, ts = np.linspace(0, 1, 257), np.linspace(0, 0.5, 65)
    nus = np.linspace(0.07, 0.27, 7)
    pred = np.asarray(sol(p=nus[None, :], grids=[xs, ts]))    # (X, T, P)
    rels = []
    for j, v in enumerate(nus):
        want = reference_burgers(float(v), xs, ts)
        rels.append(np.linalg.norm(pred[:, :, j] - want)
                    / np.linalg.norm(want))
        print(f"  nu={v:.3f}  rel L2 {rels[-1]:.4f}")
    print(f"mean rel L2 over the held-out family: {np.mean(rels):.4f}")


if __name__ == "__main__":
    main()
