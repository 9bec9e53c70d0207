"""2-D Navier-Stokes (decaying turbulence) operator with PINOPDE: one FNO3D
learns the map from a random initial vorticity field to the full space-time
flow (beyond reference — the reference's PINO surface is ODE-only,
src/pino_ode_solve.jl; this is the classic FNO Navier-Stokes benchmark
shape, Li et al. 2021 §5.3, trained PHYSICS-INFORMED: no solver data).

Vorticity-streamfunction form on the periodic unit torus:

    w_t + s*(psi_y w_x - psi_x w_y) = nu (w_xx + w_yy)
    s*(psi_xx + psi_yy) + w = 0
    w(x, y, 0) = w0(x, y)                (GRF sample, zero mean)

with `s` a fixed stream-function rescaling (psi_phys = s*psi) keeping both
FNO output channels O(1): for vorticity of std sigma at length scale l,
psi_phys ~ sigma (l/2pi)^2 << sigma.  The operator input is the sampled
w0 as a function-valued channel; both equations, the IC and the periodic
pairs lower onto the training tensor grid through `compile/fieldgrid.py`.
The gauge nullspace of the periodic Poisson equation (psi + const) is
pinned by an `additional_loss` on the per-slice mean of psi.

Ground truth per held-out IC comes from an in-script Fourier pseudo-
spectral vorticity solver (integrating-factor RK4, 2/3-rule dealiasing).

Measured (this config, 8000 iters): mean rel L2 0.049 over 4 held-out GRF
initial vorticities vs the spectral solver, 54 min on one CPU core; on one
TPU v5e chip, 264.5 s (12.3×) at rel L2 0.0614 over 8 held-out ICs — WITH
--precision highest, which is essential on TPU (default bf16 matmul passes
stall the loss 120× higher; PERF.md "PINOPDE operator families").

Run: python examples/ns_vorticity_pino.py [--iters 8000] [--cpu]
     python examples/ns_vorticity_pino.py --precision highest   # on TPU
     python examples/ns_vorticity_pino.py --check   # spectral solver only
"""
import argparse
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neuralpde_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def reference_ns_vorticity(w0, nu, ts, n=128, substeps=16):
    """Pseudo-spectral 2-D vorticity solver on [0,1)^2: w0 is (X, Y) on a
    uniform grid INCLUDING both endpoints (wrap node dropped internally,
    spectrally resampled to n x n); returns (X, Y, T) at the input grid
    nodes for uniformly-spaced `ts` (integrating-factor RK4 in the
    diffusion term, 2/3-rule dealiased advection)."""
    m = w0.shape[0] - 1
    wh = np.fft.rfft2(w0[:-1, :-1])
    # spectral up/resample m x m -> n x n
    vh = np.zeros((n, n // 2 + 1), dtype=complex)
    half = min(m, n) // 2
    vh[:half, :half + 1] = wh[:half, :half + 1]
    vh[-half:, :half + 1] = wh[-half:, :half + 1]
    vh *= (n / m) ** 2

    kx = 2 * np.pi * np.fft.fftfreq(n, d=1.0 / n)[:, None]
    ky = 2 * np.pi * np.fft.rfftfreq(n, d=1.0 / n)[None, :]
    k2 = kx**2 + ky**2
    k2_inv = np.where(k2 > 0, 1.0 / np.where(k2 > 0, k2, 1.0), 0.0)
    kcut = (2 / 3) * np.pi * n
    dealias = (np.abs(kx) <= kcut) & (np.abs(ky) <= kcut)
    dt = (ts[1] - ts[0]) / substeps
    E = np.exp(-nu * k2 * dt / 2)
    E2 = E * E

    def rhs(v):
        ph = v * k2_inv                       # psi_hat (Delta psi = -w)
        u = np.fft.irfft2(1j * ky * ph, s=(n, n))      # u = psi_y
        vvel = np.fft.irfft2(-1j * kx * ph, s=(n, n))  # v = -psi_x
        wx = np.fft.irfft2(1j * kx * v, s=(n, n))
        wy = np.fft.irfft2(1j * ky * v, s=(n, n))
        return -np.fft.rfft2(u * wx + vvel * wy) * dealias * dt

    out = []
    idx = np.round(np.linspace(0, n, m + 1)).astype(int) % n
    v = vh
    for i in range(len(ts)):
        if i > 0:
            for _ in range(substeps):
                a = rhs(v)
                b = rhs(E * (v + a / 2))
                c = rhs(E * v + b / 2)
                d = rhs(E2 * v + E * c)
                v = E2 * v + (E2 * a + 2 * E * (b + c) + d) / 6
        w = np.fft.irfft2(v, s=(n, n))
        out.append(w[np.ix_(idx, idx)])
    return np.stack(out, axis=-1)            # (X, Y, T)


def check_reference():
    """Self-check of the spectral solver: (a) zero-advection limit matches
    the exact heat decay, (b) grid/substep refinement converges."""
    rng = np.random.default_rng(0)
    m = 32
    g = np.linspace(0, 1, m + 1)
    X, Y = np.meshgrid(g, g, indexing="ij")
    w0 = (np.sin(2 * np.pi * X) * np.cos(4 * np.pi * Y)
          + 0.5 * np.cos(2 * np.pi * (X + Y)))
    ts = np.linspace(0, 0.5, 6)
    nu = 0.02
    # single-mode field: advection of sin(2pix)cos(...) is nonzero, so
    # compare the full solver at two resolutions instead
    a = reference_ns_vorticity(w0, nu, ts, n=64, substeps=8)
    b = reference_ns_vorticity(w0, nu, ts, n=128, substeps=32)
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    print(f"[check] refinement rel diff {rel:.2e}")
    assert rel < 1e-6, rel
    # pure-diffusion limit: single Fourier mode, exact decay
    w1 = np.sin(2 * np.pi * X)                      # advection term vanishes
    c = reference_ns_vorticity(w1, nu, ts, n=64, substeps=8)
    want = w1[:, :, None] * np.exp(-nu * (2 * np.pi) ** 2 * ts)[None, None, :]
    rel = np.linalg.norm(c - want) / np.linalg.norm(want)
    print(f"[check] heat-limit rel err {rel:.2e}")
    assert rel < 1e-10, rel
    print("[check] spectral reference OK")


def build_system(nu, s, tmax):
    """Symbolic vorticity-streamfunction system + GRF family (shared with
    the CI test)."""
    import neuralpde_tpu as npde
    from neuralpde_tpu import (
        DepVar, Differential, Domain, Eq, Interval, PDESystem, symbols,
    )

    x, y, t = symbols("x y t")
    w, psi, w0 = DepVar("w"), DepVar("psi"), DepVar("w0")
    Dt = Differential(t)
    Dx, Dy = Differential(x), Differential(y)
    Dxx, Dyy = Differential(x) ** 2, Differential(y) ** 2
    W, PSI = w(x, y, t), psi(x, y, t)
    eqs = [
        Eq(Dt(W) + s * (Dy(PSI) * Dx(W) - Dx(PSI) * Dy(W)),
           nu * (Dxx(W) + Dyy(W))),
        Eq(s * (Dxx(PSI) + Dyy(PSI)) + W, 0.0),
    ]
    bcs = [Eq(w(x, y, 0.0), w0(x, y))]
    for f, F in ((w, W), (psi, PSI)):
        bcs += [Eq(f(0.0, y, t), f(1.0, y, t)),
                Eq(Dx(f(0.0, y, t)), Dx(f(1.0, y, t))),
                Eq(f(x, 0.0, t), f(x, 1.0, t)),
                Eq(Dy(f(x, 0.0, t)), Dy(f(x, 1.0, t)))]
    system = PDESystem(eqs, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1)),
                        Domain(t, Interval(0, tmax))],
                       ivs=[x, y, t], dvs=[W, PSI])
    return system, w0(x, y)


def zero_mean_grf(length_scale, variance):
    """GRF vorticity sampler with the zero-mean constraint the periodic
    Poisson equation needs (mean vorticity has no stream function on the
    torus; it is also conserved, so zero-mean stays zero-mean)."""
    import jax.numpy as jnp
    from neuralpde_tpu import GaussianRandomField

    grf = GaussianRandomField(length_scale=length_scale, variance=variance)

    def sampler(key, axis_grids, n):
        f = grf(key, axis_grids, n)
        return f - jnp.mean(f[:-1, :-1, :], axis=(0, 1))   # drop wrap nodes
    return sampler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--check", action="store_true")
    # on TPU the default f32 matmuls run bf16 passes (PERF.md round-3
    # finding); "highest" recovers CPU-class accuracy — measured on this
    # operator (one v5e, 8000 iters, 8 held-out ICs): default 0.1062
    # mean rel L2 / final loss 0.22 (floor-limited) vs highest 0.0614 /
    # loss 0.0018, at only +3% wall (257 -> 265 s; the FNO is
    # FFT-dominated, so true-f32 passes are nearly free here)
    ap.add_argument("--precision", default=None,
                    choices=[None, "default", "high", "highest"])
    args = ap.parse_args()
    if args.check:
        check_reference()
        return
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax
    from neuralpde_tpu import FNO3D, GridTraining, PINOPDE, solve_pino_pde

    NU, SIGMA, LSCALE, TMAX = 0.02, 3.0, 0.25, 0.5
    S = SIGMA * (LSCALE / (2 * np.pi)) ** 2 * 10   # psi-channel rescale
    system, w0_call = build_system(NU, S, TMAX)
    sampler = zero_mean_grf(LSCALE, SIGMA**2)

    gauge = lambda fields, theta: 10.0 * jnp.mean(
        jnp.mean(fields["psi"], axis=(0, 1)) ** 2)

    alg = PINOPDE(chain=FNO3D(1, width=16, modes=(8, 8, 4), depth=3,
                              out_channels=2),
                  opt=optax.adam(2e-3),
                  number_of_parameters=12,
                  input_functions={w0_call: sampler},
                  additional_loss=gauge,
                  matmul_precision=args.precision,
                  strategy=GridTraining([1 / 32, 1 / 32, TMAX / 8]))
    t0 = time.time()
    sol = solve_pino_pde(system, alg, maxiters=args.iters, inner_steps=50,
                         verbose=True)
    wall = time.time() - t0
    print(f"train wall {wall:.1f} s   final loss "
          f"{float(sol.original.objective):.3e}")

    # held-out GRF initial vorticities vs the spectral reference
    test_ic = np.asarray(sampler(jax.random.key(4242),
                                 [sol.grids[0], sol.grids[1]], 8))
    pred = np.asarray(sol(input_values={"w0": jnp.asarray(test_ic)}))
    ts = np.asarray(sol.grids[2])
    rels = []
    for j in range(test_ic.shape[-1]):
        want = reference_ns_vorticity(test_ic[:, :, j], NU, ts)
        got = pred[0, :, :, :, j]                       # vorticity channel
        rels.append(np.linalg.norm(got - want) / np.linalg.norm(want))
        print(f"  IC {j}: rel L2(w) {rels[-1]:.4f}")
    print(f"mean rel L2 over held-out ICs: {np.mean(rels):.4f}")


if __name__ == "__main__":
    main()
