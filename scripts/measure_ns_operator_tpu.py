"""Apples-to-apples NS vorticity operator benchmark (VERDICT r4 item 2+3).

One shared eval protocol for EVERY row — the r4 rows were not comparable
(CPU: 4 held-out ICs; TPU: 8 ICs; unexplained 0.049 vs 0.0614 gap):

* 8 held-out initial vorticities drawn ONCE from the zero-mean GRF on the
  canonical 65-node grid with key 4242, spectrally downsampled to each
  row's training grid (the GRF at l=0.25 is band-limited far below 16
  modes, so all rows see the SAME continuum ICs to machine precision).
* ground truth per IC from the example's pseudo-spectral IF-RK4 solver at
  n=128 with substep dt ~= 3.9e-3 for every row.
* metric: per-IC rel L2 of the vorticity over the row's space-time grid;
  scaled rows ALSO report the restriction to the base 33^2 x 9 node subset
  (65 = 2*32+1 and 17 = 2*8+1, so base nodes are every other scaled node)
  so base and scaled rows share one column.

Rows (select with --rows, comma-separated):
  base-fd          33^2 x 9 grid, FNO3D w16 m(8,8,4) d3, FD2 field derivs
                   (the r4 headline config re-run under this protocol)
  base-spectral    same + spectral_axes=(x, y)  (FFT derivatives of the
                   evaluated field on the periodic axes — Li et al. 2021
                   PINO; VERDICT item 3's A/B on the NS family)
  scaled-spectral  65^2 x 17 grid, FNO3D w20 m(12,12,6) d3, spectral x/y
                   (the >=64^2 Li et al. S5.3-shaped config, item 2)
  scaled-fd        scaled grid with FD2 (isolates the derivative effect
                   at the resolution where FD truncation should shrink)
  scaled-nu01      scaled-spectral at nu=0.01 (lower viscosity)

On TPU every row trains with matmul_precision="highest" (measured
essential in r4: default bf16 passes stall the loss 120x).  --cpu re-runs
a row on the CPU backend for the cross-backend column.

Run: python scripts/measure_ns_operator_tpu.py [--rows base-fd,...]
     python scripts/measure_ns_operator_tpu.py --rows base-fd --cpu
Emits one JSON line per row plus a summary table.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

NU, SIGMA, LSCALE, TMAX = 0.02, 3.0, 0.25, 0.5
EVAL_KEY, EVAL_N = 4242, 8

ROWS = {
    # name: (nx_elems, nt_elems, width, modes, nu, spectral)
    "base-fd":        (32, 8, 16, (8, 8, 4), NU, False),
    "base-spectral":  (32, 8, 16, (8, 8, 4), NU, True),
    "scaled-spectral": (64, 16, 20, (12, 12, 6), NU, True),
    "scaled-fd":      (64, 16, 20, (12, 12, 6), NU, False),
    "scaled-nu01":    (64, 16, 20, (12, 12, 6), 0.01, True),
}


def spectral_downsample(f, m_out):
    """(M+1, M+1) periodic field (wrap nodes included) -> (m_out+1, m_out+1)
    by Fourier truncation — exact for band-limited fields."""
    m_in = f.shape[0] - 1
    if m_in == m_out:
        return f
    fh = np.fft.rfft2(f[:-1, :-1])
    out = np.zeros((m_out, m_out // 2 + 1), dtype=complex)
    h = m_out // 2
    out[:h, :h + 1] = fh[:h, :h + 1]
    out[-h:, :h + 1] = fh[-h:, :h + 1]
    g = np.fft.irfft2(out, s=(m_out, m_out)) * (m_out / m_in) ** 2
    g = np.concatenate([g, g[:1]], axis=0)
    return np.concatenate([g, g[:, :1]], axis=1)


def canonical_eval_ics():
    """The 8 shared held-out ICs on the canonical 65-grid."""
    import jax
    import jax.numpy as jnp
    from ns_vorticity_pino import zero_mean_grf

    g65 = jnp.linspace(0.0, 1.0, 65)
    sampler = zero_mean_grf(LSCALE, SIGMA**2)
    return np.asarray(sampler(jax.random.key(EVAL_KEY), [g65, g65], EVAL_N))


def run_row(name, iters, eval65):
    import jax
    import jax.numpy as jnp
    import optax
    from neuralpde_tpu import FNO3D, GridTraining, PINOPDE, solve_pino_pde
    from ns_vorticity_pino import (build_system, reference_ns_vorticity,
                                   zero_mean_grf)

    nxe, nte, width, modes, nu, spectral = ROWS[name]
    s = SIGMA * (LSCALE / (2 * np.pi)) ** 2 * 10
    system, w0_call = build_system(nu, s, TMAX)
    sampler = zero_mean_grf(LSCALE, SIGMA**2)
    gauge = lambda fields, theta: 10.0 * jnp.mean(
        jnp.mean(fields["psi"], axis=(0, 1)) ** 2)
    on_tpu = jax.devices()[0].platform != "cpu"
    x, y = system.ivs[0], system.ivs[1]
    alg = PINOPDE(chain=FNO3D(1, width=width, modes=modes, depth=3,
                              out_channels=2),
                  opt=optax.adam(2e-3),
                  number_of_parameters=12,
                  input_functions={w0_call: sampler},
                  additional_loss=gauge,
                  matmul_precision="highest" if on_tpu else None,
                  spectral_axes=(x, y) if spectral else None,
                  strategy=GridTraining([1 / nxe, 1 / nxe, TMAX / nte]))
    t0 = time.time()
    sol = solve_pino_pde(system, alg, maxiters=iters, inner_steps=50,
                         verbose=True)
    wall = time.time() - t0

    test_ic = np.stack([spectral_downsample(eval65[:, :, j], nxe)
                        for j in range(EVAL_N)], axis=-1)
    pred = np.asarray(sol(input_values={"w0": jnp.asarray(test_ic)}))
    ts = np.asarray(sol.grids[2])
    rels, rels_sub = [], []
    for j in range(EVAL_N):
        want = reference_ns_vorticity(test_ic[:, :, j], nu, ts)
        got = pred[0, :, :, :, j]
        rels.append(float(np.linalg.norm(got - want)
                          / np.linalg.norm(want)))
        if nxe > 32:        # restriction to the base 33^2 x 9 node subset
            st = (nxe // 32, nxe // 32, nte // 8)
            gs, ws = got[::st[0], ::st[1], ::st[2]], \
                want[::st[0], ::st[1], ::st[2]]
            rels_sub.append(float(np.linalg.norm(gs - ws)
                                  / np.linalg.norm(ws)))
    rec = {"row": name, "backend": jax.devices()[0].platform,
           "grid": f"{nxe + 1}^2x{nte + 1}", "nu": nu,
           "derivative": "spectral-xy" if spectral else "fd2",
           "width": width, "modes": list(modes), "iters": iters,
           "wall_s": round(wall, 1),
           "final_loss": float(sol.original.objective),
           "per_ic_rel_l2": [round(r, 4) for r in rels],
           "mean_rel_l2": round(float(np.mean(rels)), 4),
           "eval_protocol": f"{EVAL_N} ICs key {EVAL_KEY} on 65-grid"}
    if rels_sub:
        rec["mean_rel_l2_base_subset"] = round(float(np.mean(rels_sub)), 4)
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="base-fd,base-spectral,scaled-spectral")
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/neuralpde_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    eval65 = canonical_eval_ics()
    recs = []
    for name in args.rows.split(","):
        name = name.strip()
        if name not in ROWS:
            raise SystemExit(f"unknown row {name!r}; have {sorted(ROWS)}")
        print(f"=== {name} ===", flush=True)
        recs.append(run_row(name, args.iters, eval65))
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(recs[-1]) + "\n")

    print("\nrow                 backend  grid       deriv        "
          "mean relL2   wall")
    for r in recs:
        sub = (f"  (base subset {r['mean_rel_l2_base_subset']})"
               if "mean_rel_l2_base_subset" in r else "")
        print(f"{r['row']:<19} {r['backend']:<8} {r['grid']:<10} "
              f"{r['derivative']:<12} {r['mean_rel_l2']:<12} "
              f"{r['wall_s']}s{sub}")


if __name__ == "__main__":
    main()
