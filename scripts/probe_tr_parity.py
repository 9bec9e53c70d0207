"""TR-vs-LSQR wall parity probe (VERDICT r3 item 7) on the Poisson GN
frontier config (hard-constrained separable rank-24, 33^2 grid, f32,
matmul_precision="highest" defaults).

r3 measured TR at 43 s vs LSQR 13 s for the same floor class.  r4 changed
the TR driver: dtype-scaled truncated-CG early exit (advisor fix) and
in-loop model-value accumulation (no extra B(p) per outer iteration).
This probe re-times both warm and prints the floors + TR inner-iteration
total.

Run: python scripts/probe_tr_parity.py
"""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neuralpde_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, Interval, PDESystem, PhysicsInformedNN,
    SeparableNet, SeparableTraining, Transformed, discretize, mlp,
    solve_gauss_newton, symbols,
)


def build():
    x, y = symbols("x y")
    u = DepVar("u")
    eq = Eq((Differential(x) ** 2)(u(x, y)) + (Differential(y) ** 2)(u(x, y)),
            -npde.sin(np.pi * x) * npde.sin(np.pi * y))
    sys_ = PDESystem(eq, [], [Domain(x, Interval(0, 1)),
                              Domain(y, Interval(0, 1))], [x, y], [u(x, y)])
    hard = lambda c, o: c * (1 - c) * o
    net = SeparableNet([Transformed(mlp([1, 24, 24, 24]), hard)
                        for _ in range(2)])
    prob = discretize(sys_, PhysicsInformedNN(
        net, SeparableTraining(dx=1 / 32), dtype=jnp.float32))
    return prob, net


def rel_l2(net, theta):
    xs = np.linspace(0, 1, 101)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    want = np.sin(np.pi * X) * np.sin(np.pi * Y) / (2 * np.pi**2)
    with jax.default_matmul_precision("highest"):
        pred = np.asarray(net.grid(theta["depvar"],
                                   [jnp.asarray(xs, jnp.float32)] * 2))
    return float(np.linalg.norm(pred - want) / np.linalg.norm(want))


def run(method, **kw):
    prob, net = build()
    # warm compile pass
    solve_gauss_newton(prob, method=method, maxiters=2, cg_iters=200, **kw)
    t0 = time.perf_counter()
    res = solve_gauss_newton(prob, method=method, maxiters=200, cg_iters=200,
                             **kw)
    dt = time.perf_counter() - t0
    extra = (f" inner={res.aux.get('inner_iterations')}"
             if "inner_iterations" in res.aux else "")
    print(f"{method}{kw}: rel L2={rel_l2(net, res.u):.3e} "
          f"loss={res.objective:.3e} iters={res.iterations} "
          f"wall={dt:.1f}s{extra}", flush=True)


if __name__ == "__main__":
    run("lm", solver="lsqr", scalar_dtype=jnp.float64)
    run("tr")
