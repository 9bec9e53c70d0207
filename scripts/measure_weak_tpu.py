"""Measure hp-VPINN (WeakTraining) step cost vs strong-form collocation on
the same 2-D Poisson problem and network (one TPU chip).

The weak projection at ibp=1 trains a Laplacian on FIRST network
derivatives (one fewer nested jvp); this measures what that buys in
wall-clock per step on the MXU, at matched residual-evaluation node counts
(weak: elements*quad nodes/axis; strong: the same tensor grid).

Run: python scripts/measure_weak_tpu.py   (repo root on sys.path)
"""
import json
import time

import numpy as np


def measure(strategy_factory, label, steps=50):
    import jax
    import jax.numpy as jnp
    import optax

    import neuralpde_tpu as npde
    from neuralpde_tpu import (
        DepVar, Differential, Domain, Eq, Interval, PDESystem,
        PhysicsInformedNN, discretize, mlp, symbols,
    )
    from neuralpde_tpu.train import make_step

    x, y = symbols("x y")
    u = DepVar("u")
    eq = Eq((Differential(x) ** 2)(u(x, y)) + (Differential(y) ** 2)(u(x, y)),
            -npde.sin(np.pi * x) * npde.sin(np.pi * y))
    bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
           Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    disc = PhysicsInformedNN(mlp([2, 64, 64, 1]), strategy_factory(),
                             derivative="jet")
    prob = discretize(system, disc)
    opt = optax.adam(1e-3)
    lf = prob.pinnrep.loss_functions
    step = make_step(prob.loss, opt, prob.pinnrep.adaloss,
                     lf.pde_loss_functions, lf.bc_loss_functions)
    theta = prob.init_params
    ada = prob.pinnrep.adaloss.init_state(1, 4, prob.pinnrep.dtype)
    carry = (theta, opt.init(theta), ada, jnp.asarray(0, jnp.int32))
    key = jax.random.key(0)

    def multi(carry, key):
        def body(c, _):
            return step(c, key)
        carry, (losses, _) = jax.lax.scan(body, carry, None, length=steps)
        return carry, losses[-1]

    jm = jax.jit(multi)
    carry, loss = jm(carry, key)
    jax.block_until_ready(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry, loss = jm(carry, key)
        jax.block_until_ready(loss)
        best = min(best, (time.perf_counter() - t0) / steps)
    print(json.dumps({"config": label, "us_per_step": round(best * 1e6, 1)}),
          flush=True)
    return best


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/neuralpde_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from neuralpde_tpu import GridTraining, WeakTraining

    # weak: 32 elements x 12 quad = 384 nodes/axis -> 384^2 residual evals
    # strong grid at the same node count: dx = 1/383
    e, q = 32, 12
    n = e * q
    for label, f in [
        ("weak_ibp0", lambda: WeakTraining(elements=e, n_test=8, ibp=0,
                                           bc_dx=1.0 / (n - 1))),
        ("weak_ibp1", lambda: WeakTraining(elements=e, n_test=8, ibp=1,
                                           bc_dx=1.0 / (n - 1))),
        ("weak_ibp2", lambda: WeakTraining(elements=e, n_test=8, ibp=2,
                                           bc_dx=1.0 / (n - 1))),
        ("strong_grid_same_nodes", lambda: GridTraining(1.0 / (n - 1))),
    ]:
        measure(f, label)


if __name__ == "__main__":
    main()
