"""Worker process for the 2-process jax.distributed smoke test
(tests/test_distributed.py).  Must be launched with env:
JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=2,
argv: <process_id> <num_processes> <coordinator_port>.

Prints one line ``RESULT <loss0> <loss1>`` — the sharded full-loss value
before and after one Adam step on the global 4-device mesh.
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)   # match the test suite env
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from neuralpde_tpu.parallel.distributed import (
        global_batch_mesh, initialize_distributed, per_process_batch,
    )

    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    import neuralpde_tpu as npde
    from neuralpde_tpu import (
        DepVar, Differential, Domain, Eq, GridTraining, Interval, PDESystem,
        PhysicsInformedNN, discretize, mlp, symbols,
    )
    from neuralpde_tpu.parallel.mesh import use_mesh

    mesh = global_batch_mesh()
    n_dev = len(jax.devices())
    assert n_dev == 2 * nproc, n_dev
    assert per_process_batch(64) == 64 // nproc

    x, y = symbols("x y")
    u = DepVar("u")
    eq = Eq((Differential(x) ** 2)(u(x, y)) + (Differential(y) ** 2)(u(x, y)),
            -npde.sin(np.pi * x) * npde.sin(np.pi * y))
    bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0)]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])

    with use_mesh(mesh):
        # dx=1/3 -> 4 grid points per axis: 16 interior points, divisible by
        # the 4-device global data axis
        prob = discretize(system, PhysicsInformedNN(
            mlp([2, 8, 1]), GridTraining(1.0 / 3.0), seed=0))
        lstate = {"key": jax.random.key(0),
                  "adaptive": prob.pinnrep.adaloss.init_state(
                      1, 2, prob.pinnrep.dtype)}
        # identical seeded init on every process -> replicate onto the
        # global mesh
        theta = jax.tree.map(
            lambda a: multihost_utils.host_local_array_to_global_array(
                np.asarray(a), mesh, P()),
            prob.init_params)

        opt = optax.adam(1e-2)
        repl = NamedSharding(mesh, P())

        def loss_fn(th):
            return prob.loss(th, lstate)[0]

        step = jax.jit(
            lambda th, os_: _one_step(loss_fn, opt, th, os_),
            out_shardings=((jax.tree.map(lambda _: repl, theta),
                            jax.tree.map(lambda _: repl, opt.init(
                                prob.init_params))), repl))
        loss0 = float(jax.jit(loss_fn, out_shardings=repl)(theta))
        (theta2, _), loss_after = step(theta, jax.tree.map(
            lambda a: multihost_utils.host_local_array_to_global_array(
                np.asarray(a), mesh, P()), opt.init(prob.init_params)))
        loss1 = float(jax.jit(loss_fn, out_shardings=repl)(theta2))

    print(f"RESULT {loss0:.10e} {loss1:.10e}", flush=True)


def _one_step(loss_fn, opt, theta, opt_state):
    import jax

    loss, g = jax.value_and_grad(loss_fn)(theta)
    updates, opt_state = opt.update(g, opt_state, theta)
    import optax

    theta = optax.apply_updates(theta, updates)
    return (theta, opt_state), loss


if __name__ == "__main__":
    main()
