"""Multi-process (DCN-analog) execution of `parallel.distributed`
(VERDICT r2 item 8): two OS processes, each with 2 virtual CPU devices,
coordinate through `jax.distributed` (gloo collectives) and run a sharded
training step over the global 4-device mesh.  The reference has no
multi-process story at all (SURVEY §5)."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _gloo_available():
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _gloo_available(),
                    reason="jaxlib built without gloo CPU collectives")
def test_two_process_sharded_train_step():
    """initialize_distributed + global_batch_mesh + one sharded train step:
    both processes agree on the loss, the step decreases it, and the value
    matches a single-process run of the same seeded program."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    env = {"PATH": os.environ.get("PATH", "/usr/bin:/bin"),
           "HOME": os.environ.get("HOME", "/root"),
           "PYTHONPATH": os.path.dirname(os.path.dirname(worker)),
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        text = out.decode()
        assert p.returncode == 0, text[-2000:]
        line = [ln for ln in text.splitlines() if ln.startswith("RESULT ")]
        assert line, text[-2000:]
        _, l0, l1 = line[-1].split()
        results.append((float(l0), float(l1)))

    (a0, a1), (b0, b1) = results
    assert np.isfinite([a0, a1, b0, b1]).all()
    np.testing.assert_allclose(a0, b0, rtol=1e-8)   # processes agree
    np.testing.assert_allclose(a1, b1, rtol=1e-8)
    assert a1 < a0                                   # the step descended

    # single-process reference of the same seeded program
    from neuralpde_tpu import (
        DepVar, Differential, Domain, Eq, GridTraining, Interval, PDESystem,
        PhysicsInformedNN, discretize, mlp, symbols,
    )
    import neuralpde_tpu as npde
    import jax.numpy as jnp

    x, y = symbols("x y")
    u = DepVar("u")
    eq = Eq((Differential(x) ** 2)(u(x, y)) + (Differential(y) ** 2)(u(x, y)),
            -npde.sin(np.pi * x) * npde.sin(np.pi * y))
    bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0)]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    prob = discretize(system, PhysicsInformedNN(
        mlp([2, 8, 1]), GridTraining(1.0 / 3.0), seed=0))
    lstate = {"key": jax.random.key(0),
              "adaptive": prob.pinnrep.adaloss.init_state(
                  1, 2, prob.pinnrep.dtype)}
    cpu0 = jax.devices("cpu")[0]
    ref = float(jax.jit(lambda th: prob.loss(th, lstate)[0], device=cpu0)(
        jax.device_put(prob.init_params, cpu0)))
    np.testing.assert_allclose(a0, ref, rtol=1e-6)
