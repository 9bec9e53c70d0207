"""Data-parallel sharded PINN training over all available devices.

Run: python examples/sharded_training.py
(on a multi-chip TPU host this shards the collocation batch over ICI;
on CPU set XLA_FLAGS=--xla_force_host_platform_device_count=8 to simulate)
"""
import numpy as np
import jax
import optax

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, Interval, PDESystem, PhysicsInformedNN,
    StochasticTraining, discretize, mlp, solve, symbols,
)
from neuralpde_tpu.parallel.mesh import make_mesh, replicate_params, use_mesh

x, y = symbols("x y")
u = DepVar("u")
Dxx, Dyy = Differential(x) ** 2, Differential(y) ** 2
eq = Eq(Dxx(u(x, y)) + Dyy(u(x, y)), -npde.sin(np.pi * x) * npde.sin(np.pi * y))
bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
       Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)]
system = PDESystem(eq, bcs,
                   [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                   [x, y], [u(x, y)])

mesh = make_mesh()
n = mesh.shape["data"]
print(f"training over {n} devices")
with use_mesh(mesh):
    disc = PhysicsInformedNN(mlp([2, 32, 32, 1]),
                             StochasticTraining(1024 * n, bcs_points=128 * n))
    prob = discretize(system, disc)
    theta = replicate_params(prob.init_params, mesh)
    res = solve(prob.with_params(theta), optax.adam(2e-2), maxiters=2000,
                inner_steps=50)
print(f"final loss {res.objective:.3e}")

# -- variant: 2-D (data, model) mesh with tensor-parallel layers ------------
# For wide networks, split the layers themselves over a second axis
# (Megatron column/row alternation; see docs/src/manual/tpu.md):
if n >= 4 and n % 2 == 0:
    from neuralpde_tpu import make_mesh_2d, shard_params_tp

    mesh2 = make_mesh_2d(n // 2, 2)
    with use_mesh(mesh2):
        disc2 = PhysicsInformedNN(mlp([2, 64, 64, 1]),
                                  StochasticTraining(512 * n, bcs_points=64 * n))
        prob2 = discretize(system, disc2)
        theta2 = {"depvar": shard_params_tp(prob2.init_params["depvar"], mesh2)}
        res2 = solve(prob2.with_params(theta2), optax.adam(2e-2),
                     maxiters=500, inner_steps=50)
    print(f"dp+tp final loss {res2.objective:.3e}")
