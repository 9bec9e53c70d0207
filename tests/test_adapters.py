"""Cross-framework adapters (FromFluxAdaptor analog: Flax/Haiku -> Module)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from neuralpde_tpu import GridTraining, NNODE, ODEProblem
from neuralpde_tpu.nn.adapters import FlaxAdapter, HaikuAdapter
from neuralpde_tpu.solvers.ode import solve_ode


def test_flax_adapter_in_nnode():
    flax = pytest.importorskip("flax")
    import flax.linen as nn

    net = FlaxAdapter(
        nn.Sequential([nn.Dense(16), nn.tanh, nn.Dense(1)]),
        in_dim=1, out_dim=1)
    prob = ODEProblem(f=lambda u, p, t: -u, u0=1.0, tspan=(0.0, 1.0),
                      analytic=lambda u0, p, t: np.exp(-t))
    alg = NNODE(net, optax.adam(0.05))
    sol = solve_ode(prob, alg, dt=0.05, maxiters=800, abstol=1e-10,
                    inner_steps=25)
    assert sol.errors["l2"] < 0.05


def test_haiku_adapter_forward():
    hk = pytest.importorskip("haiku")
    f = hk.transform(lambda x: hk.nets.MLP([16, 1])(x))
    net = HaikuAdapter(f, in_dim=2, out_dim=1)
    params = net.init(jax.random.key(0))
    out = net.apply(params, jnp.ones((2, 5)))
    assert out.shape == (1, 5)
