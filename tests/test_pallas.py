"""Pallas fused-MLP kernel (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralpde_tpu import mlp
from neuralpde_tpu.nn.core import Dense, Chain
from neuralpde_tpu.ops import pallas_mlp


@pytest.mark.skipif(not pallas_mlp.HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("n", [512, 700, 64])
def test_fused_mlp_matches_xla(n):
    net = mlp([2, 64, 64, 1])
    params = jax.tree.map(lambda x: x.astype(jnp.float32),
                          net.init(jax.random.key(0)))
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, n)), jnp.float32)
    ref = net.apply(params, x)
    got = pallas_mlp.fused_mlp_apply(net, params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_mlp_falls_back_for_unsupported():
    class NotDense:
        pass

    # Chain-with-non-Dense falls back to the XLA path transparently
    net = mlp([2, 8, 1])
    params = net.init(jax.random.key(0))
    x = jnp.ones((2, 10))
    out = pallas_mlp.fused_mlp_apply(net, params, x, interpret=True)
    assert out.shape == (1, 10)
