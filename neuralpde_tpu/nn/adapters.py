"""Cross-framework network adapters (FromFluxAdaptor analog).

The reference converts Flux chains to Lux transparently
(reference: src/pinn_types.jl:149-155 `FromFluxAdaptor`).  The JAX ecosystem
equivalent: wrap Flax or Haiku modules as `neuralpde_tpu.nn.Module`s so any
existing model drops into `PhysicsInformedNN`/`NNODE`/....

Convention note: this framework is column-major (`(features, batch)`), while
Flax/Haiku models conventionally take `(batch, features)` — the adapters
transpose at the boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import default_float
from .core import Module


def _cast_to_default_float(params):
    """Flax/Haiku initialize float32 regardless of jax_enable_x64; cast so
    adapted params match the framework default (HMC flattening and optimizer
    states require one consistent dtype)."""
    dtype = default_float()
    return jax.tree.map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating)
        else p, params)


class FlaxAdapter(Module):
    """Wrap a `flax.linen.Module` with (batch, features) convention.

    >>> import flax.linen as nn
    >>> net = FlaxAdapter(nn.Sequential([nn.Dense(16), nn.tanh, nn.Dense(1)]),
    ...                   in_dim=2, out_dim=1)
    """

    def __init__(self, module, in_dim: int, out_dim: int):
        self.module = module
        self._in = in_dim
        self._out = out_dim

    @property
    def in_dim(self):
        return self._in

    @property
    def out_dim(self):
        return self._out

    def init(self, key):
        dummy = jnp.zeros((1, self._in))
        return _cast_to_default_float(self.module.init(key, dummy))

    def apply(self, params, x):
        y = self.module.apply(params, x.T)  # (N, out)
        return y.T


class HaikuAdapter(Module):
    """Wrap a Haiku-transformed function (`hk.transform(fn)`, without state).

    >>> import haiku as hk
    >>> f = hk.transform(lambda x: hk.nets.MLP([16, 1])(x))
    >>> net = HaikuAdapter(f, in_dim=2, out_dim=1)
    """

    def __init__(self, transformed, in_dim: int, out_dim: int):
        self.transformed = transformed
        self._in = in_dim
        self._out = out_dim

    @property
    def in_dim(self):
        return self._in

    @property
    def out_dim(self):
        return self._out

    def init(self, key):
        dummy = jnp.zeros((1, self._in))
        return _cast_to_default_float(self.transformed.init(key, dummy))

    def apply(self, params, x):
        y = self.transformed.apply(params, None, x.T)
        return y.T
