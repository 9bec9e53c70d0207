"""Minimal pytree neural-network library (Lux-equivalent substrate).

Replaces the reference's Lux/LuxCore/WeightInitializers dependency (reference:
src/NeuralPDE.jl:17-20).  Layers are immutable Python objects; parameters are
nested dict pytrees created by ``init(key)`` and consumed by ``apply(params, x)``.

Layout convention: arrays are column-major ``(features, batch)`` like the
reference's ``dim × npoints`` coordinate matrices (reference:
src/discretize.jl:56,147-152).  On TPU the batch axis is the XLA lane/minor
dimension, which keeps the MXU matmuls ``W @ x`` well tiled for large batches.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..config import default_float

Array = jax.Array


# ---------------------------------------------------------------------------
# Initializers (glorot_uniform matches Lux's Dense default weight init)
# ---------------------------------------------------------------------------

def glorot_uniform(key, shape, dtype=None):
    dtype = dtype or default_float()
    fan_out, fan_in = shape[0], shape[1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def glorot_normal(key, shape, dtype=None):
    dtype = dtype or default_float()
    fan_out, fan_in = shape[0], shape[1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def zeros_init(key, shape, dtype=None):
    del key
    return jnp.zeros(shape, dtype or default_float())


# ---------------------------------------------------------------------------
# Activations (names mirror the Lux / NNlib set used by the reference docs)
# ---------------------------------------------------------------------------

sigmoid = jax.nn.sigmoid
tanh = jnp.tanh
relu = jax.nn.relu
gelu = jax.nn.gelu
swish = jax.nn.silu
softplus = jax.nn.softplus
sin = jnp.sin


def identity(x):
    return x


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class Module:
    """Base class: stateless; params live in a separate pytree."""

    def init(self, key) -> dict:
        raise NotImplementedError

    def apply(self, params, x: Array) -> Array:
        raise NotImplementedError

    def __call__(self, params, x: Array) -> Array:
        return self.apply(params, x)

    @property
    def in_dim(self) -> int:
        raise NotImplementedError

    @property
    def out_dim(self) -> int:
        raise NotImplementedError


class Dense(Module):
    """`y = act(W @ x + b)` with x shaped (in_dim, N)."""

    def __init__(self, in_dim: int, out_dim: int, activation: Callable | None = None,
                 *, use_bias: bool = True, init_weight=glorot_uniform,
                 init_bias=zeros_init):
        self._in = in_dim
        self._out = out_dim
        self.activation = activation or identity
        self.use_bias = use_bias
        self.init_weight = init_weight
        self.init_bias = init_bias

    @property
    def in_dim(self):
        return self._in

    @property
    def out_dim(self):
        return self._out

    def init(self, key):
        kw, kb = jax.random.split(key)
        params = {"weight": self.init_weight(kw, (self._out, self._in))}
        if self.use_bias:
            params["bias"] = self.init_bias(kb, (self._out, 1))
        return params

    def apply(self, params, x):
        y = jnp.dot(params["weight"], x, preferred_element_type=x.dtype)
        if self.use_bias:
            y = y + params["bias"]
        return self.activation(y)


class Chain(Module):
    """Sequential container; params = {"layer_0": ..., "layer_1": ...}."""

    def __init__(self, *layers: Module):
        self.layers = tuple(layers)

    @property
    def in_dim(self):
        return self.layers[0].in_dim

    @property
    def out_dim(self):
        return self.layers[-1].out_dim

    def init(self, key):
        keys = jax.random.split(key, len(self.layers))
        return {f"layer_{i}": l.init(k) for i, (l, k) in enumerate(zip(self.layers, keys))}

    def apply(self, params, x):
        for i, layer in enumerate(self.layers):
            x = layer.apply(params[f"layer_{i}"], x)
        return x


class SkipConnection(Module):
    """`y = merge(layer(x), x)`; used by the DGM block chaining
    (reference: src/dgm.jl:50-62)."""

    def __init__(self, layer: Module, merge: Callable[[Array, Array], Array]):
        self.layer = layer
        self.merge = merge

    @property
    def in_dim(self):
        return self.layer.in_dim

    @property
    def out_dim(self):
        return self.layer.out_dim

    def init(self, key):
        return self.layer.init(key)

    def apply(self, params, x):
        return self.merge(self.layer.apply(params, x), x)


class Transformed(Module):
    """Hard-constraint trial function: ``u(x) = transform(x, base(x))``.

    The standard Lagaris-style construction for imposing Dirichlet BCs/ICs
    EXACTLY instead of penalizing them: e.g. on the unit square with zero
    boundary, ``Transformed(net, lambda x, out: x[0:1]*(1-x[0:1]) *
    x[1:2]*(1-x[1:2]) * out)`` makes every boundary residual identically
    zero, so the optimizer spends its entire budget on the interior physics.
    The transform differentiates exactly through the jvp/jet pipeline (it is
    part of the trial function the lowering sees).  The ODE solvers already
    hard-constrain ICs this way (``u0 + (t-t0)·NN``, reference:
    src/ode_solve.jl:123-159); this wrapper gives the PDE pipeline the same
    power with user-supplied geometry.
    """

    def __init__(self, base: Module, transform):
        self.base = base
        self.transform = transform

    @property
    def in_dim(self):
        return self.base.in_dim

    @property
    def out_dim(self):
        return self.base.out_dim

    def init(self, key):
        return self.base.init(key)

    def apply(self, params, x):
        return self.transform(x, self.base.apply(params, x))


class FourierFeatures(Module):
    """Random Fourier feature embedding (Tancik et al. 2020): the standard
    remedy for the spectral bias of coordinate MLPs, so PINNs resolve
    high-frequency solution content orders of magnitude faster.

    ``y = [sin(2π B x); cos(2π B x)]`` with ``B ~ N(0, σ²)`` of shape
    ``(n_frequencies, in_dim)`` drawn at init and held FIXED during training
    (the paper's recipe; a trainable B destabilizes the NTK argument).  σ
    sets the band center: σ ≈ the highest frequency (in periods per unit
    length) the solution contains.  Beyond the reference (which has no
    embedding layers); composes with the jet/jvp derivative pipeline since
    sin/cos have exact Taylor-mode rules.
    """

    def __init__(self, in_dim: int, n_frequencies: int, sigma: float = 1.0):
        self._in = in_dim
        self.n_frequencies = n_frequencies
        self.sigma = sigma

    @property
    def in_dim(self):
        return self._in

    @property
    def out_dim(self):
        return 2 * self.n_frequencies

    def init(self, key):
        b = self.sigma * jax.random.normal(
            key, (self.n_frequencies, self._in), default_float())
        return {"B": b}

    def apply(self, params, x):
        # fixed embedding: stop_gradient zeroes B's gradient so first-order
        # optimizers and L-BFGS never move it even though it rides the
        # params pytree (NOTE: HMC samplers explore the full flat vector, so
        # prefer plain chains — or a frozen init_params split — for BPINNs)
        proj = 2.0 * jnp.pi * jnp.dot(jax.lax.stop_gradient(params["B"]), x,
                                      preferred_element_type=x.dtype)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=0)


class PeriodicEmbedding(Module):
    """Exact periodic embedding of one coordinate axis: replaces row `axis`
    with integer harmonics ``sin(2πk x/period), cos(2πk x/period)``,
    k = 1..n_modes, passing the other rows through unchanged.

    Any network downstream is EXACTLY periodic in that axis — periodic
    value/derivative boundary conditions hold to machine precision and their
    losses vanish identically (the hard-constraint counterpart of
    `Transformed` for periodic geometry).  Derivatives are exact under the
    jvp/jet pipeline.
    """

    def __init__(self, in_dim: int, axis: int, period: float, n_modes: int):
        self._in = in_dim
        self.axis = axis
        self.period = period
        self.n_modes = n_modes

    @property
    def in_dim(self):
        return self._in

    @property
    def out_dim(self):
        return self._in - 1 + 2 * self.n_modes

    def init(self, key):
        del key
        return {}

    def apply(self, params, x):
        del params
        ks = jnp.arange(1, self.n_modes + 1, dtype=x.dtype)[:, None]
        ang = 2.0 * jnp.pi / self.period * ks * x[self.axis:self.axis + 1]
        rest = [x[i:i + 1] for i in range(self._in) if i != self.axis]
        return jnp.concatenate(rest + [jnp.sin(ang), jnp.cos(ang)], axis=0)


def mlp(sizes: Sequence[int], activation: Callable = tanh,
        out_activation: Callable | None = None, *,
        fourier_features: int | None = None,
        fourier_sigma: float = 1.0) -> Chain:
    """Convenience constructor: mlp([2, 16, 16, 1]) -> 3-layer Chain.

    ``fourier_features=m`` prepends a fixed random Fourier embedding with m
    frequencies (bandwidth ``fourier_sigma``); the first Dense layer then
    takes the 2m embedded channels instead of the raw coordinates.
    """
    layers = []
    start = 0
    if fourier_features:
        layers.append(FourierFeatures(sizes[0], fourier_features,
                                      fourier_sigma))
        layers.append(Dense(2 * fourier_features, sizes[1], activation
                            if len(sizes) > 2 else out_activation))
        start = 1
    for i in range(start, len(sizes) - 1):
        act = activation if i < len(sizes) - 2 else out_activation
        layers.append(Dense(sizes[i], sizes[i + 1], act))
    return Chain(*layers)
