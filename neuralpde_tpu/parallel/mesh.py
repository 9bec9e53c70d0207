"""Device mesh + collocation-batch sharding (the TPU scaling layer).

The reference has **no distributed backend** (SURVEY §5): GPU support is
array-type dispatch and the only concurrency is threads over MCMC chains.
The TPU-native scaling axis for a PINN is the collocation batch: shard the
point dimension data-parallel over ICI and let GSPMD insert the psum for the
gradient reduction.  Parameters stay replicated (they are tiny next to the
batch).

Usage:
    mesh = make_mesh()                       # all devices, axis "data"
    with use_mesh(mesh):
        prob = discretize(system, disc)      # strategies shard their batches
        res = solve(prob, ...)
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: Mesh | None = None
BATCH_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: int | None = None, axis_name: str = BATCH_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        # fall back to the host CPU backend (e.g. 8 virtual devices via
        # --xla_force_host_platform_device_count) for sharding validation
        devs = jax.devices("cpu")
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devs)}; set "
                "XLA_FLAGS=--xla_force_host_platform_device_count")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def get_mesh() -> Mesh | None:
    return _ACTIVE_MESH


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


@contextlib.contextmanager
def no_mesh():
    """Temporarily deactivate the ambient mesh.  Used by drivers that own
    the device axis themselves (e.g. ensemble training shards the MEMBER
    axis; the loss they build must not also shard_map its batch/family
    axis over the same devices)."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = None
    try:
        yield
    finally:
        _ACTIVE_MESH = prev


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the trailing (points) axis of a (dim, N) coordinate matrix."""
    return NamedSharding(mesh, P(None, BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x):
    """Annotate/place a (dim, N) collocation matrix as batch-sharded under the
    active mesh.  No-op when no mesh is active or N doesn't divide the axis.

    Uses `with_sharding_constraint`, which works both eagerly (placement,
    like device_put) and while tracing.  IMPORTANT: a concrete array closed
    over by a jitted function is baked in as a REPLICATED constant regardless
    of its eager placement, so deterministic strategies must call this again
    INSIDE their loss (in-trace) for the sharding to survive jit — see
    strategies._mean_sq_loss.
    """
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    n_axis = mesh.shape[BATCH_AXIS]
    if x.ndim < 2 or x.shape[-1] % n_axis != 0:
        return x
    if jax.process_count() > 1 and jax.core.is_concrete(x):
        # multi-process: eager placement would create a global array
        # spanning non-addressable devices, which a jitted loss cannot
        # close over — leave the constant host-local (it bakes in
        # replicated; the IN-TRACE call re-shards it under GSPMD).
        # is_concrete (False under tracing) is the supported tracer test;
        # isinstance(x, jax.core.Tracer) relies on a deprecated shim.
        return x
    sharding = NamedSharding(mesh, P(*([None] * (x.ndim - 1)), BATCH_AXIS))
    return jax.lax.with_sharding_constraint(x, sharding)


def shard_axis_nodes(x):
    """Annotate a 1-D per-axis node array (separable tensor grids) as sharded
    over the data axis.  The factorized residual's grid then has its first
    dimension sharded: each device contracts its slice of axis-0 features
    against replicated features of the other axes, and the loss mean induces
    the only collective (psum).  No-op when no mesh is active or the node
    count doesn't divide the axis."""
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    n_axis = mesh.shape[BATCH_AXIS]
    if x.ndim != 1 or x.shape[0] % n_axis != 0:
        return x
    if jax.process_count() > 1 and jax.core.is_concrete(x):
        return x   # see shard_batch: no eager global placement multi-process
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(BATCH_AXIS)))


def replicate_params(params, mesh: Mesh | None = None):
    mesh = mesh or _ACTIVE_MESH
    if mesh is None:
        return params
    return jax.device_put(params, replicated(mesh))


def make_mesh_2d(n_data: int, n_model: int) -> Mesh:
    """2-D (data, model) mesh: collocation batch over `data`, wide layers
    tensor-parallel over `model`.  Lay `model` on the fast (contiguous) axis
    so its collectives ride the shortest ICI hops."""
    devs = jax.devices()
    if len(devs) < n_data * n_model:
        devs = jax.devices("cpu")
    if len(devs) < n_data * n_model:
        raise ValueError(
            f"requested {n_data}x{n_model} mesh, have {len(devs)} devices")
    arr = np.array(devs[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (BATCH_AXIS, MODEL_AXIS))


def _layer_index(name: str) -> int | None:
    if "_" in name:
        tail = name.rsplit("_", 1)[1]
        if tail.isdigit():
            return int(tail)
    return None


def shard_params_tp(params, mesh: Mesh | None = None, axis: str = MODEL_AXIS):
    """Megatron-style tensor-parallel placement for Dense-chain params:
    even layers column-parallel (split output features, weight P(model, -),
    bias P(model, -)), odd layers row-parallel (split input features, weight
    P(-, model), bias replicated) — GSPMD then inserts one psum per
    row-parallel layer.  Dims not divisible by the axis size (or leaves that
    aren't a `layer_<i>` dict of weight/bias) stay replicated.
    """
    mesh = mesh or _ACTIVE_MESH
    if mesh is None or axis not in mesh.shape:
        return params
    n = mesh.shape[axis]

    def spec_for(path, leaf):
        layer = None
        for entry in path:
            key = getattr(entry, "key", None)
            if isinstance(key, str):
                idx = _layer_index(key)
                if idx is not None:
                    layer = idx
        name = getattr(path[-1], "key", None) if path else None
        if layer is None or leaf.ndim != 2 or name not in ("weight", "bias"):
            return P()
        col_parallel = layer % 2 == 0
        if name == "weight":
            if col_parallel and leaf.shape[0] % n == 0:
                return P(axis, None)
            if not col_parallel and leaf.shape[1] % n == 0:
                return P(None, axis)
            return P()
        # bias: only the column-parallel (split-output) layers shard it
        if col_parallel and leaf.shape[0] % n == 0:
            return P(axis, None)
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {tuple(p): spec_for(p, l) for p, l in flat}

    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, specs[tuple(path)]))

    return jax.tree_util.tree_map_with_path(place, params)
