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


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the trailing (points) axis of a (dim, N) coordinate matrix."""
    return NamedSharding(mesh, P(None, BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x):
    """Annotate/place a (dim, N) collocation matrix as batch-sharded under the
    active mesh.  No-op when no mesh is active or N doesn't divide the axis.

    Inside jit -> `with_sharding_constraint`; outside -> `device_put`.
    """
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    n_axis = mesh.shape[BATCH_AXIS]
    if x.ndim < 2 or x.shape[-1] % n_axis != 0:
        return x
    sharding = NamedSharding(mesh, P(*([None] * (x.ndim - 1)), BATCH_AXIS))
    if isinstance(x, jax.core.Tracer):
        return jax.lax.with_sharding_constraint(x, sharding)
    return jax.device_put(x, sharding)


def replicate_params(params, mesh: Mesh | None = None):
    mesh = mesh or _ACTIVE_MESH
    if mesh is None:
        return params
    return jax.device_put(params, replicated(mesh))
