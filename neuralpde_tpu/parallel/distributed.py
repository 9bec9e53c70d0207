"""Multi-host (DCN) initialization helpers.

The reference has no multi-process story (SURVEY §5).  For multi-slice /
multi-host TPU pods the same sharded training code runs unchanged once
`jax.distributed` is initialized — collocation batches shard over the global
device set (ICI within a slice, DCN across slices for the psum).
"""

from __future__ import annotations

import jax

from .mesh import BATCH_AXIS, make_mesh


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """`jax.distributed.initialize` wrapper; with no args, autodetects from
    the TPU environment (GKE/GCE metadata)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_batch_mesh(axis_name: str = BATCH_AXIS):
    """Mesh over every device across all processes (call after
    initialize_distributed)."""
    return make_mesh(axis_name=axis_name)


def per_process_batch(total_batch: int) -> int:
    """Split a global collocation batch across processes evenly."""
    n = jax.process_count()
    if total_batch % n:
        raise ValueError(f"batch {total_batch} not divisible by {n} processes")
    return total_batch // n
