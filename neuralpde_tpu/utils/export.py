"""Serving export: serialize a trained trial function to portable StableHLO.

Production deployment path (no analog in the reference): a trained `phi`
(or any jitted fn) AOT-exports via `jax.export` into a self-contained
artifact that any JAX runtime — or XLA-compatible serving stack — can load
and execute without the Python framework.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_phi(phi, params, in_dim: int, *, batch: int | None = None,
               dtype=jnp.float32, matmul_precision: str | None = "highest"):
    """Export `phi(cord, params)` with params baked in.

    ``batch=None`` exports with a dynamic batch dimension (symbolic shape);
    otherwise a fixed (in_dim, batch) signature.  Returns the serialized
    bytes and a `call(cord)` convenience wrapper.

    ``matmul_precision`` stamps the exported dots' precision at trace time
    (default "highest": true-f32 MXU passes — bf16-pass inference floors
    predictions at ~1e-3 relative, PERF.md r3; None inherits the ambient
    setting)."""
    def fn(cord):
        if matmul_precision is None:
            return phi(cord, params)
        with jax.default_matmul_precision(matmul_precision):
            return phi(cord, params)

    if batch is None:
        n = jax_export.symbolic_shape("n")[0]
        spec = jax.ShapeDtypeStruct((in_dim, n), dtype)
    else:
        spec = jax.ShapeDtypeStruct((in_dim, batch), dtype)
    exported = jax_export.export(jax.jit(fn))(spec)
    blob = exported.serialize()
    # deserialize ONCE (also round-trip-verifies the blob); `call` closes
    # over the loaded object instead of re-deserializing per invocation
    loaded = jax_export.deserialize(blob)

    def call(cord):
        return loaded.call(cord)

    return blob, call


def export_pino_pde(sol, *, grids=None, n_family: int | None = None,
                    dtype=jnp.float32):
    """Export a trained `PINOPDESolution` operator to StableHLO.

    The evaluation grids are baked into the artifact (`grids=None` uses the
    training grids — re-export for a different serving resolution; FNO
    discretization transfer makes any uniform grid over the same domains
    valid).  The exported signature is ``fn(p, *input_values)``: the
    parameter columns ``(n_ps, P)`` followed by one ``(*axis_sizes, P)``
    array per input function in name order.  ``n_family=None`` exports a
    symbolic family dimension.

    Matmul precision is inherited from the solve (`PINOPDE
    (matmul_precision=...)` — the interp applies it internally)."""
    gs = (sol.grids if grids is None
          else [jnp.ravel(jnp.asarray(g)) for g in grids])
    names = sorted(sol.input_samples)
    axes = sol.input_axes or {}

    def fn(p, *vals):
        return sol.interp(p, gs, dict(zip(names, vals)))

    n = (jax_export.symbolic_shape("n")[0] if n_family is None
         else int(n_family))
    n_ps = sol.p.shape[0]
    specs = [jax.ShapeDtypeStruct((n_ps, n), dtype)]
    for name in names:
        sizes = tuple(int(gs[a].shape[0]) for a in axes[name])
        specs.append(jax.ShapeDtypeStruct((*sizes, n), dtype))
    exported = jax_export.export(jax.jit(fn))(*specs)
    blob = exported.serialize()
    loaded = jax_export.deserialize(blob)

    def call(p, *vals):
        return loaded.call(p, *vals)

    return blob, call


def save_exported(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_exported(path: str):
    """Load a serialized solution; returns `call(cord)`."""
    with open(path, "rb") as f:
        blob = f.read()
    exported = jax_export.deserialize(blob)
    return exported.call
