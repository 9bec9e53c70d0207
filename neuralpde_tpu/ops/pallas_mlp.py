"""Pallas TPU kernels for the hot path: fused MLP evaluation.

The PINN hot loop evaluates the same small MLP at many stencil-shifted
collocation points (reference hot loop: src/pinn_types.jl:439-454 — each
Differential costs 2+ batched NN forwards).  This kernel fuses the whole
Dense chain for one batch tile in VMEM: weights stay resident, activations
never round-trip to HBM between layers, and the batch axis rides the lanes.

`fused_mlp_apply(chain, params, x)` is a drop-in for `Chain.apply` for
inference-sized batches; falls back to the XLA path for architectures the
kernel doesn't cover (non-Dense layers).  Verified compiled on v5e (matmuls
take the MXU's single bf16 pass, ~1e-3 absolute difference vs XLA's f32
decomposition).  Training still uses the XLA path — measured head-to-head,
XLA's fused jvp-of-jvp pipeline already runs at ~45% of f32 peak and beat a
hand-stacked Taylor formulation (PERF.md), so a custom-VJP Pallas kernel is
deferred until profiling shows a gap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..nn.core import Chain, Dense

try:  # pallas import can fail on unsupported platforms
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

LANE_TILE = 512


def _supported(chain: Chain) -> bool:
    return HAVE_PALLAS and isinstance(chain, Chain) and all(
        isinstance(l, Dense) for l in chain.layers)


def _kernel(chain: Chain, n_layers: int, *refs):
    # refs: [x_ref, W0, b0?, W1, b1?, ..., out_ref]
    x_ref = refs[0]
    out_ref = refs[-1]
    h = x_ref[:]
    idx = 1
    for layer in chain.layers:
        w = refs[idx][:]
        idx += 1
        h = jnp.dot(w, h, preferred_element_type=h.dtype)
        if layer.use_bias:
            h = h + refs[idx][:]
            idx += 1
        h = layer.activation(h)
    out_ref[:] = h


def fused_mlp_apply(chain: Chain, params, x, *, interpret: bool = False):
    """Evaluate a Dense-only Chain with a single fused Pallas kernel.

    x: (in_dim, N); returns (out_dim, N).  N is tiled over the grid in
    LANE_TILE columns (padded).
    """
    if not _supported(chain):
        return chain.apply(params, x)
    in_dim, n = x.shape
    out_dim = chain.out_dim
    n_pad = -(-n // LANE_TILE) * LANE_TILE
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)))
    grid = (n_pad // LANE_TILE,)

    operands = [x]
    in_specs = [pl.BlockSpec((in_dim, LANE_TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    for li, layer in enumerate(chain.layers):
        p = params[f"layer_{li}"]
        operands.append(p["weight"])
        in_specs.append(pl.BlockSpec(p["weight"].shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        if layer.use_bias:
            operands.append(p["bias"])
            in_specs.append(pl.BlockSpec(p["bias"].shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel, chain, len(chain.layers)),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_dim, LANE_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_dim, n_pad), x.dtype),
        interpret=interpret,
    )(*operands)
    return out[:, :n]
