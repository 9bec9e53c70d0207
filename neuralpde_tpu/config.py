"""Global dtype/device policy.

The reference defaults all parameters to Float64 (reference:
src/discretize.jl:430-447).  On TPU, float64 is emulated and slow, so the
TPU-native default is float32 with an opt-in x64 mode for CPU parity runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_x64(enable: bool = True) -> None:
    """Enable float64 globally (matches the reference's Float64 default)."""
    jax.config.update("jax_enable_x64", enable)


def default_float():
    """The dtype new parameters / training sets default to."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def finfo_eps(dtype) -> float:
    return float(jnp.finfo(dtype).eps)
