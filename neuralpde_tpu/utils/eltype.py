"""Eltype adaptor (reference: src/eltype_matching.jl).

Recursively converts array leaves of a pytree to a target dtype (incl.
complex), so training data matches parameter precision."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class EltypeAdaptor:
    """`EltypeAdaptor(jnp.float32)(tree)` converts every array leaf."""

    def __init__(self, dtype):
        self.dtype = jnp.dtype(dtype)

    def __call__(self, tree):
        def conv(x):
            arr = jnp.asarray(x)
            if jnp.issubdtype(arr.dtype, jnp.floating) or \
                    jnp.issubdtype(arr.dtype, jnp.complexfloating):
                return arr.astype(self.dtype)
            return arr

        return jax.tree.map(conv, tree)


def recursive_eltype(tree):
    """Widest floating dtype among the leaves (reference: recursive_eltype)."""
    leaves = [jnp.asarray(x) for x in jax.tree.leaves(tree)]
    dtypes = [x.dtype for x in leaves
              if jnp.issubdtype(x.dtype, jnp.inexact)]
    if not dtypes:
        return jnp.float32
    return jnp.result_type(*dtypes)
