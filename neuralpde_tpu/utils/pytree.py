"""Flat-vector <-> pytree parameter addressing (ComponentArrays replacement).

`vector_to_parameters` mirrors the reference helper
(src/bpinn_types.jl:5-16) used by the Bayesian samplers to map a flat HMC
position vector back into the structured parameter pytree.
"""

from __future__ import annotations

import jax
from jax.flatten_util import ravel_pytree


def parameters_to_vector(params):
    """Flatten a parameter pytree into a 1-D vector; returns (vec, unravel)."""
    return ravel_pytree(params)


def vector_to_parameters(vec, like):
    """Reshape flat vector `vec` into the structure of pytree `like`."""
    _, unravel = ravel_pytree(like)
    return unravel(vec)


def tree_size(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
