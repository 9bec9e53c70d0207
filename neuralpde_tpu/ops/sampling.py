"""Collocation-point samplers (QuasiMonteCarlo.jl replacement).

The reference delegates to QuasiMonteCarlo.jl (LatinHypercubeSample default,
reference: src/training_strategies.jl:266-344).  Here all samplers are either
static precomputes (Sobol base sequence, host numpy) or pure in-graph JAX
functions of a PRNG key, so a fresh sample per optimizer step traces into one
XLA program — no host round-trip per iteration.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array

# Joe-Kuo "new-joe-kuo-6" primitive polynomials & initial direction numbers
# for Sobol dimensions 2..21 (dimension 1 is the van der Corput sequence).
# Format: (s, a, [m_1..m_s]).  Public-domain table of S. Joe & F. Y. Kuo.
_JOE_KUO = [
    (1, 0, [1]),
    (2, 1, [1, 3]),
    (3, 1, [1, 3, 1]),
    (3, 2, [1, 1, 1]),
    (4, 1, [1, 1, 3, 3]),
    (4, 4, [1, 3, 5, 13]),
    (5, 2, [1, 1, 5, 5, 17]),
    (5, 4, [1, 1, 5, 5, 5]),
    (5, 7, [1, 1, 7, 11, 19]),
    (5, 11, [1, 1, 5, 1, 1]),
    (5, 13, [1, 1, 1, 3, 11]),
    (5, 14, [1, 3, 5, 5, 31]),
    (6, 1, [1, 3, 3, 9, 7, 49]),
    (6, 13, [1, 1, 1, 15, 21, 21]),
    (6, 16, [1, 3, 1, 13, 27, 49]),
    (6, 19, [1, 1, 1, 15, 7, 5]),
    (6, 22, [1, 3, 1, 15, 13, 25]),
    (6, 25, [1, 1, 5, 5, 19, 61]),
    (7, 1, [1, 3, 7, 11, 23, 15, 103]),
    (7, 4, [1, 3, 7, 13, 13, 15, 69]),
]

_NBITS = 32
MAX_SOBOL_DIM = len(_JOE_KUO) + 1


def _direction_numbers(dim: int) -> np.ndarray:
    """v[j, k] direction numbers (as uint64 shifted to 32-bit fixed point)."""
    v = np.zeros((dim, _NBITS), dtype=np.uint64)
    # dimension 0: van der Corput
    for k in range(_NBITS):
        v[0, k] = np.uint64(1) << np.uint64(_NBITS - 1 - k)
    for j in range(1, dim):
        s, a, m = _JOE_KUO[j - 1]
        m = list(m)
        for k in range(_NBITS):
            if k < s:
                v[j, k] = np.uint64(m[k]) << np.uint64(_NBITS - 1 - k)
            else:
                val = v[j, k - s] ^ (v[j, k - s] >> np.uint64(s))
                for i in range(1, s):
                    if (a >> (s - 1 - i)) & 1:
                        val ^= v[j, k - i]
                v[j, k] = val
    return v


def sobol_bits(points: int, dim: int) -> np.ndarray:
    """First `points` Sobol points as uint32 bit patterns, shape (dim, points).

    Host-side static precompute (Gray-code construction); combine with
    ``randomize_bits`` for per-step randomized QMC.  Dimensions beyond the
    embedded Joe-Kuo table dispatch to the native C++ engine
    (neuralpde_tpu.native) which searches primitive polynomials on the fly.
    """
    if dim > MAX_SOBOL_DIM:
        from .. import native

        if native.available():
            return native.sobol_bits_native(points, dim)
        raise ValueError(
            f"pure-Python Sobol supports up to {MAX_SOBOL_DIM} dims (got "
            f"{dim}) and the native engine is unavailable; use 'lhs' or "
            "'random' sampling"
        )
    v = _direction_numbers(dim)
    out = np.zeros((dim, points), dtype=np.uint64)
    x = np.zeros(dim, dtype=np.uint64)
    for i in range(1, points):
        c = (~np.uint64(i - 1) & np.uint64(i)).item().bit_length() - 1  # rightmost zero bit of i-1
        x ^= v[:, c]
        out[:, i] = x
    return out.astype(np.uint32)


def bits_to_unit(bits: Array) -> Array:
    """uint32 bit patterns -> floats in [0, 1)."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2.0**-24)


def randomize_bits(bits: Array, key) -> Array:
    """Random digital shift (XOR-scramble) — one uint32 draw per dimension."""
    dim = bits.shape[0]
    shift = jax.random.bits(key, (dim, 1), dtype=jnp.uint32)
    return bits ^ shift


def sobol_sample(base_bits, lb, ub, key=None, dtype=None):
    """Map (optionally randomized) Sobol bits into the box [lb, ub]."""
    bits = base_bits if key is None else randomize_bits(jnp.asarray(base_bits), key)
    u = bits_to_unit(jnp.asarray(bits))
    lb = jnp.asarray(lb, dtype=dtype)[:, None]
    ub = jnp.asarray(ub, dtype=dtype)[:, None]
    return (u.astype(dtype) if dtype is not None else u) * (ub - lb) + lb


def latin_hypercube(key, points: int, lb, ub, dtype=None):
    """Latin-hypercube sample in [lb, ub], shape (dim, points). Pure JAX."""
    lb = jnp.asarray(lb, dtype=dtype)
    ub = jnp.asarray(ub, dtype=dtype)
    dim = lb.shape[0]
    kperm, kjit = jax.random.split(key)
    perms = jax.vmap(lambda k: jax.random.permutation(k, points))(
        jax.random.split(kperm, dim)
    )  # (dim, points)
    jitter = jax.random.uniform(kjit, (dim, points), dtype=lb.dtype)
    u = (perms.astype(lb.dtype) + jitter) / points
    return u * (ub[:, None] - lb[:, None]) + lb[:, None]


def uniform_random(key, points: int, lb, ub, dtype=None):
    """Uniform random points in [lb, ub], shape (dim, points).

    Mirrors ``generate_random_points`` (reference:
    src/training_strategies.jl:197-200).
    """
    lb = jnp.asarray(lb, dtype=dtype)
    ub = jnp.asarray(ub, dtype=dtype)
    u = jax.random.uniform(key, (lb.shape[0], points), dtype=lb.dtype)
    return u * (ub[:, None] - lb[:, None]) + lb[:, None]


def lattice_rule_bits(points: int, dim: int) -> np.ndarray:
    """Rank-1 lattice rule (Korobov construction) in fixed point, shape
    (dim, points) — the LatticeRuleSample analog of the reference's
    QuasiMonteCarlo options (src/training_strategies.jl:266-289).

    x_i = frac(i * z / n) with generating vector z_j = a^j mod n for a a
    Fibonacci-ish multiplier; returned as uint32 fixed-point so the same
    `randomize_bits`/`bits_to_unit` pipeline applies (random shift = XOR on
    high bits ~ Cranley-Patterson rotation up to quantization).
    """
    # Kronecker construction: alpha_j = frac(sqrt(p_j)) for distinct primes —
    # valid for any n (Korobov vectors degrade badly for power-of-two n)
    primes = []
    c = 2
    while len(primes) < dim:
        if all(c % q for q in primes):
            primes.append(c)
        c += 1
    alpha = np.sqrt(np.asarray(primes, dtype=np.float64)) % 1.0
    # first dimension stays the regular grid i/n
    i = np.arange(points, dtype=np.float64)
    mat = np.empty((dim, points), dtype=np.float64)
    mat[0] = i / points
    for j in range(1, dim):
        mat[j] = (i * alpha[j - 1]) % 1.0
    return (mat * 2.0**32).astype(np.uint32)
