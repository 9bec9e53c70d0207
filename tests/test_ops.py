"""Unit tests for sampling and quadrature ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralpde_tpu.ops import quadrature, sampling


def test_sobol_low_discrepancy():
    bits = sampling.sobol_bits(256, 2)
    u = np.asarray(sampling.bits_to_unit(jnp.asarray(bits)))
    assert u.shape == (2, 256)
    assert u.min() >= 0.0 and u.max() < 1.0
    # first points of the 2-D Sobol sequence are well known
    np.testing.assert_allclose(u[:, 1], [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(u[:, 2], [0.75, 0.25], atol=1e-6)
    np.testing.assert_allclose(u[:, 3], [0.25, 0.75], atol=1e-6)
    # mean of a balanced Sobol block ~ 0.5 with much lower error than random
    assert abs(u.mean() - 0.5) < 5e-3


def test_sobol_integration_beats_uniform():
    # integrate x*y over [0,1]^2 = 0.25
    bits = sampling.sobol_bits(1024, 2)
    u = np.asarray(sampling.bits_to_unit(jnp.asarray(bits)))
    est = (u[0] * u[1]).mean()
    assert abs(est - 0.25) < 2e-3


def test_sobol_randomization_changes_points():
    bits = jnp.asarray(sampling.sobol_bits(64, 2))
    a = sampling.sobol_sample(bits, [0.0, 0.0], [1.0, 1.0],
                              key=jax.random.key(0))
    b = sampling.sobol_sample(bits, [0.0, 0.0], [1.0, 1.0],
                              key=jax.random.key(1))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert np.asarray(a).min() >= 0.0 and np.asarray(a).max() <= 1.0


def test_latin_hypercube_stratification():
    pts = sampling.latin_hypercube(jax.random.key(0), 50, [0.0, -1.0], [1.0, 1.0])
    pts = np.asarray(pts)
    assert pts.shape == (2, 50)
    # each of the 50 strata contains exactly one point per dimension
    strata = np.floor((pts[0] - 0.0) / (1.0 / 50)).astype(int)
    assert len(np.unique(strata)) == 50


def test_uniform_random_bounds():
    pts = np.asarray(sampling.uniform_random(jax.random.key(0), 200,
                                             [1.0, -2.0], [2.0, 0.0]))
    assert pts[0].min() >= 1.0 and pts[0].max() <= 2.0
    assert pts[1].min() >= -2.0 and pts[1].max() <= 0.0


def test_gauss_legendre_polynomial_exactness():
    # order-n GL integrates polynomials up to degree 2n-1 exactly
    def f(x):
        return (x[0] ** 7 + 3 * x[0] ** 2)[None, :]

    got = quadrature.integrate_box(f, [0.0], [1.0], order=5)
    np.testing.assert_allclose(float(got[0]), 1 / 8 + 1.0, rtol=1e-12)


def test_tensor_rule_2d():
    def f(x):
        return (jnp.sin(x[0]) * jnp.cos(x[1]))[None, :]

    got = quadrature.integrate_box(f, [0.0, 0.0], [np.pi, np.pi / 2],
                                   order=12, panels=2)
    np.testing.assert_allclose(float(got[0]), 2.0, rtol=1e-10)


def test_parametric_1d_batched():
    # ∫_0^b x dx = b²/2 for a batch of upper bounds
    b = jnp.asarray([0.5, 1.0, 2.0])

    def f(nodes):  # (N, Q) -> (1, N, Q)
        return nodes[None, :, :]

    got = quadrature.integrate_parametric_1d(f, jnp.zeros(3), b, order=8)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(b) ** 2 / 2, rtol=1e-12)


def test_sobol_high_dim_dispatch():
    """Above the Joe-Kuo table the sampler uses the native C++ engine (or
    raises a clear error when no toolchain exists)."""
    from neuralpde_tpu import native

    if native.available():
        bits = sampling.sobol_bits(8, sampling.MAX_SOBOL_DIM + 1)
        assert bits.shape == (sampling.MAX_SOBOL_DIM + 1, 8)
    else:
        with pytest.raises(ValueError):
            sampling.sobol_bits(8, sampling.MAX_SOBOL_DIM + 1)


def test_lattice_rule_sampler():
    bits = sampling.lattice_rule_bits(128, 3)
    u = np.asarray(sampling.bits_to_unit(jnp.asarray(bits)))
    assert u.shape == (3, 128)
    assert u.min() >= 0 and u.max() < 1
    # rank-1 lattice: first dimension is i/n exactly
    np.testing.assert_allclose(np.sort(u[0]), np.arange(128) / 128, atol=1e-5)
    # integrates smooth products well
    assert abs((u[1] * u[2]).mean() - 0.25) < 1e-2
