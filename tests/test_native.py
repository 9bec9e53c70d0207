"""Native C++ components: high-dimensional Sobol engine."""

import numpy as np
import pytest

from neuralpde_tpu import native
from neuralpde_tpu.ops import sampling


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native engine unavailable")


@needs_native
def test_native_sobol_equidistribution_high_dim():
    bits = native.sobol_bits_native(2048, 48)
    u = (bits >> np.uint32(8)).astype(np.float64) * 2.0**-24
    assert u.shape == (48, 2048)
    # balanced dyadic halves in every dimension (first 1024 = full block)
    frac = (u[:, :1024] < 0.5).mean(axis=1)
    np.testing.assert_allclose(frac, 0.5, atol=0.01)
    # pairwise product integrates to 1/4 with QMC accuracy
    est = (u[7] * u[33]).mean()
    assert abs(est - 0.25) < 5e-3


@needs_native
def test_native_sobol_skip_consistency():
    full = native.sobol_bits_native(256, 6)
    tail = native.sobol_bits_native(128, 6, skip=128)
    np.testing.assert_array_equal(full[:, 128:], tail)


@needs_native
def test_sampler_dispatches_to_native_above_table():
    bits = sampling.sobol_bits(64, sampling.MAX_SOBOL_DIM + 5)
    assert bits.shape == (sampling.MAX_SOBOL_DIM + 5, 64)


def test_python_sobol_still_used_for_low_dim():
    bits = sampling.sobol_bits(16, 2)
    u = np.asarray(sampling.bits_to_unit(np.asarray(bits)))
    np.testing.assert_allclose(u[:, 1], [0.5, 0.5], atol=1e-6)
