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


@needs_native
def test_high_dimensional_quasirandom_training():
    """25-dim function approximation via QuasiRandom Sobol sampling — the
    native engine feeding the full training pipeline (DGM-style high-dim
    use case)."""
    import jax.numpy as jnp
    import optax

    from neuralpde_tpu import (
        DepVar, Domain, Eq, Interval, PDESystem, PhysicsInformedNN,
        QuasiRandomTraining, discretize, mlp, solve,
    )
    from neuralpde_tpu.symbolic.expr import Sym

    d = 25
    xs = [Sym(f"x{i}") for i in range(d)]
    u = DepVar("u")
    target = xs[0]
    for s in xs[1:]:
        target = target + s
    target = target / float(d)
    eq = Eq(u(*xs), target)          # u ≈ mean(x)
    system = PDESystem(eq, [], [Domain(s, Interval(0, 1)) for s in xs],
                       xs, [u(*xs)])
    disc = PhysicsInformedNN(
        mlp([d, 32, 1]), QuasiRandomTraining(512, sampling_alg="sobol"))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(0.01), maxiters=1500, inner_steps=25)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0.2, 0.8, size=(d, 200)))
    pred = np.asarray(disc.phi(pts, res.u["depvar"])[0])
    want = np.asarray(pts).mean(axis=0)
    assert np.max(np.abs(pred - want)) < 0.05
