"""Unit tests for derivative engines (reference test group: test/Forward/,
forward__derivatives.jl validates numeric_derivative vs AD to order 2+)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralpde_tpu.ops.derivatives import (
    DerivativeEngine, eps_masks, fd_step, jvp_derivative, numeric_derivative,
)


def f_scalar(x):
    # u(x, y) = sin(x) * cos(2 y): known partials; x shape (2, N) -> (1, N)
    return (jnp.sin(x[0]) * jnp.cos(2.0 * x[1]))[None, :]


@pytest.fixture
def cord():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0.2, 0.8, size=(2, 64)))


def analytic(cord, which):
    x, y = np.asarray(cord[0]), np.asarray(cord[1])
    table = {
        "dx": np.cos(x) * np.cos(2 * y),
        "dy": -2 * np.sin(x) * np.sin(2 * y),
        "dxx": -np.sin(x) * np.cos(2 * y),
        "dyy": -4 * np.sin(x) * np.cos(2 * y),
        "dxy": -2 * np.cos(x) * np.sin(2 * y),
        "dxxx": -np.cos(x) * np.cos(2 * y),
        "dxxxx": np.sin(x) * np.cos(2 * y),
    }
    return table[which]


CASES = [("dx", [0]), ("dy", [1]), ("dxx", [0, 0]), ("dyy", [1, 1]),
         ("dxy", [0, 1]), ("dxxx", [0, 0, 0]), ("dxxxx", [0, 0, 0, 0])]


@pytest.mark.parametrize("name,vi", CASES)
def test_jvp_derivative_exact(cord, name, vi):
    got = jvp_derivative(f_scalar, cord, tuple(vi), 2)[0]
    np.testing.assert_allclose(np.asarray(got), analytic(cord, name), rtol=1e-8)


@pytest.mark.parametrize("name,vi,tol", [
    ("dx", [0], 1e-5), ("dy", [1], 1e-5), ("dxx", [0, 0], 1e-4),
    ("dyy", [1, 1], 1e-4), ("dxy", [0, 1], 1e-3), ("dxxx", [0, 0, 0], 1e-3),
    ("dxxxx", [0, 0, 0, 0], 1e-2),
])
def test_fd_derivative_matches_reference_stencils(cord, name, vi, tol):
    masks = eps_masks(2, vi, np.float64)
    got = numeric_derivative(f_scalar, cord, masks, len(vi))[0]
    np.testing.assert_allclose(np.asarray(got), analytic(cord, name),
                               rtol=tol, atol=tol)


def test_fd_step_matches_reference_formula():
    # ε = eps(T)^(1/(2+order)), reference: src/symbolic_utilities.jl:98-103
    assert fd_step(np.float64, 1) == pytest.approx(np.finfo(np.float64).eps ** (1 / 3))
    assert fd_step(np.float32, 2) == pytest.approx(np.finfo(np.float32).eps ** (1 / 4))


def test_engine_dispatch(cord):
    for mode in ("jvp", "fd"):
        eng = DerivativeEngine(mode)
        got = eng(f_scalar, cord, [0, 0], 2)[0]
        np.testing.assert_allclose(np.asarray(got), analytic(cord, "dxx"),
                                   rtol=1e-3, atol=1e-3)
    with pytest.raises(ValueError):
        DerivativeEngine("bogus")


def test_fd_differentiable_in_reverse_mode(cord):
    """The FD stencil path must itself be differentiable (the reference
    differentiates it with Zygote for the outer training gradient)."""
    w = jnp.asarray(1.3)

    def loss(w):
        def u(x):
            return (jnp.sin(w * x[0]) * x[1])[None, :]

        masks = eps_masks(2, [0, 0], np.float64)
        return jnp.sum(numeric_derivative(u, cord, masks, 2) ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(float(g))


@pytest.mark.parametrize("name,vi", [("dxx", [0, 0]), ("dyy", [1, 1]),
                                     ("dxxx", [0, 0, 0]),
                                     ("dxy", [0, 1])])
def test_jet_derivative_engine(cord, name, vi):
    """Taylor-mode backend matches analytic (pure partials via jet, mixed
    falls back to nested jvp)."""
    eng = DerivativeEngine("jet")
    got = eng(f_scalar, cord, vi, 2)[0]
    np.testing.assert_allclose(np.asarray(got), analytic(cord, name),
                               rtol=1e-7, atol=1e-8)


def test_jet_engine_reverse_differentiable(cord):
    eng = DerivativeEngine("jet")
    w = jnp.asarray(1.1)

    def loss(w):
        def u(x):
            return (jnp.sin(w * x[0]) * x[1])[None, :]

        return jnp.sum(eng(u, cord, [0, 0], 2) ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(float(g))
