"""PINOPDE / field-grid lowering tests (beyond reference: the reference's
PINO surface is ODE-only, src/pino_ode_solve.jl — this extends the operator
family to symbolic `PDESystem` problems on an FNO backbone)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neuralpde_tpu import (
    FNO1D, FNO2D, FNO3D, GaussianRandomField, GridTraining, PDESystem,
    PINOPDE, SpectralConv2D, SpectralConv3D, StochasticTraining,
    solve_pino_pde,
)
from neuralpde_tpu.compile.fieldgrid import (
    FieldGridContext, build_field_residual, grid_diff,
)
from neuralpde_tpu.symbolic import expr as E
from neuralpde_tpu.symbolic.system import Domain, Interval

PI = float(np.pi)


# ---------------------------------------------------------------- grid_diff

def _fd_error(n, order):
    xs = jnp.linspace(0.0, 1.0, n, dtype=jnp.float64)
    h = float(xs[1] - xs[0])
    u = jnp.sin(2 * xs)[:, None]
    d = grid_diff(u, h, 0, order)
    want = (2 * jnp.cos(2 * xs) if order == 1 else -4 * jnp.sin(2 * xs))
    return float(jnp.max(jnp.abs(d[:, 0] - want)))


@pytest.mark.parametrize("order", [1, 2])
def test_grid_diff_second_order_convergence(order):
    """Interior + one-sided boundary stencils are all second order: halving
    h shrinks the max error ~4x (boundary rows included in the max)."""
    e1, e2 = _fd_error(33, order), _fd_error(65, order)
    assert e1 / e2 > 3.0


def test_grid_diff_higher_order_composes():
    xs = jnp.linspace(0.0, 1.0, 129, dtype=jnp.float64)
    h = float(xs[1] - xs[0])
    d3 = grid_diff(jnp.sin(xs)[:, None], h, 0, 3)[5:-5, 0]
    np.testing.assert_allclose(np.asarray(d3), -np.cos(np.asarray(xs[5:-5])),
                               atol=5e-3)


def test_grid_diff_rejects_tiny_grids():
    with pytest.raises(ValueError, match="grid nodes"):
        grid_diff(jnp.ones((2, 1)), 0.5, 0, 1)


# ----------------------------------------------------- field-grid lowering

def _ctx(nx=9, nt=7):
    return FieldGridContext(
        iv_names=["x", "t"],
        grids=[jnp.linspace(0.0, 1.0, nx), jnp.linspace(0.0, 2.0, nt)],
        dict_depvar_input={"u": ["x", "t"]},
        eq_params=["nu"])


def test_field_residual_matches_manual_fd():
    """Interior lowering of Dt(u) - nu*Dxx(u) on a manufactured field equals
    the hand-built FD arrays."""
    x, t = E.Sym("x"), E.Sym("t")
    nu, u = E.Param("nu"), E.DepVar("u")
    eq = E.Eq(E.Deriv(u(x, t), (t,)), nu * E.Deriv(u(x, t), (x, x)))
    ctx = _ctx()
    res = build_field_residual(eq, ctx)
    key = jax.random.key(0)
    field = jax.random.normal(key, (9, 7, 3))
    p = jnp.asarray([[0.5, 1.0, 2.0]])
    got = res({"u": field}, p)
    hx, ht = ctx.spacings
    want = (grid_diff(field, ht, 1, 1)
            - p[0].reshape(1, 1, 3) * grid_diff(field, hx, 0, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_boundary_condition_lowers_to_slice():
    """u(0, t) ~ sin(pi t) pins x to node 0 -> residual shape (1, T, P)."""
    x, t, u = E.Sym("x"), E.Sym("t"), E.DepVar("u")
    bc = E.Eq(u(E.Num(0.0), t), E.sin(E.Num(PI) * t))
    ctx = _ctx()
    res = build_field_residual(bc, ctx)
    field = jnp.zeros((9, 7, 2))
    out = res({"u": field}, jnp.zeros((1, 2)))
    assert out.shape == (1, 7, 2)
    want = -np.sin(PI * np.asarray(ctx.grids[1]))[None, :, None]
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(want, (1, 7, 2)), atol=1e-6)


def test_boundary_derivative_condition():
    """Dx(u)(1, t) ~ 0 takes the full-axis FD first, then slices the last
    x-row (the one-sided boundary stencil makes that row second-order)."""
    x, t, u = E.Sym("x"), E.Sym("t"), E.DepVar("u")
    bc = E.Eq(E.Deriv(u(E.Num(1.0), t), (x,)), E.Num(0.0))
    ctx = _ctx()
    res = build_field_residual(bc, ctx)
    field = jax.random.normal(jax.random.key(1), (9, 7, 2))
    out = res({"u": field}, jnp.zeros((1, 2)))
    want = grid_diff(field, ctx.spacings[0], 0, 1)[-1:, :, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_derivative_wrt_nongrid_variable_is_zero():
    x, t, u = E.Sym("x"), E.Sym("t"), E.DepVar("u")
    z = E.Sym("z")
    eq = E.Eq(E.Deriv(u(x, t), (z,)), E.Num(0.0))
    out = build_field_residual(eq, _ctx())({"u": jnp.ones((9, 7, 1))},
                                           jnp.zeros((1, 1)))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_offgrid_boundary_constant_raises():
    x, t, u = E.Sym("x"), E.Sym("t"), E.DepVar("u")
    bc = E.Eq(u(E.Num(0.31), t), E.Num(0.0))
    res = build_field_residual(bc, _ctx())
    with pytest.raises(ValueError, match="not a grid node"):
        res({"u": jnp.zeros((9, 7, 1))}, jnp.zeros((1, 1)))


def test_noncanonical_call_argument_raises():
    """u(t, x) (swapped arguments) is rejected — fields live on the grid in
    declaration order; transposed calls need the pointwise path."""
    x, t, u = E.Sym("x"), E.Sym("t"), E.DepVar("u")
    eq = E.Eq(u(t, x), E.Num(0.0))
    res = build_field_residual(eq, _ctx())
    with pytest.raises(ValueError, match="canonical"):
        res({"u": jnp.zeros((9, 7, 1))}, jnp.zeros((1, 1)))


def test_integral_terms_rejected():
    x, t, u = E.Sym("x"), E.Sym("t"), E.DepVar("u")
    ix = E.Integral(x, 0.0, 1.0)
    eq = E.Eq(ix(u(x, t)), E.Num(0.0))
    res = build_field_residual(eq, _ctx())
    with pytest.raises(NotImplementedError, match="integral"):
        res({"u": jnp.zeros((9, 7, 1))}, jnp.zeros((1, 1)))


# ------------------------------------------------------------ SpectralConv2D

def test_spectral_conv2d_shapes_and_mode_clip():
    layer = SpectralConv2D(3, 5, modes=64)     # modes > grid: clipped
    params = layer.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (3, 12, 10, 4), jnp.float32)
    y = layer.apply(params, x)
    assert y.shape == (5, 12, 10, 4)
    assert jnp.isfinite(y).all()


def test_spectral_conv2d_resolution_consistency():
    """Band-limited periodic input at (N, N) and (2N, 2N) gives matching
    outputs on the shared nodes (2-D discretization invariance)."""
    layer = SpectralConv2D(1, 1, modes=(3, 3))
    params = layer.init(jax.random.key(2))

    def run(n):
        g = jnp.arange(n) / n
        f = (jnp.sin(2 * jnp.pi * g)[:, None]
             * jnp.cos(2 * jnp.pi * g)[None, :])
        return layer.apply(params, f[None, :, :, None])[0, :, :, 0]

    coarse, fine = run(16), run(32)
    np.testing.assert_allclose(np.asarray(coarse),
                               np.asarray(fine[::2, ::2]), atol=1e-5)


def test_fno2d_input_layouts():
    net = FNO2D(in_channels=2, width=8, modes=4, depth=2)
    params = net.init(jax.random.key(0))
    gx, gt = jnp.linspace(0, 1, 9), jnp.linspace(0, 1, 7)
    p_cols = jax.random.normal(jax.random.key(1), (2, 5), jnp.float32)
    out = net.apply(params, (p_cols, (gx, gt)))
    assert out.shape == (9, 7, 5)
    p_field = jnp.broadcast_to(p_cols[:, None, None, :], (2, 9, 7, 5))
    out2 = net.apply(params, (p_field, (gx, gt)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
    with pytest.raises(ValueError, match="ndim"):
        net.apply(params, (p_cols[0], (gx, gt)))


def test_spectral_conv3d_shapes_and_mode_clip():
    layer = SpectralConv3D(2, 3, modes=32)     # modes > grid: clipped
    params = layer.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 9, 8, 10, 4), jnp.float32)
    y = layer.apply(params, x)
    assert y.shape == (3, 9, 8, 10, 4)
    assert jnp.isfinite(y).all()


def test_spectral_conv3d_resolution_consistency():
    """Band-limited periodic input at N^3 and (2N)^3 gives matching outputs
    on the shared nodes (3-D discretization invariance)."""
    layer = SpectralConv3D(1, 1, modes=(2, 2, 2))
    params = layer.init(jax.random.key(2))

    def run(n):
        g = jnp.arange(n) / n
        f = (jnp.sin(2 * jnp.pi * g)[:, None, None]
             * jnp.cos(2 * jnp.pi * g)[None, :, None]
             * jnp.sin(2 * jnp.pi * g)[None, None, :])
        return layer.apply(params, f[None, :, :, :, None])[0, ..., 0]

    coarse, fine = run(8), run(16)
    np.testing.assert_allclose(np.asarray(coarse),
                               np.asarray(fine[::2, ::2, ::2]), atol=1e-5)


def test_fno3d_input_layouts():
    net = FNO3D(in_channels=2, width=8, modes=3, depth=2)
    params = net.init(jax.random.key(0))
    gs = (jnp.linspace(0, 1, 9), jnp.linspace(0, 1, 7),
          jnp.linspace(0, 1, 8))
    p_cols = jax.random.normal(jax.random.key(1), (2, 4), jnp.float32)
    out = net.apply(params, (p_cols, gs))
    assert out.shape == (9, 7, 8, 4)
    p_field = jnp.broadcast_to(p_cols[:, None, None, None, :],
                               (2, 9, 7, 8, 4))
    out2 = net.apply(params, (p_field, gs))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
    with pytest.raises(ValueError, match="ndim"):
        net.apply(params, (p_cols[0], gs))


def test_pino_pde_fno3d_heat2d_family():
    """2-D + time: the heat family u_t = nu (u_xx + u_yy) on an FNO3D
    backbone, against the analytic separable solution."""
    x, y, t = E.Sym("x"), E.Sym("y"), E.Sym("t")
    nu, u = E.Param("nu"), E.DepVar("u")
    U = u(x, y, t)
    eq = E.Eq(E.Deriv(U, (t,)),
              nu * (E.Deriv(U, (x, x)) + E.Deriv(U, (y, y))))
    bcs = [E.Eq(u(x, y, E.Num(0.0)),
                E.sin(E.Num(PI) * x) * E.sin(E.Num(PI) * y)),
           E.Eq(u(E.Num(0.0), y, t), E.Num(0.0)),
           E.Eq(u(E.Num(1.0), y, t), E.Num(0.0)),
           E.Eq(u(x, E.Num(0.0), t), E.Num(0.0)),
           E.Eq(u(x, E.Num(1.0), t), E.Num(0.0))]
    sysd = PDESystem(eq, bcs,
                     [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1)),
                      Domain(t, Interval(0, 0.5))],
                     ivs=[x, y, t], dvs=[U], ps=[nu])
    alg = PINOPDE(chain=FNO3D(1, width=12, modes=5, depth=2),
                  opt=optax.adam(3e-3), bounds=[(0.05, 0.3)],
                  number_of_parameters=5,
                  strategy=GridTraining([1 / 16, 1 / 16, 1 / 32]))
    sol = solve_pino_pde(sysd, alg, maxiters=400, inner_steps=25)
    gx, gt = np.linspace(0, 1, 17), np.linspace(0, 0.5, 17)
    ps = np.linspace(0.08, 0.27, 5)
    pred = np.asarray(sol(p=ps[None, :], grids=[gx, gx, gt]))
    want = (np.exp(-2 * ps[None, None, None, :] * PI**2
                   * gt[None, None, :, None])
            * np.sin(PI * gx[:, None, None, None])
            * np.sin(PI * gx[None, :, None, None]))
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 0.1, rel


def test_fno2d_vector_output_shape():
    net = FNO2D(in_channels=1, width=8, modes=4, depth=2, out_channels=3)
    params = net.init(jax.random.key(0))
    out = net.apply(params, (jnp.ones((1, 4)),
                             (jnp.linspace(0, 1, 9), jnp.linspace(0, 1, 7))))
    assert out.shape == (3, 9, 7, 4)


# ----------------------------------------------------------------- PINOPDE

def _heat_system():
    x, t = E.Sym("x"), E.Sym("t")
    nu, u = E.Param("nu"), E.DepVar("u")
    eq = E.Eq(E.Deriv(u(x, t), (t,)), nu * E.Deriv(u(x, t), (x, x)))
    bcs = [E.Eq(u(x, E.Num(0.0)), E.sin(E.Num(PI) * x)),
           E.Eq(u(E.Num(0.0), t), E.Num(0.0)),
           E.Eq(u(E.Num(1.0), t), E.Num(0.0))]
    return PDESystem(eq, bcs,
                     [Domain(x, Interval(0.0, 1.0)),
                      Domain(t, Interval(0.0, 1.0))],
                     ivs=[x, t], dvs=[u(x, t)], ps=[nu])


def test_pino_pde_validation_errors():
    sysd = _heat_system()
    mk = lambda **kw: PINOPDE(chain=FNO2D(1, width=8, modes=4, depth=2),
                              bounds=[(0.05, 0.5)],
                              strategy=GridTraining(0.25), **kw)
    with pytest.raises(ValueError, match="GridTraining"):
        solve_pino_pde(sysd, PINOPDE(chain=FNO2D(1, width=8, modes=4,
                                                 depth=2),
                                     bounds=[(0.05, 0.5)],
                                     strategy=StochasticTraining(16)),
                       maxiters=1)
    with pytest.raises(ValueError, match="one .lb, ub. bound"):
        solve_pino_pde(sysd, PINOPDE(chain=FNO2D(1, width=8, modes=4,
                                                 depth=2),
                                     strategy=GridTraining(0.25)), maxiters=1)
    with pytest.raises(ValueError, match="in_channels"):
        solve_pino_pde(sysd, PINOPDE(chain=FNO2D(2, width=8, modes=4,
                                                 depth=2),
                                     bounds=[(0.05, 0.5)],
                                     strategy=GridTraining(0.25)), maxiters=1)
    # non-parametric system
    nop = _heat_system()
    nop.ps = []
    nop.eqs = [E.Eq(E.Deriv(E.DepVar("u")(E.Sym("x"), E.Sym("t")),
                            (E.Sym("t"),)), E.Num(0.0))]
    with pytest.raises(ValueError, match="parametric"):
        solve_pino_pde(nop, mk(), maxiters=1)
    # FNO1D on a 2-iv system
    with pytest.raises(ValueError, match="1 independent variable"):
        solve_pino_pde(sysd, PINOPDE(chain=FNO1D(1, width=8, modes=4,
                                                 depth=2),
                                     bounds=[(0.05, 0.5)],
                                     strategy=GridTraining(0.25)), maxiters=1)


def test_pino_pde_coupled_system_and_periodic_bc():
    """Two coupled fields on one FNO (out_channels=2): transport
    u_t + c u_x = 0 plus the derivative-extraction field v = u_x, with a
    periodic pair u(0,t) ~ u(1,t) (both sides lower to slices).  Checked
    against the analytic travelling wave for both fields."""
    x, t = E.Sym("x"), E.Sym("t")
    c, u, v = E.Param("c"), E.DepVar("u"), E.DepVar("v")
    eqs = [E.Eq(E.Deriv(u(x, t), (t,)) + c * E.Deriv(u(x, t), (x,)),
                E.Num(0.0)),
           E.Eq(v(x, t), E.Deriv(u(x, t), (x,)))]
    bcs = [E.Eq(u(x, E.Num(0.0)), E.sin(E.Num(2 * PI) * x)),
           E.Eq(u(E.Num(0.0), t), u(E.Num(1.0), t))]
    sysd = PDESystem(eqs, bcs,
                     [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 0.5))],
                     ivs=[x, t], dvs=[u(x, t), v(x, t)], ps=[c])
    alg = PINOPDE(chain=FNO2D(1, width=16, modes=8, depth=3, out_channels=2),
                  opt=optax.adam(3e-3), bounds=[(0.5, 1.5)],
                  number_of_parameters=10,
                  strategy=GridTraining([1 / 32, 1 / 32]))
    sol = solve_pino_pde(sysd, alg, maxiters=700, inner_steps=25)
    gx, gt = np.linspace(0, 1, 33), np.linspace(0, 0.5, 17)
    ps = np.linspace(0.6, 1.4, 7)
    pred = np.asarray(sol(p=ps[None, :], grids=[gx, gt]))   # (2, X, T, P)
    phase = 2 * PI * (gx[:, None, None] - ps[None, None, :] * gt[None, :, None])
    wu, wv = np.sin(phase), 2 * PI * np.cos(phase)
    assert np.linalg.norm(pred[0] - wu) / np.linalg.norm(wu) < 0.08
    assert np.linalg.norm(pred[1] - wv) / np.linalg.norm(wv) < 0.12


def test_pino_pde_fno1d_one_iv_family():
    """One independent variable routes through FNO1D: the growth family
    w' = p w, w(0) = 1 over p in [0.2, 1], evaluated at doubled
    resolution."""
    x = E.Sym("x")
    p1, w = E.Param("p"), E.DepVar("w")
    sysd = PDESystem(E.Eq(E.Deriv(w(x), (x,)), p1 * w(x)),
                     [E.Eq(w(E.Num(0.0)), E.Num(1.0))],
                     [Domain(x, Interval(0, 1))], ivs=[x], dvs=[w(x)],
                     ps=[p1])
    alg = PINOPDE(chain=FNO1D(1, width=16, modes=8, depth=3),
                  opt=optax.adam(3e-3), bounds=[(0.2, 1.0)],
                  number_of_parameters=12, strategy=GridTraining(1 / 32))
    sol = solve_pino_pde(sysd, alg, maxiters=500, inner_steps=25)
    ps = np.linspace(0.3, 0.9, 9)
    xs = np.linspace(0, 1, 65)
    pred = np.asarray(sol(p=ps[None, :], grids=[xs]))
    want = np.exp(ps[None, :] * xs[:, None])
    assert np.linalg.norm(pred - want) / np.linalg.norm(want) < 0.02


def test_gaussian_random_field_sampler():
    """GRF samples are periodic (wrap node matches), smooth at the
    requested length scale, and normalized to ~unit std."""
    grf = GaussianRandomField(length_scale=0.2)
    g = jnp.linspace(0.0, 1.0, 65)
    f = np.asarray(grf(jax.random.key(0), [g], 32))
    assert f.shape == (65, 32)
    np.testing.assert_allclose(f[0], f[-1], atol=1e-6)       # periodic wrap
    assert abs(float(np.std(f)) - 1.0) < 0.05
    # smoothness: total variation of a l=0.2 field is far below white noise
    tv = np.abs(np.diff(f, axis=0)).mean()
    assert tv < 0.2, tv
    # 2-D sampling
    f2 = np.asarray(grf(jax.random.key(1), [g, jnp.linspace(0, 2, 33)], 4))
    assert f2.shape == (65, 33, 4)
    np.testing.assert_allclose(f2[0], f2[-1], atol=1e-6)
    np.testing.assert_allclose(f2[:, 0], f2[:, -1], atol=1e-6)


def test_pino_pde_initial_condition_operator():
    """The classic operator-learning benchmark shape: u0 -> u(x, t) for the
    periodic heat equation, with GRF-sampled initial conditions fed to the
    FNO as a function-valued channel.  Held-out ICs are checked against the
    EXACT spectral evolution of the sampled field."""
    NU = 0.05
    x, t = E.Sym("x"), E.Sym("t")
    u, f0 = E.DepVar("u"), E.DepVar("f0")
    eq = E.Eq(E.Deriv(u(x, t), (t,)), E.Num(NU) * E.Deriv(u(x, t), (x, x)))
    bcs = [E.Eq(u(x, E.Num(0.0)), f0(x)),
           E.Eq(u(E.Num(0.0), t), u(E.Num(1.0), t)),
           E.Eq(E.Deriv(u(E.Num(0.0), t), (x,)),
                E.Deriv(u(E.Num(1.0), t), (x,)))]
    sysd = PDESystem(eq, bcs,
                     [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 0.5))],
                     ivs=[x, t], dvs=[u(x, t)])
    grf = GaussianRandomField(length_scale=0.15)
    alg = PINOPDE(chain=FNO2D(1, width=16, modes=(10, 6), depth=2),
                  opt=optax.adam(2e-3), number_of_parameters=16,
                  input_functions={f0(x): grf},
                  strategy=GridTraining([1 / 32, 1 / 16]))
    sol = solve_pino_pde(sysd, alg, maxiters=800, inner_steps=25)

    gx, gt = np.asarray(sol.grids[0]), np.asarray(sol.grids[1])
    test_ic = np.asarray(grf(jax.random.key(99), [sol.grids[0]], 8))
    pred = np.asarray(sol(input_values={"f0": jnp.asarray(test_ic)}))
    m = len(gx) - 1
    k = 2 * np.pi * np.fft.rfftfreq(m, d=1.0 / m)
    uh0 = np.fft.rfft(test_ic[:-1, :], axis=0)
    want = np.stack([np.fft.irfft(uh0 * np.exp(-NU * k[:, None]**2 * tt),
                                  n=m, axis=0) for tt in gt], axis=1)
    want = np.concatenate([want, want[:1]], axis=0)
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 0.09, rel


def test_pino_pde_input_function_validation():
    x, t = E.Sym("x"), E.Sym("t")
    u, f0 = E.DepVar("u"), E.DepVar("f0")
    eq = E.Eq(E.Deriv(u(x, t), (t,)), E.Deriv(u(x, t), (x, x)))
    sysd = PDESystem(eq, [E.Eq(u(x, E.Num(0.0)), f0(x))],
                     [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 1))],
                     ivs=[x, t], dvs=[u(x, t)])
    grf = GaussianRandomField(0.2)
    # input fn declared out of grid order (t, x) is rejected
    bad = E.DepVar("g0")
    with pytest.raises(ValueError, match="subset"):
        solve_pino_pde(sysd, PINOPDE(
            chain=FNO2D(2, width=8, modes=4, depth=2),
            number_of_parameters=4, input_functions={bad(t, x): grf},
            strategy=GridTraining(0.25)), maxiters=1)
    # input fn that is also a solved depvar is rejected
    with pytest.raises(ValueError, match="also a solved depvar"):
        solve_pino_pde(sysd, PINOPDE(
            chain=FNO2D(1, width=8, modes=4, depth=2),
            number_of_parameters=4, input_functions={u(x, t): grf},
            strategy=GridTraining(0.25)), maxiters=1)
    # in_channels must count input functions
    with pytest.raises(ValueError, match="n_input_functions"):
        solve_pino_pde(sysd, PINOPDE(
            chain=FNO2D(2, width=8, modes=4, depth=2),
            number_of_parameters=4, input_functions={f0(x): grf},
            strategy=GridTraining(0.25)), maxiters=1)
    # evaluation on new grids without input_values is rejected
    sol = solve_pino_pde(sysd, PINOPDE(
        chain=FNO2D(1, width=8, modes=4, depth=2),
        number_of_parameters=4, input_functions={f0(x): grf},
        strategy=GridTraining(0.25)), maxiters=2)
    with pytest.raises(ValueError, match="input_values"):
        sol(grids=[np.linspace(0, 1, 9), np.linspace(0, 1, 9)])


def test_pino_pde_resampled_family():
    """resample=True draws a fresh family every step inside the jitted
    loss: scalar parameters uniform over bounds + GRF input functions.
    Held-out ICs stay in the fixed-family accuracy class."""
    NU = 0.05
    x, t = E.Sym("x"), E.Sym("t")
    u, f0 = E.DepVar("u"), E.DepVar("f0")
    eq = E.Eq(E.Deriv(u(x, t), (t,)), E.Num(NU) * E.Deriv(u(x, t), (x, x)))
    bcs = [E.Eq(u(x, E.Num(0.0)), f0(x)),
           E.Eq(u(E.Num(0.0), t), u(E.Num(1.0), t))]
    sysd = PDESystem(eq, bcs,
                     [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 0.5))],
                     ivs=[x, t], dvs=[u(x, t)])
    grf = GaussianRandomField(length_scale=0.15)
    alg = PINOPDE(chain=FNO2D(1, width=16, modes=(10, 6), depth=2),
                  opt=optax.adam(2e-3), number_of_parameters=16,
                  input_functions={f0(x): grf}, resample=True,
                  strategy=GridTraining([1 / 32, 1 / 16]))
    sol = solve_pino_pde(sysd, alg, maxiters=800, inner_steps=25)
    gx, gt = np.asarray(sol.grids[0]), np.asarray(sol.grids[1])
    test_ic = np.asarray(grf(jax.random.key(77), [sol.grids[0]], 8))
    pred = np.asarray(sol(input_values={"f0": jnp.asarray(test_ic)}))
    m = len(gx) - 1
    k = 2 * np.pi * np.fft.rfftfreq(m, d=1.0 / m)
    uh0 = np.fft.rfft(test_ic[:-1, :], axis=0)
    want = np.stack([np.fft.irfft(uh0 * np.exp(-NU * k[:, None]**2 * tt),
                                  n=m, axis=0) for tt in gt], axis=1)
    want = np.concatenate([want, want[:1]], axis=0)
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 0.12, rel

    # scalar-parameter resampling path compiles and trains
    nu, w = E.Param("nu"), E.DepVar("w")
    eq2 = E.Eq(E.Deriv(w(x, t), (t,)), nu * E.Deriv(w(x, t), (x, x)))
    sys2 = PDESystem(eq2, [E.Eq(w(x, E.Num(0.0)), E.sin(E.Num(PI) * x))],
                     [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 1))],
                     ivs=[x, t], dvs=[w(x, t)], ps=[nu])
    alg2 = PINOPDE(chain=FNO2D(1, width=8, modes=4, depth=2),
                   bounds=[(0.05, 0.3)], number_of_parameters=6,
                   resample=True, strategy=GridTraining(0.25))
    sol2 = solve_pino_pde(sys2, alg2, maxiters=10, inner_steps=5)
    assert np.isfinite(float(sol2.original.objective))


def test_pino_pde_heat_family():
    """Parametric heat equation u_t = nu u_xx over nu in [0.05, 0.5]: one
    trained operator, evaluated off the training parameter set AND on a
    finer grid (33 > 17 training nodes), against the analytic
    exp(-nu pi^2 t) sin(pi x)."""
    sysd = _heat_system()
    alg = PINOPDE(chain=FNO2D(1, width=16, modes=6, depth=2),
                  opt=optax.adam(3e-3), bounds=[(0.05, 0.5)],
                  number_of_parameters=10, strategy=GridTraining(1 / 16))
    sol = solve_pino_pde(sysd, alg, maxiters=800, inner_steps=25)
    assert sol.u.shape == (17, 17, 10)
    gx, gt = np.linspace(0, 1, 33), np.linspace(0, 1, 33)
    ps = np.linspace(0.1, 0.45, 7)
    pred = np.asarray(sol(p=ps[None, :], grids=[gx, gt]))
    want = (np.exp(-ps[None, None, :] * PI**2 * gt[None, :, None])
            * np.sin(PI * gx[:, None, None]))
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 0.15, rel


def test_pino_pde_gauss_newton_polish():
    """solve_pino_pde_gauss_newton polishes an Adam-trained operator: the
    deterministic least-squares objective drops >= 10x; resample and
    additional_loss configs are rejected."""
    from neuralpde_tpu import solve_pino_pde_gauss_newton

    sysd = _heat_system()
    mk = lambda **kw: PINOPDE(chain=FNO2D(1, width=16, modes=6, depth=2),
                              opt=optax.adam(3e-3), bounds=[(0.05, 0.5)],
                              number_of_parameters=10,
                              strategy=GridTraining(1 / 16), **kw)
    sol = solve_pino_pde(sysd, mk(), maxiters=400, inner_steps=25)
    adam_loss = float(sol.original.objective)
    sol2 = solve_pino_pde_gauss_newton(
        sysd, mk(init_params=sol.original.u["depvar"]), maxiters=30)
    gn_loss = float(sol2.original.objective)
    assert gn_loss < adam_loss / 10, (adam_loss, gn_loss)
    assert sol2.u.shape == sol.u.shape

    with pytest.raises(ValueError, match="resample"):
        solve_pino_pde_gauss_newton(sysd, mk(resample=True), maxiters=1)
    with pytest.raises(ValueError, match="additional_loss"):
        solve_pino_pde_gauss_newton(
            sysd, mk(additional_loss=lambda f, th: 0.0), maxiters=1)


def test_pino_pde_causal_weighting_matches_manual():
    """causal_eps weights the interior residual's time slices by
    exp(-eps*dt*cumsum(L)) (gradient-blocked, dt-normalized like
    SeparableTraining); the total loss matches a manual recomputation from
    the same residual fields, and BCs stay unweighted."""
    sysd = _heat_system()
    eps = 5.0
    alg = PINOPDE(chain=FNO2D(1, width=8, modes=4, depth=2),
                  bounds=[(0.05, 0.5)], number_of_parameters=4,
                  causal_eps=eps, strategy=GridTraining(0.25))
    sol = solve_pino_pde(sysd, alg, maxiters=2, inner_steps=1)
    theta = {"depvar": sol.original.u["depvar"]}
    got = float(sol.loss_fn(theta, jax.random.key(0)))

    # manual: rebuild the residual fields through the public surface
    from neuralpde_tpu.compile.fieldgrid import (FieldGridContext,
                                                 build_field_residual)
    gx = np.asarray(sol.grids[0])
    gt = np.asarray(sol.grids[1])
    ctx = FieldGridContext(iv_names=["x", "t"],
                           grids=[jnp.asarray(gx), jnp.asarray(gt)],
                           dict_depvar_input={"u": ["x", "t"]},
                           eq_params=["nu"])
    fields = {"u": sol.u}
    dt_node = gt[1] - gt[0]
    want = 0.0
    for i, eq in enumerate(sysd.eqs + sysd.bcs):
        r = np.asarray(build_field_residual(eq, ctx)(fields, sol.p))
        if i < len(sysd.eqs):
            L = (r ** 2).mean(axis=(0, 2))
            csum = np.cumsum(L) - L
            w = np.exp(-eps * dt_node * csum)
            want += (w * L).mean()
        else:
            want += (r ** 2).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # GN rejects causal configs
    from neuralpde_tpu import solve_pino_pde_gauss_newton
    with pytest.raises(ValueError, match="causal"):
        solve_pino_pde_gauss_newton(sysd, alg, maxiters=1)


# ------------------------------------------- NS vorticity flagship (gated)

def test_ns_vorticity_operator_downscaled():
    """2-D Navier-Stokes vorticity-streamfunction operator from
    examples/ns_vorticity_pino.py, tiny: coupled w/psi system with a
    function-valued GRF initial vorticity, gauge-pinning additional_loss,
    periodic pairs — gates the flagship example end-to-end (full-budget
    accuracy numbers in PERF.md).  Also self-checks the example's in-script
    pseudo-spectral reference against the exact heat decay."""
    import os
    import sys

    sys.path.append(os.path.join(os.path.dirname(__file__), "..", "examples"))
    import ns_vorticity_pino as nsv
    from neuralpde_tpu import FNO3D, GridTraining, PINOPDE, solve_pino_pde

    # spectral reference: single-mode field has no advection -> exact decay
    m, nu = 16, 0.05
    g = np.linspace(0, 1, m + 1)
    X, _ = np.meshgrid(g, g, indexing="ij")
    w1 = np.sin(2 * np.pi * X)
    ts = np.linspace(0, 0.25, 3)
    got = nsv.reference_ns_vorticity(w1, nu, ts, n=32, substeps=4)
    want = w1[:, :, None] * np.exp(-nu * (2 * np.pi) ** 2 * ts)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-8

    NU, SIGMA, LSCALE, TMAX = 0.02, 3.0, 0.25, 0.5
    S = SIGMA * (LSCALE / (2 * np.pi)) ** 2 * 10
    system, w0_call = nsv.build_system(NU, S, TMAX)
    sampler = nsv.zero_mean_grf(LSCALE, SIGMA**2)
    gauge = lambda fields, theta: 10.0 * jnp.mean(
        jnp.mean(fields["psi"], axis=(0, 1)) ** 2)
    alg = PINOPDE(chain=FNO3D(1, width=8, modes=(4, 4, 3), depth=2,
                              out_channels=2),
                  opt=optax.adam(2e-3), number_of_parameters=2,
                  input_functions={w0_call: sampler}, additional_loss=gauge,
                  strategy=GridTraining([1 / 8, 1 / 8, TMAX / 4]))
    sol = solve_pino_pde(system, alg, maxiters=30, inner_steps=10)
    assert np.isfinite(float(sol.original.objective))
    assert float(sol.original.objective) < float(sol.original.history[0])

    # held-out ICs evaluate through the function-channel path; the sampled
    # zero-mean constraint must survive prediction plumbing (shape + finite)
    test_ic = np.asarray(sampler(jax.random.key(1),
                                 [sol.grids[0], sol.grids[1]], 2))
    pred = np.asarray(sol(input_values={"w0": jnp.asarray(test_ic)}))
    assert pred.shape == (2, 9, 9, 5, 2)
    assert np.all(np.isfinite(pred))
    # IC slice of the vorticity channel aligns with the sampled w0 layout
    ic_err = np.linalg.norm(pred[0, :, :, 0, :] - test_ic)
    assert np.isfinite(ic_err)


# --------------------------------------------- DeepONetPDE backbone (PI-DeepONet)

def test_pino_pde_deeponet_heat_family():
    """PI-DeepONet backbone on the heat family: branch eats the parameter
    columns, trunk the grid coordinates; same lowering, same accuracy class
    as the FNO2D row, and the trunk is MESH-FREE — evaluation on a
    non-uniform grid (which FNO's FFT resampling cannot do) matches the
    analytic solution."""
    from neuralpde_tpu import DeepONetPDE

    sysd = _heat_system()
    alg = PINOPDE(chain=DeepONetPDE(1, 2, latent=32, branch_sizes=(32,),
                                    trunk_sizes=(32, 32)),
                  opt=optax.adam(3e-3), bounds=[(0.05, 0.5)],
                  number_of_parameters=10, strategy=GridTraining(1 / 16))
    sol = solve_pino_pde(sysd, alg, maxiters=800, inner_steps=25)
    assert sol.u.shape == (17, 17, 10)

    ps = np.linspace(0.1, 0.45, 7)
    # non-uniform evaluation grid: Chebyshev-clustered nodes in x, t
    gx = 0.5 * (1 - np.cos(np.linspace(0, PI, 29)))
    gt = np.sort(np.concatenate([[0.0, 1.0],
                                 np.random.default_rng(0).uniform(0, 1, 21)]))
    pred = np.asarray(sol(p=ps[None, :], grids=[gx, gt]))
    want = (np.exp(-ps[None, None, :] * PI**2 * gt[None, :, None])
            * np.sin(PI * gx[:, None, None]))
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 0.15, rel


def test_pino_pde_deeponet_validation():
    from neuralpde_tpu import DeepONetPDE

    sysd = _heat_system()
    with pytest.raises(ValueError, match="grid_ndim"):
        solve_pino_pde(sysd, PINOPDE(chain=DeepONetPDE(1, 3),
                                     bounds=[(0.05, 0.5)],
                                     strategy=GridTraining(0.25)), maxiters=1)
    # function-valued inputs need an FNO backbone
    x, t = E.Sym("x"), E.Sym("t")
    nu, u, f0 = E.Param("nu"), E.DepVar("u"), E.DepVar("f0")
    sysf = PDESystem(
        E.Eq(E.Deriv(u(x, t), (t,)), nu * E.Deriv(u(x, t), (x, x))),
        [E.Eq(u(x, E.Num(0.0)), f0(x))],
        [Domain(x, Interval(0.0, 1.0)), Domain(t, Interval(0.0, 1.0))],
        ivs=[x, t], dvs=[u(x, t)], ps=[nu])
    with pytest.raises(ValueError, match="FNO backbone"):
        solve_pino_pde(sysf, PINOPDE(
            chain=DeepONetPDE(2, 2), bounds=[(0.05, 0.5)],
            input_functions={f0(x): GaussianRandomField(0.2)},
            strategy=GridTraining(0.25)), maxiters=1)
    with pytest.raises(ValueError, match="scalar parameter channel"):
        DeepONetPDE(0, 2)


# ------------------------------------------------- spectral derivatives (r5)

def test_grid_diff_spectral_exact_on_fourier_modes():
    """FFT differentiation is exact (to rounding) on band-limited periodic
    fields — vs grid_diff's O(h^2) truncation."""
    from neuralpde_tpu.compile.fieldgrid import grid_diff_spectral

    n = 32
    xs = jnp.linspace(0.0, 1.0, n + 1)          # wrap node included
    u = jnp.sin(2 * PI * 3 * xs)[:, None]
    d1 = grid_diff_spectral(u, 1.0, 0, 1)
    want1 = 2 * PI * 3 * jnp.cos(2 * PI * 3 * xs)[:, None]
    np.testing.assert_allclose(np.asarray(d1), np.asarray(want1),
                               atol=1e-9 * (2 * PI * 3))
    d2 = grid_diff_spectral(u, 1.0, 0, 2)
    want2 = -(2 * PI * 3) ** 2 * u
    np.testing.assert_allclose(np.asarray(d2), np.asarray(want2),
                               rtol=1e-9, atol=1e-6)
    # wrap node consistency: derivative repeats at both endpoints
    np.testing.assert_allclose(np.asarray(d1[0]), np.asarray(d1[-1]))
    # FD on the same grid carries visible truncation error; spectral none
    fd = grid_diff(u, float(xs[1] - xs[0]), 0, 1)
    assert np.abs(np.asarray(fd - want1)).max() > 1e-2


def test_grid_diff_spectral_nyquist_and_axis():
    """Odd-order Nyquist zeroing: the pure Nyquist mode cos(pi n x) has no
    representable first derivative -> exactly zero; and axis handling
    matches moveaxis semantics."""
    from neuralpde_tpu.compile.fieldgrid import grid_diff_spectral

    n = 16
    xs = np.linspace(0.0, 2.0, n + 1)
    u = jnp.asarray(np.cos(2 * np.pi * (n // 2) * xs / 2.0))[None, :, None]
    d1 = grid_diff_spectral(u, 2.0, 1, 1)
    np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-10)
    d2 = grid_diff_spectral(u, 2.0, 1, 2)      # even order: exact
    want = -(2 * np.pi * (n // 2) / 2.0) ** 2 * np.asarray(u)
    np.testing.assert_allclose(np.asarray(d2), want, rtol=1e-8)


def test_field_residual_spectral_axis():
    """A FieldGridContext with spectral_axes lowers Deriv terms through the
    FFT on that axis and FD on the others; unknown axes are rejected."""
    nx, nt = 17, 7
    gx = jnp.linspace(0.0, 1.0, nx)
    gt = jnp.linspace(0.0, 0.5, nt)
    x, t = E.Sym("x"), E.Sym("t")
    u = E.DepVar("u")
    ctx = FieldGridContext(iv_names=["x", "t"], grids=[gx, gt],
                           dict_depvar_input={"u": ["x", "t"]}, eq_params=[],
                           spectral_axes=frozenset({"x"}))
    # u(x,t) = sin(2 pi x) * (1 + t): u_xx = -(2pi)^2 u, exact spectrally
    field = (jnp.sin(2 * PI * gx)[:, None] * (1.0 + gt)[None, :])[..., None]
    res = build_field_residual(
        E.Eq(E.Deriv(u(x, t), (x, x)), E.Num(-(2 * PI) ** 2) * u(x, t)), ctx)
    r = np.asarray(res({"u": field}, jnp.zeros((0, 1))))
    np.testing.assert_allclose(r, 0.0, atol=1e-4)
    # the t axis stays FD: u_t - sin = 0 only up to FD error but structure ok
    res_t = build_field_residual(
        E.Eq(E.Deriv(u(x, t), (t,)),
             E.Call("*", (E.Num(1.0), u(x, t)))), ctx)
    assert np.isfinite(np.asarray(res_t({"u": field},
                                        jnp.zeros((0, 1))))).all()
    with pytest.raises(ValueError, match="spectral_axes"):
        FieldGridContext(iv_names=["x"], grids=[gx],
                         dict_depvar_input={"u": ["x"]}, eq_params=[],
                         spectral_axes=frozenset({"zz"}))


def test_pino_pde_spectral_axes_ic_operator():
    """The heat IC-operator family trained with derivative='spectral' on the
    periodic x axis: same gate as the FD run, and the interior heat residual
    evaluated spectrally must be SMALLER than the FD path's truncation floor
    on the trained solution."""
    NU = 0.05
    x, t = E.Sym("x"), E.Sym("t")
    u, f0 = E.DepVar("u"), E.DepVar("f0")
    eq = E.Eq(E.Deriv(u(x, t), (t,)), E.Num(NU) * E.Deriv(u(x, t), (x, x)))
    bcs = [E.Eq(u(x, E.Num(0.0)), f0(x)),
           E.Eq(u(E.Num(0.0), t), u(E.Num(1.0), t)),
           E.Eq(E.Deriv(u(E.Num(0.0), t), (x,)),
                E.Deriv(u(E.Num(1.0), t), (x,)))]
    sysd = PDESystem(eq, bcs,
                     [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 0.5))],
                     ivs=[x, t], dvs=[u(x, t)])
    grf = GaussianRandomField(length_scale=0.15)
    alg = PINOPDE(chain=FNO2D(1, width=16, modes=(10, 6), depth=2),
                  opt=optax.adam(2e-3), number_of_parameters=16,
                  input_functions={f0(x): grf},
                  spectral_axes=(x,),
                  strategy=GridTraining([1 / 32, 1 / 16]))
    sol = solve_pino_pde(sysd, alg, maxiters=800, inner_steps=25)

    gx, gt = np.asarray(sol.grids[0]), np.asarray(sol.grids[1])
    test_ic = np.asarray(grf(jax.random.key(99), [sol.grids[0]], 8))
    pred = np.asarray(sol(input_values={"f0": jnp.asarray(test_ic)}))
    m = len(gx) - 1
    k = 2 * np.pi * np.fft.rfftfreq(m, d=1.0 / m)
    uh0 = np.fft.rfft(test_ic[:-1, :], axis=0)
    want = np.stack([np.fft.irfft(uh0 * np.exp(-NU * k[:, None]**2 * tt),
                                  n=m, axis=0) for tt in gt], axis=1)
    want = np.concatenate([want, want[:1]], axis=0)
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 0.09, rel
