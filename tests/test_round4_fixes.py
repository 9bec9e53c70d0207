"""Round-4 regression coverage: VERDICT r3 items 4/6/8/9 and the four
advisor findings (gauss_newton eta/scalar_dtype/CG-tolerance, mesh tracer
check)."""

import warnings

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, GridTraining, Integral, Interval,
    MiniMaxAdaptiveLoss, PDESystem, PhysicsInformedNN, QuadratureTraining,
    Sym, build_residual_vector, discretize, mlp, separable_mlp, solve,
    solve_gauss_newton, symbols, trust_region_least_squares,
)
from neuralpde_tpu.compile.separable import SeparableTraining
from neuralpde_tpu.symbolic.expr import IntegralExpr, cos, sin


def _poisson_1d(strategy, dtype=jnp.float64, **kw):
    x = Sym("x")
    u = DepVar("u")
    sys = PDESystem(Eq((Differential(x) ** 2)(u(x)),
                       -(np.pi**2) * sin(np.pi * x)),
                    [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0)],
                    [Domain(x, Interval(0, 1))], [x], [u(x)])
    disc = PhysicsInformedNN(mlp([1, 16, 16, 1]), strategy, dtype=dtype, **kw)
    return discretize(sys, disc)


class TestGNAdaptiveState:
    """VERDICT r3 item 6: GN must optimize the SAME weighted objective as
    adaptive training — thread the trained state or reject."""

    def test_adaptive_loss_without_state_rejected(self):
        prob = _poisson_1d(GridTraining(0.1),
                           adaptive_loss=MiniMaxAdaptiveLoss(10))
        with pytest.raises(ValueError, match="adaptive_state"):
            build_residual_vector(prob.pinnrep)

    def test_explicit_state_threads_weights(self):
        prob = _poisson_1d(GridTraining(0.1),
                           adaptive_loss=MiniMaxAdaptiveLoss(10))
        ada = prob.pinnrep.adaloss.init_state(1, 2, prob.pinnrep.dtype)
        ada = dict(ada)
        ada["pde_weights"] = jnp.asarray([2.5])
        ada["bc_weights"] = jnp.asarray([3.0, 0.5])
        r = build_residual_vector(prob.pinnrep, ada)(prob.init_params)
        full, _ = prob.loss(prob.init_params,
                            {"key": jax.random.key(0), "adaptive": ada})
        np.testing.assert_allclose(float(jnp.sum(r * r)), float(full),
                                   rtol=1e-12)

    def test_trained_state_round_trips_through_solve(self):
        prob = _poisson_1d(GridTraining(0.1),
                           adaptive_loss=MiniMaxAdaptiveLoss(5))
        res = solve(prob, optax.adam(1e-3), maxiters=12)
        state = res.aux["adaptive_state"]
        gn = solve_gauss_newton(prob.with_params(res.u), maxiters=5,
                                cg_iters=20, adaptive_state=state)
        assert np.isfinite(gn.objective)


class TestAdvisorFindings:
    def test_tr_eta_validated(self):
        with pytest.raises(ValueError, match="eta"):
            trust_region_least_squares(lambda v: v["a"], {"a": jnp.zeros(2)},
                                       eta=0.3)

    def test_scalar_dtype_degradation_raises(self):
        prob = _poisson_1d(GridTraining(0.2), dtype=jnp.float32)
        with jax.enable_x64(False):
            with pytest.raises(ValueError, match="jax_enable_x64"):
                solve_gauss_newton(prob, solver="lsqr",
                                   scalar_dtype=jnp.float64, maxiters=1)

    def test_tr_f32_converges_with_scaled_tolerance(self):
        # the fixed 1e-14·g2 CG exit is unreachable in f32; the scaled
        # tolerance must not break convergence (and lets CG exit early)
        prob = _poisson_1d(GridTraining(0.05), dtype=jnp.float32)
        res = solve_gauss_newton(prob, method="tr", maxiters=40, cg_iters=60)
        assert res.objective < 1e-3, res.objective

    def test_shard_batch_concrete_and_traced(self):
        # jax.core.is_concrete replaced the deprecated Tracer isinstance;
        # both eager and in-trace annotation must still work
        from neuralpde_tpu.parallel.mesh import make_mesh, shard_batch, use_mesh

        mesh = make_mesh(8)
        x = jnp.zeros((2, 16))
        with use_mesh(mesh):
            eager = shard_batch(x)
            assert eager.shape == x.shape

            @jax.jit
            def f(a):
                return shard_batch(a).sum()

            assert float(f(x)) == 0.0


class TestLeibnizMultiVar:
    """VERDICT r3 item 8: Leibniz rule for variable-dependent bounds of
    multi-variable integrals (symbolic/expr.py restriction lifted)."""

    def test_boundary_term_first_ivar(self):
        from neuralpde_tpu.compile.lower import LoweringContext, _ev
        from neuralpde_tpu.ops.derivatives import DerivativeEngine

        x, s, r = symbols("x s r")
        # d/dx ∫_0^x ∫_0^1 sin(s)cos(r) dr ds = sin(x)·sin(1)
        I = IntegralExpr(sin(s) * cos(r), (s, r), (0.0, 0.0), (x, 1.0))
        from neuralpde_tpu.symbolic.expr import expand_derivatives

        dI = expand_derivatives(Differential(x)(I))
        ctx = LoweringContext(depvars=[], indvars=["x"],
                              dict_depvar_input={}, phis=[],
                              multioutput=False,
                              derivative=DerivativeEngine("jvp"),
                              integral_order=20, integral_panels=2)
        xs = jnp.linspace(0.1, 0.9, 5)
        val = np.asarray(_ev(dI, {"x": xs}, {}, None, ctx, 5))
        want = np.sin(np.asarray(xs)) * np.sin(1.0)
        np.testing.assert_allclose(val, want, atol=1e-12)

    def test_boundary_term_second_ivar(self):
        from neuralpde_tpu.compile.lower import LoweringContext, _ev
        from neuralpde_tpu.ops.derivatives import DerivativeEngine
        from neuralpde_tpu.symbolic.expr import expand_derivatives

        x, s, r = symbols("x s r")
        I = IntegralExpr(sin(r) * cos(s), (s, r), (0.0, 0.0), (1.0, x))
        dI = expand_derivatives(Differential(x)(I))
        ctx = LoweringContext(depvars=[], indvars=["x"],
                              dict_depvar_input={}, phis=[],
                              multioutput=False,
                              derivative=DerivativeEngine("jvp"),
                              integral_order=20, integral_panels=2)
        xs = jnp.linspace(0.1, 0.9, 5)
        val = np.asarray(_ev(dI, {"x": xs}, {}, None, ctx, 5))
        want = np.sin(np.asarray(xs)) * np.sin(1.0)
        np.testing.assert_allclose(val, want, atol=1e-12)

    def test_non_box_region_rejected(self):
        from neuralpde_tpu.symbolic.expr import expand_derivatives

        x, s, r = symbols("x s r")
        # inner bound depends on the other integration variable: simplex
        I = IntegralExpr(sin(s) * cos(r), (s, r), (0.0, 0.0), (x, s))
        with pytest.raises(ValueError, match="non-box"):
            expand_derivatives(Differential(x)(I))

    def test_trained_ide_with_derivative_of_integral(self):
        """End-to-end: train u with an equation containing
        d/dx ∫_0^x u(s) ds (which Leibniz reduces to u(x)).
        u' + d/dx ∫_0^x u ds = cos(x) − sin(x), u(0)=1 → u = cos(x)."""
        from neuralpde_tpu import Interval

        x, s = symbols("x s")
        u = DepVar("u")
        Dx = Differential(x)
        eq = Eq(Dx(u(x)) + Dx(Integral(s, 0.0, x)(u(s))),
                cos(x) - sin(x))
        sys = PDESystem(eq, [Eq(u(0.0), 1.0)],
                        [Domain(x, Interval(0, 1))], [x], [u(x)])
        prob = discretize(sys, PhysicsInformedNN(
            mlp([1, 16, 16, 1]), GridTraining(0.05), dtype=jnp.float64))
        res = solve(prob, optax.adam(2e-3), maxiters=1500, inner_steps=50)
        xs = np.linspace(0, 1, 41)
        up = np.asarray(prob.pinnrep.phi(jnp.asarray(xs)[None, :],
                                         res.u["depvar"])).ravel()
        err = float(np.max(np.abs(up - np.cos(xs))))
        assert err < 5e-2, err


class TestQuadratureTrainedRecheck:
    """VERDICT r3 item 9: the build-time auto-refined rule is re-checked
    against the TRAINED params after solve."""

    def test_smooth_solution_passes(self):
        prob = _poisson_1d(QuadratureTraining(order=8, panels=None))
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            res = solve(prob, optax.adam(2e-3), maxiters=30)
        reports = prob.pinnrep.strategy.validate_trained(res.u, warn=False)
        assert reports and all(r["ok"] for r in reports)

    def test_rule_mismatch_warns(self):
        prob = _poisson_1d(QuadratureTraining(order=8, panels=None))
        res = solve(prob, optax.adam(2e-3), maxiters=10)
        strategy = prob.pinnrep.strategy
        # force an unreachable tolerance: any fp disagreement now flags,
        # exercising the warning path deterministically
        strategy.abstol = 0.0
        strategy.reltol = 0.0
        with pytest.warns(UserWarning, match="auto-refined rule"):
            strategy.validate_trained(res.u)

    def test_solve_invokes_recheck(self):
        prob = _poisson_1d(QuadratureTraining(order=8, panels=None))
        strategy = prob.pinnrep.strategy
        strategy.abstol = 0.0
        strategy.reltol = 0.0
        with pytest.warns(UserWarning, match="auto-refined rule"):
            solve(prob, optax.adam(2e-3), maxiters=10)

    def test_pinned_panels_register_no_checks(self):
        prob = _poisson_1d(QuadratureTraining(order=8, panels=4))
        assert prob.pinnrep.strategy._trained_checks == []


class TestSeparableAutoHybrid:
    """VERDICT r3 item 4: non-factorizable equations route to a dense
    pointwise fallback inside SeparableTraining instead of failing."""

    def _mixed_system(self):
        x, y, s = symbols("x y s")
        u = DepVar("u")
        from neuralpde_tpu import Interval

        eq1 = Eq((Differential(x) ** 2)(u(x, y))
                 + (Differential(y) ** 2)(u(x, y)),
                 -sin(np.pi * x) * sin(np.pi * y))
        # parametric upper bound x couples grid axes -> dense fallback
        eq2 = Eq(0.5 * u(x, y), Integral(s, 0.0, x)(u(s, y)))
        return PDESystem([eq1, eq2], [],
                         [Domain(x, Interval(0, 1)),
                          Domain(y, Interval(0, 1))], [x, y], [u(x, y)])

    def test_mixed_problem_builds_and_trains(self):
        sys = self._mixed_system()
        with pytest.warns(UserWarning, match="cannot factorize"):
            prob = discretize(sys, PhysicsInformedNN(
                separable_mlp(2, (8,), 4), SeparableTraining(dx=1 / 8),
                dtype=jnp.float64))
        res = solve(prob, optax.adam(1e-3), maxiters=10)
        assert np.isfinite(res.objective)

    def test_routed_equation_matches_all_dense(self):
        """The routed equation's loss must equal the same equation lowered
        by GridTraining on the same grid (parity of the fallback path)."""
        sys = self._mixed_system()
        with pytest.warns(UserWarning):
            prob_h = discretize(sys, PhysicsInformedNN(
                separable_mlp(2, (8,), 4), SeparableTraining(dx=1 / 8),
                dtype=jnp.float64, seed=3))
        prob_d = discretize(sys, PhysicsInformedNN(
            separable_mlp(2, (8,), 4), GridTraining(1 / 8),
            dtype=jnp.float64, seed=3))
        lstate = {"key": jax.random.key(0),
                  "adaptive": prob_h.pinnrep.adaloss.init_state(
                      2, 0, prob_h.pinnrep.dtype)}
        _, aux_h = prob_h.loss(prob_h.init_params, lstate)
        _, aux_d = prob_d.loss(prob_d.init_params, lstate)
        # equation 2 (routed dense) must agree exactly with all-dense
        np.testing.assert_allclose(float(aux_h["pde_losses"][1]),
                                   float(aux_d["pde_losses"][1]),
                                   rtol=1e-12)

    def test_resample_mode_routes_too(self):
        sys = self._mixed_system()
        with pytest.warns(UserWarning, match="cannot factorize"):
            prob = discretize(sys, PhysicsInformedNN(
                separable_mlp(2, (8,), 4),
                SeparableTraining(points=8, resample=True),
                dtype=jnp.float64))
        res = solve(prob, optax.adam(1e-3), maxiters=10)
        assert np.isfinite(res.objective)

    def test_gauss_newton_routes_dense_rows(self):
        sys = self._mixed_system()
        with pytest.warns(UserWarning):
            prob = discretize(sys, PhysicsInformedNN(
                separable_mlp(2, (8,), 4), SeparableTraining(dx=1 / 8),
                dtype=jnp.float64))
        r = build_residual_vector(prob.pinnrep)(prob.init_params)
        lstate = {"key": jax.random.key(0),
                  "adaptive": prob.pinnrep.adaloss.init_state(
                      2, 0, prob.pinnrep.dtype)}
        full, _ = prob.loss(prob.init_params, lstate)
        np.testing.assert_allclose(float(jnp.sum(r * r)), float(full),
                                   rtol=1e-12)

    def test_oversized_dense_fallback_rejected(self):
        sys = self._mixed_system()
        with pytest.raises(ValueError, match="dense "):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                discretize(sys, PhysicsInformedNN(
                    separable_mlp(2, (8,), 4),
                    SeparableTraining(dx=1 / 4096), dtype=jnp.float64))


class TestWrapZeroDimScalars:
    """0-d numpy/JAX scalars compose into symbolic expressions as Num —
    e.g. npde.exp(0.0) evaluates numerically (a 0-d array) and must still
    multiply/add with Exprs (hit by analytic BC construction in
    examples/beltrami_spinn.py)."""

    def test_numeric_primitive_result_enters_expression(self):
        from neuralpde_tpu.symbolic.expr import Sym, exp, sin, wrap

        x = Sym("x")
        e = exp(0.5) * sin(x) + exp(jnp.float32(1.0))
        # exp(0.5) is evaluated numerically; the product must be an Expr
        from neuralpde_tpu.symbolic import expr as E

        assert isinstance(e, E.Expr)
        w = wrap(jnp.asarray(2.0))
        assert isinstance(w, E.Num) and w.value == 2.0

    def test_nonscalar_array_still_rejected(self):
        from neuralpde_tpu.symbolic.expr import wrap

        with pytest.raises(TypeError, match="symbolic expression"):
            wrap(jnp.zeros((3,)))


class TestTRModelAccumulation:
    """VERDICT r3 item 7: the TR driver accumulates the CG model value in
    the loop (no extra B(p) after it) and reports inner iterations."""

    def test_inner_iterations_reported_and_bounded(self):
        prob = _poisson_1d(GridTraining(0.05))
        res = solve_gauss_newton(prob, method="tr", maxiters=60, cg_iters=50,
                                 matmul_precision=None)
        assert "inner_iterations" in res.aux
        assert 0 < res.aux["inner_iterations"] <= 60 * 50
        # f64 CPU: TR should descend far below init on this smooth problem
        assert res.objective < 1e-4
        assert res.objective < res.history[0] * 1e-3

    def test_accumulated_pred_matches_explicit_quadratic(self):
        # linear residual r(th) = A th - b: the GN model is EXACT, so an
        # accepted full step must give rho ~= 1 (accumulated pred == actual)
        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.normal(size=(12, 5)))
        b = jnp.asarray(rng.normal(size=(12,)))
        rhos = []
        res = trust_region_least_squares(
            lambda th: A @ th - b, jnp.zeros(5), maxiters=8, cg_iters=10,
            delta0=100.0, matmul_precision=None,
            callback=lambda it, loss, delta, acc: rhos.append(acc))
        lstsq = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
        np.testing.assert_allclose(np.asarray(res.u), lstsq, atol=1e-6)
