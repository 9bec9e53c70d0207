"""Separable PINN (SPINN) fast path: factorized tensor-grid lowering.

Beyond-reference capability (the reference has no factorized trial
functions); correctness is anchored by bit-level parity against the dense
pointwise lowering (compile.lower) on the same grids.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from neuralpde_tpu import (
    DepVar, DerivativeEngine, Differential, Domain, Eq, Integral, Interval,
    PDESystem, PhysicsInformedNN, SeparableNet, SeparableTraining, Transformed,
    discretize, mlp, separable_mlp, solve, symbols,
)
from neuralpde_tpu.compile.lower import LoweringContext, build_residual_function
from neuralpde_tpu.compile.separable import build_separable_residual
from neuralpde_tpu.symbolic.expr import sin


def _ctx(net, depvars=("u",), inputs=("x", "y")):
    names = list(depvars)
    nets = net if isinstance(net, list) else [net]
    return LoweringContext(
        depvars=names, indvars=list(inputs),
        dict_depvar_input={d: list(inputs) for d in names},
        phis=[n.apply for n in nets], multioutput=len(names) > 1,
        derivative=DerivativeEngine("jvp"))


def poisson_eq():
    x, y = symbols("x y")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    Dyy = Differential(y) ** 2
    eq = Eq(Dxx(u(x, y)) + Dyy(u(x, y)), -sin(np.pi * x) * sin(np.pi * y))
    return x, y, u, eq


class TestFactorizedParity:
    def test_interior_residual_matches_dense(self):
        x, y, u, eq = poisson_eq()
        net = separable_mlp(2, hidden=(16, 16), rank=8)
        theta = {"depvar": net.init(jax.random.key(0))}
        ctx = _ctx(net)
        res, axes = build_separable_residual(eq, ctx, {"u": net}, jnp.float64)
        assert [a.name for a in axes] == ["x", "y"]
        xs = np.linspace(0, 1, 9)
        ys = np.linspace(0, 1, 7)
        grid_r = res([xs, ys], theta)
        dense = build_residual_function(eq, [x, y], ctx)
        X, Y = np.meshgrid(xs, ys, indexing="ij")
        dense_r = dense(jnp.asarray(np.stack([X.ravel(), Y.ravel()])),
                        theta).reshape(9, 7)
        np.testing.assert_allclose(np.asarray(grid_r), np.asarray(dense_r),
                                   atol=1e-12)

    def test_dirichlet_and_neumann_bc_match_dense(self):
        x, y, u, _ = poisson_eq()
        Dx = Differential(x)
        net = separable_mlp(2, hidden=(16, 16), rank=8)
        theta = {"depvar": net.init(jax.random.key(1))}
        ctx = _ctx(net)
        ys = np.linspace(0, 1, 11)
        for bc in (Eq(u(0.0, y), 0.0), Eq(Dx(u(1.0, y)), sin(np.pi * y))):
            res, axes = build_separable_residual(bc, ctx, {"u": net},
                                                 jnp.float64)
            assert [a.name for a in axes] == ["y"]
            dense = build_residual_function(bc, [y], ctx)
            np.testing.assert_allclose(
                np.asarray(res([ys], theta)),
                np.asarray(dense(jnp.asarray(ys)[None, :], theta)), atol=1e-12)

    def test_pinned_point_call(self):
        # fully pinned call u(0.3, 0.7) -> scalar grid (gauge-pinning BCs)
        x, y, u, _ = poisson_eq()
        net = separable_mlp(2, hidden=(8,), rank=4)
        theta = {"depvar": net.init(jax.random.key(2))}
        ctx = _ctx(net)
        bc = Eq(u(0.3, 0.7), 0.0)
        res, axes = build_separable_residual(bc, ctx, {"u": net}, jnp.float64)
        assert axes == []
        val = res([], theta)
        direct = net.apply(theta["depvar"],
                           jnp.asarray([[0.3], [0.7]]))[0, 0]
        np.testing.assert_allclose(float(val), float(direct), rtol=1e-12)

    def test_3d_parity_and_pointwise_apply(self):
        x, y, z = symbols("x y z")
        u = DepVar("u")
        Dxx, Dyy, Dzz = (Differential(v) ** 2 for v in (x, y, z))
        eq = Eq(Dxx(u(x, y, z)) + Dyy(u(x, y, z)) + Dzz(u(x, y, z)),
                u(x, y, z))
        net = separable_mlp(3, hidden=(8, 8), rank=6)
        theta = {"depvar": net.init(jax.random.key(3))}
        ctx = _ctx(net, inputs=("x", "y", "z"))
        res, axes = build_separable_residual(eq, ctx, {"u": net}, jnp.float64)
        xs, ys, zs = (np.linspace(0, 1, n) for n in (5, 4, 3))
        grid_r = res([xs, ys, zs], theta)
        assert grid_r.shape == (5, 4, 3)
        dense = build_residual_function(eq, [x, y, z], ctx)
        X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
        dense_r = dense(jnp.asarray(np.stack([X.ravel(), Y.ravel(), Z.ravel()])),
                        theta).reshape(5, 4, 3)
        np.testing.assert_allclose(np.asarray(grid_r), np.asarray(dense_r),
                                   atol=1e-12)

    def test_fourth_order_ks_operator_parity(self):
        # Kuramoto-Sivashinsky-type operator: u_t + u*u_x + u_xx + u_xxxx
        x, t = symbols("x t")
        u = DepVar("u")
        Dt = Differential(t)
        Dx = Differential(x)
        eq = Eq(Dt(u(x, t)) + u(x, t) * Dx(u(x, t))
                + (Dx ** 2)(u(x, t)) + (Dx ** 4)(u(x, t)), 0.0)
        net = separable_mlp(2, hidden=(12, 12), rank=6)
        theta = {"depvar": net.init(jax.random.key(11))}
        ctx = _ctx(net, inputs=("x", "t"))
        res, axes = build_separable_residual(eq, ctx, {"u": net}, jnp.float64)
        xs = np.linspace(0, 1, 7)
        tsv = np.linspace(0, 1, 5)
        grid_r = res([xs, tsv], theta)
        dense = build_residual_function(eq, [x, t], ctx)
        X, T = np.meshgrid(xs, tsv, indexing="ij")
        dense_r = dense(jnp.asarray(np.stack([X.ravel(), T.ravel()])),
                        theta).reshape(7, 5)
        np.testing.assert_allclose(np.asarray(grid_r), np.asarray(dense_r),
                                   rtol=1e-9, atol=1e-9)

    def test_transformed_axis_nets_factorize(self):
        # hard-constraint axis transforms stay inside the factorization
        x, y, u, eq = poisson_eq()
        hard = lambda c, out: c * (1 - c) * out
        net = SeparableNet([Transformed(mlp([1, 8, 6]), hard),
                            Transformed(mlp([1, 8, 6]), hard)])
        theta = {"depvar": net.init(jax.random.key(4))}
        ctx = _ctx(net)
        res, _ = build_separable_residual(eq, ctx, {"u": net}, jnp.float64)
        xs = np.linspace(0, 1, 6)
        dense = build_residual_function(eq, [x, y], ctx)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        np.testing.assert_allclose(
            np.asarray(res([xs, xs], theta)),
            np.asarray(dense(jnp.asarray(np.stack([X.ravel(), Y.ravel()])),
                             theta).reshape(6, 6)), atol=1e-12)
        # boundary values are exactly zero
        vals = net.apply(theta["depvar"],
                         jnp.asarray([[0.0, 1.0, 0.5], [0.5, 0.3, 1.0]]))
        np.testing.assert_allclose(np.asarray(vals), 0.0, atol=1e-15)


class TestGridEval:
    def test_grid_matches_pointwise_apply(self):
        net = separable_mlp(3, (8,), 4)
        params = net.init(jax.random.key(9))
        xs, ys, zs = (jnp.linspace(0, 1, n) for n in (4, 3, 5))
        grid = np.asarray(net.grid(params, [xs, ys, zs]))
        assert grid.shape == (4, 3, 5)
        X, Y, Z = np.meshgrid(np.asarray(xs), np.asarray(ys), np.asarray(zs),
                              indexing="ij")
        cord = jnp.asarray(np.stack([X.ravel(), Y.ravel(), Z.ravel()]))
        pointwise = np.asarray(net.apply(params, cord)).reshape(4, 3, 5)
        np.testing.assert_allclose(grid, pointwise, atol=1e-12)
        with pytest.raises(ValueError, match="node arrays"):
            net.grid(params, [xs, ys])


class TestAxisFeatures:
    def test_jet_orders_match_finite_difference(self):
        net = separable_mlp(2, hidden=(8, 8), rank=4)
        params = net.init(jax.random.key(5))
        nodes = jnp.linspace(0.1, 0.9, 7)
        h = 1e-4
        f0 = net.axis_features(params, 0, nodes, 0)
        f1 = net.axis_features(params, 0, nodes, 1)
        f2 = net.axis_features(params, 0, nodes, 2)
        fp = net.axis_features(params, 0, nodes + h, 0)
        fm = net.axis_features(params, 0, nodes - h, 0)
        np.testing.assert_allclose(np.asarray((fp - fm) / (2 * h)),
                                   np.asarray(f1), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray((fp + fm - 2 * f0) / h**2),
                                   np.asarray(f2), rtol=1e-3, atol=1e-4)


class TestEndToEnd:
    def test_hard_constrained_poisson(self):
        x, y, u, eq = poisson_eq()
        domains = [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))]
        sys = PDESystem(eq, [], domains, [x, y], [u(x, y)])
        hard = lambda c, out: c * (1 - c) * out
        net = SeparableNet([Transformed(mlp([1, 32, 32, 32]), hard),
                            Transformed(mlp([1, 32, 32, 32]), hard)])
        disc = PhysicsInformedNN(net, SeparableTraining(dx=1 / 64),
                                 dtype=jnp.float32)
        prob = discretize(sys, disc)
        res = solve(prob, optax.adam(2e-3), maxiters=500)
        xs = np.linspace(0, 1, 65)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        cord = jnp.asarray(np.stack([X.ravel(), Y.ravel()]), jnp.float32)
        up = np.asarray(prob.pinnrep.phi(cord, res.params["depvar"]))
        ua = (np.sin(np.pi * X) * np.sin(np.pi * Y) / (2 * np.pi**2)).ravel()
        rel = np.linalg.norm(up.ravel() - ua) / np.linalg.norm(ua)
        assert rel < 5e-3, rel

    def test_resample_mode_trains(self):
        x, y, u, eq = poisson_eq()
        bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
               Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)]
        domains = [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))]
        sys = PDESystem(eq, bcs, domains, [x, y], [u(x, y)])
        net = separable_mlp(2, hidden=(16, 16), rank=16)
        disc = PhysicsInformedNN(
            net, SeparableTraining(points=32, resample=True),
            dtype=jnp.float32)
        prob = discretize(sys, disc)
        l0 = float(prob.loss(prob.init_params,
                             {"key": jax.random.key(0),
                              "adaptive": _ada(prob)})[0])
        res = solve(prob, optax.adam(2e-3), maxiters=400)
        assert float(res.objective) < 0.3 * l0

    def test_adaptive_loss_composes(self):
        from neuralpde_tpu import MiniMaxAdaptiveLoss

        x, y, u, eq = poisson_eq()
        bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0)]
        domains = [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))]
        sys = PDESystem(eq, bcs, domains, [x, y], [u(x, y)])
        disc = PhysicsInformedNN(
            separable_mlp(2, (12,), 8), SeparableTraining(dx=1 / 12),
            adaptive_loss=MiniMaxAdaptiveLoss(reweight_every=5),
            dtype=jnp.float32)
        prob = discretize(sys, disc)
        res = solve(prob, optax.adam(2e-3), maxiters=60)
        assert np.isfinite(float(res.objective))
        w = np.asarray(res.aux["adaptive_state"]["bc_weights"])
        assert not np.allclose(w, 1.0)    # minimax ascent actually moved

    def test_lbfgs_composes(self):
        x, y, u, eq = poisson_eq()
        domains = [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))]
        sys = PDESystem(eq, [], domains, [x, y], [u(x, y)])
        hard = lambda c, o: c * (1 - c) * o
        net = SeparableNet([Transformed(mlp([1, 16, 12]), hard)
                            for _ in range(2)])
        disc = PhysicsInformedNN(net, SeparableTraining(dx=1 / 24),
                                 dtype=jnp.float32)
        prob = discretize(sys, disc)
        r1 = solve(prob, optax.adam(2e-3), maxiters=200)
        r2 = solve(prob.with_params(r1.u), optax.lbfgs(), maxiters=200)
        assert float(r2.objective) < float(r1.objective)

    def test_multioutput_system_parity(self):
        x, y = symbols("x y")
        u, v = DepVar("u"), DepVar("v")
        Dx, Dy = Differential(x), Differential(y)
        eq = Eq(Dx(u(x, y)) + Dy(v(x, y)), u(x, y) * v(x, y))
        nets = [separable_mlp(2, (8,), 4), separable_mlp(2, (8,), 4)]
        ctx = _ctx(nets, depvars=("u", "v"))
        keys = jax.random.split(jax.random.key(6))
        theta = {"depvar": {"u": nets[0].init(keys[0]),
                            "v": nets[1].init(keys[1])}}
        res, _ = build_separable_residual(
            eq, ctx, {"u": nets[0], "v": nets[1]}, jnp.float64)
        xs = np.linspace(0, 1, 5)
        dense = build_residual_function(eq, [x, y], ctx)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        np.testing.assert_allclose(
            np.asarray(res([xs, xs], theta)),
            np.asarray(dense(jnp.asarray(np.stack([X.ravel(), Y.ravel()])),
                             theta).reshape(5, 5)), atol=1e-12)


class TestParamEstim:
    def test_inverse_diffusion_recovery(self):
        """Separable inverse problem: recover the diffusion coefficient D of
        u_t = D u_xx from data of the analytic decaying sine (D* = 0.2)."""
        from neuralpde_tpu import Param

        x, t = symbols("x t")
        u = DepVar("u")
        D = Param("D")
        eq = Eq(Differential(t)(u(x, t)),
                D * (Differential(x) ** 2)(u(x, t)))
        bcs = [Eq(u(x, 0.0), sin(np.pi * x)),
               Eq(u(0.0, t), 0.0), Eq(u(1.0, t), 0.0)]
        domains = [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 1))]
        sys = PDESystem(eq, bcs, domains, [x, t], [u(x, t)],
                        ps=[D], defaults={D: 0.05})   # wrong initial guess

        D_true = 0.2
        xs = np.linspace(0, 1, 24)
        tsv = np.linspace(0, 1, 24)
        X, T = np.meshgrid(xs, tsv, indexing="ij")
        data = np.sin(np.pi * X) * np.exp(-D_true * np.pi**2 * T)
        cord = jnp.asarray(np.stack([X.ravel(), T.ravel()]), jnp.float32)
        want = jnp.asarray(data.ravel(), jnp.float32)

        def data_loss(phi, theta, p):
            return jnp.mean((phi(cord, theta)[0] - want) ** 2)

        net = separable_mlp(2, (24, 24), 16)
        disc = PhysicsInformedNN(
            net, SeparableTraining(dx=1 / 24), dtype=jnp.float32,
            param_estim=True, additional_loss=data_loss, seed=1)
        prob = discretize(sys, disc)
        res = solve(prob, optax.adam(3e-3), maxiters=2000)
        D_hat = float(res.params["p"][0])
        assert abs(D_hat - D_true) < 0.05 * D_true, D_hat


class TestCausalSeparable:
    def _heat(self, strategy):
        x, t = symbols("x t")
        u = DepVar("u")
        eq = Eq(Differential(t)(u(x, t)),
                0.1 * (Differential(x) ** 2)(u(x, t)))
        bcs = [Eq(u(x, 0.0), sin(np.pi * x)),
               Eq(u(0.0, t), 0.0), Eq(u(1.0, t), 0.0)]
        domains = [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 1))]
        sys = PDESystem(eq, bcs, domains, [x, t], [u(x, t)])
        net = separable_mlp(2, (16, 16), 12)
        disc = PhysicsInformedNN(net, strategy, dtype=jnp.float32, seed=3)
        return discretize(sys, disc), t

    def test_eps_zero_equals_plain(self):
        prob0, t = self._heat(SeparableTraining(dx=1 / 16))
        probc, _ = self._heat(SeparableTraining(dx=1 / 16, causal=t,
                                                causal_eps=0.0))
        theta = prob0.init_params
        key = jax.random.key(0)
        l0 = prob0.pinnrep.loss_functions.pde_loss_functions[0](theta, key)
        lc = probc.pinnrep.loss_functions.pde_loss_functions[0](theta, key)
        np.testing.assert_allclose(float(l0), float(lc), rtol=1e-6)

    def test_weights_monotone_and_train(self):
        probc, t = self._heat(SeparableTraining(dx=1 / 16, causal="t",
                                                causal_eps=5.0))
        strat = probc.pinnrep.strategy
        w = np.asarray(strat.causal_weights(probc.init_params,
                                            jax.random.key(0))[0])
        assert w.shape == (17,)
        assert w[0] == 1.0
        assert np.all(np.diff(w) <= 1e-12)        # non-increasing
        res = solve(probc, optax.adam(2e-3), maxiters=300)
        assert np.isfinite(float(res.objective))
        w2 = np.asarray(strat.causal_weights(res.params,
                                             jax.random.key(0))[0])
        assert w2[-1] > w[-1]                     # causal front advanced

    def test_resample_causal_sorted_axis(self):
        probc, t = self._heat(SeparableTraining(points=16, resample=True,
                                                causal="t", causal_eps=1.0))
        l = probc.pinnrep.loss_functions.pde_loss_functions[0](
            probc.init_params, jax.random.key(1))
        assert np.isfinite(float(l))


def _ada(prob):
    n_pde = len(prob.pinnrep.loss_functions.pde_loss_functions)
    n_bc = len(prob.pinnrep.loss_functions.bc_loss_functions)
    return {"pde_weights": jnp.ones(n_pde), "bc_weights": jnp.ones(n_bc),
            "additional_weights": jnp.ones(1)}


class TestGPINNAndRemat:
    """gradient_enhanced and remat on the factorized path (previously silent
    no-ops — advisor r2 medium finding)."""

    def _sys(self):
        x, y, u, eq = poisson_eq()
        bcs = [Eq(u(0.0, y), 0.0), Eq(u(x, 0.0), 0.0)]
        domains = [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))]
        return PDESystem(eq, bcs, domains, [x, y], [u(x, y)])

    def test_gradient_enhanced_parity_with_dense(self):
        """Separable gPINN rows (symbolic ∂residual/∂x_i on the grid) must
        reproduce the dense ge_wrap (exact jvp rows) loss on the same grid."""
        from neuralpde_tpu import GridTraining

        sys = self._sys()
        net = separable_mlp(2, (12, 12), 8)
        w = 0.3
        kw = dict(gradient_enhanced=w, seed=0)
        prob_s = discretize(sys, PhysicsInformedNN(
            net, SeparableTraining(dx=1 / 16), **kw))
        prob_d = discretize(sys, PhysicsInformedNN(
            net, GridTraining(1 / 16), **kw))
        lstate = {"key": jax.random.key(0), "adaptive": _ada(prob_s)}
        ls = float(prob_s.loss(prob_s.init_params, lstate)[0])
        ld = float(prob_d.loss(prob_d.init_params, lstate)[0])
        np.testing.assert_allclose(ls, ld, rtol=1e-9)
        # and it must differ from the non-gPINN loss (rows actually added)
        prob_p = discretize(sys, PhysicsInformedNN(
            net, SeparableTraining(dx=1 / 16), seed=0))
        lp = float(prob_p.loss(prob_p.init_params, lstate)[0])
        assert abs(ls - lp) > 1e-12

    def test_remat_matches_and_trains(self):
        sys = self._sys()
        net = separable_mlp(2, (12,), 8)
        prob_r = discretize(sys, PhysicsInformedNN(
            net, SeparableTraining(dx=1 / 16), remat=True, seed=1))
        prob_p = discretize(sys, PhysicsInformedNN(
            net, SeparableTraining(dx=1 / 16), seed=1))
        lstate = {"key": jax.random.key(0), "adaptive": _ada(prob_r)}
        np.testing.assert_allclose(
            float(prob_r.loss(prob_r.init_params, lstate)[0]),
            float(prob_p.loss(prob_p.init_params, lstate)[0]), rtol=1e-12)
        g = jax.grad(lambda th: prob_r.loss(th, lstate)[0])(
            prob_r.init_params)
        assert all(np.all(np.isfinite(np.asarray(leaf)))
                   for leaf in jax.tree.leaves(g))
        res = solve(prob_r, optax.adam(2e-3), maxiters=100)
        assert float(res.objective) < float(
            prob_r.loss(prob_r.init_params, lstate)[0])

    def test_gradient_enhanced_causal_eps_zero_reduces_to_plain(self):
        x, t = symbols("x t")
        u = DepVar("u")
        eq = Eq(Differential(t)(u(x, t)),
                0.1 * (Differential(x) ** 2)(u(x, t)))
        bcs = [Eq(u(x, 0.0), sin(np.pi * x))]
        domains = [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 1))]
        sys = PDESystem(eq, bcs, domains, [x, t], [u(x, t)])
        net = separable_mlp(2, (12,), 8)
        probc = discretize(sys, PhysicsInformedNN(
            net, SeparableTraining(dx=1 / 16, causal="t", causal_eps=0.0),
            gradient_enhanced=0.2, seed=2))
        prob0 = discretize(sys, PhysicsInformedNN(
            net, SeparableTraining(dx=1 / 16), gradient_enhanced=0.2, seed=2))
        key = jax.random.key(3)
        lc = probc.pinnrep.loss_functions.pde_loss_functions[0](
            probc.init_params, key)
        l0 = prob0.pinnrep.loss_functions.pde_loss_functions[0](
            prob0.init_params, key)
        np.testing.assert_allclose(float(lc), float(l0), rtol=1e-7)
        # nonzero eps trains with causal weights over the stacked rows
        probe = discretize(sys, PhysicsInformedNN(
            net, SeparableTraining(dx=1 / 16, causal="t", causal_eps=5.0),
            gradient_enhanced=0.2, seed=2))
        w = np.asarray(probe.pinnrep.strategy.causal_weights(
            probe.init_params, key)[0])
        assert w.shape == (17,) and w[0] == 1.0 and np.all(np.diff(w) <= 1e-12)


class TestMesh:
    def test_sharded_axis_matches_single_device(self):
        """Separable grid sharded over an 8-device mesh: loss bit-parity and
        the gradient psum shows up in the compiled HLO."""
        from neuralpde_tpu.parallel.mesh import (
            make_mesh, replicate_params, use_mesh)

        x, y, u, eq = poisson_eq()
        bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0)]
        domains = [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))]
        sys = PDESystem(eq, bcs, domains, [x, y], [u(x, y)])
        net = separable_mlp(2, (16,), 8)

        def build():
            disc = PhysicsInformedNN(net, SeparableTraining(dx=1 / 63),
                                     dtype=jnp.float32)   # 64 nodes: 8 | 64
            return discretize(sys, disc)

        prob = build()
        lstate = {"key": jax.random.key(0),
                  "adaptive": prob.pinnrep.adaloss.init_state(
                      1, 2, prob.pinnrep.dtype)}
        cpu0 = jax.devices("cpu")[0]
        theta = jax.device_put(prob.init_params, cpu0)
        loss_single, _ = jax.jit(prob.loss, device=cpu0)(theta, lstate)

        mesh = make_mesh(8)
        with use_mesh(mesh):
            prob2 = build()
            theta_r = replicate_params(theta, mesh)
            jitted = jax.jit(lambda th: prob2.loss(th, lstate)[0])
            loss_sharded = jitted(theta_r)
            hlo = jitted.lower(theta_r).compile().as_text()
        np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                                   rtol=1e-6)
        assert "all-reduce" in hlo, "expected a psum from the sharded grid"


class TestMeshCausal:
    def test_causal_weights_survive_sharding(self):
        """Causal cumsum along grid axis 0 while that axis is sharded:
        parity vs single device (GSPMD must not alter the prefix sums)."""
        from neuralpde_tpu.parallel.mesh import (
            make_mesh, replicate_params, use_mesh)

        x, t = symbols("x t")
        u = DepVar("u")
        eq = Eq(Differential(t)(u(t, x)),
                0.1 * (Differential(x) ** 2)(u(t, x)))   # t is grid axis 0
        bcs = [Eq(u(0.0, x), sin(np.pi * x))]
        domains = [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 1))]
        sys = PDESystem(eq, bcs, domains, [x, t], [u(t, x)])
        net = separable_mlp(2, (12,), 8)

        def build():
            return discretize(sys, PhysicsInformedNN(
                net, SeparableTraining(dx=1 / 63, causal="t",
                                       causal_eps=5.0),
                dtype=jnp.float32))

        prob = build()
        lstate = {"key": jax.random.key(0),
                  "adaptive": prob.pinnrep.adaloss.init_state(
                      1, 1, prob.pinnrep.dtype)}
        cpu0 = jax.devices("cpu")[0]
        theta = jax.device_put(prob.init_params, cpu0)
        loss_single, _ = jax.jit(prob.loss, device=cpu0)(theta, lstate)
        mesh = make_mesh(8)
        with use_mesh(mesh):
            prob2 = build()
            loss_sharded, _ = jax.jit(prob2.loss)(
                replicate_params(theta, mesh), lstate)
        np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                                   rtol=1e-6)


class TestErrors:
    def test_dense_chain_rejected(self):
        x, y, u, eq = poisson_eq()
        domains = [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))]
        sys = PDESystem(eq, [], domains, [x, y], [u(x, y)])
        disc = PhysicsInformedNN(mlp([2, 8, 1]), SeparableTraining(dx=0.5))
        with pytest.raises(TypeError, match="SeparableNet"):
            discretize(sys, disc)

    def test_axis_coupling_argument_rejected(self):
        x, y = symbols("x y")
        u = DepVar("u")
        net = separable_mlp(2, (8,), 4)
        ctx = _ctx(net)
        theta = {"depvar": net.init(jax.random.key(7))}
        eq = Eq(u(x * y, y), 0.0)     # first slot couples both grid axes
        res, _ = build_separable_residual(eq, ctx, {"u": net}, jnp.float64)
        with pytest.raises(ValueError, match="couples"):
            res([np.linspace(0, 1, 4), np.linspace(0, 1, 4)], theta)

    def test_constant_bound_integral_now_supported(self):
        # r3: constant-bound integral terms factorize (temporary quadrature
        # grid axis; tests/test_integrodiff.py TestSeparableIntegrals has
        # the dense-parity coverage) — only parametric bounds still raise
        x, y = symbols("x y")
        u = DepVar("u")
        s = symbols("s")
        net = separable_mlp(2, (8,), 4)
        ctx = _ctx(net)
        theta = {"depvar": net.init(jax.random.key(8))}
        eq = Eq(u(x, y), Integral(s, 0.0, 1.0)(u(s, y)))
        res, _ = build_separable_residual(eq, ctx, {"u": net}, jnp.float64)
        out = res([np.linspace(0, 1, 4), np.linspace(0, 1, 4)], theta)
        assert np.all(np.isfinite(np.asarray(out)))
        eq_p = Eq(u(x, y), Integral(s, 0.0, x)(u(s, y)))
        res_p, _ = build_separable_residual(eq_p, ctx, {"u": net},
                                            jnp.float64)
        with pytest.raises(NotImplementedError, match="parametric"):
            res_p([np.linspace(0, 1, 4), np.linspace(0, 1, 4)], theta)

    def test_strategy_arg_validation(self):
        with pytest.raises(ValueError, match="exactly one"):
            SeparableTraining()
        with pytest.raises(ValueError, match="exactly one"):
            SeparableTraining(dx=0.1, points=8)
        with pytest.raises(ValueError, match="resample"):
            SeparableTraining(points=8)

    def test_mismatched_axis_ranks_rejected(self):
        with pytest.raises(ValueError, match="rank"):
            SeparableNet([mlp([1, 8, 4]), mlp([1, 8, 6])])
        with pytest.raises(ValueError, match="scalar input"):
            SeparableNet([mlp([2, 8, 4]), mlp([1, 8, 4])])


def test_matmul_precision_kwarg_reaches_the_compiled_loss():
    """PhysicsInformedNN(matmul_precision="highest") must stamp HIGHEST
    operand precision on the loss's dot_generals (the r3 TPU accuracy
    lever: default bf16-pass MXU matmuls floored sharp-front separable
    training at rel L2 0.025 vs 0.0039 with true-f32 passes, PERF.md)."""
    x, y, u, eq = poisson_eq()
    domains = [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))]
    sys = PDESystem(eq, [], domains, [x, y], [u(x, y)])
    net = separable_mlp(2, (8,), 4)

    def lowered(mp):
        disc = PhysicsInformedNN(net, SeparableTraining(dx=1 / 8),
                                 dtype=jnp.float32, matmul_precision=mp)
        prob = discretize(sys, disc)
        lstate = {"key": jax.random.key(0), "adaptive": _ada(prob)}
        return jax.jit(lambda th: prob.loss(th, lstate)[0]).lower(
            prob.init_params).as_text()

    assert "HIGHEST" in lowered("highest")
    assert "HIGHEST" not in lowered(None)


class TestAxisRAD:
    """Residual-adaptive per-axis node sampling (beyond reference; the
    factorized analog of ResidualAdaptiveTraining's RAD scheme)."""

    def _peaked_sys(self):
        # direct approximation of a sharply peaked function: at init the
        # residual mass sits under the peak, so RAD nodes should find it
        from neuralpde_tpu.symbolic.expr import exp

        x, y = symbols("x y")
        u = DepVar("u")
        f = exp(-50.0 * ((x - 0.8) ** 2 + (y - 0.2) ** 2))
        eq = Eq(u(x, y), f)
        domains = [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))]
        return PDESystem(eq, [], domains, [x, y], [u(x, y)])

    def test_rad_beats_uniform_on_peaked_target(self):
        sys = self._peaked_sys()

        def run(strategy):
            disc = PhysicsInformedNN(separable_mlp(2, (24, 24), 12),
                                     strategy, dtype=jnp.float32, seed=0)
            prob = discretize(sys, disc)
            res = solve(prob, optax.adam(3e-3), maxiters=2000,
                        key=jax.random.key(0))
            # evaluate true L2 on a fine fixed grid (not the training loss)
            xs = np.linspace(0, 1, 101)
            X, Y = np.meshgrid(xs, xs, indexing="ij")
            cord = jnp.asarray(np.stack([X.ravel(), Y.ravel()]), jnp.float32)
            pred = np.asarray(prob.pinnrep.phi(cord,
                                               res.u["depvar"])[0])
            want = np.exp(-50 * ((X - 0.8) ** 2 + (Y - 0.2) ** 2)).ravel()
            return float(np.linalg.norm(pred - want)
                         / np.linalg.norm(want))

        uni = run(SeparableTraining(points=32, resample=True))
        rad = run(SeparableTraining(points=32, resample=True,
                                    rad_candidates=256))
        assert np.isfinite(rad)
        # measured: uniform 0.40 vs RAD 0.10 (the residual-guided
        # marginals concentrate the 32 axis nodes under the peak)
        assert rad < 0.5 * uni, (rad, uni)

    def test_rad_composes_with_causal(self):
        x, t = symbols("x t")
        u = DepVar("u")
        eq = Eq(Differential(t)(u(x, t)),
                0.1 * (Differential(x) ** 2)(u(x, t)))
        bcs = [Eq(u(x, 0.0), sin(np.pi * x))]
        domains = [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 1))]
        sys = PDESystem(eq, bcs, domains, [x, t], [u(x, t)])
        disc = PhysicsInformedNN(
            separable_mlp(2, (12,), 8),
            SeparableTraining(points=16, resample=True, causal="t",
                              causal_eps=1.0, rad_candidates=64),
            dtype=jnp.float32)
        prob = discretize(sys, disc)
        res = solve(prob, optax.adam(2e-3), maxiters=100)
        assert np.isfinite(float(res.objective))
        w = np.asarray(prob.pinnrep.strategy.causal_weights(
            res.u, jax.random.key(0))[0])
        assert w.shape == (16,) and w[0] == 1.0

    def test_rad_requires_resampling_mode(self):
        with pytest.raises(ValueError, match="rad_candidates"):
            SeparableTraining(dx=0.1, rad_candidates=64)


def test_phi_inherits_matmul_precision():
    """PhysicsInformedNN(matmul_precision=...) flows into phi so user
    evaluation runs under the same precision as training."""
    x, y, u, eq = poisson_eq()
    domains = [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))]
    sys = PDESystem(eq, [], domains, [x, y], [u(x, y)])
    disc = PhysicsInformedNN(separable_mlp(2, (8,), 4),
                             SeparableTraining(dx=1 / 8),
                             dtype=jnp.float32, matmul_precision="highest")
    prob = discretize(sys, disc)
    phi = prob.pinnrep.phi
    assert phi.matmul_precision == "highest"
    cord = jnp.ones((2, 3), jnp.float32)
    hlo = jax.jit(lambda th: phi(cord, th["depvar"])).lower(
        prob.init_params).as_text()
    assert "HIGHEST" in hlo
    disc0 = PhysicsInformedNN(separable_mlp(2, (8,), 4),
                              SeparableTraining(dx=1 / 8), dtype=jnp.float32)
    prob0 = discretize(sys, disc0)
    hlo0 = jax.jit(lambda th: prob0.pinnrep.phi(cord, th["depvar"])).lower(
        prob0.init_params).as_text()
    assert "HIGHEST" not in hlo0


def test_beltrami_4d_coupled_system_downscaled():
    """(3+1)-D coupled Navier-Stokes (Beltrami) from the example, tiny:
    4 separable fields, 4 equations, 22 analytic BCs on a 5^4 grid —
    gates the flagship example end-to-end (examples/beltrami_spinn.py;
    full-budget numbers in PERF.md)."""
    import os
    import sys

    sys.path.append(os.path.join(os.path.dirname(__file__), "..", "examples"))
    import beltrami_spinn as bs
    from neuralpde_tpu import NonAdaptiveLoss

    system = bs.build_system()
    nets = bs.make_nets(2, hidden=8)
    strat = SeparableTraining(dx=[0.5, 0.5, 0.5, 0.25], causal=bs.t,
                              causal_eps=1.0)
    disc = PhysicsInformedNN(
        nets, strat, dtype=jnp.float32,
        adaptive_loss=NonAdaptiveLoss(
            bc_loss_weights=[100.0] * 3 + [10.0] * 19))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(2e-3), maxiters=40, inner_steps=20)
    assert np.isfinite(res.objective)
    assert res.objective < res.history[0]
    rel = bs.rel_l2_velocities(nets, res.u, n_eval=5)
    assert np.isfinite(rel) and rel < 2.0
