"""hp-VPINN weak-form training (`WeakTraining`) — beyond reference.

Validates the variational machinery itself (test bases, normalization,
the integration-by-parts identity on the real network) plus end-to-end
accuracy, routing, and composition gates.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import optax

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, Integral, Interval, MiniMaxAdaptiveLoss,
    PDESystem, PhysicsInformedNN, WeakTraining, discretize, mlp, solve,
    symbols, symbolic_discretize,
)
from neuralpde_tpu.compile.lower import LoweringContext, build_residual_function
from neuralpde_tpu.compile.weak import (
    _axis_matrices, _ibp_groups, _test_basis,
)
from neuralpde_tpu.symbolic.expr import Call, Deriv, Sym, expand_derivatives

x, y = symbols("x y")
u = DepVar("u")
v = DepVar("v")
Dx, Dy = Differential(x), Differential(y)
Dxx, Dyy = Differential(x) ** 2, Differential(y) ** 2


def _poisson_1d():
    eq = Eq(Dxx(u(x)), -np.pi**2 * npde.sin(np.pi * x))
    bcs = [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0)]
    return PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])


# ---------------------------------------------------------------------------
# basis & normalization invariants
# ---------------------------------------------------------------------------

def test_basis_vanishing_conditions():
    L = np.polynomial.legendre
    for k, c in enumerate(_test_basis(6, 1)):
        for xi in (-1.0, 1.0):
            assert abs(L.legval(xi, c)) < 1e-12, f"v_{k} must vanish at {xi}"
    for k, c in enumerate(_test_basis(6, 2)):
        for xi in (-1.0, 1.0):
            assert abs(L.legval(xi, c)) < 1e-12
            assert abs(L.legval(xi, L.legder(c))) < 1e-12, \
                f"v'_{k} must vanish at {xi} for the double-IBP basis"


def test_constant_residual_rows():
    """ibp=0 basis includes P_0: a constant residual projects exactly onto
    the k=0 rows with value == the constant (the normalization contract:
    rows live on the strong-form residual scale), zero elsewhere."""
    nodes, w, C, _ = _axis_matrices(5, 0, 9, 0.0, 2.0, elements=3, max_order=0)
    r = np.full((3, 9), 2.5)  # constant residual on the (E, q) node grid
    F = np.einsum("eq,eqk->ek", r, np.asarray(C[0]))
    assert np.allclose(F[:, 0], 2.5, atol=1e-12)
    assert np.allclose(F[:, 1:], 0.0, atol=1e-12)


def test_rows_bounded_by_element_rms():
    """Cauchy-Schwarz: every normalized row is bounded by the element RMS
    residual — the loss can never exceed the strong-form mean square built
    from the same nodes/weights."""
    rng = np.random.default_rng(0)
    nodes, w, C, _ = _axis_matrices(7, 1, 16, -1.0, 3.0, elements=4, max_order=0)
    r = rng.normal(size=(4, 16))
    F = np.einsum("eq,eqk->ek", r, np.asarray(C[0]))
    h = 1.0
    w_el = w.reshape(4, 16) / (h / 1.0)  # physical weights; h=1 per element
    rms = np.sqrt(np.einsum("eq,eq->e", r * r, w.reshape(4, 16)) / h)
    assert (np.abs(F) <= rms[:, None] * (1 + 1e-10)).all()


# ---------------------------------------------------------------------------
# integration-by-parts identity on the real network
# ---------------------------------------------------------------------------

def test_ibp_identity_on_network():
    """∫ u'' v = −∫ u' v' = ∫ u v'' for the vanish-2 basis — the projection
    computed from the m=0/1/2 contraction matrices and the correspondingly
    reduced symbolic derivative must agree up to quadrature error."""
    system = _poisson_1d()
    disc = PhysicsInformedNN(mlp([1, 16, 1]), WeakTraining())
    pinnrep = symbolic_discretize(system, disc)
    ctx = LoweringContext.from_pinnrep(pinnrep)
    theta = pinnrep.flat_init_params

    nodes, w, C, _ = _axis_matrices(6, 2, 40, 0.0, 1.0, elements=3, max_order=2)
    cord = jnp.asarray(nodes[None, :], pinnrep.dtype)
    layout = [x]

    projections = []
    for expr, m, sign in [(Dxx(u(x)), 0, 1.0), (Dx(u(x)), 1, -1.0),
                          (u(x), 2, 1.0)]:
        rfn = build_residual_function(Eq(expr, 0.0), layout, ctx,
                                      pinnrep.default_p)
        r = np.asarray(rfn(cord, theta)).reshape(3, 40)
        projections.append(sign * np.einsum("eq,eqk->ek", r, np.asarray(C[m])))
    np.testing.assert_allclose(projections[0], projections[1],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(projections[0], projections[2],
                               rtol=1e-6, atol=1e-9)


# ---------------------------------------------------------------------------
# term grouping
# ---------------------------------------------------------------------------

def test_ibp_groups_splits_nonlinear_terms():
    """u·u_x cannot integrate by parts (non-constant coefficient); ν·u_xx
    moves one derivative with a sign flip; the forcing stays at m=0."""
    nu = 0.07
    expr = Call("-", (expand_derivatives(
        u(x) * Dx(u(x)) - nu * Dxx(u(x))), expand_derivatives(
        npde.sin(np.pi * x))))
    groups = _ibp_groups(expr, {"x"}, ibp=1)
    assert set(groups) == {(), (("x", 1),)}
    # the IBP'd group is  −(−ν·u_x)  ≡ +ν·u_x  (sign folded into the expr)
    sub = groups[(("x", 1),)]
    found = [""]

    def walk(e):
        if isinstance(e, Deriv):
            assert e.order == 1 and e.wrt[0] == Sym("x")
            found[0] = "ok"
        for a in getattr(e, "args", ()):
            walk(a)
        if isinstance(e, Deriv):
            walk(e.target)

    walk(sub)
    assert found[0] == "ok"


def test_mixed_partial_moves_one_per_axis():
    expr = Deriv(u(x, y), (Sym("x"), Sym("y")))
    groups = _ibp_groups(expr, {"x", "y"}, ibp=1)
    (key, sub), = groups.items()
    assert dict(key) == {"x": 1, "y": 1}

    def has_deriv(e):
        if isinstance(e, Deriv):
            return True
        return any(has_deriv(a) for a in getattr(e, "args", ()))

    assert not has_deriv(sub)  # both derivatives moved onto test functions


# ---------------------------------------------------------------------------
# end-to-end accuracy
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ibp", [0, 1, 2])
def test_poisson_1d_all_ibp_levels(ibp):
    system = _poisson_1d()
    disc = PhysicsInformedNN(mlp([1, 32, 32, 1]),
                             WeakTraining(elements=6, n_test=8, ibp=ibp))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(2e-3), maxiters=1500, inner_steps=50)
    xs = jnp.linspace(0, 1, 201)[None, :]
    pred = np.asarray(disc.phi(xs, res.u["depvar"])[0])
    want = np.sin(np.pi * np.asarray(xs[0]))
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 2e-2, f"ibp={ibp}: rel L2 {rel}"


def test_poisson_2d_weak():
    eq = Eq(Dxx(u(x, y)) + Dyy(u(x, y)),
            -npde.sin(np.pi * x) * npde.sin(np.pi * y))
    bcs = [Eq(u(0.0, y), 0.0), Eq(u(1.0, y), 0.0),
           Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)]
    system = PDESystem(eq, bcs,
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    disc = PhysicsInformedNN(mlp([2, 16, 16, 1]),
                             WeakTraining(elements=4, n_test=6, ibp=1))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(2e-2), maxiters=1200, inner_steps=50)
    xs = np.linspace(0, 1, 21)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    cord = jnp.asarray(np.stack([X.ravel(), Y.ravel()]))
    pred = np.asarray(disc.phi(cord, res.u["depvar"])[0]).reshape(21, 21)
    want = np.sin(np.pi * X) * np.sin(np.pi * Y) / (2 * np.pi**2)
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 0.2, rel


# ---------------------------------------------------------------------------
# routing, rejection, composition
# ---------------------------------------------------------------------------

def test_integral_equation_routes_to_quadrature_loss():
    """Integro-differential equations cannot be projected; they must fall
    back to the quadrature-weighted pointwise loss and still train."""
    Ix = Integral(x, 0.0, 1.0)
    eq = Eq(u(x) + Ix(u(x)), 1.0 + x)  # u = x + 1/2 solves it... (gate only)
    bcs = [Eq(u(0.0), 0.5)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])
    disc = PhysicsInformedNN(mlp([1, 16, 1]), WeakTraining(elements=3,
                                                           n_test=4))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(1e-2), maxiters=300, inner_steps=50)
    assert np.isfinite(res.objective)
    # routing gate: the quadrature fallback trains (down from O(1) at init)
    assert res.objective < 5e-2


def test_gradient_enhanced_rejected():
    system = _poisson_1d()
    disc = PhysicsInformedNN(mlp([1, 16, 1]), WeakTraining(),
                             gradient_enhanced=0.1)
    with pytest.raises(ValueError, match="gradient_enhanced"):
        discretize(system, disc)


def test_adaptive_loss_composes():
    system = _poisson_1d()
    disc = PhysicsInformedNN(mlp([1, 16, 1]), WeakTraining(elements=3,
                                                           n_test=4),
                             adaptive_loss=MiniMaxAdaptiveLoss(
                                 reweight_every=5))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(1e-3), maxiters=30)
    assert np.isfinite(res.objective)


def test_coupled_system_weak():
    """Two coupled first-order equations (u' = v, v' = −u) — multi-equation,
    multi-output weak projection; ibp moves the single derivative."""
    eqs = [Eq(Dx(u(x)), v(x)), Eq(Dx(v(x)), -u(x))]
    bcs = [Eq(u(0.0), 0.0), Eq(v(0.0), 1.0)]
    system = PDESystem(eqs, bcs, [Domain(x, Interval(0, np.pi))], [x],
                       [u(x), v(x)])
    disc = PhysicsInformedNN([mlp([1, 24, 1]), mlp([1, 24, 1])],
                             WeakTraining(elements=5, n_test=6, ibp=1,
                                          bc_dx=0.1))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(3e-3), maxiters=2000, inner_steps=50)
    xs = jnp.linspace(0, np.pi, 101)[None, :]
    pu = np.asarray(disc.phi[0](xs, res.u["depvar"]["u"])[0])
    rel = (np.linalg.norm(pu - np.sin(np.asarray(xs[0])))
           / np.linalg.norm(np.sin(np.asarray(xs[0]))))
    assert rel < 8e-2, rel


# ---------------------------------------------------------------------------
# Gauss-Newton on weak rows (hp-VPINN least squares)
# ---------------------------------------------------------------------------

def test_gauss_newton_weak_norm_squared_equals_full_loss():
    """The weak projection IS a residual vector: build_residual_vector on a
    WeakTraining problem must satisfy ||r(θ)||² == full_loss(θ) (incl. the
    pointwise BC rows and custom loss weights)."""
    import jax
    from neuralpde_tpu import NonAdaptiveLoss, build_residual_vector

    system = _poisson_1d()
    disc = PhysicsInformedNN(mlp([1, 16, 16, 1]),
                             WeakTraining(elements=4, n_test=6, ibp=1),
                             adaptive_loss=NonAdaptiveLoss(
                                 pde_loss_weights=2.0,
                                 bc_loss_weights=[3.0, 5.0]))
    prob = discretize(system, disc)
    r = build_residual_vector(prob.pinnrep)(prob.init_params)
    lstate = {"key": jax.random.key(0),
              "adaptive": prob.pinnrep.adaloss.init_state(
                  1, 2, prob.pinnrep.dtype)}
    full, _ = prob.loss(prob.init_params, lstate)
    np.testing.assert_allclose(float(jnp.sum(r * r)), float(full), rtol=2e-6)


def test_gauss_newton_weak_ide_routing_norm_parity():
    """An integro-differential equation routes to the quadrature-weighted
    pointwise rows inside the SAME residual vector (auto-hybrid precedent)."""
    import jax
    from neuralpde_tpu import build_residual_vector

    Ix = Integral(x, 0.0, 1.0)
    eq = Eq(u(x) + Ix(u(x)), 1.0 + x)
    bcs = [Eq(u(0.0), 0.5)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])
    disc = PhysicsInformedNN(mlp([1, 12, 1]),
                             WeakTraining(elements=3, n_test=4))
    prob = discretize(system, disc)
    r = build_residual_vector(prob.pinnrep)(prob.init_params)
    lstate = {"key": jax.random.key(0),
              "adaptive": prob.pinnrep.adaloss.init_state(
                  1, 1, prob.pinnrep.dtype)}
    full, _ = prob.loss(prob.init_params, lstate)
    np.testing.assert_allclose(float(jnp.sum(r * r)), float(full), rtol=2e-6)


def test_solve_gauss_newton_weak_poisson():
    """hp-VPINN + Gauss-Newton: the weak objective polishes far below the
    Adam floor of the same budget class (curvature on variational rows)."""
    from neuralpde_tpu import solve_gauss_newton

    system = _poisson_1d()
    disc = PhysicsInformedNN(mlp([1, 16, 16, 1]),
                             WeakTraining(elements=6, n_test=8, ibp=1))
    prob = discretize(system, disc)
    res = solve_gauss_newton(prob, maxiters=60, cg_iters=100)
    xs = np.linspace(0, 1, 201)
    pred = np.asarray(disc.phi(jnp.asarray(xs)[None, :],
                               res.params["depvar"])).ravel()
    want = np.sin(np.pi * xs)
    rel = np.linalg.norm(pred - want) / np.linalg.norm(want)
    assert rel < 1e-3, rel
    # weak rows are element-RMS-normalized: the f32 GN floor sits ~1e-5
    assert res.objective < 1e-4


# ---------------------------------------------------------------------------
# h-refinement (refine_weak) — the "h" of hp-VPINN
# ---------------------------------------------------------------------------

def test_explicit_uniform_edges_match_element_count():
    """elements=N and an explicit uniform edges array are the SAME mesh:
    identical loss at identical params."""
    import jax
    from neuralpde_tpu import refine_weak  # noqa: F401  (export gate)

    system = _poisson_1d()

    def build(elements):
        disc = PhysicsInformedNN(mlp([1, 12, 1]),
                                 WeakTraining(elements=elements, n_test=5))
        return discretize(system, disc)

    p1 = build(4)
    p2 = build({"x": np.linspace(0.0, 1.0, 5)})
    lstate = {"key": jax.random.key(0),
              "adaptive": p1.pinnrep.adaloss.init_state(
                  1, 2, p1.pinnrep.dtype)}
    l1, _ = p1.loss(p1.init_params, lstate)
    l2, _ = p2.loss(p1.init_params, lstate)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-12)


def _tanh_front_system(S=20.0, X0=0.7):
    th = lambda e: npde.tanh(S * (e - X0))
    eq = Eq(Dxx(u(x)), -2 * S**2 * th(x) * (1.0 - th(x) ** 2))
    bcs = [Eq(u(0.0), float(np.tanh(-S * X0))),
           Eq(u(1.0), float(np.tanh(S * (1 - X0))))]
    return PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)]), S, X0


def test_refine_weak_targets_front_and_beats_uniform():
    """Residual-driven refinement on a tanh front at x0=0.7: the element
    containing the front must be among the split ones, and a deterministic
    Gauss-Newton polish (which converges to each MESH's attainable floor)
    from the same warm start must reach a lower true error on the refined
    mesh than on the uniform mesh with the SAME final element count."""
    from neuralpde_tpu import refine_weak, solve_gauss_newton

    # S=60 with only 5 test fns per element: the MESH is the binding
    # constraint (at gentler fronts both meshes reach the same network
    # floor and refinement can't show)
    system, S, X0 = _tanh_front_system(S=60.0)

    def rel_l2(disc, theta):
        xs = np.linspace(0, 1, 401)
        pred = np.asarray(disc.phi(jnp.asarray(xs)[None, :],
                                   theta["depvar"])).ravel()
        want = np.tanh(S * (xs - X0))
        return np.linalg.norm(pred - want) / np.linalg.norm(want)

    disc1 = PhysicsInformedNN(mlp([1, 32, 32, 1]),
                              WeakTraining(elements=6, n_test=5, ibp=1))
    prob1 = discretize(system, disc1)
    res1 = solve(prob1, optax.adam(2e-3), maxiters=2000, inner_steps=50)

    strat2 = refine_weak(prob1, res1.u, frac=0.34)   # 6 -> 9 elements
    edges = strat2.elements["x"]
    assert len(edges) == 10
    # the front element [0.6667, 0.8333] was split: a new edge inside it
    assert any(0.667 < e < 0.833 for e in edges), edges

    def polish(strategy):
        disc = PhysicsInformedNN(mlp([1, 32, 32, 1]), strategy)
        prob = discretize(system, disc).with_params(res1.u)
        res = solve_gauss_newton(prob, maxiters=40, cg_iters=100)
        return rel_l2(disc, res.params)

    r_ref = polish(strat2)
    r_uni = polish(WeakTraining(elements=9, n_test=5, ibp=1))
    # measured 2.1e-3 vs 3.0e-2 (14x); assert half the margin
    assert r_ref < 0.5 * r_uni, (r_ref, r_uni)


def test_refine_weak_rejects_non_weak_and_all_routed():
    from neuralpde_tpu import GridTraining, refine_weak

    system = _poisson_1d()
    prob_g = discretize(system, PhysicsInformedNN(mlp([1, 8, 1]),
                                                  GridTraining(0.1)))
    with pytest.raises(TypeError, match="WeakTraining"):
        refine_weak(prob_g, prob_g.init_params)

    Ix = Integral(x, 0.0, 1.0)
    ide = PDESystem(Eq(u(x) + Ix(u(x)), 1.0 + x), [Eq(u(0.0), 0.5)],
                    [Domain(x, Interval(0, 1))], [x], [u(x)])
    prob_i = discretize(ide, PhysicsInformedNN(
        mlp([1, 8, 1]), WeakTraining(elements=3, n_test=4)))
    with pytest.raises(ValueError, match="quadrature-routed"):
        refine_weak(prob_i, prob_i.init_params)


def test_gauss_newton_on_refined_edges_norm_parity():
    """||r||² == loss must hold on an h-refined (non-uniform edges) mesh."""
    import jax
    from neuralpde_tpu import build_residual_vector

    system = _poisson_1d()
    edges = np.array([0.0, 0.1, 0.3, 0.35, 0.6, 1.0])
    disc = PhysicsInformedNN(mlp([1, 12, 1]),
                             WeakTraining(elements={"x": edges}, n_test=5))
    prob = discretize(system, disc)
    r = build_residual_vector(prob.pinnrep)(prob.init_params)
    lstate = {"key": jax.random.key(0),
              "adaptive": prob.pinnrep.adaloss.init_state(
                  1, 2, prob.pinnrep.dtype)}
    full, _ = prob.loss(prob.init_params, lstate)
    np.testing.assert_allclose(float(jnp.sum(r * r)), float(full), rtol=2e-6)


def test_refine_weak_2d_targets_front_axis():
    """2-D: per-axis scoring localizes the x-front (u = tanh(S(x−0.7))·
    sin(πy)) — the x element containing 0.7 must be split."""
    from neuralpde_tpu import refine_weak

    S, X0 = 30.0, 0.7
    th = lambda e: npde.tanh(S * (e - X0))
    f = ((-2 * S**2) * th(x) * (1.0 - th(x) ** 2) * npde.sin(np.pi * y)
         - np.pi**2 * th(x) * npde.sin(np.pi * y))
    eq = Eq(Dxx(u(x, y)) + Dyy(u(x, y)), f)
    bcs = [Eq(u(0.0, y), float(np.tanh(-S * X0)) * npde.sin(np.pi * y)),
           Eq(u(1.0, y), float(np.tanh(S * (1 - X0))) * npde.sin(np.pi * y)),
           Eq(u(x, 0.0), 0.0), Eq(u(x, 1.0), 0.0)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1)),
                                 Domain(y, Interval(0, 1))],
                       [x, y], [u(x, y)])
    disc = PhysicsInformedNN(mlp([2, 32, 32, 1]),
                             WeakTraining(elements=5, n_test=6, ibp=1))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(2e-3), maxiters=1500, inner_steps=50)
    strat2 = refine_weak(prob, res.u, frac=0.25)
    ex, ey = strat2.elements["x"], strat2.elements["y"]
    assert len(ex) == 8 and len(ey) == 8          # 5 -> 7 elements per axis
    # the x front element [0.6, 0.8] gained an interior edge
    assert any(0.6 < e_ < 0.8 for e_ in ex), ex


# ---------------------------------------------------------------------------
# p-refinement (per-element test counts) + the adaptive driver (r5)
# ---------------------------------------------------------------------------

def test_per_element_ntest_uniform_array_matches_scalar():
    """n_test given as a per-element array of identical counts is the SAME
    projection as the scalar: identical loss at identical params."""
    import jax

    system = _poisson_1d()

    def build(n_test):
        disc = PhysicsInformedNN(mlp([1, 12, 1]),
                                 WeakTraining(elements=4, n_test=n_test))
        return discretize(system, disc)

    p1 = build(5)
    p2 = build({"x": np.array([5, 5, 5, 5])})
    lstate = {"key": jax.random.key(0),
              "adaptive": p1.pinnrep.adaloss.init_state(
                  1, 2, p1.pinnrep.dtype)}
    l1, _ = p1.loss(p1.init_params, lstate)
    l2, _ = p2.loss(p1.init_params, lstate)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-12)


def test_per_element_ntest_pads_with_zero_rows():
    """Mixed per-element counts: modes beyond an element's count contribute
    exactly zero (zeroed contraction columns AND zero row weight), and the
    active row weights still sum to 1."""
    nodes, w, C, mask = _axis_matrices(np.array([3, 6, 3]), 1, 10, 0.0, 1.0,
                                       elements=3, max_order=1)
    assert C[0].shape == (3, 10, 6) and mask.shape == (3, 6)
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(mask[1], [1, 1, 1, 1, 1, 1])
    # padded columns are exactly zero in every derivative matrix
    for m in range(2):
        assert np.all(C[m][0][:, 3:] == 0.0)
        assert np.all(C[m][2][:, 3:] == 0.0)
    # and the first 3 columns match a K=3 build exactly
    _, _, C3, _ = _axis_matrices(3, 1, 10, 0.0, 1.0, elements=3, max_order=1)
    np.testing.assert_allclose(C[0][:, :, :3], C3[0], rtol=1e-12)


def test_refine_weak_p_mode_raises_counts_keeps_edges():
    """mode='p' on a smooth problem: flagged elements gain test functions,
    the mesh edges stay put."""
    from neuralpde_tpu import refine_weak

    system = _poisson_1d()
    disc = PhysicsInformedNN(mlp([1, 16, 1]),
                             WeakTraining(elements=4, n_test=5, ibp=1))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(2e-3), maxiters=500, inner_steps=50)
    strat2 = refine_weak(prob, res.u, frac=0.5, mode="p", p_inc=3)
    np.testing.assert_allclose(strat2.elements["x"],
                               np.linspace(0, 1, 5), atol=1e-12)
    k2 = np.asarray(strat2.n_test["x"])
    assert k2.shape == (4,)
    assert np.sum(k2 == 8) == 2 and np.sum(k2 == 5) == 2, k2
    # and the refined strategy trains (quad auto-tracks the new max K)
    disc2 = PhysicsInformedNN(mlp([1, 16, 1]), strat2)
    prob2 = discretize(system, disc2).with_params(res.u)
    res2 = solve(prob2, optax.adam(2e-3), maxiters=100, inner_steps=50)
    assert np.isfinite(res2.objective)


def test_hp_action_decision_rule():
    """The hp smoothness indicator on synthetic spectra: geometric decay
    -> 'p' (smooth), flat/tail-heavy spectrum -> 'h' (unresolved), and the
    p cap forces 'h'."""
    from neuralpde_tpu.compile.weak import _hp_action

    decaying = 10.0 ** -np.arange(8)           # resolved smooth residual
    assert _hp_action(decaying, 8, 4, 24, 0.1) == "p"
    flat = np.ones(8)                           # point-spike-like spectrum
    assert _hp_action(flat, 8, 4, 24, 0.1) == "h"
    tail_heavy = np.array([0.1, 0.1, 0.1, 0.1, 1.0, 2.0, 3.0, 4.0])
    assert _hp_action(tail_heavy, 8, 4, 24, 0.1) == "h"
    # at the cap, even a smooth element h-splits
    assert _hp_action(decaying, 22, 4, 24, 0.1) == "h"
    # only the ACTIVE modes count (padded entries ignored)
    padded = np.array([1.0, 1e-4, 1e-8, 1e-12, 777.0, 777.0])
    assert _hp_action(padded, 4, 4, 24, 0.1) == "p"


def test_refine_weak_hp_refines_top_energy_elements():
    """mode='hp' plumbing on the tanh front: exactly ceil(frac·E) elements
    are refined (h-split or p-raised), h children inherit the parent's test
    count, and the refined strategy trains from the warm start.  (Which
    flagged element gets h vs p depends on the trained residual's spectrum
    — the decision rule itself is unit-tested above.)"""
    from neuralpde_tpu import refine_weak

    system, S, X0 = _tanh_front_system(S=60.0)
    disc = PhysicsInformedNN(mlp([1, 32, 32, 1]),
                             WeakTraining(elements=6, n_test=5, ibp=1))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(2e-3), maxiters=2000, inner_steps=50)
    strat2 = refine_weak(prob, res.u, frac=0.34, mode="hp", p_inc=4)
    edges = np.asarray(strat2.elements["x"])
    k2 = np.asarray(strat2.n_test["x"])
    n_split = (len(edges) - 1) - 6            # parts=2: one extra per split
    n_raised = int(np.sum(k2 == 9)) if np.ndim(k2) else 0
    # ceil(0.34·6) = 3 elements refined, one way or the other
    assert n_split + n_raised == 3, (edges, k2)
    assert set(np.unique(k2)) <= {5, 9}          # inherit or +p_inc only
    disc2 = PhysicsInformedNN(mlp([1, 32, 32, 1]), strat2)
    prob2 = discretize(system, disc2).with_params(res.u)
    res2 = solve(prob2, optax.adam(2e-3), maxiters=100, inner_steps=50)
    assert np.isfinite(res2.objective)


def test_refine_weak_seeds_unscored_axes_from_strategy():
    """An axis appearing only in a quadrature-routed equation keeps its
    ORIGINAL element count/test count after refine_weak (advisor r4: it
    used to silently fall back to the defaults)."""
    from neuralpde_tpu import Integral, refine_weak

    Iy = Integral(y, 0.0, 1.0)
    system = PDESystem(
        [Eq(Dxx(u(x)), -np.pi**2 * npde.sin(np.pi * x)),
         Eq(v(y) + Iy(v(y)), 1.0 + y)],
        [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0), Eq(v(0.0), 0.5)],
        [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
        [x, y], [u(x), v(y)])
    disc = PhysicsInformedNN(
        [mlp([1, 10, 1]), mlp([1, 10, 1])],
        WeakTraining(elements={"x": 4, "y": 7}, n_test={"x": 5, "y": 9}))
    prob = discretize(system, disc)
    strat2 = refine_weak(prob, prob.init_params, frac=0.25)
    assert strat2.elements["y"] == 7          # untouched, NOT the default 4
    assert strat2.n_test["y"] == 9
    assert len(np.asarray(strat2.elements["x"])) == 6   # 4 -> 5 elements


def test_solve_weak_adaptive_front_beats_equal_budget_uniform():
    """The one-call driver: 3 rounds of train->refine->warm-start on the
    tanh front must beat the SAME total Adam budget on the fixed initial
    mesh (the mesh is the binding constraint at S=60)."""
    from neuralpde_tpu import solve_weak_adaptive

    system, S, X0 = _tanh_front_system(S=60.0)

    def rel_l2(prob, theta):
        xs = np.linspace(0, 1, 401)
        phi = prob.pinnrep.phi
        pred = np.asarray(phi(jnp.asarray(xs)[None, :],
                              theta["depvar"])).ravel()
        want = np.tanh(S * (xs - X0))
        return np.linalg.norm(pred - want) / np.linalg.norm(want)

    disc = PhysicsInformedNN(mlp([1, 32, 32, 1]),
                             WeakTraining(elements=6, n_test=5, ibp=1))
    ares = solve_weak_adaptive(system, disc, optax.adam(2e-3), rounds=3,
                               maxiters=2000, frac=0.34, mode="hp",
                               inner_steps=50)
    assert len(ares.strategies) == 3
    assert len(np.asarray(ares.strategy.elements["x"])) > 7  # mesh grew
    assert ares.iterations == 6000
    r_adapt = rel_l2(ares.prob, ares.u)

    prob_u = discretize(system, PhysicsInformedNN(
        mlp([1, 32, 32, 1]), WeakTraining(elements=6, n_test=5, ibp=1)))
    res_u = solve(prob_u, optax.adam(2e-3), maxiters=6000, inner_steps=50)
    r_fixed = rel_l2(prob_u, res_u.u)
    assert r_adapt < 0.67 * r_fixed, (r_adapt, r_fixed)


def test_solve_weak_adaptive_validates_args():
    from neuralpde_tpu import GridTraining, solve_weak_adaptive

    system = _poisson_1d()
    disc_g = PhysicsInformedNN(mlp([1, 8, 1]), GridTraining(0.1))
    with pytest.raises(TypeError, match="WeakTraining"):
        solve_weak_adaptive(system, disc_g)
    disc_w = PhysicsInformedNN(mlp([1, 8, 1]), WeakTraining(elements=3))
    with pytest.raises(ValueError, match="rounds"):
        solve_weak_adaptive(system, disc_w, rounds=0)
    with pytest.raises(ValueError, match="entries"):
        solve_weak_adaptive(system, disc_w, rounds=2, maxiters=[100])


def test_refine_weak_h_mode_preserves_explicit_quad():
    """mode='h' (no test-count growth) must keep a deliberate explicit quad
    setting; mode='p' growth past the resolve floor must still bump it
    (r5 review finding: the bump used to apply unconditionally)."""
    from neuralpde_tpu import refine_weak

    system = _poisson_1d()
    disc = PhysicsInformedNN(mlp([1, 16, 1]),
                             WeakTraining(elements=4, n_test=5, ibp=1,
                                          quad=6))
    prob = discretize(system, disc)
    res = solve(prob, optax.adam(2e-3), maxiters=200, inner_steps=50)
    s_h = refine_weak(prob, res.u, frac=0.5, mode="h")
    assert s_h.quad == 6, s_h.quad          # h-split: counts unchanged
    s_p = refine_weak(prob, res.u, frac=0.5, mode="p", p_inc=3)
    assert s_p.quad == 8 + 1 + 3, s_p.quad  # max K grew 5->8: floor bump
