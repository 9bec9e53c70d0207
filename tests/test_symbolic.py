"""Unit tests for the symbolic IR: expression building, differentiation,
equation analysis (get_argument/get_variables parity semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from neuralpde_tpu import (
    DepVar, Differential, Eq, Integral, Interval, Num, PDESystem, Sym,
    expand_derivatives, substitute, symbolic_diff, symbols,
)
from neuralpde_tpu.symbolic import expr as E
from neuralpde_tpu.compile.lower import (
    get_argument, get_integration_variables, get_variables,
)


x, y, t = symbols("x y t")
u = DepVar("u")
v = DepVar("v")
Dx = Differential(x)
Dy = Differential(y)
Dxx = Differential(x) ** 2


def _eval_const(e):
    """Evaluate a constant (Sym-free) expression numerically."""
    if isinstance(e, E.Num):
        return e.value
    if isinstance(e, E.Call):
        return float(E.PRIMITIVES[e.op](*[_eval_const(a) for a in e.args]))
    raise TypeError(e)


def _eval_at(e, env):
    return _eval_const(substitute(e, {k: Num(val) for k, val in env.items()}))


def test_operator_overloading_repr():
    e = Dxx(u(x, y)) + 4 * Dy(Dy(u(x, y)))
    assert isinstance(e, E.Call) and e.op == "+"
    d = e.args[0]
    assert isinstance(d, E.Deriv) and d.order == 2 and d.wrt == (x, x)


def test_differential_composition_and_power():
    d1 = Differential(x)(Differential(y)(u(x, y)))
    assert d1.wrt == (x, y)
    d2 = (Differential(x) ** 3)(u(x, y))
    assert d2.order == 3


def test_symbolic_diff_product_chain():
    # d/dx [ x^2 sin(x) ] = 2x sin x + x^2 cos x
    e = x**2 * E.sin(x)
    de = expand_derivatives(Differential(x)(e))
    for xv in (0.3, 1.2):
        got = _eval_at(de, {x: xv})
        want = 2 * xv * np.sin(xv) + xv**2 * np.cos(xv)
        # rel 1e-6: this XLA CPU build computes cos/tanh at ~f32 accuracy
        assert got == pytest.approx(want, rel=1e-6)


def test_expand_derivatives_product_rule_with_depvar():
    # Dx(f(x) * u(x,t)) -> f'(x) u + f(x) Dx(u)   (Fokker-Planck pattern)
    e = expand_derivatives(Dx(E.sin(x) * u(x, t)))
    # should contain a first-order Deriv of u and a plain u call
    found_deriv = found_call = False
    stack = [e]
    while stack:
        n = stack.pop()
        if isinstance(n, E.Deriv):
            assert n.wrt == (x,)
            found_deriv = True
        elif isinstance(n, E.DepVarCall):
            found_call = True
        if isinstance(n, E.Call):
            stack.extend(n.args)
        elif isinstance(n, E.Deriv):
            pass
    assert found_deriv and found_call


def test_expand_second_derivative_of_product():
    # Dxx(x^2 * u(x)) = 2u + 4x Dx(u) + x^2 Dxx(u)
    e = expand_derivatives(Dxx(x**2 * u(x)))
    # count derivative orders present
    orders = []
    stack = [e]
    while stack:
        n = stack.pop()
        if isinstance(n, E.Deriv):
            orders.append(n.order)
        elif isinstance(n, E.DepVarCall):
            orders.append(0)
        elif isinstance(n, E.Call):
            stack.extend(n.args)
    assert sorted(orders) == [0, 1, 1, 2]


def test_get_argument_numbers_and_symbols():
    bc = Eq(u(0, y), y**2)
    args = get_argument(bc, ["u"])
    assert args[0] == 0.0 and isinstance(args[1], Sym) and args[1].name == "y"
    assert get_variables(bc, ["u"]) == [y]


def test_get_argument_heterogeneous_system():
    # u(x), v(x, y) mixed in one equation
    eq = Eq(Dx(u(x)) + v(x, y), 0)
    args = get_argument(eq, ["u", "v"])
    assert [a.name for a in args] == ["x", "y"]


def test_get_integration_variables():
    eq = Eq(Integral(x, 0, 1)(u(x, y)), y)
    assert get_integration_variables(eq) == [x]


def test_substitute_inside_depvar_call():
    e = substitute(u(x, y) + E.sin(x), {x: x / (1 - x**2)})
    call = e.args[0]
    assert isinstance(call, E.DepVarCall)
    assert isinstance(call.args[0], E.Call)  # transformed argument


def test_interval_validation():
    with pytest.raises(ValueError):
        Interval(1.0, 0.0)


def test_pdesystem_validation_errors():
    u = DepVar("u")
    with pytest.raises(ValueError, match="no domain"):
        PDESystem([Eq(u(x), 0.0)], [], [], [x], [u(x)])
    with pytest.raises(TypeError, match="declared dependent-variable calls"):
        PDESystem([Eq(u(x), 0.0)], [],
                  [__import__("neuralpde_tpu").Domain(x, Interval(0, 1))],
                  [x], [u])  # bare DepVar, not a call
    with pytest.raises(TypeError, match="must be Eq"):
        PDESystem([u(x)], [],
                  [__import__("neuralpde_tpu").Domain(x, Interval(0, 1))],
                  [x], [u(x)])


def test_multidim_integral_parametric_bounds_evaluates():
    """Multi-dim integrals with parametric bounds lower to iterated 1-D
    integrals (supported since the IDE-example-4 feature)."""
    from neuralpde_tpu import Domain, GridTraining, PhysicsInformedNN, discretize, mlp
    import jax

    u2 = DepVar("u")
    ix = Integral((x, y), (0.0, 0.0), (x, 1.0))  # parametric in first dim
    eq = Eq(ix(u2(x, y)), 1.0)
    system = PDESystem(eq, [],
                       [Domain(x, Interval(0, 1)), Domain(y, Interval(0, 1))],
                       [x, y], [u2(x, y)])
    disc = PhysicsInformedNN(mlp([2, 8, 1]), GridTraining(0.5))
    prob = discretize(system, disc)
    total, aux = prob.loss(prob.init_params,
                           {"key": jax.random.key(0),
                            "adaptive": {"pde_weights": jnp.ones(1),
                                         "bc_weights": jnp.ones(0),
                                         "additional_weights": jnp.ones(1)}})
    assert np.isfinite(float(total))


def test_parameters_helper_and_repr():
    from neuralpde_tpu import parameters

    a, b = parameters("a b")
    assert repr(a) == "a" and a != b
    e = a * E.sin(x) + 2.0
    assert "sin" in repr(e)


def test_register_custom_primitive():
    """register_primitive adds a numeric op + symbolic derivative rule
    (reference's nonlinear_hyperbolic.md uses SpecialFunctions Bessel fns)."""
    from neuralpde_tpu.symbolic.expr import register_primitive, PRIMITIVES

    softplus = register_primitive(
        "softplus_test", lambda z: jnp.logaddexp(z, 0.0),
        deriv=lambda a: E.sigmoid(a))
    try:
        e = softplus(2.0 * x)
        # numeric evaluation through the registry
        got = _eval_at(e, {x: 0.7})
        assert got == pytest.approx(np.logaddexp(1.4, 0.0), rel=1e-6)
        # symbolic derivative: d/dx softplus(2x) = 2 sigmoid(2x)
        de = expand_derivatives(Differential(x)(e))
        got_d = _eval_at(de, {x: 0.7})
        want_d = 2.0 / (1.0 + np.exp(-1.4))
        assert got_d == pytest.approx(want_d, rel=1e-6)
        # without a deriv rule, differentiation raises
        plain = register_primitive("opaque_test", lambda z: z * 3.0)
        with pytest.raises(ValueError, match="no symbolic derivative"):
            expand_derivatives(Differential(x)(plain(x)))
    finally:
        PRIMITIVES.pop("softplus_test", None)
        PRIMITIVES.pop("opaque_test", None)
