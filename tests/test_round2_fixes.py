"""Regression tests for the round-1 review findings (VERDICT.md round 1):
optimizer dispatch, export deserialization, checkpoint validation +
auto-resume, WeightedIntervalTraining sampling, get_loss_function export."""

import os
from unittest import mock

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, GridTraining, Interval, PDESystem,
    PhysicsInformedNN, StochasticTraining, WeightedIntervalTraining,
    discretize, get_loss_function, mlp, solve, symbols,
)
from neuralpde_tpu.symbolic.expr import sin
from neuralpde_tpu.utils.checkpoint import (
    has_checkpoint, restore_checkpoint, save_checkpoint,
)


def poisson_1d_prob(strategy=None):
    """u'' = -pi^2 sin(pi x) on [0,1], u(0)=u(1)=0 -> u = sin(pi x)."""
    x = symbols("x")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    eq = Eq(Dxx(u(x)), -np.pi**2 * sin(np.pi * x))
    bcs = [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])
    disc = PhysicsInformedNN(mlp([1, 8, 1]), strategy or GridTraining(0.1))
    return discretize(system, disc)


# --- optimizer dispatch (train.py used to swallow TypeErrors) --------------

def test_plain_gradient_transformation_dispatch():
    """A bare (non-ExtraArgs) GradientTransformation must train via the
    plain update(grads, state, params) path."""
    calls = []

    def init(params):
        return ()

    def update(updates, state, params=None):
        calls.append(1)
        return jax.tree.map(lambda g: -1e-2 * g, updates), state

    opt = optax.GradientTransformation(init, update)
    prob = poisson_1d_prob()
    res = solve(prob, opt, maxiters=3)
    assert res.iterations == 3
    assert np.isfinite(res.objective)
    assert calls  # plain branch exercised at trace time


def test_lbfgs_extra_args_dispatch():
    prob = poisson_1d_prob()
    res = solve(prob, optax.lbfgs(), maxiters=30)
    assert np.isfinite(res.objective)
    assert res.objective < 5.0


def test_typeerror_inside_loss_propagates():
    """A TypeError raised inside the loss must surface, not be silently
    retried down a different optimizer branch."""

    class BadProb:
        init_params = jnp.zeros((3,))

        @staticmethod
        def loss(theta, lstate):
            raise TypeError("genuine bug inside the loss")

    with pytest.raises(TypeError, match="genuine bug"):
        solve(BadProb(), optax.lbfgs(), maxiters=1)


# --- checkpointing ----------------------------------------------------------

def _params():
    return mlp([2, 4, 1]).init(jax.random.key(0))


def test_checkpoint_writes_no_dead_treedef_files(tmp_path):
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, _params(), iteration=1)
    files = os.listdir(path)
    assert not [f for f in files if f.endswith(".treedef")], files
    assert "meta.json" in files and "params.npz" in files


def test_checkpoint_shape_mismatch_raises(tmp_path):
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, _params(), iteration=1)
    other = mlp([2, 5, 1]).init(jax.random.key(0))  # same treedef, new shapes
    with pytest.raises(ValueError, match="shape"):
        restore_checkpoint(path, other)


def test_checkpoint_structure_mismatch_raises(tmp_path):
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"a": jnp.zeros(3), "b": jnp.ones(2)}, iteration=1)
    with pytest.raises(ValueError, match="structure|leaves"):
        restore_checkpoint(path, {"a": jnp.zeros(3), "c": jnp.ones(2)})


def test_solve_auto_resume(tmp_path):
    """solve(checkpoint_dir=...) restores params/opt-state/iteration on
    restart: maxiters is the TOTAL iteration count across restarts."""
    path = str(tmp_path / "run")
    prob = poisson_1d_prob()
    r1 = solve(prob, optax.adam(1e-2), maxiters=6, checkpoint_dir=path,
               checkpoint_every=2)
    assert r1.iterations == 6
    assert has_checkpoint(path)
    r2 = solve(prob, optax.adam(1e-2), maxiters=12, checkpoint_dir=path)
    assert r2.iterations == 12
    assert len(r2.history) == 6  # only the remaining 6 steps ran
    # resumed params differ from a fresh start's after-6 params only by the
    # continued trajectory; at minimum the run continued (loss finite)
    assert np.isfinite(r2.objective)


# --- WeightedIntervalTraining ------------------------------------------------

def test_weighted_interval_exact_point_count():
    s = WeightedIntervalTraining([0.3, 0.3, 0.4], 100)
    assert int(s.segment_counts().sum()) == 100
    assert len(s.sample_times(0.0, 1.0)) == 100
    # awkward weights that floor-undershoot
    s2 = WeightedIntervalTraining([1, 1, 1], 100)
    assert int(s2.segment_counts().sum()) == 100
    assert len(s2.sample_times(0.0, 3.0)) == 100


def test_weighted_interval_not_hardcoded_seed():
    a = WeightedIntervalTraining([0.5, 0.5], 50).sample_times(0.0, 1.0)
    b = WeightedIntervalTraining([0.5, 0.5], 50).sample_times(0.0, 1.0)
    assert not np.allclose(a, b)  # fresh entropy per solve (ref semantics)
    c = WeightedIntervalTraining([0.5, 0.5], 50, seed=7).sample_times(0.0, 1.0)
    d = WeightedIntervalTraining([0.5, 0.5], 50, seed=7).sample_times(0.0, 1.0)
    np.testing.assert_array_equal(c, d)  # opt-in reproducibility


def test_weighted_interval_segment_bounds():
    s = WeightedIntervalTraining([0.2, 0.8], 40, seed=0)
    ts = np.sort(s.sample_times(1.0, 3.0))
    assert ts.min() >= 1.0 and ts.max() <= 3.0
    counts = s.segment_counts()
    n_first = int((ts < 2.0).sum())
    assert n_first == counts[0]


# --- get_loss_function parity export ----------------------------------------

def test_get_loss_function_matches_pipeline():
    prob = poisson_1d_prob(GridTraining(0.1))
    pinnrep = prob.pinnrep
    residual = pinnrep.loss_functions.datafree_pde_loss_functions[0]
    lf = get_loss_function(pinnrep, residual)
    v_direct = float(lf(prob.init_params, jax.random.key(0)))
    v_pipeline = float(pinnrep.loss_functions.pde_loss_functions[0](
        prob.init_params, jax.random.key(0)))
    assert np.isclose(v_direct, v_pipeline)


def test_get_loss_function_strategy_override():
    prob = poisson_1d_prob(GridTraining(0.1))
    pinnrep = prob.pinnrep
    residual = pinnrep.loss_functions.datafree_pde_loss_functions[0]
    lf = get_loss_function(pinnrep, residual,
                           strategy=StochasticTraining(64))
    v = float(lf(prob.init_params, jax.random.key(1)))
    assert np.isfinite(v) and v >= 0.0


# --- export deserializes once ------------------------------------------------

def test_export_deserializes_once():
    from jax import export as jax_export

    from neuralpde_tpu.utils.export import export_phi

    net = mlp([2, 4, 1])
    params = net.init(jax.random.key(0))

    def phi(cord, p):
        return net.apply(p, cord)

    real = jax_export.deserialize
    with mock.patch.object(jax_export, "deserialize",
                           side_effect=real) as m:
        blob, call = export_phi(phi, params, 2, batch=8,
                                dtype=jnp.float64)
        n_after_export = m.call_count
        cord = jnp.zeros((2, 8), jnp.float64)
        call(cord)
        call(cord)
        assert m.call_count == n_after_export  # no per-call deserialization
    assert n_after_export == 1


# --- solve_hybrid + loss_accum_dtype (VERDICT r1 items 9, 10) ----------------

def test_solve_hybrid_improves_on_adam():
    from neuralpde_tpu.train import solve_hybrid

    prob = poisson_1d_prob(GridTraining(0.05))
    r_adam = solve(prob, optax.adam(2e-3), maxiters=600, inner_steps=25)
    r_hyb = solve_hybrid(prob, adam_iters=300, lbfgs_iters=300,
                         adam_lr=2e-3, inner_steps=25)
    assert r_hyb.iterations == 600
    assert len(r_hyb.history) == len(r_adam.history)
    assert r_hyb.objective < r_adam.objective  # curvature polish wins


def test_loss_accum_dtype_f64():
    """f32 residuals with f64 reduction: loss comes out f64 and matches the
    f32 reduction to f32 precision."""
    x = symbols("x")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    eq = Eq(Dxx(u(x)), -np.pi**2 * sin(np.pi * x))
    bcs = [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])

    def build(acc):
        disc = PhysicsInformedNN(mlp([1, 8, 1]), GridTraining(0.05),
                                 dtype=jnp.float32, loss_accum_dtype=acc)
        return discretize(system, disc)

    p32 = build(None)
    p64 = build(jnp.float64)
    l32 = p32.pinnrep.loss_functions.pde_loss_functions[0](p32.init_params)
    l64 = p64.pinnrep.loss_functions.pde_loss_functions[0](p64.init_params)
    assert l64.dtype == jnp.float64
    assert np.isclose(float(l32), float(l64), rtol=1e-5)
    # trains fine end-to-end
    r = solve(p64, optax.adam(1e-2), maxiters=50)
    assert np.isfinite(r.objective)


def test_stochastic_microbatch_matches_unchunked():
    """microbatch chunking is a pure execution-schedule change: same points
    (same key), same loss value."""
    x = symbols("x")
    u = DepVar("u")
    Dxx = Differential(x) ** 2
    eq = Eq(Dxx(u(x)), -np.pi**2 * sin(np.pi * x))
    bcs = [Eq(u(0.0), 0.0), Eq(u(1.0), 0.0)]
    system = PDESystem(eq, bcs, [Domain(x, Interval(0, 1))], [x], [u(x)])

    def build(mb):
        disc = PhysicsInformedNN(mlp([1, 8, 1]),
                                 StochasticTraining(256, microbatch=mb))
        return discretize(system, disc)

    p_plain = build(None)
    p_mb = build(64)
    k = jax.random.key(3)
    l_plain = float(p_plain.pinnrep.loss_functions.pde_loss_functions[0](
        p_plain.init_params, k))
    l_mb = float(p_mb.pinnrep.loss_functions.pde_loss_functions[0](
        p_mb.init_params, k))
    assert np.isclose(l_plain, l_mb, rtol=1e-6), (l_plain, l_mb)
    # trains end-to-end
    r = solve(p_mb, optax.adam(1e-2), maxiters=30)
    assert np.isfinite(r.objective)
    # invalid divisor raises
    with pytest.raises(ValueError, match="multiple"):
        StochasticTraining(100, microbatch=64)
