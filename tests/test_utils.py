"""Checkpoint/resume, logging hooks, pytree utils, profiling."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from neuralpde_tpu import LogOptions, logscalar, logvector, mlp
from neuralpde_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from neuralpde_tpu.utils.profiling import PhaseTimer, checkify_residual
from neuralpde_tpu.utils.pytree import (
    parameters_to_vector, tree_size, vector_to_parameters,
)


def test_checkpoint_roundtrip(tmp_path):
    net = mlp([2, 8, 1])
    params = net.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params, opt_state, iteration=42)
    p2, o2, it = restore_checkpoint(path, params, opt_state)
    assert it == 42
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert len(jax.tree.leaves(o2)) == len(jax.tree.leaves(opt_state))


def test_vector_roundtrip():
    net = mlp([3, 5, 2])
    params = net.init(jax.random.key(1))
    vec, unravel = parameters_to_vector(params)
    assert vec.shape == (tree_size(params),)
    back = vector_to_parameters(vec, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class _RecordingLogger:
    def __init__(self):
        self.records = []

    def log_scalar(self, name, value, step):
        self.records.append((name, value, step))


def test_logging_hooks():
    logger = _RecordingLogger()
    logscalar(logger, 1.5, "loss/total", 10)
    logvector(logger, [1.0, 2.0], "loss/parts", 10)
    names = [r[0] for r in logger.records]
    assert names == ["loss/total", "loss/parts/1", "loss/parts/2"]
    # no-op for logger without the method / None
    logscalar(None, 1.0, "x", 0)
    logscalar(object(), 1.0, "x", 0)
    assert LogOptions().log_frequency == 50


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2


def test_checkify_residual_catches_nan():
    def residual(x):
        return jnp.log(x)  # NaN for negative input

    checked = checkify_residual(residual)
    err, out = checked(jnp.asarray(-1.0))
    with pytest.raises(Exception):
        err.throw()


def test_tensorboard_logger_writes_events(tmp_path):
    """Logger side-effects (reference: adaptive_loss tests assert TB log-dir
    contents)."""
    import optax
    from neuralpde_tpu import (
        DepVar, Differential, Domain, Eq, GridTraining, Interval, LogOptions,
        PDESystem, PhysicsInformedNN, TensorBoardLogger, discretize, solve,
        symbols,
    )

    t = symbols("t")
    u = DepVar("u")
    eq = Eq(Differential(t)(u(t)), -u(t))
    system = PDESystem(eq, [Eq(u(0.0), 1.0)],
                       [Domain(t, Interval(0, 1))], [t], [u(t)])
    logdir = str(tmp_path / "tb")
    logger = TensorBoardLogger(logdir)
    disc = PhysicsInformedNN(mlp([1, 8, 1]), GridTraining(0.1),
                             logger=logger, log_options=LogOptions(10))
    prob = discretize(system, disc)
    solve(prob, optax.adam(0.05), maxiters=30)
    logger.flush()
    files = os.listdir(logdir)
    assert files, "no TensorBoard event files written"


def test_export_serving_roundtrip(tmp_path):
    """AOT export of a trained phi to StableHLO and reload (serving path —
    beyond-reference production feature)."""
    from neuralpde_tpu.compile.discretize import Phi
    from neuralpde_tpu.utils.export import (
        export_phi, load_exported, save_exported,
    )

    net = mlp([2, 8, 1])
    params = net.init(jax.random.key(0))
    phi = Phi(net)
    blob, call = export_phi(phi, params, in_dim=2, batch=16,
                            dtype=jnp.float64)
    cord = jnp.ones((2, 16), jnp.float64) * 0.3
    want = phi(cord, params)
    got = call(cord)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)
    p = str(tmp_path / "sol.stablehlo")
    save_exported(p, blob)
    serve = load_exported(p)
    got2 = serve(cord)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), rtol=1e-12)


def test_solve_checkpointing(tmp_path):
    import optax
    from neuralpde_tpu import (
        DepVar, Differential, Domain, Eq, GridTraining, Interval, PDESystem,
        PhysicsInformedNN, discretize, solve,
    )
    from neuralpde_tpu import symbols
    from neuralpde_tpu.utils.checkpoint import restore_checkpoint

    t = symbols("t")
    u = DepVar("u")
    eq = Eq(Differential(t)(u(t)), -u(t))
    system = PDESystem(eq, [Eq(u(0.0), 1.0)],
                       [Domain(t, Interval(0, 1))], [t], [u(t)])
    disc = PhysicsInformedNN(mlp([1, 8, 1]), GridTraining(0.1))
    prob = discretize(system, disc)
    ckpt = str(tmp_path / "run1")
    res = solve(prob, optax.adam(0.05), maxiters=50, inner_steps=25,
                checkpoint_dir=ckpt)
    params, _, it = restore_checkpoint(ckpt, res.u)
    assert it == 50
    # resume training from the checkpoint
    res2 = solve(prob.with_params(params), optax.adam(0.05), maxiters=25,
                 inner_steps=25)
    assert np.isfinite(res2.objective)


def test_eltype_adaptor():
    from neuralpde_tpu import EltypeAdaptor, recursive_eltype

    tree = {"a": jnp.ones((2,), jnp.float64), "b": jnp.ones((2,), jnp.float32),
            "i": jnp.ones((2,), jnp.int32)}
    out = EltypeAdaptor(jnp.float32)(tree)
    assert out["a"].dtype == jnp.float32
    assert out["i"].dtype == jnp.int32          # ints untouched
    assert recursive_eltype(tree) == jnp.float64


def test_export_dynamic_batch():
    from neuralpde_tpu.compile.discretize import Phi
    from neuralpde_tpu.utils.export import export_phi

    net = mlp([2, 8, 1])
    params = net.init(jax.random.key(0))
    phi = Phi(net)
    blob, call = export_phi(phi, params, in_dim=2, batch=None,
                            dtype=jnp.float64)
    for n in (5, 17):
        out = call(jnp.ones((2, n), jnp.float64))
        assert out.shape == (1, n)


def test_per_process_batch():
    from neuralpde_tpu.parallel.distributed import per_process_batch

    assert per_process_batch(64) == 64  # single process (always divisible)


def test_solve_stops_on_divergence():
    """NaN loss stops training with a warning instead of burning iterations."""
    import warnings as _w
    import optax
    from neuralpde_tpu.solvers.ode import _SimpleProblem
    from neuralpde_tpu.train import solve as tsolve

    def bad_loss(theta, key):
        return jnp.log(-jnp.abs(theta["w"]).sum())  # NaN immediately

    prob = _SimpleProblem(bad_loss, {"w": jnp.ones(3)})
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        res = tsolve(prob, optax.adam(0.1), maxiters=500)
    assert res.iterations < 500
    assert any("diverged" in str(r.message) for r in rec)


def test_export_stamps_matmul_precision():
    """export_phi defaults to true-f32 dot precision in the exported
    StableHLO (bf16-pass inference floors at ~1e-3 relative, PERF.md r3)."""
    from neuralpde_tpu import mlp
    from neuralpde_tpu.compile.discretize import Phi
    from neuralpde_tpu.utils.export import export_phi

    net = mlp([2, 8, 1])
    phi = Phi(net)
    params = jax.tree.map(lambda a: a.astype(jnp.float32),
                          net.init(jax.random.key(0)))
    blob, call = export_phi(phi, params, 2, batch=4)
    from jax import export as jax_export

    text = str(jax_export.deserialize(blob).mlir_module())
    assert "HIGHEST" in text
    blob0, _ = export_phi(phi, params, 2, batch=4, matmul_precision=None)
    assert "HIGHEST" not in str(jax_export.deserialize(blob0).mlir_module())
    out = call(jnp.ones((2, 4), jnp.float32))
    assert np.asarray(out).shape == (1, 4)


def test_export_pino_pde_operator():
    """A trained PINOPDE operator exports to StableHLO with grids baked in;
    the loaded artifact reproduces sol() on params + input-function values
    (symbolic family dimension)."""
    import optax
    from neuralpde_tpu import (FNO2D, GaussianRandomField, GridTraining,
                               PDESystem, PINOPDE, solve_pino_pde)
    from neuralpde_tpu.symbolic import expr as E
    from neuralpde_tpu.symbolic.system import Domain, Interval
    from neuralpde_tpu.utils.export import export_pino_pde

    x, t = E.Sym("x"), E.Sym("t")
    nu, u, f0 = E.Param("nu"), E.DepVar("u"), E.DepVar("f0")
    eq = E.Eq(E.Deriv(u(x, t), (t,)), nu * E.Deriv(u(x, t), (x, x)))
    sysd = PDESystem(eq, [E.Eq(u(x, E.Num(0.0)), f0(x))],
                     [Domain(x, Interval(0, 1)), Domain(t, Interval(0, 1))],
                     ivs=[x, t], dvs=[u(x, t)], ps=[nu])
    grf = GaussianRandomField(0.2)
    alg = PINOPDE(chain=FNO2D(2, width=8, modes=4, depth=2),
                  opt=optax.adam(1e-3), bounds=[(0.05, 0.3)],
                  number_of_parameters=4, input_functions={f0(x): grf},
                  strategy=GridTraining(0.25))
    sol = solve_pino_pde(sysd, alg, maxiters=3, inner_steps=1)

    blob, call = export_pino_pde(sol)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0
    p = jnp.asarray([[0.1, 0.2]], jnp.float32)
    ic = jnp.asarray(grf(jax.random.key(5), [sol.grids[0]], 2), jnp.float32)
    got = np.asarray(call(p, ic))
    want = np.asarray(sol(p=p, input_values={"f0": ic}))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
