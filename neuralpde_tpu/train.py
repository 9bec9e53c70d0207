"""Training loop (Optimization.jl + OptimizationOptimisers replacement).

`solve(prob, optimizer, maxiters, ...)` runs a fully jitted train step:
value_and_grad of the weighted loss, optax update, and adaptive-loss
reweighting under `lax.cond` — all one XLA program.  The host loop only
handles the callback / abstol-stop protocol (reference semantics:
src/ode_solve.jl:469-481) and logging at `log_frequency`
(reference: src/discretize.jl:598-643).

Set ``inner_steps > 1`` to scan that many optimizer steps per host round-trip
(the TPU-throughput mode; callbacks then fire every `inner_steps` iterations).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import math
import warnings

import jax
import jax.numpy as jnp
import optax

from .logging_utils import logscalar, logvector


@dataclass
class SolveResult:
    """OptimizationSolution analog: `u` = trained parameters."""

    u: Any
    objective: float
    iterations: int
    aux: dict
    history: list

    @property
    def params(self):
        return self.u


def _component_grads(loss_fns, theta, key):
    grads = []
    for i, f in enumerate(loss_fns):
        k = jax.random.fold_in(key, i)
        grads.append(jax.grad(lambda th: f(th, k))(theta))
    return grads


def make_step(loss_fn, optimizer, adaloss=None, pde_loss_fns=(), bc_loss_fns=()):
    """Build the jitted train step.

    carry = (theta, opt_state, ada_state, iteration); returns new carry plus
    (loss, aux).  ``key`` is the per-run PRNG key; per-iteration keys are
    folded in so the step retraces never.
    """

    every = getattr(adaloss, "reweight_every", 0) if adaloss is not None else 0
    needs_grads = bool(adaloss is not None and adaloss.needs_component_grads)

    def step(carry, key):
        theta, opt_state, ada_state, it = carry
        kstep = jax.random.fold_in(key, it)
        lstate = {"key": kstep, "adaptive": ada_state}
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(theta, lstate)
        # JAX returns Wirtinger-conjugate gradients for complex leaves;
        # descent needs the conjugate (NNODE allows complex parameters)
        grads = jax.tree.map(
            lambda g: jnp.conj(g) if jnp.iscomplexobj(g) else g, grads)

        if every and adaloss is not None:
            def do_reweight(ada):
                comp = None
                if needs_grads:
                    kg = jax.random.fold_in(kstep, 7)
                    comp = (_component_grads(pde_loss_fns, theta, jax.random.fold_in(kg, 0)),
                            _component_grads(bc_loss_fns, theta, jax.random.fold_in(kg, 1)))
                return adaloss.reweight(ada, theta, aux["pde_losses"],
                                        aux["bc_losses"], comp,
                                        jax.random.fold_in(kstep, 11))

            ada_state = jax.lax.cond((it + 1) % every == 0, do_reweight,
                                     lambda a: a, ada_state)

        def value_fn(th):
            return loss_fn(th, lstate)[0]

        if isinstance(optimizer, optax.GradientTransformationExtraArgs):
            # linesearch-based optimizers (optax.lbfgs) consume value/grad/
            # value_fn; other ExtraArgs transforms ignore unknown extras.
            # Dispatch on the type — never by swallowing TypeErrors, which
            # would hide genuine errors raised inside value_fn/the loss.
            updates, opt_state = optimizer.update(
                grads, opt_state, theta, value=loss, grad=grads,
                value_fn=value_fn)
        else:
            updates, opt_state = optimizer.update(grads, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return (theta, opt_state, ada_state, it + 1), (loss, aux)

    return step


def solve(prob, optimizer=None, maxiters: int = 1000, *,
          callback: Callable | None = None, abstol: float | None = None,
          key=None, inner_steps: int = 1, verbose: bool = False,
          checkpoint_dir: str | None = None, checkpoint_every: int = 1000,
          profile_dir: str | None = None, quad_adapt: bool = False,
          quad_adapt_rounds: int = 3):
    """Train a `TrainingProblem` (from `discretize`) or any object with
    `.loss(theta, lstate)` and `.init_params`.

    ``checkpoint_dir`` makes the run preemption-safe (SURVEY §5
    "orbax-style retry/restore"): params/opt-state/iteration are saved every
    `checkpoint_every` iterations (and once at the end), and when the
    directory already holds a checkpoint, solve() RESUMES from it — iteration
    count included, so `maxiters` means *total* iterations across restarts.
    ``profile_dir`` captures a jax.profiler trace of the run.

    ``quad_adapt``: close the quadrature-adaptivity loop for auto-refined
    `QuadratureTraining` rules.  The build-time rule matched reltol/abstol
    on the INITIAL-params integrand; after training, `validate_trained`
    rechecks it on the trained solution, and with ``quad_adapt=True`` a
    failing recheck triggers up to ``quad_adapt_rounds`` rebuild+warm-start
    re-solves (each with a fresh ``maxiters`` budget) with the rule
    re-refined against the trained params — delivering the reference's
    tolerances-on-the-returned-solution semantics
    (src/training_strategies.jl:406-436) at re-solve boundaries.
    The user callback IS threaded through the re-solves (it keeps firing,
    and can stop each re-solve); checkpointing and profiling are not (the
    re-solves' iteration budgets are separate)."""

    optimizer = optimizer or optax.adam(1e-3)
    key = key if key is not None else jax.random.key(0)
    pinnrep = getattr(prob, "pinnrep", None)
    adaloss = pinnrep.adaloss if pinnrep is not None else None
    lf = pinnrep.loss_functions if pinnrep is not None else None
    n_pde = len(lf.pde_loss_functions) if lf else 0
    n_bc = len(lf.bc_loss_functions) if lf else 0
    dtype = pinnrep.dtype if pinnrep is not None else jnp.float32

    theta = prob.init_params
    opt_state = optimizer.init(theta)
    start_iter = 0
    if checkpoint_dir is not None:
        from .utils.checkpoint import has_checkpoint, restore_checkpoint

        if has_checkpoint(checkpoint_dir):
            theta, restored_opt, start_iter = restore_checkpoint(
                checkpoint_dir, theta, opt_state)
            if restored_opt is not None:
                opt_state = restored_opt
            if verbose:
                print(f"[solve] resumed from {checkpoint_dir} at iteration "
                      f"{start_iter}")
    if adaloss is not None:
        ada_state = adaloss.init_state(n_pde, n_bc, dtype)
    else:
        ada_state = {"pde_weights": jnp.ones((n_pde,), dtype),
                     "bc_weights": jnp.ones((n_bc,), dtype),
                     "additional_weights": jnp.ones((1,), dtype)}

    step = make_step(prob.loss, optimizer, adaloss,
                     lf.pde_loss_functions if lf else (),
                     lf.bc_loss_functions if lf else ())

    if inner_steps > 1:
        def multi(carry, key):
            def body(c, _):
                return step(c, key)
            carry, (losses, auxs) = jax.lax.scan(body, carry, None, length=inner_steps)
            last_aux = jax.tree.map(lambda x: x[-1], auxs)
            return carry, (losses[-1], last_aux)

        jit_step = jax.jit(multi)
    else:
        jit_step = jax.jit(step)

    logger = pinnrep.logger if pinnrep is not None else None
    log_frequency = (pinnrep.log_options.log_frequency
                     if pinnrep is not None else 50)

    if profile_dir is not None:
        jax.profiler.start_trace(profile_dir)
    carry = (theta, opt_state, ada_state, jnp.asarray(start_iter, jnp.int32))
    history = []
    loss_val, aux = None, {}
    it = start_iter
    while it < maxiters:
        carry, (loss, aux) = jit_step(carry, key)
        it += inner_steps
        loss_val = float(loss)
        history.append(loss_val)
        if verbose:
            print(f"[solve] iter {it:6d}  loss {loss_val:.6g}")
        if logger is not None and it % log_frequency == 0:
            _log_metrics(logger, aux, it, carry[2])
        if callback is not None and callback(it, loss_val, aux):
            break
        if checkpoint_dir is not None and it % checkpoint_every < inner_steps:
            from .utils.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_dir, carry[0], carry[1], iteration=it)
        if abstol is not None and loss_val < abstol:
            break
        if not math.isfinite(loss_val):
            warnings.warn(
                f"training diverged (loss={loss_val}) at iteration {it}; "
                "stopping — consider a lower learning rate, remat=True, or "
                "utils.profiling.enable_nan_debugging() to locate the source")
            break

    theta, opt_state, ada_state, _ = carry
    if profile_dir is not None:
        jax.profiler.stop_trace()
    if checkpoint_dir is not None:
        from .utils.checkpoint import save_checkpoint

        save_checkpoint(checkpoint_dir, theta, opt_state, iteration=it)
    # post-solve quadrature-rule recheck: an auto-refined QuadratureTraining
    # rule was tuned on the INITIAL params — warn if the TRAINED residual
    # outruns it (strategies.QuadratureTraining.validate_trained), or, with
    # quad_adapt=True, ACT on it: re-refine the rule against the trained
    # params and warm-start a bounded re-solve
    strategy = pinnrep.strategy if pinnrep is not None else None
    result = SolveResult(u=theta, objective=loss_val, iterations=it,
                         aux={**aux, "adaptive_state": ada_state},
                         history=history)
    if (getattr(strategy, "_trained_checks", None)
            and math.isfinite(loss_val if loss_val is not None else math.nan)):
        if not quad_adapt:
            strategy.validate_trained(theta)
        else:
            result = _quad_adapt_resolve(
                result, prob, strategy, optimizer, maxiters,
                rounds=quad_adapt_rounds, abstol=abstol, key=key,
                inner_steps=inner_steps, verbose=verbose, callback=callback)
    return result


def _quad_adapt_resolve(result, prob, strategy, optimizer, maxiters, *,
                        rounds, abstol, key, inner_steps, verbose,
                        callback=None):
    """The quadrature-adaptivity loop body: while the trained solution
    outruns the frozen rule, rebuild every equation's rule against the
    trained params (`rebuild_strategy_losses`) and warm-start a re-solve."""
    from .compile.discretize import rebuild_strategy_losses

    pinnrep = prob.pinnrep
    for r in range(rounds):
        reports = strategy.validate_trained(result.u, warn=False)
        if all(rep["ok"] for rep in reports):
            return result
        if verbose:
            bad = sum(1 for rep in reports if not rep["ok"])
            print(f"[solve] quad_adapt round {r + 1}/{rounds}: {bad} "
                  f"equation rule(s) no longer meet tolerances on the "
                  f"trained solution; re-refining and re-solving")
        full_loss = rebuild_strategy_losses(pinnrep, at_params=result.u)
        prob = type(prob)(full_loss, result.u, pinnrep)
        # the rebuild registered the refined rule's checks; stash them so
        # the inner solve's own end-of-run recheck doesn't warn mid-loop
        checks = strategy._trained_checks
        strategy._trained_checks = []
        try:
            res2 = solve(prob, optimizer, maxiters=maxiters, abstol=abstol,
                         key=key, inner_steps=inner_steps, verbose=verbose,
                         callback=callback)
        finally:
            strategy._trained_checks = checks
        result = SolveResult(u=res2.u, objective=res2.objective,
                             iterations=result.iterations + res2.iterations,
                             aux=res2.aux,
                             history=result.history + res2.history)
    # final honest recheck (warns if rounds were exhausted while failing)
    strategy.validate_trained(result.u)
    return result


def solve_hybrid(prob, *, adam_iters: int = 2000, lbfgs_iters: int = 1000,
                 adam_lr: float = 2e-3, inner_steps: int = 50,
                 abstol: float | None = None, key=None, verbose: bool = False,
                 **kw):
    """Adam → L-BFGS two-stage recipe — the reference docs' standard
    wall-clock-to-accuracy pattern (e.g. docs/src/tutorials/low_level.md,
    docs/src/examples/wave.md train Adam then (L-)BFGS): Adam escapes the
    rough early landscape, L-BFGS's curvature steps polish to low loss in
    far fewer iterations.

    Works best with deterministic strategies (Grid/Quadrature) in the L-BFGS
    stage — the linesearch assumes a fixed objective; with stochastic
    strategies prefer a larger `adam_iters` fraction.  Returns a SolveResult
    whose history concatenates both stages.  Measured numbers in PERF.md.
    """
    import optax as _optax

    r1 = solve(prob, _optax.adam(adam_lr), maxiters=adam_iters,
               inner_steps=inner_steps, key=key, verbose=verbose, **kw)
    r2 = solve(prob.with_params(r1.u), _optax.lbfgs(), maxiters=lbfgs_iters,
               inner_steps=inner_steps, key=key, abstol=abstol,
               verbose=verbose, **kw)
    return SolveResult(u=r2.u, objective=r2.objective,
                       iterations=r1.iterations + r2.iterations,
                       aux=r2.aux, history=r1.history + r2.history)


def _log_metrics(logger, aux, step: int, ada_state=None):
    logvector(logger, aux["pde_losses"], "unweighted_loss/pde_losses", step)
    logvector(logger, aux["bc_losses"], "unweighted_loss/bc_losses", step)
    logvector(logger, aux["weighted_pde_losses"],
              "weighted_loss/weighted_pde_losses", step)
    logvector(logger, aux["weighted_bc_losses"],
              "weighted_loss/weighted_bc_losses", step)
    logscalar(logger, float(jnp.sum(aux["weighted_pde_losses"])),
              "weighted_loss/sum_weighted_pde_losses", step)
    logscalar(logger, float(jnp.sum(aux["weighted_bc_losses"])),
              "weighted_loss/sum_weighted_bc_losses", step)
    logscalar(logger, float(aux["full_weighted_loss"]),
              "weighted_loss/full_weighted_loss", step)
    if "additional_loss" in aux:
        logscalar(logger, float(aux["additional_loss"]),
                  "weighted_loss/weighted_additional_loss", step)
    if ada_state is not None:
        logvector(logger, ada_state["pde_weights"],
                  "adaptive_loss/pde_loss_weights", step)
        logvector(logger, ada_state["bc_weights"],
                  "adaptive_loss/bc_loss_weights", step)
