"""Matrix-free damped Gauss-Newton (Levenberg-Marquardt) for PINN losses.

PINN objectives are nonlinear least squares: ``loss(θ) = Σ_i w_i·mean r_i²``
over residual blocks.  First-order optimizers (Adam) stall orders of
magnitude above the attainable floor on these objectives; Gauss-Newton
curvature reaches it in tens of steps (cf. energy-natural-gradient /
GN-PINN literature, e.g. Müller & Zeinhofer 2023).  The reference offers
only first-order + (L-)BFGS training (Optimization.jl, reference:
src/discretize.jl:774-778) — this module is beyond-reference capability.

TPU-native formulation: the normal-equation solve is matrix-free CG where
each iteration is ONE jvp + ONE vjp through the residual vector — both fuse
into the same XLA program as the residual itself; no Jacobian is ever
materialized.  The whole damped step (residual, gradient, CG, trial-point
evaluation) jits as a single program with the damping λ as a traced scalar,
and the outer loop adapts λ Levenberg-Marquardt style on the host.

Deterministic training sets are required (the objective must be fixed
across CG iterations): `GridTraining`, static-grid `SeparableTraining`,
or `QuadratureTraining` (fixed rule).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from .strategies import GridTraining, QuadratureTraining, generate_training_sets
from .train import SolveResult


def build_residual_vector(pinnrep) -> Callable:
    """One flat residual function ``r(theta) -> (M,)`` with
    ``||r(θ)||² == full_loss(θ)`` (at the adaptive state's initial weights):
    each equation/BC residual block is scaled by ``sqrt(w_i / N_i)``."""
    from .compile.separable import SeparableTraining, build_separable_residual
    from .compile.lower import LoweringContext
    from .nn.separable import SeparableNet

    strategy = pinnrep.strategy
    lf = pinnrep.loss_functions
    n_pde = len(lf.datafree_pde_loss_functions)
    n_bc = len(lf.datafree_bc_loss_functions)
    ada0 = pinnrep.adaloss.init_state(n_pde, n_bc, pinnrep.dtype)
    w_pde = np.asarray(ada0["pde_weights"], dtype=np.float64)
    w_bc = np.asarray(ada0["bc_weights"], dtype=np.float64)

    if isinstance(strategy, GridTraining):
        pde_sets = generate_training_sets(
            pinnrep.domains, strategy.dx, pinnrep.pde_args, pinnrep.dtype)
        bc_sets = generate_training_sets(
            pinnrep.domains, strategy.dx, pinnrep.bc_args, pinnrep.dtype)

        def block(f, s, w):
            s = jnp.asarray(s)

            def r(theta):
                out = jnp.ravel(f(s, theta))
                return out * jnp.sqrt(jnp.asarray(w / out.size, out.dtype))

            return r

        blocks = (
            [block(f, s, w) for f, s, w in
             zip(lf.datafree_pde_loss_functions, pde_sets, w_pde)]
            + [block(f, s, w) for f, s, w in
               zip(lf.datafree_bc_loss_functions, bc_sets, w_bc)])

    elif isinstance(strategy, SeparableTraining):
        if strategy.dx is None:
            raise ValueError("Gauss-Newton needs a deterministic objective: "
                             "use SeparableTraining(dx=...), not resample=True")
        if strategy.causal is not None:
            raise ValueError(
                "Gauss-Newton on SeparableTraining(causal=...) would optimize "
                "the UNWEIGHTED least-squares objective, not the causally "
                "weighted one that training uses — build the problem with "
                "causal=None for GN")
        if getattr(pinnrep, "gradient_enhanced", None):
            raise ValueError(
                "Gauss-Newton with SeparableTraining does not lower the gPINN "
                "residual-gradient rows; build with gradient_enhanced=None "
                "(GridTraining supports gPINN rows in GN)")
        from .strategies import julia_range
        from .symbolic.system import infimum, supremum

        phis = pinnrep.phi if pinnrep.multioutput else [pinnrep.phi]
        nets = {name: phi.module
                for name, phi in zip(pinnrep.depvars, phis)}
        for name, net in nets.items():
            if not isinstance(net, SeparableNet):
                raise TypeError(f"chain for {name!r} is not a SeparableNet")
        ctx = LoweringContext(
            depvars=pinnrep.depvars, indvars=pinnrep.indvars,
            dict_depvar_input=pinnrep.dict_depvar_input,
            phis=[p.apply for p in phis], multioutput=pinnrep.multioutput,
            derivative=pinnrep.derivative, eq_params=pinnrep.eq_params,
            param_estim=pinnrep.param_estim)
        dxs = (list(strategy.dx) if isinstance(strategy.dx, (list, tuple))
               else [strategy.dx] * len(pinnrep.domains))
        nodes_of = {d.variables.name: julia_range(
            float(infimum(d.domain)), float(supremum(d.domain)), h)
            for d, h in zip(pinnrep.domains, dxs)}

        def sep_block(eq, w):
            residual, axes = build_separable_residual(
                eq, ctx, nets, pinnrep.dtype, pinnrep.default_p)
            nodes = [jnp.asarray(nodes_of[a.name], pinnrep.dtype)
                     for a in axes]

            def r(theta):
                out = jnp.ravel(residual(nodes, theta))
                return out * jnp.sqrt(jnp.asarray(w / out.size, out.dtype))

            return r

        blocks = ([sep_block(eq, w) for eq, w in zip(pinnrep.eqs, w_pde)]
                  + [sep_block(bc, w) for bc, w in zip(pinnrep.bcs, w_bc)])

    elif isinstance(strategy, QuadratureTraining):
        # fixed composite rule (deterministic): fold the per-point quadrature
        # weights into the residual scaling so ||r||² == Σ w_i·Σ_j q_j·r_j²
        from .ops.quadrature import tensor_rule_box
        from .symbolic.expr import Sym
        from .symbolic.system import infimum, supremum

        lo = {d.variables.name: infimum(d.domain) for d in pinnrep.domains}
        hi = {d.variables.name: supremum(d.domain) for d in pinnrep.domains}
        theta0 = getattr(pinnrep, "flat_init_params", None)

        def quad_block(f, args, w):
            syms = [a for a in args if isinstance(a, Sym)]
            if not syms:
                cord = jnp.zeros((len(args), 10), pinnrep.dtype)

                def r(theta):
                    out = jnp.ravel(f(cord, theta))
                    return out * jnp.sqrt(
                        jnp.asarray(w / out.size, out.dtype))

                return r
            lb = [lo[s.name] for s in syms]
            ub = [hi[s.name] for s in syms]
            area = float(np.prod(np.asarray(ub, dtype=np.float64)
                                 - np.asarray(lb, dtype=np.float64)))

            def rule(p):
                nodes, weights = tensor_rule_box(lb, ub, strategy.order, p)
                return (jnp.asarray(nodes, pinnrep.dtype),
                        jnp.asarray(weights / area, pinnrep.dtype))

            # replay the strategy's build-time auto-refinement so the panel
            # count (and hence ||r||²) matches the trained objective exactly
            integral_at = None
            if theta0 is not None and strategy.panels is None:
                def integral_at(p):
                    n, wq = rule(p)
                    return jnp.sum(f(n, theta0) ** 2 * wq)

            nodes, q = rule(strategy.resolve_panels(integral_at, len(syms)))

            def r(theta):
                out = jnp.atleast_2d(f(nodes, theta))   # (rows, Q)
                # matches the strategy's sum(r²·q) reduction (no /rows)
                scale = jnp.sqrt(q[None, :] * jnp.asarray(w, out.dtype))
                return jnp.ravel(out * scale)

            return r

        blocks = (
            [quad_block(f, a, w) for f, a, w in
             zip(lf.datafree_pde_loss_functions, pinnrep.pde_args, w_pde)]
            + [quad_block(f, a, w) for f, a, w in
               zip(lf.datafree_bc_loss_functions, pinnrep.bc_args, w_bc)])

    else:
        raise TypeError(
            f"Gauss-Newton needs a deterministic strategy (GridTraining or "
            f"SeparableTraining(dx=...)); got {type(strategy).__name__}")

    def residuals(theta):
        return jnp.concatenate([b(theta) for b in blocks])

    return residuals


def lm_least_squares(r_fn: Callable, init_params, *, maxiters: int = 50,
                     damping: float = 1e-3, cg_iters: int = 100,
                     damping_factor: float = 3.0, min_damping: float = 1e-12,
                     max_damping: float = 1e8, abstol: float = 0.0,
                     precondition: bool = False, verbose: bool = False,
                     callback=None) -> SolveResult:
    """Levenberg-Marquardt on ``loss(θ) = ||r_fn(θ)||²`` for any residual
    pytree-function (bring your own residual — e.g. ODE physics + data
    stacks for inverse problems).

    Each outer iteration jits one fused program: residual + gradient, a
    ``cg_iters``-step matrix-free CG solve of ``(JᵀJ + λI)δ = Jᵀr``, and the
    trial objective at ``θ - δ``.  λ adapts on the host: accepted steps
    divide it by ``damping_factor``, rejected steps multiply (θ unchanged).
    Stops at ``maxiters`` outer iterations or ``loss < abstol``.
    """
    v0, unravel = ravel_pytree(init_params)
    if v0.dtype == jnp.float32:
        import warnings

        warnings.warn(
            "Gauss-Newton CG on the normal equations amplifies float32 "
            "rounding and typically stalls ~2e-3 (measured, PERF.md); enable "
            "jax_enable_x64 and build the problem with dtype=jnp.float64",
            stacklevel=2)

    def r_flat(v):
        return r_fn(unravel(v))

    def loss_of(v):
        r = r_flat(v)
        return jnp.sum(r * r)

    @jax.jit
    def trial(v, lam):
        r, vjp = jax.vjp(r_flat, v)
        g = vjp(r)[0]

        def matvec(p):
            Jp = jax.jvp(r_flat, (v,), (p,))[1]
            return vjp(Jp)[0] + lam * p

        M = None
        if precondition:
            # Jacobi preconditioner from a Hutchinson estimate of
            # diag(JᵀJ): E[(JᵀJ z) ⊙ z] over Rademacher z (8 probes,
            # fixed key — determinism keeps LM accept/reject stable)
            zs = jax.random.rademacher(
                jax.random.key(0), (8, v.shape[0]), v.dtype)
            diag = jnp.mean(jax.vmap(
                lambda z: (vjp(jax.jvp(r_flat, (v,), (z,))[1])[0]) * z)(zs),
                axis=0)
            inv = 1.0 / (jnp.abs(diag) + lam)
            M = lambda p: inv * p

        delta, _ = jax.scipy.sparse.linalg.cg(matvec, g, maxiter=cg_iters,
                                              M=M)
        v_new = v - delta
        return v_new, loss_of(v_new)

    jit_loss = jax.jit(loss_of)
    lam = float(damping)
    v = v0
    loss = float(jit_loss(v))
    history = [loss]
    it = 0
    while it < maxiters:
        v_new, loss_new = trial(v, jnp.asarray(lam, v.dtype))
        loss_new = float(loss_new)
        if np.isfinite(loss_new) and loss_new < loss:
            v, loss = v_new, loss_new
            lam = max(lam / damping_factor, min_damping)
            accepted = True
        else:
            lam = min(lam * damping_factor, max_damping)
            accepted = False
        it += 1
        history.append(loss)
        if verbose:
            print(f"[gn] iter={it} loss={loss:.3e} lam={lam:.1e} "
                  f"{'acc' if accepted else 'rej'}")
        if callback is not None:
            callback(it, loss, lam, accepted)
        if loss < abstol:
            break
        if lam >= max_damping:
            break   # stalled: no descent direction at any damping

    theta = unravel(v)
    return SolveResult(u=theta, objective=loss, iterations=it,
                       aux={"damping": lam}, history=history)


def solve_gauss_newton(prob, **kwargs) -> SolveResult:
    """Levenberg-Marquardt on a discretized `TrainingProblem`'s least-squares
    objective (see `lm_least_squares` for the knobs; deterministic strategies
    only — GridTraining or static-grid SeparableTraining)."""
    return lm_least_squares(build_residual_vector(prob.pinnrep),
                            prob.init_params, **kwargs)
