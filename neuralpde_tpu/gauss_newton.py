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
`QuadratureTraining` (fixed rule), or `WeakTraining` (hp-VPINN rows —
the weak projection is already a least-squares residual vector).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from .strategies import GridTraining, QuadratureTraining, generate_training_sets
from .train import SolveResult


def _prec_ctx(matmul_precision):
    """Trace-time matmul-precision context for a GN program (None inherits
    the ambient setting)."""
    import contextlib

    return (jax.default_matmul_precision(matmul_precision)
            if matmul_precision is not None else contextlib.nullcontext())


def _ls_driver(method: str):
    """Least-squares outer driver for ``method`` ("lm" | "tr")."""
    if method == "lm":
        return lm_least_squares
    if method == "tr":
        return trust_region_least_squares
    raise ValueError(f"method must be 'lm' or 'tr', got {method!r}")


def build_residual_vector(pinnrep, adaptive_state=None) -> Callable:
    """One flat residual function ``r(theta) -> (M,)`` with
    ``||r(θ)||² == full_loss(θ)`` at the given adaptive state's weights:
    each equation/BC residual block is scaled by ``sqrt(w_i / N_i)``.

    ``adaptive_state``: the weight state whose loss GN should optimize —
    pass a `solve` result's ``res.aux["adaptive_state"]`` to polish an
    adaptively-trained objective at its final weights.  With the default
    `NonAdaptiveLoss` the initial state is used; an adaptive scheme WITHOUT
    an explicit state is rejected (GN would silently optimize a different
    weighting than training did)."""
    from .adaptive import NonAdaptiveLoss
    from .compile.separable import SeparableTraining, build_separable_residual
    from .compile.lower import LoweringContext
    from .compile.weak import WeakTraining
    from .nn.separable import SeparableNet

    strategy = pinnrep.strategy
    lf = pinnrep.loss_functions
    n_pde = len(lf.datafree_pde_loss_functions)
    n_bc = len(lf.datafree_bc_loss_functions)
    if adaptive_state is None:
        if not isinstance(pinnrep.adaloss, NonAdaptiveLoss):
            raise ValueError(
                f"the problem was built with {type(pinnrep.adaloss).__name__} "
                "— Gauss-Newton at the INITIAL weights would optimize a "
                "different objective than training did; pass the trained "
                "state: solve_gauss_newton(prob, adaptive_state="
                "res.aux['adaptive_state'])")
        adaptive_state = pinnrep.adaloss.init_state(n_pde, n_bc, pinnrep.dtype)
    w_pde = np.asarray(adaptive_state["pde_weights"], dtype=np.float64)
    w_bc = np.asarray(adaptive_state["bc_weights"], dtype=np.float64)

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
        ctx = LoweringContext.from_pinnrep(pinnrep)
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
            # surface factorization failures now (not at first jvp trace)
            # so the auto-hybrid routing below can catch them
            jax.eval_shape(residual, nodes, pinnrep.flat_init_params)

            def r(theta):
                out = jnp.ravel(residual(nodes, theta))
                return out * jnp.sqrt(jnp.asarray(w / out.size, out.dtype))

            return r

        def dense_block(f, args, w):
            # auto-hybrid routing (mirrors SeparableTraining.build's dense
            # fallback): non-factorizable equations contribute dense
            # pointwise rows on the same tensor grid
            s = jnp.asarray(generate_training_sets(
                pinnrep.domains, strategy.dx, [args], pinnrep.dtype)[0])

            def r(theta):
                out = jnp.ravel(f(s, theta))
                return out * jnp.sqrt(jnp.asarray(w / out.size, out.dtype))

            return r

        from .compile.separable import _is_factorization_error

        def sep_or_dense(eq, f, args, w):
            try:
                return sep_block(eq, w)
            except (ValueError, NotImplementedError) as e:
                if not _is_factorization_error(e):
                    raise
                return dense_block(f, args, w)

        blocks = (
            [sep_or_dense(eq, f, a, w) for eq, f, a, w in
             zip(pinnrep.eqs, lf.datafree_pde_loss_functions,
                 pinnrep.pde_args, w_pde)]
            + [sep_or_dense(bc, f, a, w) for bc, f, a, w in
               zip(pinnrep.bcs, lf.datafree_bc_loss_functions,
                   pinnrep.bc_args, w_bc)])

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

    elif isinstance(strategy, WeakTraining):
        # hp-VPINN: the weak projection F_{j,k}(θ) is itself a deterministic
        # residual vector (loss == Σ w_row·F²), so GN optimizes the exact
        # weak objective; essential BCs contribute their pointwise rows.
        ctx = LoweringContext.from_pinnrep(pinnrep)
        spans = WeakTraining._spans(pinnrep)

        def weak_block(eq, args, f, w):
            rows, wvec = strategy._equation_rows(
                eq, args, ctx, pinnrep, spans, f, pinnrep.dtype, remat=False)
            scale = np.sqrt(np.asarray(wvec, np.float64) * w)

            def r(theta):
                out = rows(theta)
                return out * jnp.asarray(scale, out.dtype)

            return r

        def bc_block(f, s, w):
            s = jnp.asarray(s)

            def r(theta):
                out = jnp.ravel(f(s, theta))
                return out * jnp.sqrt(jnp.asarray(w / out.size, out.dtype))

            return r

        bc_sets = strategy._bc_training_sets(pinnrep, spans)
        blocks = (
            [weak_block(eq, a, f, w) for eq, a, f, w in
             zip(pinnrep.eqs, pinnrep.pde_args,
                 lf.datafree_pde_loss_functions, w_pde)]
            + [bc_block(f, s, w) for f, s, w in
               zip(lf.datafree_bc_loss_functions, bc_sets, w_bc)])

    else:
        raise TypeError(
            f"Gauss-Newton needs a deterministic strategy (GridTraining, "
            f"SeparableTraining(dx=...), QuadratureTraining or WeakTraining); "
            f"got {type(strategy).__name__}")

    def residuals(theta):
        return jnp.concatenate([b(theta) for b in blocks])

    return residuals


def _damped_lsqr(matvec, rmatvec, b, damp, iters: int, hi=None):
    """LSQR (Paige & Saunders 1982, Golub-Kahan bidiagonalization) for
    ``min ||J x - b||² + damp²·||x||²`` — mathematically the LM normal
    equations ``(JᵀJ + damp² I) x = Jᵀ b``, but WITHOUT ever forming JᵀJ
    products in the recurrence, so the effective condition number is κ(J)
    instead of κ(J)² — the fix for the measured f32 CG stall (PERF.md).

    ``matvec``/``rmatvec`` evaluate J·v / Jᵀ·u in the residual dtype (f32 —
    the network math stays on the MXU); with ``hi`` (e.g. jnp.float64) the
    bidiagonalization vectors, Givens rotations, and solution accumulate in
    the wider dtype (cheap: O(M+n) elementwise per iteration)."""
    cast = (lambda z: z.astype(hi)) if hi is not None else (lambda z: z)
    lo_dtype = b.dtype
    lo = (lambda z: z.astype(lo_dtype)) if hi is not None else (lambda z: z)

    def Av(v):
        return cast(matvec(lo(v)))

    def Atu(u):
        return cast(rmatvec(lo(u)))

    def _normalize(z):
        nrm = jnp.linalg.norm(z)
        return z / jnp.where(nrm > 0, nrm, 1.0), nrm

    b_hi = cast(b)
    u, beta = _normalize(b_hi)
    v, alpha = _normalize(Atu(u))
    damp_hi = jnp.asarray(damp, u.dtype)
    x = jnp.zeros_like(v)
    state0 = (x, v, u, v, alpha, beta, alpha)   # (x, w, u, v, α, φ̄, ρ̄)

    def body(_, state):
        x, w, u, v, alpha, phibar, rhobar = state
        u, beta = _normalize(Av(v) - alpha * u)
        v, alpha = _normalize(Atu(u) - beta * v)
        # rotation eliminating the damping row
        rhobar1 = jnp.sqrt(rhobar * rhobar + damp_hi * damp_hi)
        phibar = (rhobar / rhobar1) * phibar
        # Givens rotation eliminating the subdiagonal β
        rho = jnp.sqrt(rhobar1 * rhobar1 + beta * beta)
        cs, sn = rhobar1 / rho, beta / rho
        theta = sn * alpha
        rhobar = -cs * alpha
        phi = cs * phibar
        phibar = sn * phibar
        x = x + (phi / rho) * w
        w = v - (theta / rho) * w
        return (x, w, u, v, alpha, phibar, rhobar)

    x = jax.lax.fori_loop(0, iters, body, state0)[0]
    return lo(x)


def lm_least_squares(r_fn: Callable, init_params, *, maxiters: int = 50,
                     damping: float = 1e-3, cg_iters: int = 100,
                     damping_factor: float = 3.0, min_damping: float = 1e-12,
                     max_damping: float = 1e8, abstol: float = 0.0,
                     precondition: bool = False, solver: str = "cg",
                     scalar_dtype=None,
                     matmul_precision: str | None = "highest",
                     verbose: bool = False,
                     callback=None) -> SolveResult:
    """Levenberg-Marquardt on ``loss(θ) = ||r_fn(θ)||²`` for any residual
    pytree-function (bring your own residual — e.g. ODE physics + data
    stacks for inverse problems).

    Each outer iteration jits one fused program: residual + gradient, a
    ``cg_iters``-step matrix-free inner solve of ``(JᵀJ + λI)δ = Jᵀr``, and
    the trial objective at ``θ - δ``.  λ adapts on the host: accepted steps
    divide it by ``damping_factor``, rejected steps multiply (θ unchanged).
    Stops at ``maxiters`` outer iterations or ``loss < abstol``.

    * ``solver``: "cg" (CG on the normal equations; each iteration one jvp +
      one vjp) or "lsqr" (damped LSQR on J itself — same cost per iteration,
      conditioning κ(J) instead of κ(J)²).
    * ``scalar_dtype``: with solver="lsqr", run the recurrence/rotations in
      this wider dtype (e.g. ``jnp.float64``) while the J products stay in
      the residual dtype — mixed-precision GN: MXU-speed f32 network math
      with f64-stable inner iterations.  Requires ``jax.config.x64`` for
      float64 (the *problem* can stay f32).
    * ``matmul_precision``: trace-time `jax.default_matmul_precision` for
      every GN program (default "highest" = true-f32 MXU passes).  THE TPU
      accuracy fix: the round-2 "f32 stall at 2.3e-3" was the MXU's default
      bf16-pass matmuls, not CG conditioning — with "highest" the f32 solve
      matches CPU-f32 quality at MXU speed (measured, PERF.md).  The nets
      GN targets are tiny, so the ~3x matmul cost is irrelevant.  None
      inherits the ambient precision.
    """
    v0, unravel = ravel_pytree(init_params)
    if v0.dtype == jnp.float32 and matmul_precision is None:
        import warnings

        warnings.warn(
            "float32 Gauss-Newton with matmul_precision=None stalls ~2e-3 "
            "on TPU (default MXU matmuls run bf16 passes; measured, "
            "PERF.md) — leave matmul_precision='highest' or enable "
            "jax_enable_x64 end-to-end",
            stacklevel=2)
    if solver not in ("cg", "lsqr"):
        raise ValueError(f"solver must be 'cg' or 'lsqr', got {solver!r}")
    if scalar_dtype is not None and solver != "lsqr":
        raise ValueError("scalar_dtype (mixed-precision recurrence) requires "
                         "solver='lsqr'")
    if (scalar_dtype is not None
            and jax.dtypes.canonicalize_dtype(scalar_dtype)
            != jnp.dtype(scalar_dtype)):
        # without jax_enable_x64 the astype calls in _damped_lsqr are no-ops
        # and the advertised mixed-precision recurrence silently doesn't run
        raise ValueError(
            f"scalar_dtype={jnp.dtype(scalar_dtype).name} is unavailable: "
            "this dtype degrades under the current JAX config — enable it "
            "with jax.config.update('jax_enable_x64', True) (the problem "
            "itself can stay float32), or drop scalar_dtype")
    if precondition and solver == "lsqr":
        raise ValueError("precondition=True is a CG-only option (LSQR is "
                         "already better conditioned; use solver='cg' with "
                         "precondition, or drop one of them)")

    def _prec():
        return _prec_ctx(matmul_precision)

    def r_flat(v):
        return r_fn(unravel(v))

    def loss_of(v):
        r = r_flat(v)
        return jnp.sum(r * r)

    @jax.jit
    def trial(v, lam):
        with _prec():
            return _trial_body(v, lam)

    def _trial_body(v, lam):
        r, vjp = jax.vjp(r_flat, v)

        if solver == "lsqr":
            delta = _damped_lsqr(
                lambda p: jax.jvp(r_flat, (v,), (p,))[1],
                lambda y: vjp(y)[0], r, jnp.sqrt(lam), cg_iters,
                hi=scalar_dtype)
            return v - delta, loss_of(v - delta)

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

    @jax.jit
    def jit_loss(v):
        with _prec():
            return loss_of(v)
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


def trust_region_least_squares(r_fn: Callable, init_params, *,
                               maxiters: int = 50, cg_iters: int = 100,
                               delta0: float = 1.0, max_delta: float = 1e4,
                               eta: float = 0.125, abstol: float = 0.0,
                               matmul_precision: str | None = "highest",
                               verbose: bool = False,
                               callback=None) -> SolveResult:
    """Steihaug-Toint trust-region Gauss-Newton on ``loss = ||r_fn(θ)||²``
    (Conn, Gould & Toint 2000, Alg. 7.5.1; the LM alternative — the model
    ``m(p) = gᵀp + ½pᵀJᵀJp`` is minimized over ``||p|| <= Δ`` by truncated
    CG that stops at the boundary or on negative curvature, so no damping
    schedule is needed).  Each outer iteration is ONE jitted program; the
    radius Δ adapts on the host from the actual/predicted reduction ratio.
    ``matmul_precision``: see `lm_least_squares` (the TPU f32 accuracy
    fix; default "highest")."""
    if not eta < 0.25:
        # the radius only shrinks when rho < 0.25; with eta >= 0.25 a
        # rejected step with rho in [0.25, eta] would leave delta unchanged
        # and the deterministic trial would repeat identically forever
        raise ValueError(f"eta must be < 0.25 (got {eta}): the trust-region "
                         "radius shrinks only when rho < 0.25")
    v0, unravel = ravel_pytree(init_params)

    def _prec():
        return _prec_ctx(matmul_precision)

    def r_flat(v):
        return r_fn(unravel(v))

    def loss_of(v):
        r = r_flat(v)
        return jnp.sum(r * r)

    @jax.jit
    def tr_step(v, delta):
        with _prec():
            return _tr_step_body(v, delta)

    def _tr_step_body(v, delta):
        r, vjp = jax.vjp(r_flat, v)
        g = vjp(r)[0]                    # ∇(½||r||²) = Jᵀr

        def B(p):
            return vjp(jax.jvp(r_flat, (v,), (p,))[1])[0]

        eps = jnp.asarray(jnp.finfo(v.dtype).tiny, v.dtype)
        g2 = jnp.vdot(g, g)

        def boundary(p, d):
            # τ >= 0 with ||p + τ d|| = Δ
            pd, dd, pp = jnp.vdot(p, d), jnp.vdot(d, d), jnp.vdot(p, p)
            disc = jnp.sqrt(jnp.maximum(pd * pd - dd * (pp - delta * delta),
                                        0.0))
            return (-pd + disc) / jnp.maximum(dd, eps)

        def cond(st):
            i, p, rr, d, m, done, hit = st
            return (i < cg_iters) & (~done)

        def body(st):
            i, p, rr, d, m, done, hit = st
            Bd = B(d)
            dBd = jnp.vdot(d, Bd)
            rr2 = jnp.vdot(rr, rr)
            rd = jnp.vdot(rr, d)
            alpha = rr2 / jnp.where(dBd > 0, dBd, 1.0)
            p_try = p + alpha * d
            to_boundary = (dBd <= 0) | (jnp.vdot(p_try, p_try)
                                        >= delta * delta)
            step = jnp.where(to_boundary, boundary(p, d), alpha)
            p_new = p + step * d
            # model value m(p) = gᵀp + ½pᵀBp accumulated along the CG path
            # (rr is the model gradient at p), so the predicted reduction
            # needs NO extra B(p) product after the loop — one fewer
            # jvp+vjp pair per outer iteration (r4, VERDICT item 7)
            m_new = m + step * rd + 0.5 * step * step * dBd
            rr_new = rr + alpha * Bd
            rr2_new = jnp.vdot(rr_new, rr_new)
            # early-exit tolerance scaled by the iterate dtype: the fixed
            # 1e-14·g2 is f64-calibrated — an f32 squared-residual rarely
            # reaches it, so truncated CG would always run all cg_iters
            small = rr2_new < jnp.maximum(
                (50.0 * jnp.finfo(v.dtype).eps) ** 2, 1e-14) * g2
            d_new = -rr_new + (rr2_new / jnp.maximum(rr2, eps)) * d
            return (i + 1,
                    p_new,
                    jnp.where(to_boundary, rr, rr_new),
                    jnp.where(to_boundary, d, d_new),
                    m_new,
                    done | to_boundary | small,
                    hit | to_boundary)

        p0 = jnp.zeros_like(g)
        st = (jnp.asarray(0), p0, g, -g, jnp.zeros((), v.dtype),
              jnp.asarray(False), jnp.asarray(False))
        n_inner, p, _, _, m, _, hit = jax.lax.while_loop(cond, body, st)
        # predicted reduction of the ½||r||² model (positive for descent)
        pred = -m
        v_new = v + p
        return (v_new, loss_of(v_new), pred, jnp.linalg.norm(p), hit,
                n_inner)

    @jax.jit
    def jit_loss(v):
        with _prec():
            return loss_of(v)
    v = v0
    loss = float(jit_loss(v))
    delta = float(delta0)
    history = [loss]
    it = 0
    inner_total = 0
    while it < maxiters:
        v_new, loss_new, pred, pnorm, hit, n_inner = tr_step(
            v, jnp.asarray(delta, v.dtype))
        inner_total += int(n_inner)
        loss_new = float(loss_new)
        if not (np.isfinite(loss_new) and np.isfinite(float(pred))
                and np.isfinite(float(pnorm))):
            # NaN/Inf trial (radius overshot into a non-finite region):
            # reject AND shrink, or the deterministic step would repeat
            # identically for every remaining iteration
            rho, accepted = -1.0, False
            delta = max(0.25 * delta, 1e-12)
        else:
            ared = 0.5 * (loss - loss_new)  # actual reduction in ½ metric
            rho = ared / max(float(pred), 1e-300)
            accepted = rho > eta and loss_new < loss
            if accepted:
                v, loss = v_new, loss_new
            if rho < 0.25:
                delta = max(0.25 * float(pnorm), 1e-12)
            elif rho > 0.75 and bool(hit):
                delta = min(2.0 * delta, max_delta)
        it += 1
        history.append(loss)
        if verbose:
            print(f"[gn-tr] iter={it} loss={loss:.3e} delta={delta:.1e} "
                  f"rho={rho:.2f} {'acc' if accepted else 'rej'}")
        if callback is not None:
            callback(it, loss, delta, accepted)
        if loss < abstol:
            break
        if delta <= 1e-12:
            break   # radius collapsed: no trustable descent direction

    return SolveResult(u=unravel(v), objective=loss, iterations=it,
                       aux={"delta": delta, "inner_iterations": inner_total},
                       history=history)


def solve_gauss_newton(prob, *, method: str = "lm", adaptive_state=None,
                       **kwargs) -> SolveResult:
    """Gauss-Newton on a discretized `TrainingProblem`'s least-squares
    objective (deterministic strategies only — GridTraining, static-grid
    SeparableTraining, or QuadratureTraining).

    ``method``: "lm" (Levenberg-Marquardt damping, `lm_least_squares`) or
    "tr" (Steihaug trust region, `trust_region_least_squares`).
    ``adaptive_state``: required when the problem uses an adaptive loss —
    pass ``res.aux["adaptive_state"]`` from the training `solve` so GN
    polishes the SAME weighted objective (see `build_residual_vector`)."""
    return _ls_driver(method)(
        build_residual_vector(prob.pinnrep, adaptive_state),
        prob.init_params, **kwargs)


# ---------------------------------------------------------------------------
# Gauss-Newton drivers for the solver surfaces (NNODE / PINOODE)
# ---------------------------------------------------------------------------

def build_ode_residual_vector(prob, alg, *, dt=None):
    """Flat residual ``r(theta) -> (M,)`` for an `ODEProblem` + `NNODE`
    config with ``||r(θ)||² == total NNODE loss``: physics rows at the
    strategy's deterministic time points scaled 1/√N (matching
    `inner_loss`'s sum/N reduction, solvers/ode.py), plus data-L2 rows
    (scale 1) and Data-Quadrature rows (scale √w) for inverse problems
    (reference losses: src/ode_solve.jl:184-342).

    Deterministic strategies only: GridTraining or
    WeightedIntervalTraining (its one-shot sample is drawn at build time,
    like the reference's per-solve draw).  Returns ``(r_fn, theta0, phi)``.
    """
    from .config import default_float
    from .solvers.ode import ODEPhi, _batched_f, ode_dfdx
    from .strategies import (
        GridTraining as _GT, WeightedIntervalTraining as _WIT, julia_range,
    )

    dtype = default_float()
    t0 = float(prob.tspan[0])
    u0 = prob.u0
    if jnp.iscomplexobj(jnp.asarray(u0)):
        raise ValueError("Gauss-Newton residual vectors require real u "
                         "(complex ODEs: use solve_ode with Adam/L-BFGS)")
    if alg.additional_loss is not None:
        raise ValueError(
            "Gauss-Newton cannot fold NNODE(additional_loss=...) into the "
            "least-squares residual vector (||r||^2 would silently differ "
            "from the trained objective) — stack your extra terms as "
            "residual rows via lm_least_squares instead")
    scalar_u0 = jnp.ndim(u0) == 0
    n_output = 1 if scalar_u0 else int(np.prod(np.shape(u0)))
    dataset = alg.dataset or []

    phi = ODEPhi(alg.chain, t0, u0)
    chain_params = (alg.chain.init(jax.random.key(alg.seed))
                    if alg.init_params is None else alg.init_params)
    theta0 = {"depvar": chain_params}
    if alg.param_estim:
        theta0["p"] = jnp.asarray(prob.p, dtype=dtype)

    strategy = alg.strategy
    if strategy is None and dt is not None:
        strategy = _GT(dt)
    if isinstance(strategy, _GT):
        ts = jnp.asarray(julia_range(t0, float(prob.tspan[1]), strategy.dx),
                         dtype=dtype)
    elif isinstance(strategy, _WIT):
        ts = jnp.asarray(strategy.sample_times(t0, float(prob.tspan[1])),
                         dtype=dtype)
    else:
        raise TypeError(
            "Gauss-Newton needs a deterministic NNODE objective: use "
            "GridTraining(dx)/dt= or WeightedIntervalTraining; got "
            f"{type(strategy).__name__}")

    def physics_rows(theta):
        p_ = theta["p"] if alg.param_estim else prob.p
        out = phi(ts, theta)
        u_in = out[0] if scalar_u0 else out
        fs = _batched_f(prob.f)(jnp.atleast_2d(u_in), p_, ts)
        dxdt = ode_dfdx(phi, ts, theta, alg.autodiff)
        return jnp.ravel(fs - dxdt) / jnp.sqrt(
            jnp.asarray(float(ts.shape[0]), dtype))

    blocks = [physics_rows]
    if alg.param_estim and dataset:
        t_d = jnp.asarray(dataset[-2], dtype=dtype)
        us = jnp.stack([jnp.asarray(dataset[i], dtype=dtype)
                        for i in range(n_output)])

        def data_rows(theta):
            return jnp.ravel(phi(t_d, theta) - us)   # sum-of-squares: scale 1

        blocks.append(data_rows)
        if alg.estim_collocate:
            w = jnp.sqrt(jnp.asarray(dataset[-1], dtype=dtype))

            def collocate_rows(theta):
                dxdt = ode_dfdx(phi, t_d, theta, alg.autodiff)
                u_in = us[0] if scalar_u0 else us
                fs = _batched_f(prob.f)(jnp.atleast_2d(u_in), theta["p"], t_d)
                return jnp.ravel((dxdt - fs) * w[None, :])

            blocks.append(collocate_rows)

    def r_fn(theta):
        return jnp.concatenate([b(theta) for b in blocks])

    return r_fn, theta0, phi


def solve_ode_gauss_newton(prob, alg, *, dt=None, saveat=None,
                           save_everystep: bool = True, method: str = "lm",
                           **kwargs):
    """`solve_ode` with Gauss-Newton instead of a first-order optimizer:
    the NNODE objective (physics + inverse-problem losses) is minimized as
    the nonlinear least-squares problem it is.  ``method``: "lm" or "tr";
    remaining kwargs go to the corresponding least-squares driver.  Returns
    the same dense `ODESolution` as `solve_ode`."""
    from .config import default_float
    from .solvers.ode import build_ode_solution

    r_fn, theta0, phi = build_ode_residual_vector(prob, alg, dt=dt)
    res = _ls_driver(method)(r_fn, theta0, **kwargs)
    return build_ode_solution(prob, phi, res, dt=dt, saveat=saveat,
                              save_everystep=save_everystep,
                              dtype=default_float())


def build_pino_residual_vector(prob, alg, *, dt=None):
    """Flat residual for an `ODEProblem` + `PINOODE` operator config with
    ``||r(θ)||² == PINO loss`` (physics-mean + IC-mean, solvers/pino.py
    `_losses`) on the deterministic GridTraining (p, t) product train set.
    Returns ``(r_fn, theta0, phi)``."""
    from .config import default_float
    from .solvers.pino import PINOPhi, _grid_trainset, _residuals
    from .strategies import GridTraining as _GT

    dtype = default_float()
    if alg.bounds is None:
        raise ValueError("PINOODE requires parameter bounds")
    if alg.additional_loss is not None:
        raise ValueError(
            "Gauss-Newton cannot fold PINOODE(additional_loss=...) into the "
            "least-squares residual vector — stack your extra terms as "
            "residual rows via lm_least_squares instead")
    strategy = alg.strategy
    if strategy is None and dt is not None:
        strategy = _GT(dt)
    if not isinstance(strategy, _GT):
        raise TypeError(
            "Gauss-Newton needs a deterministic PINO train set: use "
            "PINOODE(strategy=GridTraining(dx)) or pass dt=")
    bounds = [tuple(map(float, b)) for b in alg.bounds]
    tspan = (float(prob.tspan[0]), float(prob.tspan[1]))
    phi = PINOPhi(alg.chain)
    chain_params = (alg.chain.init(jax.random.key(alg.seed))
                    if alg.init_params is None else alg.init_params)
    theta0 = {"depvar": chain_params}
    p_tr, t_tr = _grid_trainset(bounds, alg.number_of_parameters, tspan,
                                strategy.dx or dt, dtype)

    def r_fn(theta):
        r_phys, r_ic = _residuals(phi, prob, p_tr, t_tr, theta)
        return jnp.concatenate([
            jnp.ravel(r_phys) / jnp.sqrt(jnp.asarray(float(r_phys.size),
                                                     dtype)),
            jnp.ravel(r_ic) / jnp.sqrt(jnp.asarray(float(r_ic.size), dtype)),
        ])

    return r_fn, theta0, phi


def solve_pino_gauss_newton(prob, alg, *, dt=None, method: str = "lm",
                            **kwargs):
    """`solve_pino_ode` with Gauss-Newton: minimizes the operator-learning
    least squares (physics + IC over the (p, t) grid).  Returns the same
    `PINOODESolution` (sol(p, t) dispatches to the trained operator)."""
    from .config import default_float
    from .solvers.pino import PINOODESolution, _grid_trainset, make_pino_interp
    from .strategies import GridTraining as _GT

    r_fn, theta0, phi = build_pino_residual_vector(prob, alg, dt=dt)
    res = _ls_driver(method)(r_fn, theta0, **kwargs)

    dtype = default_float()
    bounds = [tuple(map(float, b)) for b in alg.bounds]
    tspan = (float(prob.tspan[0]), float(prob.tspan[1]))
    strategy = alg.strategy if isinstance(alg.strategy, _GT) else _GT(dt)
    p_fin, t_fin = _grid_trainset(bounds, alg.number_of_parameters, tspan,
                                  strategy.dx or dt, dtype)
    n_out = 1 if jnp.ndim(prob.u0) == 0 else int(np.prod(np.shape(prob.u0)))
    interp = make_pino_interp(phi, res.u, n_out)
    u = interp(p_fin, t_fin)
    return PINOODESolution(u=u, t=t_fin, p=p_fin, interp=interp, original=res)


def build_pino_pde_residual_vector(pde_system, alg):
    """Flat residual for a `PDESystem` + `PINOPDE` operator config with
    ``||r(θ)||² == PINOPDE loss`` (per-equation mean-square residual
    fields, solvers/pino_pde.py `_family_loss`) on the fixed build-time
    family.  Returns ``(r_fn, theta0, built)`` with `built` the shared
    lowering namespace (solvers/pino_pde.py `_build`)."""
    from .solvers.pino_pde import _build

    if alg.additional_loss is not None:
        raise ValueError(
            "Gauss-Newton cannot fold PINOPDE(additional_loss=...) into the "
            "least-squares residual vector — stack your extra terms as "
            "residual rows via lm_least_squares instead")
    if alg.resample:
        raise ValueError(
            "Gauss-Newton needs a deterministic objective: use "
            "PINOPDE(resample=False) (polish the fixed build-time family)")
    if alg.causal_eps is not None:
        raise ValueError(
            "Gauss-Newton cannot express causal weighting as a fixed "
            "least-squares residual (weights depend on the residuals); "
            "polish with PINOPDE(causal_eps=None)")
    b = _build(pde_system, alg)
    dtype = b.dtype

    def r_fn(theta):
        with b.prec:
            fields = b.eval_fields(theta["depvar"], b.p_tr, b.grids,
                                   b.input_samples)
            rows = [r(fields, b.p_tr) for r in b.residuals]
        return jnp.concatenate([
            jnp.ravel(r) / jnp.sqrt(jnp.asarray(float(r.size), dtype))
            for r in rows])

    return r_fn, {"depvar": b.chain_params}, b


def solve_pino_pde_gauss_newton(pde_system, alg, *, method: str = "lm",
                                **kwargs):
    """`solve_pino_pde` with Gauss-Newton: minimizes the operator-learning
    least squares over the field-grid residuals.  Returns the same
    `PINOPDESolution`.  Typical use: Adam pre-train via `solve_pino_pde`,
    then polish with ``alg.init_params = sol.original.u["depvar"]``."""
    from .solvers.pino_pde import _make_solution

    r_fn, theta0, b = build_pino_pde_residual_vector(pde_system, alg)
    res = _ls_driver(method)(r_fn, theta0, **kwargs)
    return _make_solution(b, res.u["depvar"], res)
