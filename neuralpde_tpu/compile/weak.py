"""hp-VPINN weak-form training (beyond reference).

`WeakTraining` trains against *variational* residuals: each PDE residual
R(u) is projected onto tensor-product polynomial test functions localized
on a cartesian mesh of elements (hp-VPINN; Kharazmi, Zhang & Karniadakis
2021, CMAME 374:113547),

    F_{j,k} = (1/c_{j,k}) ∫_{E_j} R(u) · v_k dx ,   loss = mean F²,

with per-row normalization c_{j,k} = ‖v_k‖_{L2(E_j)}·√|E_j| so that (by
Cauchy-Schwarz) every row is bounded by the element RMS residual and the
loss lives on the same scale as the strong-form mean square regardless of
mesh/test-order choices.

Why weak form on TPU: the projection is ONE batched residual evaluation on
a static tensor-product Gauss-Legendre grid followed by per-axis einsum
contractions with precomputed (quad × test) matrices — pure MXU work, no
extra network evaluations.  With `ibp ≥ 1`, derivatives are moved off the
network onto the (analytic, polynomial) test functions by integration by
parts, so e.g. a Poisson operator needs only FIRST network derivatives —
one fewer nested jvp per term, a cheaper and better-conditioned program
than strong-form collocation of Δu.

Integration by parts is applied per additive term of the residual, per
axis: a term  c·∂ⁿx(target)  (c constant over the domain: numbers, Params,
or expressions of them) becomes  (−1)^m·c·∂^{n−m}x(target)  contracted
against the m-th derivative of the test functions.  Terms that are not
pure derivatives with constant coefficients (e.g. the nonlinear u·u_x, or
a(x)·u_xx) are kept at m = 0 — partial integration by parts, the paper's
VPINN-2 regime.  The test basis matches the requested `ibp`:

  * ibp = 0 — Legendre P_0..P_{K−1} (includes constants: row (j, 0) is the
    element-mean residual, so ibp=0 is a moment-filtered strong form);
  * ibp = 1 — v_k = P_{k+1} − P_{k−1}, k = 1..K (vanish at element edges,
    killing every first boundary term — including internal element
    interfaces, so NO flux coupling between elements is needed);
  * ibp = 2 — v_k = (1−ξ²)²·P_{k−1}, k = 1..K (v and v' vanish, killing
    both boundary terms of a double integration by parts).

Equations the projection cannot represent (integro-differential terms,
equations with no free variables) fall back to a quadrature-weighted
pointwise loss on the same nodes — routing, not rejection, as on the
separable path.  Boundary conditions stay pointwise penalties on a static
grid (essential BCs; natural BCs can instead be imposed variationally via
`DeepRitz`).

The reference has no weak-form machinery at all (its losses are strong-form
collocation only, reference: src/discretize.jl:564-649); this module is a
beyond-reference solver family built on the same symbolic pipeline.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..parallel.mesh import shard_batch
from ..strategies import (
    TrainingStrategy, generate_training_sets, _mean_sq_loss,
)
from ..symbolic.expr import (
    Call, DepVarCall, Deriv, Eq, Expr, IntegralExpr, Num, Param, Sym,
    expand_derivatives,
)
from ..symbolic.system import infimum, supremum
from .lower import LoweringContext, build_residual_function


# ---------------------------------------------------------------------------
# test bases (Legendre-coefficient representation, reference element [-1,1])
# ---------------------------------------------------------------------------

def _test_basis(n_test: int, vanish: int) -> list[np.ndarray]:
    """Legendre coefficient vectors of the K test functions; `vanish` is the
    number of derivatives (0, 1 or 2) required to vanish at ξ = ±1."""
    L = np.polynomial.legendre
    if vanish == 0:
        return [np.eye(n_test)[k] for k in range(n_test)]
    if vanish == 1:
        out = []
        for k in range(1, n_test + 1):
            c = np.zeros(k + 2)
            c[k + 1] = 1.0
            if k - 1 >= 0:
                c[k - 1] -= 1.0
            out.append(c)
        return out
    if vanish == 2:
        # (1-ξ²) = (2/3)·(P0 - P2)
        w = np.array([2.0 / 3.0, 0.0, -2.0 / 3.0])
        w2 = L.legmul(w, w)
        return [L.legmul(w2, np.eye(n_test)[k]) for k in range(n_test)]
    raise ValueError(f"vanish must be 0, 1 or 2; got {vanish}")


def _axis_matrices(n_test: int, vanish: int, quad: int, lo: float, hi: float,
                   elements, max_order: int):
    """Per-axis quadrature nodes and contraction matrices.

    ``elements`` is an element count (uniform mesh) or an array of E+1
    element edges spanning [lo, hi] (h-refined mesh).  Returns
    (nodes (E·q,), weights (E·q,), C) where C[m] is the (E, q, K) tensor
    contracting reference-element residual values with the m-th physical
    derivative of the normalized test functions times the physical
    quadrature weights — the per-axis, per-element factor of F_{j,k}."""
    L = np.polynomial.legendre
    xi, w_ref = L.leggauss(quad)
    if np.ndim(elements) == 0:
        edges = np.linspace(lo, hi, int(elements) + 1)
    else:
        edges = np.asarray(elements, dtype=np.float64)
        if not (abs(edges[0] - lo) < 1e-12 and abs(edges[-1] - hi) < 1e-12
                and np.all(np.diff(edges) > 0)):
            raise ValueError(
                f"edges must increase from {lo} to {hi}; got {edges}")
    h = np.diff(edges)                                   # (E,)
    centers = (edges[:-1] + edges[1:]) / 2.0
    nodes = (centers[:, None] + (h[:, None] / 2.0) * xi[None, :]).reshape(-1)
    weights = ((h[:, None] / 2.0) * w_ref[None, :]).reshape(-1)

    basis = _test_basis(n_test, vanish)
    # ‖v_k‖²_{L2[-1,1]} = Σ c_i²·2/(2i+1);  physical norm = √(h/2)·ref norm;
    # divisor c_{j,k} = ‖v_k‖_{L2(E)}·√h = (h/√2)·‖v_k‖_ref
    norms = np.array([np.sqrt(np.sum(c * c * 2.0 / (2 * np.arange(len(c)) + 1)))
                      for c in basis])
    C = []
    for m in range(max_order + 1):
        V = np.stack([L.legval(xi, L.legder(c, m) if m else c)
                      for c in basis], axis=1)          # (q, K)
        # per-element scale: (h/2)·(2/h)^m (quad weight × chain rule) over
        # the normalization (h/√2)
        scale = ((h / 2.0) * (2.0 / h) ** m
                 / (h / np.sqrt(2.0)))                   # (E,)
        C.append(scale[:, None, None] * (w_ref[:, None] * V)[None, :, :]
                 / norms[None, None, :])
    return nodes, weights, C


# ---------------------------------------------------------------------------
# term decomposition for integration by parts
# ---------------------------------------------------------------------------

def _is_const(e: Expr) -> bool:
    """Constant over the domain: no free variables, depvars, or integrals
    (Params are trainable scalars but spatially constant — legal factors)."""
    if isinstance(e, (Num, Param)):
        return True
    if isinstance(e, (Sym, DepVarCall, Deriv, IntegralExpr)):
        return False
    if isinstance(e, Call):
        return all(_is_const(a) for a in e.args)
    return False


def _signed_terms(e: Expr, sign: int = 1):
    """Flatten top-level +/−/neg into (sign, term) pairs."""
    if isinstance(e, Call):
        if e.op == "+":
            return _signed_terms(e.args[0], sign) + _signed_terms(e.args[1], sign)
        if e.op == "-" and len(e.args) == 2:
            return (_signed_terms(e.args[0], sign)
                    + _signed_terms(e.args[1], -sign))
        if e.op == "neg":
            return _signed_terms(e.args[0], -sign)
    return [(sign, e)]


def _peel_constants(e: Expr):
    """Split a term into (constant factors, core).  Only fully constant
    multipliers/divisors are peeled; anything else stays in the core."""
    if isinstance(e, Call) and e.op == "*":
        a, b = e.args
        if _is_const(a):
            fs, core = _peel_constants(b)
            return [a] + fs, core
        if _is_const(b):
            fs, core = _peel_constants(a)
            return [b] + fs, core
    if isinstance(e, Call) and e.op == "/" and _is_const(e.args[1]):
        fs, core = _peel_constants(e.args[0])
        return fs + [Call("/", (Num(1.0), e.args[1]))], core
    if isinstance(e, Call) and e.op == "neg":
        fs, core = _peel_constants(e.args[0])
        return fs + [Num(-1.0)], core
    return [], e


def _reassemble(factors, core: Expr) -> Expr:
    out = core
    for f in factors:
        out = Call("*", (f, out))
    return out


def _contains_integral(e) -> bool:
    if isinstance(e, IntegralExpr):
        return True
    if isinstance(e, Call):
        return any(_contains_integral(a) for a in e.args)
    if isinstance(e, Deriv):
        return _contains_integral(e.target)
    if isinstance(e, DepVarCall):
        return any(_contains_integral(a) for a in e.args)
    return False


def _ibp_groups(expr: Expr, axis_names: set, ibp: int):
    """Group the residual's additive terms by the per-axis test-derivative
    orders after integration by parts.

    Returns {orders: summed Expr} where `orders` maps axis name -> m (the
    number of derivatives moved onto the test functions in that axis; the
    (−1)^Σm sign is folded into the expression)."""
    groups: dict = {}
    for sign, term in _signed_terms(expr):
        factors, core = _peel_constants(term)
        orders = {}
        if ibp > 0 and isinstance(core, Deriv):
            counts: dict = {}
            for v in core.wrt:
                counts[v.name] = counts.get(v.name, 0) + 1
            kept = []
            for v in core.wrt:
                m_target = min(ibp, counts[v.name]) if v.name in axis_names \
                    else 0
                if orders.get(v.name, 0) < m_target:
                    orders[v.name] = orders.get(v.name, 0) + 1
                    sign = -sign
                else:
                    kept.append(v)
            core = Deriv(core.target, kept) if kept else core.target
        new_term = _reassemble(factors, core)
        if sign < 0:
            new_term = Call("neg", (new_term,))
        key = tuple(sorted(orders.items()))
        groups[key] = (Call("+", (groups[key], new_term))
                       if key in groups else new_term)
    return groups


# ---------------------------------------------------------------------------
# the strategy
# ---------------------------------------------------------------------------

class WeakTraining(TrainingStrategy):
    """hp-VPINN weak-form training strategy (see module docstring).

    * ``elements``: elements per axis — an int (uniform mesh), an array of
      E+1 element edges (h-refined mesh, e.g. from `refine_weak`), or a
      {var name: int | edges} dict
    * ``n_test``: test functions per axis per element (int or dict)
    * ``quad``: Gauss-Legendre points per element per axis
      (default ``max n_test + ibp + 3`` — exact for the polynomial factor,
      leaving the budget to resolve the network)
    * ``ibp``: integrations by parts per term per axis (0, 1 or 2); selects
      the matching vanishing test basis
    * ``bc_dx``: grid spacing for the pointwise boundary losses (scalar or
      per-domain list; default = element size / quad, matching the interior
      node density)

    Composes with adaptive losses, `additional_loss`, `param_estim`,
    checkpointing and `matmul_precision` unchanged (it is an ordinary
    strategy producing per-equation scalar losses).  `gradient_enhanced`
    is rejected: gPINN rows are strong-form by construction.
    """

    def __init__(self, elements=4, n_test: int | dict = 8, *, quad=None,
                 ibp: int = 1, bc_dx=None):
        if ibp not in (0, 1, 2):
            raise ValueError(f"ibp must be 0, 1 or 2; got {ibp}")
        self.elements = elements
        self.n_test = n_test
        self.quad = quad
        self.ibp = ibp
        self.bc_dx = bc_dx

    def _per_axis(self, value, name, default=None):
        if isinstance(value, dict):
            return value.get(name, default)
        return value

    @staticmethod
    def _spans(pinnrep):
        return {d.variables.name: (float(infimum(d.domain)),
                                   float(supremum(d.domain)))
                for d in pinnrep.domains}

    def build(self, pinnrep, datafree_pde, datafree_bc):
        if getattr(pinnrep, "gradient_enhanced", None):
            raise ValueError(
                "gradient_enhanced (gPINN) is strong-form and cannot be "
                "projected by WeakTraining; use GridTraining/"
                "StochasticTraining for gPINN rows")
        dtype = pinnrep.dtype
        acc = getattr(pinnrep, "loss_accum_dtype", None)
        remat = getattr(pinnrep, "remat", False)
        ctx = LoweringContext.from_pinnrep(pinnrep)
        spans = self._spans(pinnrep)

        pde_losses = []
        for i, eq in enumerate(pinnrep.eqs):
            args = pinnrep.pde_args[i]
            pde_losses.append(self._equation_loss(
                eq, args, ctx, pinnrep, spans, datafree_pde[i], dtype, acc,
                remat))

        # essential BCs stay pointwise penalties on a static grid
        bc_sets = self._bc_training_sets(pinnrep, spans)
        bc = [_mean_sq_loss(f, s, acc) for f, s in zip(datafree_bc, bc_sets)]
        return pde_losses, bc

    def _bc_training_sets(self, pinnrep, spans):
        """Static boundary training sets at the interior node density
        (shared by `build` and the Gauss-Newton residual vector)."""
        if self.bc_dx is not None:
            bc_dx = self.bc_dx
        else:
            bc_dx = []
            for d in pinnrep.domains:
                nm = d.variables.name
                lo, hi = spans[nm]
                e = self._per_axis(self.elements, nm, 4)
                n_el = len(e) - 1 if np.ndim(e) else int(e)
                q = self._resolve_quad(nm)
                bc_dx.append((hi - lo) / max(n_el * q - 1, 1))
        return generate_training_sets(pinnrep.domains, bc_dx,
                                      pinnrep.bc_args, pinnrep.dtype)

    def _resolve_quad(self, name):
        if self.quad is not None:
            return self._per_axis(self.quad, name)
        nt = self.n_test
        nt_max = max(nt.values()) if isinstance(nt, dict) else nt
        return nt_max + self.ibp + 3

    def _equation_loss(self, eq, args, ctx, pinnrep, spans, datafree, dtype,
                       acc, remat):
        rows, wvec = self._equation_rows(eq, args, ctx, pinnrep, spans,
                                         datafree, dtype, remat)
        wj = jnp.asarray(wvec, dtype)

        def loss(theta, key=None):
            del key
            r = rows(theta)
            sq = r * r
            if acc is not None:
                sq = sq.astype(acc)
            return jnp.sum(sq * wj.astype(sq.dtype))

        return loss

    def _equation_rows(self, eq, args, ctx, pinnrep, spans, datafree, dtype,
                       remat, with_meta=False):
        """Flat residual rows + static per-row quadrature weights for one
        equation, with ``equation_loss(θ) == Σ_i w_i · rows(θ)_i²``.

        Shared by the scalar training loss, by
        `gauss_newton.build_residual_vector` (WeakTraining is deterministic,
        so hp-VPINN objectives are valid Gauss-Newton least squares), and —
        with ``with_meta=True``, which appends a third element carrying the
        projection geometry (or None for quadrature-routed equations) — by
        `refine_weak`'s per-element scoring."""
        syms = [a for a in args if isinstance(a, Sym)]
        layout = [a if isinstance(a, Sym) else None for a in args]
        expr = Call("-", (expand_derivatives(eq.lhs),
                          expand_derivatives(eq.rhs)))

        for s in syms:
            if s.name not in spans:
                raise ValueError(f"equation variable {s.name!r} has no domain")

        # per-axis quadrature geometry + contraction matrices
        axis_geo = {}
        edges_of = {}
        for s in syms:
            lo, hi = spans[s.name]
            e = self._per_axis(self.elements, s.name, 4)
            edges = (np.linspace(lo, hi, int(e) + 1) if np.ndim(e) == 0
                     else np.asarray(e, dtype=np.float64))
            edges_of[s.name] = edges
            nt = self._per_axis(self.n_test, s.name, 8)
            q = self._resolve_quad(s.name)
            axis_geo[s.name] = (_axis_matrices(nt, self.ibp, q, lo, hi, edges,
                                               max_order=self.ibp),
                                len(edges) - 1, q)

        # static tensor-product node grid in the equation's arg layout
        mesh_axes = [axis_geo[s.name][0][0] for s in syms]
        grids = (np.meshgrid(*mesh_axes, indexing="ij") if mesh_axes
                 else [np.zeros((1,))])
        n_total = grids[0].size
        rows, gi = [], 0
        for a in args:
            if isinstance(a, Sym):
                rows.append(grids[gi].reshape(-1))
                gi += 1
            else:
                rows.append(np.full(n_total, float(a)))
        cord = jnp.asarray(np.stack(rows, axis=0), dtype)

        if _contains_integral(expr) or not syms:
            # routing, not rejection: quadrature-weighted pointwise loss on
            # the same nodes (the separable auto-hybrid precedent)
            w_parts = [axis_geo[s.name][0][1] for s in syms]
            W = np.ones((1,))
            for w in w_parts:
                W = (W[:, None] * w[None, :]).reshape(-1)
            volume = float(np.prod([spans[s.name][1] - spans[s.name][0]
                                    for s in syms])) if syms else 1.0

            def quad_rows(theta):
                return jnp.reshape(datafree(shard_batch(cord), theta), (-1,))

            if with_meta:
                return quad_rows, W / volume, None
            return quad_rows, W / volume

        groups = _ibp_groups(expr, {s.name for s in syms}, self.ibp)
        grid_shape = tuple(x for s in syms
                           for x in (axis_geo[s.name][1],
                                     axis_geo[s.name][2]))

        compiled = []
        for orders_key, gexpr in groups.items():
            orders = dict(orders_key)
            rfn = build_residual_function(Eq(gexpr, 0.0), layout, ctx,
                                          pinnrep.default_p)
            if remat:
                rfn = jax.checkpoint(rfn)
            mats = [jnp.asarray(
                axis_geo[s.name][0][2][orders.get(s.name, 0)], dtype)
                for s in syms]
            compiled.append((rfn, mats))

        d = len(syms)
        # einsum per axis: (E1,q1,..,Ed,qd) × (E_a,q_a,K_a) -> (E1,K1,..)
        # (the contraction matrix carries the element dim: h-refined meshes
        # have per-element scales)
        letters = "abcdefgh"[:d]
        qs = "mnopqrst"[:d]
        ks = "uvwxyzAB"[:d]
        in_sub = "".join(letters[a] + qs[a] for a in range(d))
        out_sub = "".join(letters[a] + ks[a] for a in range(d))
        spec = (in_sub + ","
                + ",".join(letters[a] + qs[a] + ks[a] for a in range(d))
                + "->" + out_sub)

        n_rows = int(np.prod([axis_geo[s.name][1]
                              * axis_geo[s.name][0][2][0].shape[2]
                              for s in syms]))

        def weak_rows(theta):
            # in-trace sharding constraint (closed-over constants bake in
            # replicated; see parallel.mesh.shard_batch): points split over
            # the data axis, leading element blocks land whole per device,
            # the per-axis contractions stay device-local, and the loss
            # mean induces the only collective
            c = shard_batch(cord)
            F = None
            for rfn, mats in compiled:
                r = jnp.reshape(rfn(c, theta), grid_shape)
                proj = jnp.einsum(spec, r, *mats)
                F = proj if F is None else F + proj
            return jnp.reshape(F, (-1,))

        if with_meta:
            meta = {"syms": [s.name for s in syms],
                    "shape": tuple(x for s in syms
                                   for x in (axis_geo[s.name][1],
                                             axis_geo[s.name][0][2][0]
                                             .shape[2])),
                    "edges": edges_of}
            return weak_rows, np.full(n_rows, 1.0 / n_rows), meta
        return weak_rows, np.full(n_rows, 1.0 / n_rows)


def refine_weak(prob, theta, *, frac: float = 0.3, parts: int = 2):
    """Residual-driven h-refinement — the "h" of hp-VPINN (Kharazmi et al.
    2021 §2.3 refine toward the residual; here: split, per axis, the
    elements carrying the largest projected-residual energy).

    Scores each axis-element by the weighted energy Σ w·F² of the trained
    projection, reduced over every tensor dimension except that axis's
    element dimension (summed over all weak PDE equations; quadrature-routed
    equations don't contribute).  The top ``frac`` fraction of elements per
    axis are split into ``parts`` equal children.

    Returns a NEW `WeakTraining` with per-axis refined edges and every other
    setting inherited — re-discretize and warm-start to continue training::

        res = solve(prob, opt, maxiters=...)
        strat2 = refine_weak(prob, res.u)
        disc2 = PhysicsInformedNN(chain, strat2, ...)
        prob2 = discretize(system, disc2).with_params(res.u)
    """
    import jax as _jax

    pinnrep = getattr(prob, "pinnrep", prob)
    strategy = pinnrep.strategy
    if not isinstance(strategy, WeakTraining):
        raise TypeError("refine_weak needs a WeakTraining problem; got "
                        f"{type(strategy).__name__}")
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1]; got {frac}")
    if parts < 2:
        raise ValueError(f"parts must be >= 2; got {parts}")
    ctx = LoweringContext.from_pinnrep(pinnrep)
    spans = WeakTraining._spans(pinnrep)
    lf = pinnrep.loss_functions

    scores: dict = {}
    edges_of: dict = {}
    for eq, args, f in zip(pinnrep.eqs, pinnrep.pde_args,
                           lf.datafree_pde_loss_functions):
        rows, wvec, meta = strategy._equation_rows(
            eq, args, ctx, pinnrep, spans, f, pinnrep.dtype, remat=False,
            with_meta=True)
        if meta is None:
            continue
        F2 = (np.asarray(_jax.jit(rows)(theta)) ** 2 * wvec).reshape(
            meta["shape"])                       # (E1, K1, E2, K2, ...)
        for i, name in enumerate(meta["syms"]):
            sc = F2.sum(axis=tuple(j for j in range(F2.ndim) if j != 2 * i))
            scores[name] = scores.get(name, 0.0) + sc
            edges_of[name] = meta["edges"][name]
    if not scores:
        raise ValueError("no weak-projected equations to score (all "
                         "equations quadrature-routed) — nothing to refine")

    new_elements: dict = {}
    for name, sc in scores.items():
        edges = edges_of[name]
        k = max(1, int(np.ceil(frac * sc.size)))
        top = set(np.argsort(sc)[-k:].tolist())
        out = [edges[0]]
        for e_i in range(sc.size):
            if e_i in top:
                out.extend(np.linspace(edges[e_i], edges[e_i + 1],
                                       parts + 1)[1:])
            else:
                out.append(edges[e_i + 1])
        new_elements[name] = np.asarray(out)

    return WeakTraining(elements=new_elements, n_test=strategy.n_test,
                        quad=strategy.quad, ibp=strategy.ibp,
                        bc_dx=strategy.bc_dx)
