"""Training strategies (reference: src/training_strategies.jl).

Each strategy pairs a collocation-point source with a loss reduction and
produces per-equation scalar objectives ``loss(theta, key) -> scalar``.
Deterministic strategies ignore ``key``; stochastic ones fold it, so a fresh
sample per optimizer step traces into the jitted train step (no host RNG, no
retracing) — the TPU-native replacement for the reference's per-call
`rand`/QuasiMonteCarlo sampling (src/training_strategies.jl:197-200,331-343).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .ops import sampling
from .ops.quadrature import tensor_rule_box
from .parallel.mesh import shard_batch
from .symbolic.expr import Sym
from .symbolic.system import infimum, supremum


class TrainingStrategy:
    pass


def _msq(r, acc=None):
    """mean(r²), optionally ACCUMULATED in a wider dtype (`acc`, e.g.
    float64): f32 network/residual evals with f64 loss reduction — the
    mitigation for stiff inverse problems where f64 end-to-end is ~100×
    slower on TPU (MXU is f32/bf16; SURVEY hard-part #4, measured in
    PERF.md)."""
    sq = r * r
    if acc is not None:
        sq = sq.astype(acc)
    return jnp.mean(sq)


def _wsum_sq(r, w, acc=None):
    """sum(r²·w) with optional wide-dtype accumulation (quadrature loss)."""
    sq = r * r
    if acc is not None:
        sq = sq.astype(acc)
        w = w.astype(acc)
    return jnp.sum(sq * w)


def julia_range(a: float, b: float, dx: float) -> np.ndarray:
    """Julia `a:dx:b` — inclusive of b when it lands on the grid."""
    n = int(np.floor((b - a) / dx + 1e-10)) + 1
    return a + dx * np.arange(n)


def generate_training_sets(domains, dx, eq_args_list, dtype):
    """Cartesian-product grids per equation (reference: src/discretize.jl:183-239).

    ``eq_args_list``: per equation, the get_argument layout (Syms and numbers).
    Returns a list of (rows, N) coordinate matrices.
    """
    dxs = dx if isinstance(dx, (list, tuple)) else [dx] * len(domains)
    spans = {d.variables.name: julia_range(infimum(d.domain), supremum(d.domain), h)
             for d, h in zip(domains, dxs)}
    out = []
    for args in eq_args_list:
        axes = [spans[a.name] if isinstance(a, Sym) else np.array([float(a)])
                for a in args]
        grid = np.meshgrid(*axes, indexing="ij") if axes else [np.zeros((1,))]
        cord = np.stack([g.reshape(-1) for g in grid], axis=0)
        out.append(jnp.asarray(cord, dtype=dtype))
    return out


def get_bounds(domains, eq_args_list, points: int, dtype):
    """Per-equation (lb, ub) arrays for sampling strategies, with the
    reference's 1/points inset (src/discretize.jl:297-322)."""
    dx = 1.0 / points
    lo = {d.variables.name: infimum(d.domain) + dx for d in domains}
    hi = {d.variables.name: supremum(d.domain) - dx for d in domains}
    bounds = []
    for args in eq_args_list:
        lb = np.array([lo[a.name] if isinstance(a, Sym) else float(a) for a in args])
        ub = np.array([hi[a.name] if isinstance(a, Sym) else float(a) for a in args])
        bounds.append((jnp.asarray(lb, dtype=dtype), jnp.asarray(ub, dtype=dtype)))
    return bounds


def get_loss_function(pinnrep, residual, args=None, strategy=None):
    """Per-strategy scalar loss for ONE datafree residual — the reference's
    exported debugging entry (reference: src/NeuralPDE.jl:101-105,
    src/training_strategies.jl:163-176): given a residual closure
    ``residual(cord, theta)``, returns ``loss(theta, key) -> scalar`` built by
    the strategy's point source + reduction.

    ``args`` is the equation's argument layout (defaults to the first PDE's);
    ``strategy`` defaults to ``pinnrep.strategy``.
    """
    from types import SimpleNamespace

    strategy = strategy if strategy is not None else pinnrep.strategy
    if args is None:
        args = pinnrep.pde_args[0]
    shim = SimpleNamespace(dtype=pinnrep.dtype, domains=pinnrep.domains,
                           pde_args=[list(args)], bc_args=[],
                           flat_init_params=getattr(pinnrep,
                                                    "flat_init_params", None))
    pde, _ = strategy.build(shim, [residual], [])
    return pde[0]


class GridTraining(TrainingStrategy):
    """Cartesian grid with spacing `dx` (reference: src/training_strategies.jl:1-15)."""

    def __init__(self, dx):
        self.dx = dx

    def build(self, pinnrep, datafree_pde, datafree_bc):
        dtype = pinnrep.dtype
        pde_sets = generate_training_sets(
            pinnrep.domains, self.dx, pinnrep.pde_args, dtype)
        bc_sets = generate_training_sets(
            pinnrep.domains, self.dx, pinnrep.bc_args, dtype)
        acc = getattr(pinnrep, "loss_accum_dtype", None)
        pde = [_mean_sq_loss(f, s, acc) for f, s in zip(datafree_pde, pde_sets)]
        bc = [_mean_sq_loss(f, s, acc) for f, s in zip(datafree_bc, bc_sets)]
        return pde, bc


def _mean_sq_loss(residual, train_set, acc=None):
    train_set = shard_batch(train_set)

    def loss(theta, key=None):
        del key
        # re-constrain in-trace: a closed-over array bakes into jit as a
        # REPLICATED constant, so the batch sharding must be asserted inside
        # the traced loss for GSPMD to partition the grid
        return _msq(residual(shard_batch(train_set), theta), acc)

    return loss


class StochasticTraining(TrainingStrategy):
    """Uniform resample each step (reference: src/training_strategies.jl:190-237).

    ``microbatch``: evaluate the residual in VMEM-sized chunks via
    `lax.map` with per-chunk rematerialization.  At very large batches the
    un-chunked residual's jvp-chain activations spill to HBM and throughput
    collapses; chunking keeps the working set on-chip.  Measured on one
    v5e chip (2D Poisson, 2x64x64x1, PERF.md): batch 131072 goes 35 -> 73M
    points/s, batch 524288 goes 33 -> 120M points/s with microbatch=32768.
    ``points`` must be a multiple of ``microbatch``.
    """

    def __init__(self, points: int, bcs_points: int | None = None,
                 microbatch: int | None = None):
        self.points = points
        self.bcs_points = bcs_points if bcs_points is not None else points
        self.microbatch = microbatch
        if microbatch is not None and points % microbatch != 0:
            raise ValueError(
                f"points ({points}) must be a multiple of microbatch "
                f"({microbatch})")

    def build(self, pinnrep, datafree_pde, datafree_bc):
        dtype = pinnrep.dtype
        pde_bounds = get_bounds(pinnrep.domains, pinnrep.pde_args, self.points, dtype)
        bc_bounds = get_bounds(pinnrep.domains, pinnrep.bc_args, self.points, dtype)

        acc = getattr(pinnrep, "loss_accum_dtype", None)
        mb = self.microbatch

        def make(residual, bound, n):
            lb, ub = bound

            if mb is not None and n > mb:
                @jax.checkpoint
                def chunk_sum(theta, pts):
                    sq = residual(shard_batch(pts), theta) ** 2
                    if acc is not None:
                        sq = sq.astype(acc)
                    return jnp.sum(sq)

                def loss(theta, key):
                    pts = sampling.uniform_random(key, n, lb, ub, dtype=dtype)
                    chunks = pts.reshape(pts.shape[0], n // mb, mb)
                    chunks = jnp.swapaxes(chunks, 0, 1)   # (n//mb, dim, mb)
                    s = jax.lax.map(lambda c: chunk_sum(theta, c), chunks)
                    return jnp.sum(s) / n

                return loss

            def loss(theta, key):
                pts = shard_batch(sampling.uniform_random(key, n, lb, ub, dtype=dtype))
                return _msq(residual(pts, theta), acc)

            return loss

        pde = [make(f, b, self.points) for f, b in zip(datafree_pde, pde_bounds)]
        bc = [make(f, b, self.bcs_points) for f, b in zip(datafree_bc, bc_bounds)]
        return pde, bc


class QuasiRandomTraining(TrainingStrategy):
    """Low-discrepancy sampling (reference: src/training_strategies.jl:266-344).

    sampling_alg ∈ {"lhs", "sobol"} (LatinHypercubeSample is the reference
    default).  With resampling=True a fresh randomized sample is drawn in-graph
    each step; otherwise `minibatch` precomputed designs are cycled randomly.
    """

    def __init__(self, points: int, bcs_points: int | None = None,
                 sampling_alg: str = "lhs", resampling: bool = True,
                 minibatch: int = 0):
        if sampling_alg not in ("lhs", "sobol", "lattice"):
            raise ValueError("sampling_alg must be 'lhs', 'sobol' or 'lattice'")
        self.points = points
        self.bcs_points = bcs_points if bcs_points is not None else points
        self.sampling_alg = sampling_alg
        self.resampling = resampling
        self.minibatch = minibatch

    def build(self, pinnrep, datafree_pde, datafree_bc):
        dtype = pinnrep.dtype
        acc = getattr(pinnrep, "loss_accum_dtype", None)
        pde_bounds = get_bounds(pinnrep.domains, pinnrep.pde_args, self.points, dtype)
        bc_bounds = get_bounds(pinnrep.domains, pinnrep.bc_args, self.points, dtype)

        def sample_fn(n, lb, ub):
            if self.sampling_alg in ("sobol", "lattice"):
                base = (sampling.sobol_bits(n, lb.shape[0])
                        if self.sampling_alg == "sobol"
                        else sampling.lattice_rule_bits(n, lb.shape[0]))

                def s(key):
                    return sampling.sobol_sample(base, lb, ub, key=key, dtype=dtype)
            else:
                def s(key):
                    return sampling.latin_hypercube(key, n, lb, ub, dtype=dtype)
            return s

        def make(residual, bound, n):
            lb, ub = bound
            s = sample_fn(n, lb, ub)
            if self.resampling:
                def loss(theta, key):
                    pts = shard_batch(jax.lax.stop_gradient(s(key)))
                    return _msq(residual(pts, theta), acc)
                return loss
            if self.minibatch <= 0:
                raise ValueError("minibatch must be > 0 when resampling=False")
            keys = jax.random.split(jax.random.key(0), self.minibatch)
            batch = jnp.stack([s(k) for k in keys])  # (minibatch, dim, n)

            def loss(theta, key):
                idx = jax.random.randint(key, (), 0, self.minibatch)
                return _msq(residual(shard_batch(batch[idx]), theta), acc)

            return loss

        pde = [make(f, b, self.points) for f, b in zip(datafree_pde, pde_bounds)]
        bc = [make(f, b, self.bcs_points) for f, b in zip(datafree_bc, bc_bounds)]
        return pde, bc


class QuadratureTraining(TrainingStrategy):
    """Loss = (1/|Ω|)·∫_Ω ‖residual‖² via a composite Gauss-Legendre tensor
    rule (reference: src/training_strategies.jl:367-436 uses h-adaptive
    CubatureJLh).  Runtime h-adaptivity is hostile to XLA's static-shape
    regime, so adaptivity runs at BUILD time instead: with ``panels=None``
    (the default) the panel count doubles until two successive composite
    rules agree on the initial-parameter loss integral to
    ``reltol``/``abstol``, subject to ``(order·panels)^dim <= maxiters``
    integrand evaluations (the reference's maxiters semantics).  An explicit
    ``panels`` pins the rule and skips refinement.  Train-time shapes stay
    static either way.

    For runtime h-adaptive *evaluation* parity (the reference's per-point
    adaptive integrals) see `ops.quadrature.adaptive_quad_1d` and
    `compile.lower.get_numeric_integral(..., adaptive=True)`.
    """

    DEFAULT_PANELS = 4  # used when no integrand is available for refinement

    def __init__(self, order: int = 8, panels: int | None = None,
                 reltol=1e-6, abstol=1e-3, maxiters=1000, batch=0):
        self.order = order
        self.panels = panels
        self.reltol = float(reltol)
        self.abstol = float(abstol)
        self.maxiters = int(maxiters)
        self.batch = batch  # API parity; batching is implicit in XLA
        # per-equation trained-rule checks registered by build() when the
        # rule was auto-refined (see validate_trained)
        self._trained_checks = []

    @property
    def static_panels(self) -> int:
        """Pinned panel count for call sites without a refinement integrand."""
        return self.panels if self.panels is not None else self.DEFAULT_PANELS

    def resolve_panels(self, integral_at=None, dim: int = 1) -> int:
        """Static auto-refinement honoring reltol/abstol/maxiters.

        ``integral_at(panels) -> float`` evaluates the loss integral with the
        given composite-rule panel count (at the initial parameters).  Panels
        double until two successive rules agree to the tolerances; the node
        budget ``(order·panels)^dim <= maxiters`` mirrors the reference's
        max integrand evaluations (src/training_strategies.jl:406-436).
        """
        if self.panels is not None:
            return self.panels
        if integral_at is None:
            return self.DEFAULT_PANELS
        panels = 1
        prev = float(integral_at(panels))
        while (self.order * 2 * panels) ** dim <= self.maxiters:
            cur = float(integral_at(2 * panels))
            if abs(cur - prev) <= max(self.abstol, self.reltol * abs(cur)):
                return 2 * panels  # converged; keep the finer rule
            prev = cur
            panels *= 2
        return panels

    def build(self, pinnrep, datafree_pde, datafree_bc):
        dtype = pinnrep.dtype
        lo = {d.variables.name: infimum(d.domain) for d in pinnrep.domains}
        hi = {d.variables.name: supremum(d.domain) for d in pinnrep.domains}
        theta0 = getattr(pinnrep, "flat_init_params", None)
        acc = getattr(pinnrep, "loss_accum_dtype", None)

        def make(residual, args):
            syms = [a for a in args if isinstance(a, Sym)]
            if not syms:
                dummy = jnp.zeros((len(args), 10), dtype=dtype)

                def loss(theta, key=None):
                    del key
                    return _msq(residual(dummy, theta), acc)

                return loss
            lb = [lo[s.name] for s in syms]
            ub = [hi[s.name] for s in syms]
            area = float(np.prod(np.asarray(ub) - np.asarray(lb)))

            def rule(p):
                # quadrature cord rows = symbol args only; constant args are
                # folded into the residual at lowering time (row layout)
                nodes, weights = tensor_rule_box(lb, ub, self.order, p)
                return (jnp.asarray(nodes, dtype=dtype),
                        jnp.asarray(weights / area, dtype=dtype))

            integral_at = None
            if theta0 is not None and self.panels is None:
                def integral_at(p):
                    n, w = rule(p)
                    return jnp.sum(residual(n, theta0) ** 2 * w)

            panels = self.resolve_panels(integral_at, len(syms))
            nodes, weights = rule(panels)
            nodes = shard_batch(nodes)

            if integral_at is not None:
                # build-time refinement matched the tolerances only on the
                # INITIAL-params integrand; register a post-solve check of
                # the same rule against the trained solution (the reference's
                # h-adaptive cubature tracks the solution at every step,
                # src/training_strategies.jl:406-436 — ours freezes at build)
                def check(theta, residual=residual, rule=rule, panels=panels):
                    def at(p):
                        n, w = rule(p)
                        return float(jnp.sum(residual(n, theta) ** 2 * w))

                    v1, v2 = at(panels), at(2 * panels)
                    ok = abs(v2 - v1) <= max(self.abstol,
                                             self.reltol * abs(v2))
                    return {"panels": panels, "loss_at_panels": v1,
                            "loss_at_2x_panels": v2, "ok": ok}

                self._trained_checks.append(check)

            def loss(theta, key=None):
                del key
                # in-trace constraint (see _mean_sq_loss)
                return _wsum_sq(residual(shard_batch(nodes), theta),
                                weights, acc)

            return loss

        self._trained_checks = []
        pde = [make(f, a) for f, a in zip(datafree_pde, pinnrep.pde_args)]
        bc = [make(f, a) for f, a in zip(datafree_bc, pinnrep.bc_args)]
        return pde, bc

    def validate_trained(self, theta, warn: bool = True) -> list:
        """Re-run the build-time refinement check at the TRAINED params: for
        each auto-refined equation, compare the loss integral at the frozen
        panel count against a doubled rule and flag disagreement beyond
        reltol/abstol.  Called automatically at the end of `solve`; returns
        the per-equation reports (``ok`` False = the trained solution has
        sharper structure than the frozen rule resolves — rebuild with more
        ``panels`` or tighter tolerances and retrain)."""
        import warnings

        reports = [check(theta) for check in self._trained_checks]
        bad = [r for r in reports if not r["ok"]]
        if bad and warn:
            worst = max(bad, key=lambda r: abs(r["loss_at_2x_panels"]
                                               - r["loss_at_panels"]))
            warnings.warn(
                f"QuadratureTraining: the auto-refined rule no longer meets "
                f"reltol={self.reltol}/abstol={self.abstol} on the TRAINED "
                f"solution for {len(bad)} equation(s) (worst: loss "
                f"{worst['loss_at_panels']:.3e} at {worst['panels']} panels "
                f"vs {worst['loss_at_2x_panels']:.3e} at double) — the "
                "trained residual has structure the frozen rule misses; "
                "rebuild with explicit panels= (or tighter reltol/abstol) "
                "and retrain")
        return reports


class WeightedIntervalTraining(TrainingStrategy):
    """ODE-only weighted time-segment sampling
    (reference: src/training_strategies.jl:438-468)."""

    def __init__(self, weights, points: int, seed: int | None = None):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.points = points
        self.seed = seed

    def segment_counts(self) -> np.ndarray:
        """Per-segment sample counts summing to exactly `points`
        (largest-remainder apportionment; the reference's `round.(Int, ...)`
        can over/undershoot — we guarantee the documented total)."""
        w = self.weights / self.weights.sum()
        exact = self.points * w
        counts = np.floor(exact).astype(np.int64)
        rem = self.points - int(counts.sum())
        if rem > 0:
            order = np.argsort(-(exact - counts))
            counts[order[:rem]] += 1
        return counts

    def sample_times(self, t0: float, t1: float, rng=None) -> np.ndarray:
        """One-shot weighted segment sample (reference semantics: sampled
        once per solve from fresh entropy, src/training_strategies.jl:456-468;
        pass `seed` to the constructor for reproducibility)."""
        rng = rng if rng is not None else np.random.default_rng(self.seed)
        counts = self.segment_counts()
        n_seg = len(counts)
        diff = (t1 - t0) / n_seg
        ts = [rng.random(int(n)) * diff + t0 + i * diff
              for i, n in enumerate(counts)]
        return np.concatenate(ts)

    def build(self, pinnrep, datafree_pde, datafree_bc):
        raise ValueError(
            "WeightedIntervalTraining can only be used with ODEs (NNODE)"
        )


class ResidualAdaptiveTraining(TrainingStrategy):
    """Residual-based adaptive collocation sampling (beyond the reference).

    Implements the RAD scheme of the adaptive-sampling PINN literature (see
    PAPERS.md: "Provably Accurate Adaptive Sampling for Collocation Points",
    "Efficient training of PINNs via importance sampling"): each step draws
    `candidates` uniform points, computes the (gradient-blocked) residual
    magnitude, and resamples `points` collocation points with probability
    ∝ |r|^k + c·mean(|r|^k).  Everything stays in-graph — candidate
    generation, categorical resampling, and the loss trace into the one
    compiled train step.

    BCs use plain uniform sampling (`bcs_points`).
    """

    def __init__(self, points: int, candidates: int | None = None,
                 bcs_points: int | None = None, k: float = 1.0, c: float = 1.0):
        self.points = points
        self.candidates = candidates if candidates is not None else 4 * points
        self.bcs_points = bcs_points if bcs_points is not None else points
        self.k = k
        self.c = c

    def build(self, pinnrep, datafree_pde, datafree_bc):
        dtype = pinnrep.dtype
        acc = getattr(pinnrep, "loss_accum_dtype", None)
        pde_bounds = get_bounds(pinnrep.domains, pinnrep.pde_args, self.points, dtype)
        bc_bounds = get_bounds(pinnrep.domains, pinnrep.bc_args, self.points, dtype)

        def make_pde(residual, bound):
            lb, ub = bound

            def loss(theta, key):
                kc, kr = jax.random.split(key)
                cand = sampling.uniform_random(kc, self.candidates, lb, ub,
                                               dtype=dtype)
                r = jax.lax.stop_gradient(residual(cand, theta))
                w = jnp.abs(r) ** self.k
                w = w + self.c * jnp.mean(w)
                idx = jax.random.categorical(
                    kr, jnp.log(w + 1e-30), shape=(self.points,))
                pts = shard_batch(cand[:, idx])
                return _msq(residual(pts, theta), acc)

            return loss

        def make_bc(residual, bound):
            lb, ub = bound

            def loss(theta, key):
                pts = shard_batch(sampling.uniform_random(
                    key, self.bcs_points, lb, ub, dtype=dtype))
                return _msq(residual(pts, theta), acc)

            return loss

        pde = [make_pde(f, b) for f, b in zip(datafree_pde, pde_bounds)]
        bc = [make_bc(f, b) for f, b in zip(datafree_bc, bc_bounds)]
        return pde, bc


class CausalTraining(TrainingStrategy):
    """Causality-respecting training for time-dependent PDEs (beyond the
    reference; Wang, Sankaran & Perdikaris 2022, "Respecting causality is
    all you need for training physics-informed neural networks").

    Plain PINN losses minimize the residual at all times simultaneously, so
    the optimizer happily fits late-time dynamics to wrong early-time states
    — the classic Allen-Cahn / Kuramoto-Sivashinsky failure mode.  Here the
    interior loss is split into ``n_slabs`` consecutive time slabs with mean
    residuals L_1..L_M, and slab i is weighted

        w_i = exp(-causal_eps * Σ_{j<i} L_j)        (gradient-blocked)

    so later slabs only contribute once earlier times are resolved: soft
    time-marching inside ONE static-shape XLA program (a cumsum + exp per
    step — no host control flow, no curriculum schedule to tune).

    Sampling is slab-stratified uniform: ``points`` must divide into
    ``n_slabs`` equal slabs; each slab gets ``points/n_slabs`` fresh points
    per step with the remaining coordinates uniform over their domains.
    Equations whose arguments do not contain ``time_var`` (and all BCs/ICs)
    fall back to plain stochastic sampling.

    The paper's convergence diagnostic — train until the LAST slab's weight
    w_M ≈ 1 — is exposed as ``causal_weights(theta, key)``.

    NOTE on ``causal_eps`` semantics: this class uses the paper's raw form
    ``exp(-eps·Σ_{j<i} L_j)``, so the exponent scale depends on ``n_slabs``
    (a finer slabbing needs a smaller eps).  `SeparableTraining(causal=...)`
    instead discretizes the continuous form ``exp(-eps·∫₀ᵗ L dt)`` by
    scaling the sum with the node spacing Δt, making its eps
    node-count-independent; for matched slabbing,
    ``eps_separable = eps_here / Δt``.
    """

    def __init__(self, points: int, time_var, bcs_points: int | None = None,
                 n_slabs: int = 32, causal_eps: float = 1.0):
        self.points = points
        self.time_var = time_var.name if isinstance(time_var, Sym) else str(time_var)
        self.bcs_points = bcs_points if bcs_points is not None else points
        self.n_slabs = n_slabs
        self.causal_eps = causal_eps
        if points % n_slabs != 0:
            raise ValueError(
                f"points ({points}) must be a multiple of n_slabs ({n_slabs})")
        self._weight_fns = []

    def _slab_losses(self, residual, lb, ub, t_idx, dtype, acc):
        """Per-slab mean-square residuals L (shape (n_slabs,)) from
        slab-major stratified sampling."""
        M, per = self.n_slabs, self.points // self.n_slabs

        def slabs(theta, key):
            pts = sampling.uniform_random(key, self.points, lb, ub, dtype=dtype)
            # restratify the time row slab-major: slab s spans
            # [lb_t + s·Δ, lb_t + (s+1)·Δ], Δ = (ub_t − lb_t)/M
            u = (pts[t_idx] - lb[t_idx]) / jnp.maximum(ub[t_idx] - lb[t_idx],
                                                       jnp.asarray(1e-30, dtype))
            slab = jnp.repeat(jnp.arange(M, dtype=dtype), per)
            t = lb[t_idx] + (slab + u) * (ub[t_idx] - lb[t_idx]) / M
            sq = residual(shard_batch(pts.at[t_idx].set(t.astype(pts.dtype))),
                          theta) ** 2
            if acc is not None:
                sq = sq.astype(acc)
            return jnp.mean(sq.reshape(-1, M, per), axis=(0, 2))

        return slabs

    @staticmethod
    def _weights(L, eps):
        csum = jnp.cumsum(L) - L          # Σ_{j<i} L_j
        return jax.lax.stop_gradient(jnp.exp(-eps * csum))

    def build(self, pinnrep, datafree_pde, datafree_bc):
        dtype = pinnrep.dtype
        acc = getattr(pinnrep, "loss_accum_dtype", None)
        pde_bounds = get_bounds(pinnrep.domains, pinnrep.pde_args, self.points, dtype)
        bc_bounds = get_bounds(pinnrep.domains, pinnrep.bc_args,
                               self.bcs_points, dtype)
        self._weight_fns = []

        def t_index(args):
            for i, a in enumerate(args):
                if isinstance(a, Sym) and a.name == self.time_var:
                    return i
            return None

        def make_pde(residual, bound, args):
            lb, ub = bound
            t_idx = t_index(args)
            if t_idx is None:
                def loss(theta, key):
                    pts = shard_batch(sampling.uniform_random(
                        key, self.points, lb, ub, dtype=dtype))
                    return _msq(residual(pts, theta), acc)

                return loss
            slabs = self._slab_losses(residual, lb, ub, t_idx, dtype, acc)

            def loss(theta, key):
                L = slabs(theta, key)
                return jnp.mean(self._weights(L, self.causal_eps) * L)

            self._weight_fns.append(
                lambda theta, key, s=slabs: self._weights(
                    s(theta, key), self.causal_eps))
            return loss

        def make_bc(residual, bound):
            lb, ub = bound

            def loss(theta, key):
                pts = shard_batch(sampling.uniform_random(
                    key, self.bcs_points, lb, ub, dtype=dtype))
                return _msq(residual(pts, theta), acc)

            return loss

        pde = [make_pde(f, b, a) for f, b, a in
               zip(datafree_pde, pde_bounds, pinnrep.pde_args)]
        bc = [make_bc(f, b) for f, b in zip(datafree_bc, bc_bounds)]
        return pde, bc

    def causal_weights(self, theta, key):
        """Current slab weights per time-dependent equation (paper's
        convergence monitor: stop when the last weight ≈ 1).  Available
        after the strategy has been built by discretize()."""
        if not self._weight_fns:
            raise ValueError("causal_weights requires a discretized problem "
                             "(call discretize(system, disc) first)")
        return [fn(theta, key) for fn in self._weight_fns]
