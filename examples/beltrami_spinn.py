"""(3+1)-D unsteady Navier-Stokes: Beltrami flow with a separable PINN.

The Ethier-Steinman (1994) Beltrami flow is the standard analytic benchmark
for 3-D+time incompressible Navier-Stokes (the nonlinear term is exactly
balanced by the pressure gradient).  With a = d = 1, nu = 1 on
[-1,1]^3 x [0,1]:

    u = -a[e^{ax} sin(ay+dz) + e^{az} cos(ax+dy)] e^{-d^2 t}
    v = -a[e^{ay} sin(az+dx) + e^{ax} cos(ay+dz)] e^{-d^2 t}
    w = -a[e^{az} sin(ax+dy) + e^{ay} cos(az+dx)] e^{-d^2 t}
    p = -a^2/2 [...] e^{-2 d^2 t}

Four coupled equations (three momentum + continuity), four separable
rank-R fields u(x,y,z,t) = sum_r f(x) g(y) h(z) k(t): each training step
evaluates the full 65^4 ~= 17.9M-point tensor-product residual for
4 x 65 x 4 axis-net evaluations — a grid size no dense PINN formulation
can touch on one chip.  The analytic field itself is low-rank separable
(each term is a product of univariate exp/sin/cos after angle expansion),
so the ansatz is exact.

Dirichlet faces + IC come from the analytic solution; p is pinned on the
t-axis at the origin (gauge).  Causal-in-t weighting with eps
continuation; matmul_precision="highest" (the r3 precision lever).

Measured on one TPU v5e chip (65^4 grid, rank 64, 20k Adam iters/stage,
~42 ms/step, eval at t in {0.25, 0.5, 1.0} vs the analytic field):

    eps=1:  rel L2(u,v,w) = 0.0265
    eps=10: rel L2(u,v,w) = 0.0107
    eps=30: rel L2(u,v,w) = **0.0063**   (~52 min total incl. compiles)

PERF.md "(3+1)-D Beltrami Navier-Stokes".

Run: python examples/beltrami_spinn.py [--nodes 65] [--rank 64]
     [--iters 20000] [--stages "1:1e-3,10:5e-4,30:5e-4"]
     [--save theta.pkl] [--load theta.pkl]
"""

import argparse
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neuralpde_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import optax

import neuralpde_tpu as npde
from neuralpde_tpu import (
    DepVar, Differential, Domain, Eq, Interval, NonAdaptiveLoss, PDESystem,
    PhysicsInformedNN, SeparableNet, SeparableTraining, discretize, mlp,
    solve, symbols,
)

A = 1.0
D = 1.0
NU = 1.0

x, y, z, t = symbols("x y z t")
u, v, w, p = DepVar("u"), DepVar("v"), DepVar("w"), DepVar("p")
Dt = Differential(t)
Dx, Dy, Dz = Differential(x), Differential(y), Differential(z)
Dxx, Dyy, Dzz = Dx**2, Dy**2, Dz**2


def analytic(sym_x, sym_y, sym_z, sym_t):
    """Symbolic analytic Beltrami fields at the given coordinate
    expressions (used for face/IC boundary conditions)."""
    e = npde.exp
    s = npde.sin
    c = npde.cos
    dec = e(-(D**2) * sym_t)
    ua = -A * (e(A * sym_x) * s(A * sym_y + D * sym_z)
               + e(A * sym_z) * c(A * sym_x + D * sym_y)) * dec
    va = -A * (e(A * sym_y) * s(A * sym_z + D * sym_x)
               + e(A * sym_x) * c(A * sym_y + D * sym_z)) * dec
    wa = -A * (e(A * sym_z) * s(A * sym_x + D * sym_y)
               + e(A * sym_y) * c(A * sym_z + D * sym_x)) * dec
    pa = (-(A**2) / 2.0) * (
        e(2 * A * sym_x) + e(2 * A * sym_y) + e(2 * A * sym_z)
        + 2 * s(A * sym_x + D * sym_y) * c(A * sym_z + D * sym_x)
        * e(A * (sym_y + sym_z))
        + 2 * s(A * sym_y + D * sym_z) * c(A * sym_x + D * sym_y)
        * e(A * (sym_z + sym_x))
        + 2 * s(A * sym_z + D * sym_x) * c(A * sym_y + D * sym_z)
        * e(A * (sym_x + sym_y))) * e(-2 * (D**2) * sym_t)
    return ua, va, wa, pa


def analytic_np(X, Y, Z, T):
    """NumPy analytic velocities (evaluation reference)."""
    dec = np.exp(-(D**2) * T)
    ua = -A * (np.exp(A * X) * np.sin(A * Y + D * Z)
               + np.exp(A * Z) * np.cos(A * X + D * Y)) * dec
    va = -A * (np.exp(A * Y) * np.sin(A * Z + D * X)
               + np.exp(A * X) * np.cos(A * Y + D * Z)) * dec
    wa = -A * (np.exp(A * Z) * np.sin(A * X + D * Y)
               + np.exp(A * Y) * np.cos(A * Z + D * X)) * dec
    return ua, va, wa


def build_system():
    U, V, W, P = u(x, y, z, t), v(x, y, z, t), w(x, y, z, t), p(x, y, z, t)
    lap = lambda F: Dxx(F) + Dyy(F) + Dzz(F)
    eqs = [
        Eq(Dt(U) + U * Dx(U) + V * Dy(U) + W * Dz(U) + Dx(P), NU * lap(U)),
        Eq(Dt(V) + U * Dx(V) + V * Dy(V) + W * Dz(V) + Dy(P), NU * lap(V)),
        Eq(Dt(W) + U * Dx(W) + V * Dy(W) + W * Dz(W) + Dz(P), NU * lap(W)),
        Eq(Dx(U) + Dy(V) + Dz(W), 0.0),
    ]
    bcs = []
    # ICs (t = 0) for the three velocities
    ua0, va0, wa0, _ = analytic(x, y, z, 0.0)
    bcs += [Eq(u(x, y, z, 0.0), ua0), Eq(v(x, y, z, 0.0), va0),
            Eq(w(x, y, z, 0.0), wa0)]
    # Dirichlet faces from the analytic solution, every velocity, all 6
    for const, sym in [(-1.0, "x"), (1.0, "x"), (-1.0, "y"), (1.0, "y"),
                       (-1.0, "z"), (1.0, "z")]:
        sub = {"x": x, "y": y, "z": z}
        sub[sym] = const
        ua_, va_, wa_, _ = analytic(sub["x"], sub["y"], sub["z"], t)
        bcs += [Eq(u(sub["x"], sub["y"], sub["z"], t), ua_),
                Eq(v(sub["x"], sub["y"], sub["z"], t), va_),
                Eq(w(sub["x"], sub["y"], sub["z"], t), wa_)]
    # pressure gauge: pin p on the t-axis at the origin
    _, _, _, pa0 = analytic(0.0, 0.0, 0.0, t)
    bcs.append(Eq(p(0.0, 0.0, 0.0, t), pa0))
    domains = [Domain(x, Interval(-1, 1)), Domain(y, Interval(-1, 1)),
               Domain(z, Interval(-1, 1)), Domain(t, Interval(0, 1))]
    return PDESystem(eqs, bcs, domains, [x, y, z, t],
                     [u(x, y, z, t), v(x, y, z, t), w(x, y, z, t),
                      p(x, y, z, t)])


def make_nets(rank: int, hidden: int = 64):
    return [SeparableNet([mlp([1, hidden, hidden, rank]) for _ in range(4)])
            for _ in range(4)]


def rel_l2_velocities(nets, theta, n_eval: int = 33):
    xs = np.linspace(-1, 1, n_eval)
    num2 = den2 = 0.0
    nx = jnp.asarray(xs, jnp.float32)
    for tv in (0.25, 0.5, 1.0):
        X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
        ua, va, wa = analytic_np(X, Y, Z, tv)
        nt = jnp.asarray([tv], jnp.float32)
        with jax.default_matmul_precision("highest"):
            preds = [np.asarray(nets[i].grid(
                theta["depvar"][name], [nx, nx, nx, nt]))[..., 0]
                for i, name in enumerate(("u", "v", "w"))]
        for pred, ana in zip(preds, (ua, va, wa)):
            num2 += np.linalg.norm(pred - ana) ** 2
            den2 += np.linalg.norm(ana) ** 2
    return float(np.sqrt(num2 / den2))


DEFAULT_STAGES = ((1.0, 1e-3), (10.0, 5e-4), (30.0, 5e-4))


def run(nodes: int = 65, rank: int = 64, iters: int = 20000,
        precision: str = "highest", stages=DEFAULT_STAGES,
        theta=None, save: str | None = None, verbose: bool = True) -> dict:
    """The full eps-continuation recipe as a callable (bench.py
    --accuracy-full runs this at the headline budget).  Returns
    {"rel_l2", "wall_s", "per_stage": [(eps, rel), ...]}."""
    system = build_system()
    nets = make_nets(rank)
    h = 2.0 / (nodes - 1)
    ht = 1.0 / (nodes - 1)
    mp = "highest" if precision == "highest" else None
    # 3 velocity ICs at weight 100, 18 faces at 10, gauge at 10
    bc_w = [100.0] * 3 + [10.0] * 18 + [10.0]

    per_stage = []
    rel = float("nan")
    t0 = time.perf_counter()
    for eps, lr in stages:
        strat = SeparableTraining(dx=[h, h, h, ht], causal=t, causal_eps=eps)
        disc = PhysicsInformedNN(
            nets, strat, dtype=jnp.float32, matmul_precision=mp,
            adaptive_loss=NonAdaptiveLoss(bc_loss_weights=bc_w))
        prob = discretize(system, disc)
        if theta is not None:
            prob = prob.with_params(theta)
        res = solve(prob, optax.adam(lr), maxiters=iters,
                    inner_steps=500)
        theta = res.u
        rel = rel_l2_velocities(nets, theta)
        per_stage.append((eps, rel))
        if verbose:
            print(f"eps={eps} nodes={nodes}^4 rank={rank} "
                  f"prec={precision}: rel L2(u,v,w) = {rel:.4f} "
                  f"(loss {res.objective:.3e}, "
                  f"t = {time.perf_counter() - t0:.1f}s)", flush=True)
        if save:
            import pickle

            with open(save, "wb") as fh:
                pickle.dump(jax.device_get(theta), fh)
    return {"rel_l2": rel, "wall_s": round(time.perf_counter() - t0, 1),
            "per_stage": per_stage}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=65)
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20000,
                    help="iters per continuation stage")
    ap.add_argument("--precision", default="highest",
                    choices=["default", "highest"])
    ap.add_argument("--stages", default="1:1e-3,10:5e-4",
                    help="comma list of eps:lr continuation stages")
    ap.add_argument("--save", default=None,
                    help="pickle the trained params to this path")
    ap.add_argument("--load", default=None,
                    help="warm-start from a --save'd params pickle")
    args = ap.parse_args()

    theta = None
    if args.load:
        import pickle

        with open(args.load, "rb") as fh:
            theta = pickle.load(fh)
    stages = [(float(s.split(":")[0]), float(s.split(":")[1]))
              for s in args.stages.split(",")]
    return run(nodes=args.nodes, rank=args.rank, iters=args.iters,
               precision=args.precision, stages=stages, theta=theta,
               save=args.save)["rel_l2"]


if __name__ == "__main__":
    main()
