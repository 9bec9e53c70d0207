"""Deep-ensemble PINN training: N independent initializations trained as ONE
vmapped XLA program, sharded member-parallel over the device mesh.

Beyond reference (the reference trains one network per solve;
src/discretize.jl:430-470 draws a single init).  Two problems this solves:

* **seed lottery** — stiff/inverse problems land in bad basins for some
  inits (the Lorenz inverse problem's measured failure mode, PERF.md);
  training a member per device costs one member's wall-clock and keeps
  the best basin.
* **epistemic uncertainty** — ensemble spread is the classic deep-ensemble
  UQ estimate (Lakshminarayanan et al. 2017), complementing the BPINN
  posterior at a fraction of the cost (no MCMC chain).

TPU mapping: members are embarrassingly parallel, so the stacked member
axis shards over the mesh with NO collectives in the step program — each
device trains its members locally; only the final per-member losses are
gathered.  This is ensemble parallelism (the "ep" mesh axis) in the
scaling-book sense.

Usage:
    prob = discretize(system, PhysicsInformedNN(mlp([1, 16, 1]), strat))
    res = solve_ensemble(prob, optax.adam(2e-3), maxiters=2000,
                         n_ensemble=8, mesh=make_mesh(axis_name="ensemble"))
    res.best_index, res.losses       # winner + per-member objectives
    sol = res.best                   # winner's parameter pytree
    mean, std = res.mean_and_std(cord)   # deep-ensemble UQ
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import math
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train import make_step


@dataclass
class EnsembleResult:
    """Stacked (leading axis = member) parameters + per-member objectives."""

    members: Any               # pytree, every leaf (n_ensemble, ...)
    losses: Any                # (n_ensemble,) final per-member loss
    iterations: int
    history: list              # bounded list of (iteration, (n_ensemble,) losses)
    pinnrep: Any = None

    @property
    def n_ensemble(self) -> int:
        return int(jax.tree.leaves(self.members)[0].shape[0])

    @property
    def best_index(self) -> int:
        return int(jnp.argmin(self.losses))

    @property
    def best(self):
        """Parameter pytree of the lowest-loss member."""
        return self.member(self.best_index)

    def member(self, i: int):
        return jax.tree.map(lambda x: x[i], self.members)

    def predict(self, cord, depvar: str | None = None):
        """Evaluate every member at cord (in_dim, N) -> (n_ensemble, out, N)."""
        if self.pinnrep is None:
            raise ValueError("predict needs the pinnrep (train via "
                             "solve_ensemble to attach it)")
        phi = self.pinnrep.phi
        if self.pinnrep.multioutput:
            if depvar is None:
                raise ValueError(
                    f"multi-output problem: pick depvar= from "
                    f"{self.pinnrep.depvars}")
            idx = self.pinnrep.depvars.index(depvar)
            phi = phi[idx]
            params = self.members["depvar"][depvar]
        else:
            params = self.members["depvar"]
        cord = jnp.asarray(cord)
        return jax.vmap(lambda p: phi(cord, p))(params)

    def mean_and_std(self, cord, depvar: str | None = None):
        """Deep-ensemble predictive mean and (epistemic) std at cord."""
        preds = self.predict(cord, depvar)
        return jnp.mean(preds, axis=0), jnp.std(preds, axis=0)


def _member_init_fn(prob):
    """(key) -> flat params pytree matching prob.init_params: fresh chain
    init (the same draw symbolic_discretize makes, discretize.py:242-259),
    dtype-cast, with inverse-problem `p` leaves copied from the problem's
    start value (identical across members — the estimate is data-driven)."""
    rep = prob.pinnrep
    phis = rep.phi if rep.multioutput else [rep.phi]
    modules = [p.module for p in phis]
    dtype = rep.dtype

    def cast(tree):
        return jax.tree.map(
            lambda a: (jnp.asarray(a).astype(dtype)
                       if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                       else jnp.asarray(a)), tree)

    def init(key):
        keys = jax.random.split(key, len(modules))
        inits = [m.init(k) for m, k in zip(modules, keys)]
        depvar = ({d: cast(p) for d, p in zip(rep.depvars, inits)}
                  if rep.multioutput else cast(inits[0]))
        flat = dict(prob.init_params)
        flat["depvar"] = depvar
        return flat

    return init


def _ensemble_sharding(mesh: Mesh, tree):
    """Leading-axis member sharding for every leaf."""
    axis = mesh.axis_names[0]

    def spec(leaf):
        return NamedSharding(mesh, P(axis, *([None] * (jnp.ndim(leaf) - 1))))

    return jax.tree.map(spec, tree)


def solve_ensemble(prob, optimizer=None, maxiters: int = 1000, *,
                   n_ensemble: int = 8, key=None, inner_steps: int = 1,
                   mesh: Mesh | None = None, abstol: float | None = None,
                   verbose: bool = False, callback=None,
                   checkpoint_path: str | None = None,
                   checkpoint_every: int | None = None,
                   history_cap: int = 1024,
                   member_init=None) -> EnsembleResult:
    """Train `n_ensemble` independent initializations of a `TrainingProblem`
    as one vmapped program (one compile, N members per step).

    * Per-member randomness: member m's init AND its stochastic collocation
      stream come from `fold_in(key, m)` — members are statistically
      independent replicas of `solve(prob, ...)`.
    * ``mesh``: shard the member axis over devices (make_mesh(axis_name=
      "ensemble")); members are embarrassingly parallel, the step program
      contains no collectives.  n_ensemble must divide by the mesh size.
    * Stopping: `abstol` stops when the BEST member crosses it; divergence
      of individual members does not stop the run (their losses go
      non-finite and argmin ignores them) — only all-members-diverged stops.
    * ``member_init``: `(key) -> theta pytree` override for problems without
      a `pinnrep` (e.g. operator families via `solve_pino_pde_ensemble`,
      which supplies the FNO init); default draws the chain init the same
      way symbolic_discretize does.
    * ``callback``: host function `(iteration, losses)` fired once per
      round-trip with the (n_ensemble,) per-member losses; a truthy return
      stops training (the `solve` callback contract, train.py:199).
      Members advance in lockstep inside one program, so per-member
      callbacks do not exist — the ensemble round-trip is the granularity.
    * ``checkpoint_path`` (+ ``checkpoint_every`` iterations, default
      10 round-trips): periodically snapshots the FULL stacked training
      state (members + optimizer + adaptive state) and auto-resumes from it
      on a rerun — same semantics as `solve(checkpoint_path=...)`.
    * ``history_cap``: `res.history` holds `(iteration, losses)` pairs and
      is decimated 2× whenever it exceeds the cap, so memory stays bounded
      on long runs while coverage stays roughly uniform.
    """
    optimizer = optimizer or optax.adam(1e-3)
    key = key if key is not None else jax.random.key(0)
    rep = getattr(prob, "pinnrep", None)
    if rep is None and member_init is None:
        raise ValueError("a problem without a pinnrep needs member_init=")
    adaloss = rep.adaloss if rep is not None else None
    lf = rep.loss_functions if rep is not None else None
    n_pde = len(lf.pde_loss_functions) if lf else 0
    n_bc = len(lf.bc_loss_functions) if lf else 0
    dtype = (rep.dtype if rep is not None else None) or jnp.float32

    if mesh is not None and n_ensemble % mesh.devices.size != 0:
        raise ValueError(f"n_ensemble={n_ensemble} must be a multiple of the "
                         f"mesh size {mesh.devices.size}")

    member_keys = jax.vmap(lambda m: jax.random.fold_in(key, m))(
        jnp.arange(n_ensemble))
    theta = jax.vmap(member_init or _member_init_fn(prob))(member_keys)
    opt_state = jax.vmap(optimizer.init)(theta)

    def ada_init(_):
        if adaloss is not None:
            return adaloss.init_state(n_pde, n_bc, dtype)
        return {"pde_weights": jnp.ones((n_pde,), dtype),
                "bc_weights": jnp.ones((n_bc,), dtype),
                "additional_weights": jnp.ones((1,), dtype)}

    ada_state = jax.vmap(ada_init)(jnp.arange(n_ensemble))
    iters = jnp.zeros((n_ensemble,), jnp.int32)

    step = make_step(prob.loss, optimizer, adaloss,
                     lf.pde_loss_functions if lf else (),
                     lf.bc_loss_functions if lf else ())

    def member_round(carry, mkey):
        def body(c, _):
            return step(c, mkey)
        carry, (losses, _) = jax.lax.scan(body, carry, None,
                                          length=inner_steps)
        return carry, losses[-1]

    vround = jax.vmap(member_round)

    carry = (theta, opt_state, ada_state, iters)

    from ..utils.checkpoint import (has_checkpoint, restore_checkpoint,
                                    save_checkpoint)
    # losses are checkpointed WITH the carry: a rerun that restores an
    # already-finished run (it >= maxiters) must still return the trained
    # per-member losses, not the inf initializer (best/best_index would
    # otherwise crash on an all-NaN argmin)
    it = 0
    losses = jnp.full((n_ensemble,), jnp.inf, dtype)
    if has_checkpoint(checkpoint_path):
        (carry, losses), _, it = restore_checkpoint(checkpoint_path,
                                                    (carry, losses))
        if verbose:
            print(f"[ensemble] resumed from {checkpoint_path} at iter {it}")
    ckpt_every = (checkpoint_every if checkpoint_every is not None
                  else 10 * inner_steps)
    last_ckpt = it

    if mesh is not None:
        carry = jax.device_put(carry, _ensemble_sharding(mesh, carry))
        member_keys = jax.device_put(
            member_keys, NamedSharding(mesh, P(mesh.axis_names[0])))
    jit_round = jax.jit(vround)

    history = []
    while it < maxiters:
        carry, losses = jit_round(carry, member_keys)
        it += inner_steps
        lnp = np.asarray(losses)
        history.append((it, lnp))
        if len(history) > history_cap:
            history = history[::2]
        best = float(np.nanmin(np.where(np.isfinite(lnp), lnp, np.nan)))
        if verbose:
            print(f"[ensemble] iter {it:6d}  best {best:.6g}  "
                  f"median {float(np.nanmedian(lnp)):.6g}")
        if checkpoint_path is not None and it - last_ckpt >= ckpt_every:
            save_checkpoint(checkpoint_path, (carry, losses), iteration=it)
            last_ckpt = it
        stop = callback is not None and callback(it, lnp)
        if stop or (abstol is not None and best < abstol):
            break
        if not np.any(np.isfinite(lnp)):
            warnings.warn(f"all {n_ensemble} ensemble members diverged at "
                          f"iteration {it}; stopping")
            break
    if checkpoint_path is not None and it > last_ckpt:
        save_checkpoint(checkpoint_path, (carry, losses), iteration=it)

    theta = carry[0]
    return EnsembleResult(members=theta, losses=losses, iterations=it,
                          history=history, pinnrep=rep)
