"""Hamiltonian Monte Carlo with Stan-style windowed warmup, pure JAX.

Replaces AdvancedHMC.jl (reference: ext/bpinn/advancedHMC_MCMC.jl:498-555):
the whole chain — leapfrog integration, Metropolis correction, dual-averaging
step-size adaptation, Welford diagonal mass-matrix estimation — runs inside a
single `lax.scan`, so sampling is one XLA program.  Multiple chains are
`vmap`-ped over devices instead of the reference's `Threads.@threads`
(ext/bpinn/advancedHMC_MCMC.jl:507-540).

Kernels:
  * "hmc"   — fixed n_leapfrog steps (the reference default, n_leapfrog=30)
  * "hmcda" — trajectory length λ: n_steps = max(1, round(λ/ε)) per draw
  * "nuts"  — multinomial doubling with U-turn termination (iterative)
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class DualAveragingState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    h_sum: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray


def _da_init(eps0):
    return DualAveragingState(
        log_eps=jnp.log(eps0), log_eps_avg=jnp.log(eps0),
        h_sum=jnp.zeros(()), mu=jnp.log(10.0 * eps0), count=jnp.zeros(()))


def _da_update(state: DualAveragingState, accept_prob, target):
    gamma, t0, kappa = 0.05, 10.0, 0.75
    count = state.count + 1.0
    h_sum = state.h_sum + (target - accept_prob)
    log_eps = state.mu - jnp.sqrt(count) / gamma * h_sum / (count + t0)
    eta = count ** (-kappa)
    log_eps_avg = eta * log_eps + (1.0 - eta) * state.log_eps_avg
    return DualAveragingState(log_eps, log_eps_avg, h_sum, state.mu, count)


def _leapfrog(grad_fn, q, p, eps, inv_mass, n_steps):
    def body(carry, _):
        q, p = carry
        p = p + 0.5 * eps * carry_grad(q)
        q = q + eps * inv_mass * p
        p = p + 0.5 * eps * carry_grad(q)
        return (q, p), None

    carry_grad = grad_fn
    (q, p), _ = jax.lax.scan(body, (q, p), None, length=n_steps)
    return q, p


def find_good_stepsize(logdensity, q0, key, init_eps=1.0, max_iters=60):
    """AdvancedHMC-style heuristic: double/halve ε until the one-step
    acceptance crosses 0.5 (host-side, a few evaluations)."""
    value_and_grad = jax.jit(jax.value_and_grad(logdensity))
    grad = jax.jit(jax.grad(logdensity))
    v0, _ = value_and_grad(q0)
    p0 = jax.random.normal(key, q0.shape)

    def h(q, p):
        v, _ = value_and_grad(q)
        return float(v - 0.5 * jnp.sum(p * p))

    def one_step(eps):
        q, p = q0, p0
        g = grad(q)
        p = p + 0.5 * eps * g
        q = q + eps * p
        p = p + 0.5 * eps * grad(q)
        return h(q, p)

    h0 = h(q0, p0)
    eps = init_eps
    log_ratio = one_step(eps) - h0
    direction = 1.0 if log_ratio > math.log(0.5) else -1.0
    for _ in range(max_iters):
        eps = eps * (2.0**direction)
        if not np.isfinite(eps) or eps < 1e-10 or eps > 1e7:
            eps = min(max(eps, 1e-10), 1e7)
            break
        log_ratio = one_step(eps) - h0
        if not np.isfinite(log_ratio):
            eps = eps / (2.0**direction)
            break
        if (direction == 1.0) != (log_ratio > math.log(0.5)):
            break
    return float(eps)


def find_good_stepsize_traced(logdensity, q0, key, init_eps: float = 1.0,
                              max_iters: int = 60):
    """Pure-JAX version of `find_good_stepsize` — vmappable over chains, so
    warmup initialization for n chains is one XLA program instead of n
    serial host searches (the round-1 warmup bottleneck)."""
    grad = jax.grad(logdensity)
    p0 = jax.random.normal(key, q0.shape)
    h0 = logdensity(q0) - 0.5 * jnp.sum(p0 * p0)
    log_half = jnp.log(0.5)

    def h_after(eps):
        p = p0 + 0.5 * eps * grad(q0)
        q = q0 + eps * p
        p = p + 0.5 * eps * grad(q)
        return logdensity(q) - 0.5 * jnp.sum(p * p)

    eps0 = jnp.asarray(init_eps, dtype=q0.dtype)
    r0 = h_after(eps0) - h0
    direction = jnp.where(r0 > log_half, 1.0, -1.0)

    def cond(c):
        _, done, it = c
        return (~done) & (it < max_iters)

    def body(c):
        eps, _, it = c
        eps_new = eps * (2.0 ** direction)
        out_of_range = ((eps_new < 1e-10) | (eps_new > 1e7)
                        | ~jnp.isfinite(eps_new))
        r = h_after(eps_new) - h0
        nonfinite = ~jnp.isfinite(r)
        crossed = (direction == 1.0) != (r > log_half)
        # host-version semantics: revert on non-finite ratio, clamp on
        # out-of-range, stop on acceptance crossing 0.5
        eps_out = jnp.where(nonfinite, eps,
                            jnp.clip(eps_new, 1e-10, 1e7))
        return (eps_out, out_of_range | nonfinite | crossed, it + 1)

    eps_f, _, _ = jax.lax.while_loop(
        cond, body, (eps0, jnp.asarray(False), jnp.asarray(0, jnp.int32)))
    return eps_f


@dataclass
class SampleResult:
    samples: jnp.ndarray      # (draws, dim)
    accept_prob: jnp.ndarray  # (draws,)
    step_size: float
    inv_mass: jnp.ndarray
    logdensities: jnp.ndarray

    @property
    def stats(self):
        return {"accept_prob": self.accept_prob,
                "step_size": self.step_size,
                "logdensity": self.logdensities}

    def diagnostics(self, discard: int | None = None) -> dict:
        """ESS / split-R̂ / mean / std per parameter (the MCMCChains-summary
        analog; see `bayesian.diagnostics`).  ``discard`` drops warmup draws
        first (default: the 2/3 warmup used by `sample`)."""
        from .diagnostics import summarize

        n = self.samples.shape[0]
        discard = (2 * n) // 3 if discard is None else discard
        return summarize(np.asarray(self.samples)[discard:])


def _hmc_transition(logdensity, grad_fn, kernel, n_leapfrog, lam, max_depth):
    """One MH transition; n_steps depends on kernel."""
    value_fn = logdensity

    def transition(key, q, eps, inv_mass):
        kp, ka, kn = jax.random.split(key, 3)
        p = jax.random.normal(kp, q.shape) / jnp.sqrt(inv_mass)
        v0 = value_fn(q)
        h0 = v0 - 0.5 * jnp.sum(p * p * inv_mass)
        if kernel == "hmcda":
            n_steps = jnp.minimum(
                jnp.maximum(1, jnp.round(lam / eps).astype(jnp.int32)), 4096)

            def cond(carry):
                i, _, _ = carry
                return i < n_steps

            def body(carry):
                i, q_, p_ = carry
                p_ = p_ + 0.5 * eps * grad_fn(q_)
                q_ = q_ + eps * inv_mass * p_
                p_ = p_ + 0.5 * eps * grad_fn(q_)
                return i + 1, q_, p_

            _, q_new, p_new = jax.lax.while_loop(
                cond, body, (jnp.asarray(0, jnp.int32), q, p))
        else:
            q_new, p_new = _leapfrog(grad_fn, q, p, eps, inv_mass, n_leapfrog)
        v_new = value_fn(q_new)
        h_new = v_new - 0.5 * jnp.sum(p_new * p_new * inv_mass)
        log_ratio = h_new - h0
        accept_prob = jnp.exp(jnp.minimum(0.0, log_ratio))
        accept_prob = jnp.where(jnp.isnan(accept_prob), 0.0, accept_prob)
        accept = jax.random.uniform(ka, ()) < accept_prob
        q_out = jnp.where(accept, q_new, q)
        v_out = jnp.where(accept, v_new, v0)
        return q_out, v_out, accept_prob

    return transition


def sample(logdensity: Callable, q0, key, draw_samples: int = 1000, *,
           kernel: str = "hmc", n_leapfrog: int = 30, target_accept: float = 0.8,
           lam: float = 1.0, max_depth: int = 10, n_adapt: int | None = None,
           init_step_size: float | None = None, progress: bool = False):
    """Draw `draw_samples` positions.  Warmup (first n_adapt ≈ 2/3, matching
    the reference's guidance) adapts step size by dual averaging and a
    diagonal mass matrix by Welford; all draws are returned (AdvancedHMC
    semantics — the caller slices off the ensemble tail)."""
    if kernel == "nuts":
        from .nuts import nuts_sample
        return nuts_sample(logdensity, q0, key, draw_samples,
                           target_accept=target_accept, max_depth=max_depth,
                           n_adapt=n_adapt, init_step_size=init_step_size)

    q0 = jnp.asarray(q0)
    if init_step_size is None:
        key, sub = jax.random.split(key)
        init_step_size = find_good_stepsize(logdensity, q0, sub)
    samples, accept, lvals, eps_f, inv_mass_f = _sample_arrays(
        logdensity, q0, key, draw_samples, kernel=kernel,
        n_leapfrog=n_leapfrog, target_accept=target_accept, lam=lam,
        max_depth=max_depth, n_adapt=n_adapt,
        init_step_size=init_step_size, return_state=True)
    return SampleResult(samples=samples, accept_prob=accept,
                        step_size=float(eps_f), inv_mass=inv_mass_f,
                        logdensities=lvals)


def _sample_arrays(logdensity, q0, key, draw_samples, *, kernel="hmc",
                   n_leapfrog=30, target_accept=0.8, lam=1.0, max_depth=10,
                   n_adapt=None, init_step_size=1.0, return_state=False,
                   progress=False):
    """Array-only core of `sample` (vmappable across chains)."""
    q0 = jnp.asarray(q0)
    dim = q0.shape[0]
    n_adapt = n_adapt if n_adapt is not None else (2 * draw_samples) // 3
    grad_fn = jax.grad(logdensity)

    transition = _hmc_transition(logdensity, grad_fn, kernel, n_leapfrog,
                                 lam, max_depth)
    # Stan-ish window schedule over warmup
    w1 = int(0.15 * n_adapt)          # step size only
    w2 = int(0.90 * n_adapt)          # + Welford accumulation; mass set at w2

    def body(carry, inp):
        it, key = inp
        q, da, inv_mass, welford = carry
        mean, m2, cnt = welford
        eps = jnp.exp(jnp.where(it < n_adapt, da.log_eps, da.log_eps_avg))
        q_new, v_new, accept_prob = transition(key, q, eps, inv_mass)
        da = jax.lax.cond(it < n_adapt,
                          lambda d: _da_update(d, accept_prob, target_accept),
                          lambda d: d, da)
        in_window = (it >= w1) & (it < w2)
        cnt2 = jnp.where(in_window, cnt + 1.0, cnt)
        delta = q_new - mean
        mean2 = jnp.where(in_window, mean + delta / jnp.maximum(cnt2, 1.0), mean)
        m22 = jnp.where(in_window, m2 + delta * (q_new - mean2), m2)

        def set_mass(args):
            inv_mass, da, m22, cnt2 = args
            var = m22 / jnp.maximum(cnt2 - 1.0, 1.0)
            var = jnp.where(var <= 1e-10, 1.0, var)
            # reset dual averaging around the current step size
            da2 = _da_init(jnp.exp(da.log_eps))
            return var, da2

        inv_mass, da = jax.lax.cond(
            it == w2, set_mass, lambda a: (a[0], a[1]),
            (inv_mass, da, m22, cnt2))
        return ((q_new, da, inv_mass, (mean2, m22, cnt2)),
                (q_new, accept_prob, v_new))

    keys = jax.random.split(key, draw_samples)
    da0 = _da_init(jnp.asarray(init_step_size))
    welford0 = (jnp.zeros(dim), jnp.zeros(dim), jnp.zeros(()))
    carry0 = (q0, da0, jnp.ones(dim), welford0)
    (qf, daf, inv_mass_f, _), (samples, accept, lvals) = jax.lax.scan(
        body, carry0, (jnp.arange(draw_samples), keys))
    if return_state:
        return samples, accept, lvals, jnp.exp(daf.log_eps_avg), inv_mass_f
    return samples, accept, lvals


def sample_chains(logdensity, q0s, key, draw_samples: int = 1000, *,
                  mesh=None, chain_axis: str = "data", **kw):
    """Independent chains — stepsize search, warmup, and sampling for ALL
    kernels (HMC/HMCDA/NUTS; NUTS tree-building while_loops batch legally
    under vmap) — compiled into ONE XLA program.  The TPU-native replacement
    for the reference's Threads.@threads over chains
    (ext/bpinn/advancedHMC_MCMC.jl:507-540).

    Pass ``mesh`` (a jax.sharding.Mesh) to shard the leading chain axis over
    ``chain_axis`` so chains run on separate devices; results are bit-exact
    vs the unsharded program (tests/test_parallel.py)."""
    kernel = kw.get("kernel", "hmc")
    n = q0s.shape[0]
    keys = jax.random.split(key, n)

    if kernel == "nuts":
        from .nuts import _nuts_arrays

        kw2 = {k: v for k, v in kw.items()
               if k not in ("kernel", "n_leapfrog", "lam")}

        def one(q0, k):
            k1, k2 = jax.random.split(k)
            eps = find_good_stepsize_traced(logdensity, q0, k1)
            return _nuts_arrays(logdensity, q0, k2, draw_samples,
                                init_step_size=eps, **kw2)
    else:
        def one(q0, k):
            k1, k2 = jax.random.split(k)
            eps = find_good_stepsize_traced(logdensity, q0, k1)
            return _sample_arrays(logdensity, q0, k2, draw_samples,
                                  init_step_size=eps, **kw)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        q0s = jax.device_put(q0s, NamedSharding(mesh, P(chain_axis, None)))
        keys = jax.device_put(keys, NamedSharding(mesh, P(chain_axis)))

    samples, _, _ = jax.jit(jax.vmap(one))(q0s, keys)
    return samples
