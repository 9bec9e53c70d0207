"""No-U-Turn Sampler: iterative multinomial doubling, pure JAX.

Implements the NUTS variant used by Stan/AdvancedHMC (multinomial sampling
over the trajectory, generalized-U-turn termination), replacing the
reference's AdvancedHMC NUTS kernel (ext/bpinn/advancedHMC_MCMC.jl:265-274).
Subtrees are built ITERATIVELY inside `lax.scan` with the checkpoint bit
trick for within-subtree U-turn checks (the leaf->checkpoint index map of
Phan et al., NumPyro), so the graph stays polynomial in `max_depth` — no
2^depth unrolling.

Energy convention: H(q, p) = -logdensity(q) + 0.5 pᵀ M⁻¹ p; multinomial
leaf weight log w = -H.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .hmc import SampleResult, _da_init, _da_update, find_good_stepsize


class _Leaf(NamedTuple):
    q: jnp.ndarray
    p: jnp.ndarray
    grad: jnp.ndarray
    logdens: jnp.ndarray


def _is_turning(p_left, p_right, p_sum, inv_mass):
    v = p_sum * inv_mass
    return (jnp.dot(v, p_left) <= 0.0) | (jnp.dot(v, p_right) <= 0.0)


def _leaf_to_ckpt_idxs(n):
    """(idx_min, idx_max) of checkpoints to compare leaf n against."""
    def count_high(nc):
        x, c = nc
        return (x >> 1, c + (x & 1))

    _, idx_max = jax.lax.while_loop(lambda nc: nc[0] > 0, count_high,
                                    (n >> 1, 0))

    def count_low(nc):
        x, c = nc
        return (x >> 1, c + 1)

    _, num_subtrees = jax.lax.while_loop(lambda nc: (nc[0] & 1) != 0,
                                         count_low, (n, 0))
    idx_min = idx_max - num_subtrees + 1
    return idx_min, idx_max


def nuts_sample(logdensity, q0, key, draw_samples: int = 1000, *,
                target_accept: float = 0.8, max_depth: int = 10,
                n_adapt: int | None = None, init_step_size: float | None = None,
                delta_max: float = 1000.0):
    q0 = jnp.asarray(q0)
    if init_step_size is None:
        key, sub = jax.random.split(key)
        init_step_size = find_good_stepsize(logdensity, q0, sub)
    samples, accept, lvals, eps_f, inv_mass_f = _nuts_arrays(
        logdensity, q0, key, draw_samples, target_accept=target_accept,
        max_depth=max_depth, n_adapt=n_adapt, init_step_size=init_step_size,
        delta_max=delta_max, return_state=True)
    return SampleResult(samples=samples, accept_prob=accept,
                        step_size=float(eps_f), inv_mass=inv_mass_f,
                        logdensities=lvals)


def _nuts_arrays(logdensity, q0, key, draw_samples: int = 1000, *,
                 target_accept: float = 0.8, max_depth: int = 10,
                 n_adapt: int | None = None, init_step_size=1.0,
                 delta_max: float = 1000.0, return_state: bool = False):
    """Array-only NUTS core (vmappable across chains — tree-building
    while_loops batch legally under vmap, so n chains trace into one XLA
    program; cf. sample_chains)."""
    q0 = jnp.asarray(q0)
    dim = q0.shape[0]
    n_adapt = n_adapt if n_adapt is not None else (2 * draw_samples) // 3
    value_and_grad = jax.value_and_grad(logdensity)

    def leapfrog(leaf: _Leaf, eps, inv_mass, direction):
        e = eps * direction
        p = leaf.p + 0.5 * e * leaf.grad
        q = leaf.q + e * inv_mass * p
        v, g = value_and_grad(q)
        p = p + 0.5 * e * g
        return _Leaf(q, p, g, v)

    def neg_energy(leaf: _Leaf, inv_mass):
        return leaf.logdens - 0.5 * jnp.sum(leaf.p * leaf.p * inv_mass)

    def build_subtree(key, edge: _Leaf, depth, eps, inv_mass, direction, h0):
        """Iteratively extend `edge` by 2^depth leapfrog steps.

        Returns (far_edge, proposal_q, logw_subtree, p_sum, turning,
        diverging, sum_accept, n_leaves)."""
        class Carry(NamedTuple):
            leaf_idx: jnp.ndarray
            key: jnp.ndarray
            leaf: _Leaf
            prop_q: jnp.ndarray
            logw: jnp.ndarray
            p_sum: jnp.ndarray
            turning: jnp.ndarray
            diverging: jnp.ndarray
            sum_acc: jnp.ndarray
            p_ckpts: jnp.ndarray
            psum_ckpts: jnp.ndarray

        n_leaves = 2**depth  # traced

        def cond(c: Carry):
            return (c.leaf_idx < n_leaves) & ~c.turning & ~c.diverging

        def step(c: Carry):
            leaf_idx = c.leaf_idx
            key, sub = jax.random.split(c.key)
            new = leapfrog(c.leaf, eps, inv_mass, direction)
            ne = neg_energy(new, inv_mass)
            diverging = (h0 - ne) > delta_max
            logw_new = ne - h0
            logw_tot = jnp.logaddexp(c.logw, logw_new)
            take = jnp.log(jax.random.uniform(sub, ())) < (logw_new - logw_tot)
            prop_q = jnp.where(take, new.q, c.prop_q)
            p_sum = c.p_sum + new.p
            acc = jnp.minimum(1.0, jnp.exp(logw_new))
            acc = jnp.where(jnp.isnan(acc), 0.0, acc)
            idx_min, idx_max = _leaf_to_ckpt_idxs(leaf_idx)
            is_even = (leaf_idx & 1) == 0

            p_ckpts = jnp.where(
                is_even, c.p_ckpts.at[idx_max].set(new.p), c.p_ckpts)
            psum_ckpts = jnp.where(
                is_even, c.psum_ckpts.at[idx_max].set(p_sum), c.psum_ckpts)

            def check_turn(_):
                def scan_check(turn, i):
                    inside = (i >= idx_min) & (i <= idx_max)
                    seg_psum = p_sum - psum_ckpts[i] + p_ckpts[i]
                    t = _is_turning(p_ckpts[i], new.p, seg_psum, inv_mass)
                    return turn | (inside & t), None

                turn, _ = jax.lax.scan(scan_check, jnp.asarray(False),
                                       jnp.arange(max_depth))
                return turn

            turning = jax.lax.cond(is_even, lambda _: jnp.asarray(False),
                                   check_turn, None)
            return Carry(leaf_idx + 1, key, new, prop_q, logw_tot, p_sum,
                         turning, diverging, c.sum_acc + acc,
                         p_ckpts, psum_ckpts)

        init = Carry(
            leaf_idx=jnp.asarray(0), key=key, leaf=edge, prop_q=edge.q,
            logw=-jnp.inf, p_sum=jnp.zeros_like(edge.p),
            turning=jnp.asarray(False), diverging=jnp.asarray(False),
            sum_acc=jnp.zeros(()),
            p_ckpts=jnp.zeros((max_depth, dim)),
            psum_ckpts=jnp.zeros((max_depth, dim)))
        out = jax.lax.while_loop(cond, step, init)
        return (out.leaf, out.prop_q, out.logw, out.p_sum, out.turning,
                out.diverging, out.sum_acc, n_leaves)

    def transition(key, q, eps, inv_mass):
        kp, kd = jax.random.split(key)
        p = jax.random.normal(kp, q.shape) / jnp.sqrt(inv_mass)
        v, g = value_and_grad(q)
        start = _Leaf(q, p, g, v)
        h0 = neg_energy(start, inv_mass)

        class TreeState(NamedTuple):
            key: jnp.ndarray
            left: _Leaf
            right: _Leaf
            prop_q: jnp.ndarray
            logw: jnp.ndarray
            p_sum: jnp.ndarray
            depth: jnp.ndarray
            turning: jnp.ndarray
            diverging: jnp.ndarray
            sum_acc: jnp.ndarray
            n_steps: jnp.ndarray

        def cond(ts: TreeState):
            return (~ts.turning & ~ts.diverging & (ts.depth < max_depth))

        def grow(ts: TreeState):
            key, kdir, ksub, kmerge = jax.random.split(ts.key, 4)
            go_right = jax.random.uniform(kdir, ()) < 0.5
            edge = jax.tree.map(
                lambda l, r: jnp.where(go_right, r, l), ts.left, ts.right)
            direction = jnp.where(go_right, 1.0, -1.0)
            (far, prop_q_new, logw_new, p_sum_new, turning_new, diverging_new,
             sum_acc_new, n_new) = build_subtree(
                ksub, edge, ts.depth, eps, inv_mass, direction, h0)
            left = jax.tree.map(
                lambda cur, f: jnp.where(go_right, cur, f), ts.left, far)
            right = jax.tree.map(
                lambda cur, f: jnp.where(go_right, f, cur), ts.right, far)
            valid = ~turning_new & ~diverging_new
            # biased progressive sampling: P(take new) = w_new / w_old
            take = (jnp.log(jax.random.uniform(kmerge, ())) <
                    (logw_new - ts.logw)) & valid
            prop_q = jnp.where(take, prop_q_new, ts.prop_q)
            logw = jnp.logaddexp(ts.logw, jnp.where(valid, logw_new, -jnp.inf))
            p_sum = ts.p_sum + jnp.where(valid, p_sum_new, 0.0)
            turning_total = _is_turning(left.p, right.p, p_sum, inv_mass)
            return TreeState(
                key=key, left=left, right=right, prop_q=prop_q, logw=logw,
                p_sum=p_sum, depth=ts.depth + 1,
                turning=turning_new | (valid & turning_total),
                diverging=diverging_new,
                sum_acc=ts.sum_acc + sum_acc_new,
                n_steps=ts.n_steps + n_new)

        ts0 = TreeState(
            key=kd, left=start, right=start, prop_q=q, logw=jnp.zeros(()),
            p_sum=p, depth=jnp.asarray(0), turning=jnp.asarray(False),
            diverging=jnp.asarray(False), sum_acc=jnp.zeros(()),
            n_steps=jnp.asarray(0))
        ts = jax.lax.while_loop(cond, grow, ts0)
        accept_prob = ts.sum_acc / jnp.maximum(ts.n_steps, 1)
        v_out = logdensity(ts.prop_q)
        return ts.prop_q, v_out, accept_prob

    # warmup schedule identical to hmc.sample
    w1 = int(0.15 * n_adapt)
    w2 = int(0.90 * n_adapt)

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
            return var, _da_init(jnp.exp(da.log_eps))

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
