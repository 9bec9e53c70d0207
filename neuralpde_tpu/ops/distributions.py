"""Minimal distribution toolkit (Distributions.jl replacement).

Hand-rolled Gaussian & friends for likelihoods and priors
(reference usage: src/training_strategies.jl:119-127,
ext/bpinn/advancedHMC_MCMC.jl:229-254).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def normal_logpdf(x, mu, sigma):
    z = (x - mu) / sigma
    return -0.5 * z * z - jnp.log(sigma) - 0.5 * _LOG_2PI


def mvnormal_diag_logpdf(x, mu, sigma):
    """Σ_i log N(x_i; mu_i, sigma_i) — the reference's
    `logpdf(MvNormal(mu, Diagonal(sigma²)), x)`."""
    return jnp.sum(normal_logpdf(x, mu, sigma))


@dataclass(frozen=True)
class Normal:
    mu: float = 0.0
    sigma: float = 1.0

    def logpdf(self, x):
        return normal_logpdf(x, self.mu, self.sigma)

    @property
    def mean(self):
        return self.mu

    def sample(self, key, shape=()):
        import jax
        return self.mu + self.sigma * jax.random.normal(key, shape)


@dataclass(frozen=True)
class Uniform:
    lo: float = 0.0
    hi: float = 1.0

    def logpdf(self, x):
        inside = (x >= self.lo) & (x <= self.hi)
        return jnp.where(inside, -jnp.log(self.hi - self.lo), -jnp.inf)

    @property
    def mean(self):
        return 0.5 * (self.lo + self.hi)

    def sample(self, key, shape=()):
        import jax
        return jax.random.uniform(key, shape, minval=self.lo, maxval=self.hi)


@dataclass(frozen=True)
class LogNormal:
    mu: float = 0.0
    sigma: float = 1.0

    def logpdf(self, x):
        safe = jnp.maximum(x, 1e-300)
        return jnp.where(
            x > 0,
            normal_logpdf(jnp.log(safe), self.mu, self.sigma) - jnp.log(safe),
            -jnp.inf)

    @property
    def mean(self):
        return math.exp(self.mu + 0.5 * self.sigma**2)

    def sample(self, key, shape=()):
        import jax
        return jnp.exp(self.mu + self.sigma * jax.random.normal(key, shape))


class Particles:
    """Ensemble value summary (MonteCarloMeasurements.Particles analog,
    reference: src/NeuralPDE.jl:48): holds sample axis 0."""

    def __init__(self, samples):
        self.samples = jnp.asarray(samples)

    @property
    def mean(self):
        return jnp.mean(self.samples, axis=0)

    @property
    def std(self):
        return jnp.std(self.samples, axis=0)

    def quantile(self, q):
        return jnp.quantile(self.samples, q, axis=0)

    def __repr__(self):
        return f"Particles(n={self.samples.shape[0]}, mean={self.mean})"
