"""Action distributions (pure JAX, jit-safe).

Parity targets: reference vlnce_baselines/models/utils.py:24-152 (two-sided
TruncatedNormal with analytic mean/variance/entropy and normalized-density
log_prob) and :269-289 (CustomFixedCategorical). The reference samples the
truncated normal by rejection (jit-hostile, reference models/utils.py:
106-124); here sampling is inverse-CDF — exact, one shot, identical
distribution (SURVEY.md §7 hard part 4). All functions are traceable and
differentiable.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2 * math.pi)
_HALF_LOG_2PIE = 0.5 * math.log(2 * math.pi * math.e)


def _std_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def _std_pdf(x):
    return jnp.exp(-0.5 * x * x) / math.sqrt(2 * math.pi)


def _std_icdf(u):
    return math.sqrt(2.0) * jax.lax.erf_inv(2.0 * u - 1.0)


class Categorical:
    """Categorical over logits with the CustomFixedCategorical interface:
    sample/mode return [..., 1]; log_prob takes [..., 1] and returns
    [..., 1]."""

    def __init__(self, logits: jnp.ndarray):
        self.logits = logits - jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)

    @property
    def probs(self) -> jnp.ndarray:
        return jnp.exp(self.logits)

    def sample(self, rng) -> jnp.ndarray:
        return jax.random.categorical(rng, self.logits, axis=-1)[..., None]

    def mode(self) -> jnp.ndarray:
        return jnp.argmax(self.logits, axis=-1)[..., None]

    def log_prob(self, actions: jnp.ndarray) -> jnp.ndarray:
        a = actions.squeeze(-1).astype(jnp.int32)
        return jnp.take_along_axis(self.logits, a[..., None], axis=-1)

    def entropy(self) -> jnp.ndarray:
        p = self.probs
        return -jnp.sum(p * self.logits, axis=-1)


# alias matching the reference naming
CustomFixedCategorical = Categorical


class TruncatedNormal:
    """Two-sided truncated normal parameterized by the untruncated (loc,
    scale). Matches the reference's analytic moments and normalized-density
    log_prob exactly; samples by inverse CDF."""

    def __init__(self, loc: jnp.ndarray, scale: jnp.ndarray, smin: float, smax: float):
        assert smin < smax and math.isfinite(smin) and math.isfinite(smax)
        self._loc = loc
        self._scale = jnp.asarray(scale)
        self._smin = smin
        self._smax = smax
        self._alpha = (smin - loc) / self._scale
        self._beta = (smax - loc) / self._scale
        self._alpha_cdf = _std_cdf(self._alpha)
        self._beta_cdf = _std_cdf(self._beta)
        self._Z = self._beta_cdf - self._alpha_cdf  # truncated mass

    @property
    def mean(self) -> jnp.ndarray:
        return self._loc - self._scale * (_std_pdf(self._beta) - _std_pdf(self._alpha)) / self._Z

    @property
    def variance(self) -> jnp.ndarray:
        a_pdf, b_pdf = _std_pdf(self._alpha), _std_pdf(self._beta)
        t1 = (self._beta * b_pdf - self._alpha * a_pdf) / self._Z
        t2 = ((b_pdf - a_pdf) / self._Z) ** 2
        return (self._scale**2) * (1.0 - t1 - t2)

    def mode(self) -> jnp.ndarray:
        return self._loc

    def sample(self, rng) -> jnp.ndarray:
        u = jax.random.uniform(
            rng, jnp.shape(self._loc), minval=jnp.zeros_like(self._alpha_cdf) + self._alpha_cdf,
            maxval=jnp.zeros_like(self._beta_cdf) + self._beta_cdf,
        )
        x = self._loc + self._scale * _std_icdf(u)
        return jnp.clip(x, self._smin, self._smax)

    def log_prob(self, value: jnp.ndarray) -> jnp.ndarray:
        z = (value - self._loc) / self._scale
        log_normal_density = -0.5 * z * z - jnp.log(self._scale) - _LOG_SQRT_2PI
        return log_normal_density - jnp.log(self._Z)

    def entropy(self) -> jnp.ndarray:
        a_pdf, b_pdf = _std_pdf(self._alpha), _std_pdf(self._beta)
        ent = _HALF_LOG_2PIE + jnp.log(self._scale * self._Z)
        ent = ent + (self._alpha * a_pdf - self._beta * b_pdf) / (2.0 * self._Z)
        return ent


def temperature_tanh(x: jnp.ndarray, temperature: float = 1.0) -> jnp.ndarray:
    """reference vlnce_baselines/models/utils.py:12-21."""
    assert temperature != 0.0
    return jnp.tanh(x / temperature)


def batched_index_select(x: jnp.ndarray, dim: int, index: jnp.ndarray) -> jnp.ndarray:
    """Per-row index_select along `dim`, squeezing the selected dim
    (reference vlnce_baselines/models/utils.py:292-317). index: [B]."""
    shape = list(x.shape)
    shape[dim] = 1
    idx = index.reshape([x.shape[0]] + [1] * (x.ndim - 1)).astype(jnp.int32)
    idx = jnp.broadcast_to(idx, shape)
    return jnp.squeeze(jnp.take_along_axis(x, idx, axis=dim), axis=dim)
