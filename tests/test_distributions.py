"""TruncatedNormal / Categorical parity tests (SURVEY.md §4: samplers vs
analytic moments, reference models/utils.py:65-96)."""

import math

import numpy as np
import pytest
from scipy import stats

import jax
import jax.numpy as jnp

from vlnce_tpu.models.distributions import Categorical, TruncatedNormal, batched_index_select


def make_tn(loc, scale, smin=0.25, smax=2.75):
    return TruncatedNormal(jnp.asarray(loc), jnp.asarray(scale), smin, smax)


def test_truncnorm_moments_match_scipy():
    loc, scale, smin, smax = 1.0, 0.7, 0.25, 2.75
    a, b = (smin - loc) / scale, (smax - loc) / scale
    ref = stats.truncnorm(a, b, loc=loc, scale=scale)
    d = make_tn([loc], [scale], smin, smax)
    assert np.allclose(np.asarray(d.mean), ref.mean(), atol=1e-5)
    assert np.allclose(np.asarray(d.variance), ref.var(), atol=1e-5)
    assert np.allclose(np.asarray(d.entropy()), ref.entropy(), atol=1e-5)


def test_truncnorm_log_prob_matches_scipy():
    loc, scale, smin, smax = 1.3, 0.5, 0.25, 2.75
    a, b = (smin - loc) / scale, (smax - loc) / scale
    ref = stats.truncnorm(a, b, loc=loc, scale=scale)
    d = make_tn([loc], [scale], smin, smax)
    for v in [0.3, 0.9, 1.5, 2.5]:
        assert np.allclose(np.asarray(d.log_prob(jnp.asarray([v]))), ref.logpdf(v), atol=1e-5)


def test_truncnorm_inverse_cdf_sampling():
    """Inverse-CDF samples must stay in bounds and match analytic moments
    (replaces the reference's jit-hostile rejection sampling)."""
    loc, scale, smin, smax = 0.8, 1.0, 0.25, 2.75
    d = make_tn(np.full(20000, loc, np.float32), np.full(20000, scale, np.float32), smin, smax)
    s = np.asarray(d.sample(jax.random.PRNGKey(0)))
    assert s.min() >= smin and s.max() <= smax
    a, b = (smin - loc) / scale, (smax - loc) / scale
    ref = stats.truncnorm(a, b, loc=loc, scale=scale)
    assert abs(s.mean() - ref.mean()) < 0.02
    assert abs(s.var() - ref.var()) < 0.02


def test_truncnorm_mode_is_loc():
    d = make_tn([1.0, 2.0], [0.3, 0.3])
    assert np.allclose(np.asarray(d.mode()), [1.0, 2.0])


def test_categorical_interface():
    logits = jnp.asarray([[0.0, 1.0, 2.0, -1.0]] * 3)
    d = Categorical(logits)
    assert d.mode().shape == (3, 1)
    assert int(d.mode()[0, 0]) == 2
    s = d.sample(jax.random.PRNGKey(0))
    assert s.shape == (3, 1)
    lp = d.log_prob(d.mode())
    probs = np.asarray(d.probs)
    assert np.allclose(np.asarray(lp).ravel(), np.log(probs[:, 2]), atol=1e-6)
    # entropy of uniform = log(n)
    u = Categorical(jnp.zeros((2, 5)))
    assert np.allclose(np.asarray(u.entropy()), math.log(5), atol=1e-6)


def test_categorical_sampling_distribution():
    logits = jnp.log(jnp.asarray([[0.1, 0.2, 0.7]]))
    d = Categorical(jnp.broadcast_to(logits, (30000, 3)))
    s = np.asarray(d.sample(jax.random.PRNGKey(1))).ravel()
    freqs = np.bincount(s, minlength=3) / len(s)
    assert np.allclose(freqs, [0.1, 0.2, 0.7], atol=0.01)


def test_batched_index_select():
    x = jnp.arange(2 * 3 * 4).reshape(2, 3, 4).astype(jnp.float32)
    idx = jnp.asarray([2, 0])
    out = batched_index_select(x, 1, idx)
    assert out.shape == (2, 4)
    assert np.allclose(np.asarray(out[0]), np.asarray(x[0, 2]))
    assert np.allclose(np.asarray(out[1]), np.asarray(x[1, 0]))
