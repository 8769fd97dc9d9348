"""Pallas GRU-sequence kernel parity (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from vlnce_tpu.models.rnn_state_encoder import RNNStateEncoder
from vlnce_tpu.ops.pallas_rnn import gru_sequence


def test_matches_scan_with_mask_resets():
    T, B, H, D = 7, 4, 128, 32
    enc = RNNStateEncoder(input_size=D, hidden_size=H, rnn_type="GRU")
    x = np.random.RandomState(0).randn(T, B, D).astype(np.float32)
    masks = np.ones((T, B, 1), np.float32)
    masks[3] = 0.0  # episode boundary mid-sequence
    v = enc.init(jax.random.PRNGKey(0), jnp.asarray(x[0]), enc.initial_state(B), jnp.ones((B, 1)))
    params = v["params"]
    ref_out, _ = enc.apply({"params": params}, jnp.asarray(x), enc.initial_state(B), jnp.asarray(masks))

    cell = params["cell"]
    xi = jnp.einsum("tbd,gd->tbg", jnp.asarray(x), cell["weight_ih"]) + cell["bias_ih"]
    out = gru_sequence(xi, jnp.asarray(masks), jnp.zeros((B, H)), cell["weight_hh"], cell["bias_hh"], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)


def test_nonzero_initial_state():
    T, B, H = 3, 2, 128
    rng = np.random.RandomState(1)
    xi = jnp.asarray(rng.randn(T, B, 3 * H).astype(np.float32))
    w_hh = jnp.asarray(rng.randn(3 * H, H).astype(np.float32) * 0.05)
    b_hh = jnp.asarray(rng.randn(3 * H).astype(np.float32) * 0.05)
    h0 = jnp.asarray(rng.randn(B, H).astype(np.float32))
    out = gru_sequence(xi, jnp.ones((T, B, 1)), h0, w_hh, b_hh, interpret=True)
    # step 0 must actually consume h0 (mask 1): differs from zero-state run
    out_zero = gru_sequence(xi, jnp.ones((T, B, 1)), jnp.zeros_like(h0), w_hh, b_hh, interpret=True)
    assert float(jnp.max(jnp.abs(out[0] - out_zero[0]))) > 1e-3
