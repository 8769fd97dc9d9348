"""Parity of the JAX RNN cells / masked scans against torch reference
semantics (SURVEY.md §4: masked-RNN reset is hard part #1)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vlnce_tpu.models.rnn_state_encoder import RNNStateEncoder


def _copy_torch_gru(params, cell):
    params = dict(params)
    params["cell"] = {
        "weight_ih": jnp.asarray(cell.weight_ih_l0.detach().numpy()),
        "weight_hh": jnp.asarray(cell.weight_hh_l0.detach().numpy()),
        "bias_ih": jnp.asarray((cell.bias_ih_l0).detach().numpy()),
        "bias_hh": jnp.asarray(cell.bias_hh_l0.detach().numpy()),
    }
    return params


@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM"])
def test_cell_matches_torch(rnn_type):
    torch.manual_seed(0)
    D, H, B, T = 12, 16, 3, 7
    torch_rnn = (torch.nn.GRU if rnn_type == "GRU" else torch.nn.LSTM)(D, H, num_layers=1)
    enc = RNNStateEncoder(input_size=D, hidden_size=H, rnn_type=rnn_type)
    x = np.random.RandomState(1).randn(T, B, D).astype(np.float32)

    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x[0]), enc.initial_state(B), jnp.ones((B, 1)))
    params = _copy_torch_gru(variables["params"], torch_rnn)

    # torch baseline: full unmasked sequence
    with torch.no_grad():
        out_t, _ = torch_rnn(torch.from_numpy(x))
    out_j, _ = enc.apply({"params": params}, jnp.asarray(x), enc.initial_state(B), jnp.ones((T, B, 1)))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)


@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM"])
def test_mask_reset_equals_restart(rnn_type):
    """A mask==0 at step k must make steps k.. behave as a fresh episode."""
    D, H, B, T, k = 8, 8, 2, 10, 4
    enc = RNNStateEncoder(input_size=D, hidden_size=H, rnn_type=rnn_type)
    x = np.random.RandomState(2).randn(T, B, D).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x[0]), enc.initial_state(B), jnp.ones((B, 1)))
    params = variables["params"]

    masks = np.ones((T, B, 1), np.float32)
    masks[k] = 0.0
    out_masked, _ = enc.apply({"params": params}, jnp.asarray(x), enc.initial_state(B), jnp.asarray(masks))

    out_fresh, _ = enc.apply(
        {"params": params}, jnp.asarray(x[k:]), enc.initial_state(B), jnp.ones((T - k, B, 1))
    )
    np.testing.assert_allclose(np.asarray(out_masked)[k:], np.asarray(out_fresh), atol=1e-6)


@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM"])
def test_step_equals_scan(rnn_type):
    """Single-step rollout must match the sequence scan exactly."""
    D, H, B, T = 8, 8, 2, 6
    enc = RNNStateEncoder(input_size=D, hidden_size=H, rnn_type=rnn_type)
    x = np.random.RandomState(3).randn(T, B, D).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x[0]), enc.initial_state(B), jnp.ones((B, 1)))
    params = variables["params"]

    seq_out, seq_state = enc.apply({"params": params}, jnp.asarray(x), enc.initial_state(B), jnp.ones((T, B, 1)))

    state = enc.initial_state(B)
    outs = []
    for t in range(T):
        o, state = enc.apply({"params": params}, jnp.asarray(x[t]), state, jnp.ones((B, 1)))
        outs.append(np.asarray(o))
    np.testing.assert_allclose(np.stack(outs), np.asarray(seq_out), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state), np.asarray(seq_state), atol=1e-6)
