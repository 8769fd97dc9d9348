"""Packed-sequence parity of the instruction encoder vs torch
(reference instruction_encoder.py:80-94 uses pack_padded_sequence)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vlnce_tpu.models.encoders.instruction_encoder import InstructionEncoder


def _set_lstm_weights(params, lstm, direction_names=("rnn_fwd",)):
    params = jax.tree_util.tree_map(lambda x: x, dict(params))  # shallow copy
    suffixes = ["", "_reverse"]
    for name, suffix in zip(direction_names, suffixes):
        params[name] = {
            "cell": {
                "weight_ih": jnp.asarray(getattr(lstm, f"weight_ih_l0{suffix}").detach().numpy()),
                "weight_hh": jnp.asarray(getattr(lstm, f"weight_hh_l0{suffix}").detach().numpy()),
                "bias_ih": jnp.asarray(getattr(lstm, f"bias_ih_l0{suffix}").detach().numpy()),
                "bias_hh": jnp.asarray(getattr(lstm, f"bias_hh_l0{suffix}").detach().numpy()),
            }
        }
    return params


@pytest.mark.parametrize("bidirectional", [False, True])
def test_matches_torch_packed_lstm(bidirectional):
    torch.manual_seed(0)
    B, T, E, H, V = 3, 10, 6, 8, 50
    lengths = [10, 7, 4]

    enc = InstructionEncoder(
        vocab_size=V, embedding_size=E, hidden_size=H, rnn_type="LSTM",
        final_state_only=not bidirectional, bidirectional=bidirectional,
        use_pretrained_embeddings=False,
    )
    rng = np.random.RandomState(0)
    tokens = np.zeros((B, T), np.int32)
    for b, L in enumerate(lengths):
        tokens[b, :L] = rng.randint(1, V, size=L)

    variables = enc.init(jax.random.PRNGKey(0), {"instruction": jnp.asarray(tokens)})
    params = dict(variables["params"])

    lstm = torch.nn.LSTM(E, H, bidirectional=bidirectional, batch_first=False)
    names = ("rnn_fwd", "rnn_bwd") if bidirectional else ("rnn_fwd",)
    params = _set_lstm_weights(params, lstm, names)

    emb_table = np.asarray(params["embedding"])
    emb = emb_table[tokens]  # [B, T, E]

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(emb.astype(np.float32)), lengths, batch_first=True, enforce_sorted=False
    )
    with torch.no_grad():
        out_t, (h_t, _) = lstm(packed)

    out_j = enc.apply({"params": params}, {"instruction": jnp.asarray(tokens)})

    if bidirectional:
        # full outputs [B, 2H, T] vs padded torch outputs
        padded, _ = torch.nn.utils.rnn.pad_packed_sequence(out_t, batch_first=True, total_length=T)
        np.testing.assert_allclose(np.asarray(out_j), padded.numpy().transpose(0, 2, 1), atol=1e-5)
    else:
        # final state [B, H]
        np.testing.assert_allclose(np.asarray(out_j), h_t.squeeze(0).numpy(), atol=1e-5)


def test_rxr_bert_feature_path():
    enc = InstructionEncoder(
        embedding_size=16, hidden_size=8, rnn_type="LSTM", final_state_only=True,
        bidirectional=False, sensor_uuid="rxr_instruction",
    )
    feats = np.zeros((2, 12, 16), np.float32)
    feats[0, :5] = np.random.RandomState(0).randn(5, 16)
    feats[1, :9] = np.random.RandomState(1).randn(9, 16)
    out = enc.init_with_output(jax.random.PRNGKey(0), {"rxr_instruction": jnp.asarray(feats)})[0]
    assert out.shape == (2, 8)
    assert np.all(np.isfinite(np.asarray(out)))
