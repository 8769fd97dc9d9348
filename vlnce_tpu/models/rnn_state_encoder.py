"""Masked recurrent state encoders (GRU/LSTM) as flax modules.

Replaces habitat's build_rnn_state_encoder (used at reference
vlnce_baselines/models/cma_policy.py:10-12,126-131). Two call modes:

- single step: x [B, D], masks [B, 1] -> hidden reset where mask == 0, one
  cell update. Used by act() in eval/rollout loops.
- sequence: x [T, B, D], masks [T, B, 1] -> `lax.scan` over time with
  per-step mask resets. This replaces the reference's [T*N]-flattened batch +
  episode-boundary rebuilding (the semantics are identical: hidden state is
  zeroed wherever mask==0, i.e. at episode starts; SURVEY.md §7 hard part 1).

TPU-native design: the input projection for ALL timesteps is computed as one
large matmul before the scan (MXU-friendly); only the small recurrent matmul
lives inside the scan body.

Hidden-state layout is habitat-compatible: [B, L, H] where L =
num_recurrent_layers (doubled for LSTM: h then c per layer), so rollout
storage and checkpoints line up with reference shapes.

Parameters are stored in torch layout (w_ih: [gates*H, D], w_hh: [gates*H, H],
b_ih/b_hh: [gates*H]) so torch state_dicts convert by direct copy.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Recurrent steps are MXU-tiny; the sequence scan's cost is while-loop
# latency per iteration. Packing 8 steps per loop iteration leaves semantics
# unchanged (lax.scan handles T % unroll != 0) and trims the act step ~6%
# with the train step unchanged — the on-chip unroll-1/4/8 A/B is recorded
# in PERFORMANCE.md ("Scan unroll A/B"). Single definition — the
# instruction encoder imports this constant.
_SCAN_UNROLL = 8


def _torch_linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray = None) -> jnp.ndarray:
    y = x @ w.T
    if b is not None:
        y = y + b
    return y


class GRUCellParams(nn.Module):
    """GRU with torch gate order (r, z, n). Params are created in setup()
    (not lazily) so `step` can be called inside a lax.scan body without
    creating variables under the scan trace."""

    input_size: int
    hidden_size: int

    def setup(self):
        self.weight_ih = self.param("weight_ih", nn.initializers.lecun_normal(), (3 * self.hidden_size, self.input_size))
        self.bias_ih = self.param("bias_ih", nn.initializers.zeros, (3 * self.hidden_size,))
        self.weight_hh = self.param("weight_hh", nn.initializers.orthogonal(), (3 * self.hidden_size, self.hidden_size))
        self.bias_hh = self.param("bias_hh", nn.initializers.zeros, (3 * self.hidden_size,))

    def project_inputs(self, x: jnp.ndarray) -> jnp.ndarray:
        return _torch_linear(x, self.weight_ih, self.bias_ih)

    def step(self, xi: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        hh = _torch_linear(h, self.weight_hh, self.bias_hh)
        xi_r, xi_z, xi_n = jnp.split(xi, 3, axis=-1)
        hh_r, hh_z, hh_n = jnp.split(hh, 3, axis=-1)
        r = jax.nn.sigmoid(xi_r + hh_r)
        z = jax.nn.sigmoid(xi_z + hh_z)
        n = jnp.tanh(xi_n + r * hh_n)
        return (1.0 - z) * n + z * h


class LSTMCellParams(nn.Module):
    """LSTM with torch gate order (i, f, g, o); setup-created params (see
    GRUCellParams)."""

    input_size: int
    hidden_size: int

    def setup(self):
        self.weight_ih = self.param("weight_ih", nn.initializers.lecun_normal(), (4 * self.hidden_size, self.input_size))
        self.bias_ih = self.param("bias_ih", nn.initializers.zeros, (4 * self.hidden_size,))
        self.weight_hh = self.param("weight_hh", nn.initializers.orthogonal(), (4 * self.hidden_size, self.hidden_size))
        self.bias_hh = self.param("bias_hh", nn.initializers.zeros, (4 * self.hidden_size,))

    def project_inputs(self, x: jnp.ndarray) -> jnp.ndarray:
        return _torch_linear(x, self.weight_ih, self.bias_ih)

    def step(self, xi: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        gates = xi + _torch_linear(h, self.weight_hh, self.bias_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new


class RNNStateEncoder(nn.Module):
    input_size: int
    hidden_size: int
    rnn_type: str = "GRU"  # "GRU" | "LSTM"

    @property
    def num_recurrent_layers(self) -> int:
        """Slots in the packed [B, L, H] state (habitat convention: LSTM
        counts h and c)."""
        return 2 if self.rnn_type == "LSTM" else 1

    def setup(self):
        if self.rnn_type == "GRU":
            self.cell = GRUCellParams(self.input_size, self.hidden_size)
        elif self.rnn_type == "LSTM":
            self.cell = LSTMCellParams(self.input_size, self.hidden_size)
        else:
            raise ValueError(f"unsupported rnn_type {self.rnn_type}")

    def initial_state(self, batch_size: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((batch_size, self.num_recurrent_layers, self.hidden_size), dtype)

    def _single_step(self, x, states, masks):
        states = states * masks[:, :, None] if masks.ndim == 2 else states * masks[:, None, None]
        xi = self.cell.project_inputs(x)
        if self.rnn_type == "GRU":
            h = self.cell.step(xi, states[:, 0])
            return h, h[:, None, :]
        h, c = self.cell.step(xi, states[:, 0], states[:, 1])
        return h, jnp.stack([h, c], axis=1)

    def _sequence(self, x, states, masks):
        # one big [T*B, D] @ W matmul up front; scan carries only the
        # recurrent part
        T, B, _ = x.shape
        xi_all = self.cell.project_inputs(x.reshape(T * B, -1)).reshape(T, B, -1)
        masks = masks.reshape(T, B, 1)

        if self.rnn_type == "GRU":

            def body(h, inp):
                xi, m = inp
                h = h * m
                h = self.cell.step(xi, h)
                return h, h

            h0 = states[:, 0]
            h_final, outs = jax.lax.scan(body, h0, (xi_all, masks), unroll=_SCAN_UNROLL)
            return outs, h_final[:, None, :]

        def body(carry, inp):
            h, c = carry
            xi, m = inp
            h, c = h * m, c * m
            h, c = self.cell.step(xi, h, c)
            return (h, c), h

        (h_final, c_final), outs = jax.lax.scan(
            body, (states[:, 0], states[:, 1]), (xi_all, masks), unroll=_SCAN_UNROLL
        )
        return outs, jnp.stack([h_final, c_final], axis=1)

    def __call__(self, x: jnp.ndarray, states: jnp.ndarray, masks: jnp.ndarray):
        """x: [B, D] (step) or [T, B, D] (sequence); states: [B, L, H];
        masks: [B, 1] or [T, B, 1]. Returns (output, new_states) with output
        [B, H] or [T, B, H]."""
        if x.ndim == 2:
            return self._single_step(x, states, masks)
        return self._sequence(x, states, masks)


def build_rnn_state_encoder(input_size: int, hidden_size: int, rnn_type: str = "GRU", num_layers: int = 1) -> RNNStateEncoder:
    assert num_layers == 1, "multi-layer RNNs not used by any VLN-CE model"
    return RNNStateEncoder(input_size=input_size, hidden_size=hidden_size, rnn_type=rnn_type)
