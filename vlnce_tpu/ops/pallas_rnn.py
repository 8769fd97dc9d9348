"""Pallas fused masked-GRU sequence kernel.

The IL training path scans a GRU over T timesteps with episode-boundary
resets (masks). Under a plain XLA scan the recurrent weight matrix
w_hh [3H, H] (~3 MB at H=512) is liable to be re-fetched from HBM every
iteration; this kernel pins the weights AND the hidden state in VMEM for the
whole sequence and streams only the precomputed input projections
xi [T, B, 3H] through the grid pipeline (double-buffered by pallas), writing
one [B, H] output tile per step.

Semantics identical to RNNStateEncoder's GRU sequence mode (torch gate order
r, z, n; reset h *= mask before each step). Used as a drop-in fast path by
RNNStateEncoder when running on TPU with GRU cells; everything else falls
back to the lax.scan implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_step_kernel(xi_ref, mask_ref, w_hh_ref, b_hh_ref, h0_ref, out_ref, h_scratch):
    """One grid step = one timestep. h_scratch persists across the grid."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:]

    h = h_scratch[:] * mask_ref[0]  # [B, H] * [B, 1] episode reset
    hh = (
        jax.lax.dot_general(
            h, w_hh_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_hh_ref[0]
    )  # [B, 3H]
    H = h.shape[1]
    xi = xi_ref[0]  # [B, 3H]
    r = jax.nn.sigmoid(xi[:, :H] + hh[:, :H])
    z = jax.nn.sigmoid(xi[:, H : 2 * H] + hh[:, H : 2 * H])
    n = jnp.tanh(xi[:, 2 * H :] + r * hh[:, 2 * H :])
    h_new = (1.0 - z) * n + z * h
    h_scratch[:] = h_new
    out_ref[0] = h_new


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_sequence(
    xi_all: jnp.ndarray,  # [T, B, 3H] precomputed input projections (+ b_ih)
    masks: jnp.ndarray,  # [T, B, 1]
    h0: jnp.ndarray,  # [B, H]
    w_hh: jnp.ndarray,  # [3H, H] (torch layout)
    b_hh: jnp.ndarray,  # [3H]
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns outs [T, B, H]; final state is outs[-1]."""
    T, B, threeH = xi_all.shape
    H = threeH // 3
    xi_all = xi_all.astype(jnp.float32)
    return pl.pallas_call(
        _gru_step_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, threeH), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0)),
            pl.BlockSpec((threeH, H), lambda t: (0, 0)),
            pl.BlockSpec((1, threeH), lambda t: (0, 0)),
            pl.BlockSpec((B, H), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(
        xi_all,
        masks.astype(jnp.float32),
        w_hh.astype(jnp.float32),
        b_hh.reshape(1, -1).astype(jnp.float32),
        h0.astype(jnp.float32),
    )


def gru_sequence_available(rnn_type: str, hidden_size: int) -> bool:
    backend = jax.default_backend()
    return rnn_type == "GRU" and backend in ("tpu", "axon") and hidden_size % 128 == 0
