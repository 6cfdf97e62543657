"""Pallas fused LSTM recurrence for TPU.

The hot loop of the whole framework is the 21-step x 6-cell BiLSTM
inference over millions of windows (reference: the only TF-accelerated
part, sess.run over 512-window chunks at myDetect.py:808-820). The XLA
``lax.scan`` path (deepmod_tpu.models.bilstm._lstm_layer) already hoists
the input projection into one large MXU matmul; this kernel additionally:

- keeps the cell state (c, h) in VMEM scratch across ALL timesteps, so the
  recurrence never round-trips gate tensors through HBM;
- fuses the h @ W_h MXU matmul with the sigmoid/tanh gate VPU math per
  step inside a single ``pallas_call``;
- tiles the batch over a 1-D grid so arbitrarily large window batches
  stream through a fixed VMEM budget.

Hidden size 100 and gate width 400 are padded to the (128, 512) hardware
tiles; padded lanes carry zeros through the recurrence (zero W_h rows/cols
and zero x-projection lanes keep padded c/h identically zero).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_gate_blocks(arr: jnp.ndarray, h: int, hp: int) -> jnp.ndarray:
    """Pad the trailing 4H gate axis blockwise: each H-wide gate -> Hp."""
    blocks = [arr[..., g * h : (g + 1) * h] for g in range(4)]
    pad = [(0, 0)] * (arr.ndim - 1) + [(0, hp - h)]
    return jnp.concatenate([jnp.pad(b, pad) for b in blocks], axis=-1)


def _lstm_kernel(xp_ref, wh_ref, out_ref, c_scr, h_scr, *, timesteps: int,
                 forget_bias: float, reverse: bool, hp: int):
    c_scr[...] = jnp.zeros_like(c_scr)
    h_scr[...] = jnp.zeros_like(h_scr)

    def body(step, _):
        t = (timesteps - 1 - step) if reverse else step
        xp_t = xp_ref[:, pl.ds(t, 1), :][:, 0, :]
        gates = xp_t + jnp.dot(
            h_scr[...], wh_ref[...], preferred_element_type=jnp.float32
        )
        i_g = gates[:, 0 * hp : 1 * hp]
        j_g = gates[:, 1 * hp : 2 * hp]
        f_g = gates[:, 2 * hp : 3 * hp]
        o_g = gates[:, 3 * hp : 4 * hp]
        new_c = c_scr[...] * jax.nn.sigmoid(f_g + forget_bias) + jax.nn.sigmoid(
            i_g
        ) * jnp.tanh(j_g)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o_g)
        c_scr[...] = new_c
        h_scr[...] = new_h
        out_ref[:, pl.ds(t, 1), :] = new_h[:, None, :]
        return 0

    jax.lax.fori_loop(0, timesteps, body, 0)


@functools.partial(
    jax.jit, static_argnames=("forget_bias", "reverse", "tile_b", "interpret")
)
def lstm_layer_pallas(
    kernel: jax.Array,
    bias: jax.Array,
    x_seq: jax.Array,
    forget_bias: float = 1.0,
    reverse: bool = False,
    tile_b: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """One LSTM layer over (B, T, F) -> (B, T, H) with a fused recurrence.

    Numerics match models.bilstm._lstm_layer (same gate order, forget-bias
    placement, and fp32 accumulation); the parity test pins them together.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    batch, timesteps, in_dim = x_seq.shape
    h = kernel.shape[1] // 4
    hp = _round_up(h, LANE)
    w_x = kernel[:in_dim]
    w_h = kernel[in_dim:]

    # Input projection: one large MXU matmul outside the recurrence.
    x_proj = (
        jnp.einsum("btf,fg->btg", x_seq.astype(jnp.float32), w_x,
                   preferred_element_type=jnp.float32)
        + bias
    )
    x_proj = _pad_gate_blocks(x_proj, h, hp)          # (B, T, 4*hp)
    w_h_p = _pad_gate_blocks(w_h, h, hp)              # (H, 4*hp)
    w_h_p = jnp.pad(w_h_p, ((0, hp - h), (0, 0)))     # (hp, 4*hp)

    batch_p = _round_up(max(batch, 1), tile_b)
    if batch_p != batch:
        x_proj = jnp.pad(x_proj, ((0, batch_p - batch), (0, 0), (0, 0)))

    grid = (batch_p // tile_b,)
    out = pl.pallas_call(
        functools.partial(
            _lstm_kernel,
            timesteps=timesteps,
            forget_bias=forget_bias,
            reverse=reverse,
            hp=hp,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_b, timesteps, 4 * hp),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (hp, 4 * hp), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, timesteps, hp), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch_p, timesteps, hp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_b, hp), jnp.float32),
            pltpu.VMEM((tile_b, hp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch_p * timesteps * hp * 4 * hp,
            bytes_accessed=4 * batch_p * timesteps * (4 * hp + hp),
            transcendentals=5 * batch_p * timesteps * hp,
        ),
        interpret=interpret,
    )(x_proj, w_h_p)
    return out[:batch, :, :h]
