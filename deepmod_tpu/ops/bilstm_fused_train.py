"""Training-capable fused BiLSTM: Pallas forward + Pallas backward (BPTT).

The inference kernel (ops.bilstm_fused) has no JAX-differentiable body,
so training normally falls back to the XLA scan. This module provides a
``jax.custom_vjp`` center-feature function whose forward AND backward run
as fused Pallas kernels:

- forward: the inference layer kernel extended to also emit the cell
  state sequence (c_seq) per direction — the only extra residual BPTT
  needs besides the layer inputs/outputs we already have;
- backward: per layer, one kernel walks time in reverse holding dh/dc
  carries in VMEM, RECOMPUTES the gate activations from (x_t, h_{t-1})
  (one matmul pair — cheaper than storing four gate planes), and
  produces dx_seq plus weight/bias gradients. Weight grads accumulate
  across batch tiles in the kernel's own output block (the TPU grid is
  sequential, so += into the same block is safe).

Numerics are pinned to jax.grad of the scan path by
tests/test_bilstm_train_vjp.py (interpret mode).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bilstm_fused import (
    GATES,
    LANE,
    _pad_gate_blocks,
    _pad_weights,
    _round_up,
)


def _sigmoid(x):
    """sigmoid(x) == 0.5*tanh(x/2)+0.5 exactly; the tanh form lowers to a
    single native transcendental on the VPU (see ops.bilstm_fused). Both
    the forward cell and the backward recompute use THIS function so the
    VJP differentiates the activations the forward actually produced."""
    return 0.5 * jnp.tanh(0.5 * x) + 0.5


# --------------------------------------------------------------- forward


def _fwd_kernel(
    in_fw_ref, in_bw_ref,
    wx_fw_ref, wh_fw_ref, b_fw_ref,
    wx_bw_ref, wh_bw_ref, b_bw_ref,
    h_fw_out, h_bw_out, c_fw_out, c_bw_out,
    c_fw, h_fw, c_bw, h_bw,
    *, timesteps: int, forget_bias: float, reverse_bw_read: bool,
    stop_after: int | None = None,
):
    c_fw[...] = jnp.zeros_like(c_fw)
    h_fw[...] = jnp.zeros_like(h_fw)
    c_bw[...] = jnp.zeros_like(c_bw)
    h_bw[...] = jnp.zeros_like(h_bw)

    def cell(x_t, h, c, wx_ref, wh_ref, b_ref):
        gates = (
            jnp.dot(x_t, wx_ref[...], preferred_element_type=jnp.float32)
            + jnp.dot(h, wh_ref[...], preferred_element_type=jnp.float32)
            + b_ref[...]
        )
        i = gates[:, 0 * LANE : 1 * LANE]
        j = gates[:, 1 * LANE : 2 * LANE]
        f = gates[:, 2 * LANE : 3 * LANE]
        o = gates[:, 3 * LANE : 4 * LANE]
        new_c = c * _sigmoid(f + forget_bias) + _sigmoid(i) * jnp.tanh(j)
        new_h = jnp.tanh(new_c) * _sigmoid(o)
        return new_h, new_c

    out_dt = h_fw_out.dtype
    n_steps = timesteps if stop_after is None else stop_after
    for t in range(n_steps):
        x_fw = in_fw_ref[pl.ds(t, 1), :, :][0].astype(jnp.float32)
        t_bw = (timesteps - 1 - t) if reverse_bw_read else t
        x_bw = in_bw_ref[pl.ds(t_bw, 1), :, :][0].astype(jnp.float32)
        nh_fw, nc_fw = cell(x_fw, h_fw[...], c_fw[...], wx_fw_ref, wh_fw_ref, b_fw_ref)
        nh_bw, nc_bw = cell(x_bw, h_bw[...], c_bw[...], wx_bw_ref, wh_bw_ref, b_bw_ref)
        # recurrence carries stay fp32 in scratch; only the STORED
        # sequences round to the storage dtype (bf16 mode), like
        # bf16-checkpointed activations
        h_fw[...] = nh_fw
        c_fw[...] = nc_fw
        h_bw[...] = nh_bw
        c_bw[...] = nc_bw
        h_fw_out[pl.ds(t, 1), :, :] = nh_fw.astype(out_dt)[None]
        h_bw_out[pl.ds(t, 1), :, :] = nh_bw.astype(out_dt)[None]
        c_fw_out[pl.ds(t, 1), :, :] = nc_fw.astype(out_dt)[None]
        c_bw_out[pl.ds(t, 1), :, :] = nc_bw.astype(out_dt)[None]


def _run_fwd_layer(in_fw, in_bw, weights, timesteps, forget_bias,
                   reverse_bw_read, tile_b, interpret, stop_after=None):
    wx_fw, wh_fw, b_fw, wx_bw, wh_bw, b_bw = weights
    batch_p = in_fw.shape[1]
    grid = (batch_p // tile_b,)
    seq_spec = pl.BlockSpec(
        (timesteps, tile_b, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec((LANE, GATES), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, GATES), lambda i: (0, 0), memory_space=pltpu.VMEM)
    # residual sequences inherit the input's storage dtype (bf16 mode
    # halves the dominant VMEM/HBM traffic; compute stays fp32)
    seq_shape = jax.ShapeDtypeStruct((timesteps, batch_p, LANE), in_fw.dtype)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, timesteps=timesteps, forget_bias=forget_bias,
            reverse_bw_read=reverse_bw_read, stop_after=stop_after,
        ),
        grid=grid,
        in_specs=[seq_spec, seq_spec, w_spec, w_spec, b_spec, w_spec, w_spec, b_spec],
        out_specs=(seq_spec, seq_spec, seq_spec, seq_spec),
        out_shape=(seq_shape, seq_shape, seq_shape, seq_shape),
        scratch_shapes=[pltpu.VMEM((tile_b, LANE), jnp.float32)] * 4,
        interpret=interpret,
    )(in_fw, in_bw, wx_fw, wh_fw, b_fw, wx_bw, wh_bw, b_bw)


# -------------------------------------------------------------- backward


def _bwd_kernel(
    x_ref, h_ref, c_ref, dh_in_ref,
    wx_ref, wh_ref, b_ref, wxt_ref, wht_ref,
    dx_ref, dwx_ref, dwh_ref, db_ref,
    dh_carry, dc_carry,
    *, timesteps: int, forget_bias: float, stop_after: int | None = None,
):
    """Single-direction BPTT over one batch tile (time-major blocks).

    Weight/bias gradient blocks are shared across all grid steps and
    accumulated (+=) after being zeroed on the first step.
    """
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dwx_ref[...] = jnp.zeros_like(dwx_ref)
        dwh_ref[...] = jnp.zeros_like(dwh_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dh_carry[...] = jnp.zeros_like(dh_carry)
    dc_carry[...] = jnp.zeros_like(dc_carry)
    zeros_state = jnp.zeros_like(dh_carry[...])

    start = (timesteps - 1) if stop_after is None else (stop_after - 1)
    # the early-stopped final layer never consumed inputs beyond `start`:
    # zero those dx rows explicitly (the output block is uninitialized)
    if stop_after is not None:
        for t in range(stop_after, timesteps):
            dx_ref[pl.ds(t, 1), :, :] = jnp.zeros(
                (1,) + dh_carry.shape, dx_ref.dtype
            )

    for t in range(start, -1, -1):
        x_t = x_ref[pl.ds(t, 1), :, :][0].astype(jnp.float32)
        c_t = c_ref[pl.ds(t, 1), :, :][0].astype(jnp.float32)
        if t > 0:
            h_prev = h_ref[pl.ds(t - 1, 1), :, :][0].astype(jnp.float32)
            c_prev = c_ref[pl.ds(t - 1, 1), :, :][0].astype(jnp.float32)
        else:
            h_prev = zeros_state
            c_prev = zeros_state
        # recompute gate activations
        gates = (
            jnp.dot(x_t, wx_ref[...], preferred_element_type=jnp.float32)
            + jnp.dot(h_prev, wh_ref[...], preferred_element_type=jnp.float32)
            + b_ref[...]
        )
        i = _sigmoid(gates[:, 0 * LANE : 1 * LANE])
        j = jnp.tanh(gates[:, 1 * LANE : 2 * LANE])
        f = _sigmoid(gates[:, 2 * LANE : 3 * LANE] + forget_bias)
        o = _sigmoid(gates[:, 3 * LANE : 4 * LANE])

        dh_total = (
            dh_in_ref[pl.ds(t, 1), :, :][0].astype(jnp.float32)
            + dh_carry[...]
        )
        tanh_c = jnp.tanh(c_t)
        do = dh_total * tanh_c
        dc = dc_carry[...] + dh_total * o * (1.0 - tanh_c * tanh_c)
        di = dc * j
        dj = dc * i
        df = dc * c_prev
        dc_carry[...] = dc * f
        da = jnp.concatenate(
            [
                di * i * (1.0 - i),
                dj * (1.0 - j * j),
                df * f * (1.0 - f),
                do * o * (1.0 - o),
            ],
            axis=1,
        )
        dx_ref[pl.ds(t, 1), :, :] = jnp.dot(
            da, wxt_ref[...], preferred_element_type=jnp.float32
        ).astype(dx_ref.dtype)[None]
        dh_carry[...] = jnp.dot(
            da, wht_ref[...], preferred_element_type=jnp.float32
        )
        # weight grads: contract the batch dim
        dwx_ref[...] += jax.lax.dot_general(
            x_t, da, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwh_ref[...] += jax.lax.dot_general(
            h_prev, da, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_ref[...] += jnp.sum(da, axis=0, keepdims=True)


def _run_bwd_layer(x_seq, h_seq, c_seq, dh_seq, wx, wh, b, timesteps,
                   forget_bias, tile_b, interpret, stop_after=None):
    batch_p = x_seq.shape[1]
    grid = (batch_p // tile_b,)
    seq_spec = pl.BlockSpec(
        (timesteps, tile_b, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec((LANE, GATES), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((GATES, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, GATES), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dx, dwx, dwh, db = pl.pallas_call(
        functools.partial(
            _bwd_kernel, timesteps=timesteps, forget_bias=forget_bias,
            stop_after=stop_after,
        ),
        grid=grid,
        in_specs=[seq_spec, seq_spec, seq_spec, seq_spec,
                  w_spec, w_spec, b_spec, wt_spec, wt_spec],
        out_specs=(
            seq_spec,
            pl.BlockSpec((LANE, GATES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, GATES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GATES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # dx inherits the sequence storage dtype (it becomes the
            # next layer's dh stream); weight grads stay fp32
            jax.ShapeDtypeStruct((timesteps, batch_p, LANE), x_seq.dtype),
            jax.ShapeDtypeStruct((LANE, GATES), jnp.float32),
            jax.ShapeDtypeStruct((LANE, GATES), jnp.float32),
            jax.ShapeDtypeStruct((1, GATES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, LANE), jnp.float32),
            pltpu.VMEM((tile_b, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(x_seq, h_seq, c_seq, dh_seq, wx, wh, b, wx.T, wh.T)
    return dx, dwx, dwh, db


# --------------------------------------------------- custom_vjp assembly


def _prep_layer_weights(params: Dict[str, Any], layer: int, in_dim: int, h: int):
    lp_fw = params["fw"][layer]
    lp_bw = params["bw"][layer]
    wx_fw, wh_fw = _pad_weights(jnp.asarray(lp_fw["kernel"]), in_dim, h)
    wx_bw, wh_bw = _pad_weights(jnp.asarray(lp_bw["kernel"]), in_dim, h)
    b_fw = _pad_gate_blocks(jnp.asarray(lp_fw["bias"]), h)[None, :]
    b_bw = _pad_gate_blocks(jnp.asarray(lp_bw["bias"]), h)[None, :]
    return wx_fw, wh_fw, b_fw, wx_bw, wh_bw, b_bw


def _unpad_kernel_grad(dwx, dwh, db, in_dim: int, h: int):
    """Padded (LANE, GATES) grads -> TF-layout (in+H, 4H) kernel + (4H,) bias."""
    def ungate(arr, rows):
        blocks = [arr[:rows, g * LANE : g * LANE + h] for g in range(4)]
        return jnp.concatenate(blocks, axis=-1)

    dkernel = jnp.concatenate([ungate(dwx, in_dim), ungate(dwh, h)], axis=0)
    dbias = jnp.concatenate(
        [db[0, g * LANE : g * LANE + h] for g in range(4)], axis=-1
    )
    return dkernel, dbias


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8)
)
def bilstm_fused_center_train(
    params: Dict[str, Any],
    x: jnp.ndarray,
    num_layers: int = 3,
    num_hidden: int = 100,
    timesteps: int = 21,
    forget_bias: float = 1.0,
    tile_b: int = 64,
    interpret: bool = False,
    precision: str = "fp32",
) -> jnp.ndarray:
    """``precision='bf16'`` stores the inter-layer/residual sequences
    (and the dh/dx gradient streams) in bfloat16 while every gate GEMM,
    recurrence carry, and weight gradient stays fp32 — the
    bf16-checkpointed-activations recipe. Halves the sequence traffic
    that bounds the fused VJP (docs/Validation.md round-5 sweep).
    fp32 stays the default: it is the mode pinned against jax.grad of
    the scan path."""
    out, _ = _fwd(params, x, num_layers, num_hidden, timesteps, forget_bias,
                  tile_b, interpret, precision)
    return out


def _fwd(params, x, num_layers, num_hidden, timesteps, forget_bias, tile_b,
         interpret, precision="fp32"):
    batch, t, in_dim = x.shape
    assert t == timesteps
    storage_dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    batch_p = _round_up(max(batch, 1), tile_b)
    x_pad = jnp.moveaxis(
        jnp.pad(
            x.astype(storage_dt),
            ((0, batch_p - batch), (0, 0), (0, LANE - in_dim)),
        ),
        1, 0,
    )
    in_fw = x_pad
    in_bw = x_pad
    reverse_bw_read = True
    h = num_hidden
    residuals = []
    # odd T: the fw/bw stacks are independent, so steps beyond the center
    # are outside the readout cone at EVERY depth (see ops.bilstm_fused)
    stop = (timesteps // 2 + 1) if timesteps % 2 == 1 else None
    for layer in range(num_layers):
        cur_in = in_dim if layer == 0 else h
        weights = _prep_layer_weights(params, layer, cur_in, h)
        h_fw, h_bw, c_fw, c_bw = _run_fwd_layer(
            in_fw, in_bw, weights, timesteps, forget_bias, reverse_bw_read,
            tile_b, interpret, stop,
        )
        # layer-0's bw lane consumed the time-reversed input; store the
        # reversed view so backward sees exactly what the cell saw
        in_bw_eff = in_bw[::-1] if reverse_bw_read else in_bw
        residuals.append((in_fw, in_bw_eff, h_fw, h_bw, c_fw, c_bw))
        in_fw, in_bw = h_fw, h_bw
        reverse_bw_read = False
    center = timesteps // 2
    bw_center = center if timesteps % 2 == 1 else timesteps - 1 - center
    out = jnp.concatenate(
        [in_fw[center, :batch, :h], in_bw[bw_center, :batch, :h]], axis=-1
    )
    return out, (params, x, residuals)


def _bwd(num_layers, num_hidden, timesteps, forget_bias, tile_b, interpret,
         precision, res, g):
    params, x, residuals = res
    batch, _, in_dim = x.shape
    batch_p = residuals[0][0].shape[1]
    h = num_hidden
    storage_dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    center = timesteps // 2
    bw_center = center if timesteps % 2 == 1 else timesteps - 1 - center

    # seed dh streams for the top layer: center timestep only
    dh_fw = jnp.zeros((timesteps, batch_p, LANE), storage_dt)
    dh_bw = jnp.zeros((timesteps, batch_p, LANE), storage_dt)
    dh_fw = dh_fw.at[center, :batch, :h].set(g[:, :h].astype(storage_dt))
    dh_bw = dh_bw.at[bw_center, :batch, :h].set(g[:, h:].astype(storage_dt))

    d_params = {
        "fw": [dict() for _ in range(num_layers)],
        "bw": [dict() for _ in range(num_layers)],
        "out_w": jnp.zeros_like(jnp.asarray(params["out_w"])),
        "out_b": jnp.zeros_like(jnp.asarray(params["out_b"])),
    }
    stop = (timesteps // 2 + 1) if timesteps % 2 == 1 else None
    for layer in range(num_layers - 1, -1, -1):
        cur_in = in_dim if layer == 0 else h
        wx_fw, wh_fw, b_fw, wx_bw, wh_bw, b_bw = _prep_layer_weights(
            params, layer, cur_in, h
        )
        in_fw, in_bw_eff, h_fw, h_bw, c_fw, c_bw = residuals[layer]
        dx_fw, dwx_fw, dwh_fw, db_fw = _run_bwd_layer(
            in_fw, h_fw, c_fw, dh_fw, wx_fw, wh_fw, b_fw,
            timesteps, forget_bias, tile_b, interpret, stop,
        )
        dx_bw, dwx_bw, dwh_bw, db_bw = _run_bwd_layer(
            in_bw_eff, h_bw, c_bw, dh_bw, wx_bw, wh_bw, b_bw,
            timesteps, forget_bias, tile_b, interpret, stop,
        )
        dk_fw, dbias_fw = _unpad_kernel_grad(dwx_fw, dwh_fw, db_fw, cur_in, h)
        dk_bw, dbias_bw = _unpad_kernel_grad(dwx_bw, dwh_bw, db_bw, cur_in, h)
        d_params["fw"][layer] = {"kernel": dk_fw, "bias": dbias_fw}
        d_params["bw"][layer] = {"kernel": dk_bw, "bias": dbias_bw}
        if layer > 0:
            dh_fw = dx_fw
            dh_bw = dx_bw
        else:
            # layer-0 bw consumed reversed x: reverse its dx back and add
            dx_total = dx_fw + dx_bw[::-1]
            dx_out = jnp.moveaxis(dx_total, 0, 1)[:batch, :, :in_dim]
    return d_params, dx_out.astype(x.dtype)


bilstm_fused_center_train.defvjp(_fwd, _bwd)
