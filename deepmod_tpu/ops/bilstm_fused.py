"""Whole-layer fused BiLSTM Pallas kernel (v2).

Measurement on real hardware shows the XLA scan path is HBM-bandwidth
bound: each of the 21x3x2 recurrence steps round-trips the (B, 4H) gate
pre-activations plus h/c through HBM (~11 GB per 32k-window batch). This
kernel eliminates that traffic:

- the input projection happens IN-kernel: per step one
  (TILE_B, 128) @ (128, 512) MXU matmul against W_x, so HBM only carries
  the layer's (B, T, H) input/output sequences — 3-4x less than
  streaming precomputed gate tensors;
- both directions of a layer run in the SAME kernel over the same input
  block (the backward lane reads time-reversed), halving input reads;
- h/c for both lanes live in VMEM scratch across all timesteps;
- the backward lane's outputs stay in reversed-time layout through the
  stack, so every layer iterates time forward; with odd T the center
  readout index is reversal-invariant;
- EVERY layer early-stops at the center step (odd T): the fw and bw
  stacks never exchange state (TF1 ``static_bidirectional_rnn`` over two
  ``MultiRNNCell``s, myMultiBiRNN.py:42-47), so the center readout
  depends only on steps 0..T//2 of each lane at each depth — inter-layer
  sequences shrink to T//2+1 steps and the recurrence does 3*(T//2+1)
  instead of 2T + (T//2+1) steps per lane (21T: 33 vs 53, ~1.6x).

Gate order/bias placement match TF1 BasicLSTMCell exactly
(models.bilstm); parity is pinned by tests/test_bilstm.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
GATES = 4 * LANE  # 512


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_gate_blocks(arr: jnp.ndarray, h: int) -> jnp.ndarray:
    """Blockwise pad trailing 4H gate axis so each gate occupies LANE."""
    blocks = [arr[..., g * h : (g + 1) * h] for g in range(4)]
    pad = [(0, 0)] * (arr.ndim - 1) + [(0, LANE - h)]
    return jnp.concatenate([jnp.pad(b, pad) for b in blocks], axis=-1)


def _pad_weights(kernel: jnp.ndarray, in_dim: int, h: int):
    """(in+H, 4H) TF kernel -> padded (LANE, GATES) W_x and W_h."""
    w_x = _pad_gate_blocks(kernel[:in_dim], h)
    w_x = jnp.pad(w_x, ((0, LANE - in_dim), (0, 0)))
    w_h = _pad_gate_blocks(kernel[in_dim:], h)
    w_h = jnp.pad(w_h, ((0, LANE - h), (0, 0)))
    return w_x, w_h


# bf16 mode evaluates sigmoid(x) as 0.5*tanh(0.5*x)+0.5 (exact identity,
# one native transcendental). The inner 0.5*x is folded INTO the i/f/o
# weight+bias columns at prep time: scaling every addend of the fp32
# gate accumulation by 0.5 is a pure exponent shift, so the scaled sum
# is bit-exactly 0.5x the unscaled one and the kernel drops one multiply
# per sigmoid. The f-gate's forget_bias is NOT folded into the bias —
# fl(0.5b + 0.5fb) associates differently from the original
# fl(fl(gates+b)+fb) and could drift 1 ulp; the kernel instead adds the
# pre-halved fb as the same in-order step the unscaled form used
# (fl(f_scaled + 0.5fb) == 0.5*fl(f + fb) exactly).
def _prescale_ifo(wx, wh, b):
    import numpy as np

    # i, j(stays tanh-input, unscaled), f, o
    scale = np.repeat(np.asarray([0.5, 1.0, 0.5, 0.5]), LANE)
    return (
        wx * scale.astype(wx.dtype),
        wh * scale.astype(wh.dtype),
        b * scale.astype(b.dtype),
    )


def _cell_tail(gates, c, prescaled, forget_bias):
    """Shared gate nonlinearity + state update for every kernel variant.

    The bf16 prescale contract lives ONLY here: i/f/o arrive pre-halved
    (folded into the weights, _prescale_ifo) and the f-gate adds the
    pre-halved forget_bias with the original association — one copy so
    the variants cannot drift from the bit-identity they are pinned on.
    """
    i = gates[:, 0 * LANE : 1 * LANE]
    j = gates[:, 1 * LANE : 2 * LANE]
    f = gates[:, 2 * LANE : 3 * LANE]
    o = gates[:, 3 * LANE : 4 * LANE]
    if prescaled:
        s_i = 0.5 * jnp.tanh(i) + 0.5
        s_f = 0.5 * jnp.tanh(f + 0.5 * forget_bias) + 0.5
        s_o = 0.5 * jnp.tanh(o) + 0.5
    else:
        s_i = jax.nn.sigmoid(i)
        s_f = jax.nn.sigmoid(f + forget_bias)
        s_o = jax.nn.sigmoid(o)
    new_c = c * s_f + s_i * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * s_o
    return new_h, new_c


def _make_cell(seq_dtype, forget_bias):
    """TF1 BasicLSTMCell step shared by the layered and mono kernels.

    bf16 mode: sigmoid(x) == 0.5*tanh(x/2)+0.5 exactly — one native
    transcendental instead of exp+divide (~19% on this VPU-heavy kernel).
    The inner x/2 arrives PRE-FOLDED into the i/f/o weight and bias
    columns (_prescale_ifo; exact exponent-shift scaling); the f-gate
    adds the pre-halved forget_bias in-kernel with the original
    association (see _prescale_ifo comment). fp32 stays exp-based and
    unscaled for bit-compatibility with the XLA scan path.
    """
    prescaled = seq_dtype == jnp.bfloat16

    def cell(x_t, h, c, wx_ref, wh_ref, b_ref):
        # matmuls accumulate fp32 regardless of storage dtype (bf16 mode
        # keeps sequences/weights half-width; state stays fp32)
        gates = (
            jnp.dot(x_t, wx_ref[...], preferred_element_type=jnp.float32)
            + jnp.dot(h.astype(seq_dtype), wh_ref[...],
                      preferred_element_type=jnp.float32)
            + b_ref[...].astype(jnp.float32)
        )
        return _cell_tail(gates, c, prescaled, forget_bias)

    return cell


def _layer_kernel(
    in_fw_ref, in_bw_ref,
    wx_fw_ref, wh_fw_ref, b_fw_ref,
    wx_bw_ref, wh_bw_ref, b_bw_ref,
    out_fw_ref, out_bw_ref,
    c_fw, h_fw, c_bw, h_bw,
    *, in_steps: int, out_steps: int, forget_bias: float,
    reverse_bw_read: bool, seq_dtype=jnp.float32, final: bool = False,
):
    c_fw[...] = jnp.zeros_like(c_fw)
    h_fw[...] = jnp.zeros_like(h_fw)
    c_bw[...] = jnp.zeros_like(c_bw)
    h_bw[...] = jnp.zeros_like(h_bw)

    cell = _make_cell(seq_dtype, forget_bias)

    def body(t, _):
        # time-major layout: the dynamic index lives on the OUTERMOST dim,
        # so every load/store slice is a fully tiled (tile_b, LANE) block
        # (Mosaic cannot align dynamic indices on tiled dims for bf16)
        x_fw = in_fw_ref[pl.ds(t, 1), :, :][0]
        t_bw = (in_steps - 1 - t) if reverse_bw_read else t
        x_bw = in_bw_ref[pl.ds(t_bw, 1), :, :][0]
        nh_fw, nc_fw = cell(x_fw, h_fw[...], c_fw[...], wx_fw_ref, wh_fw_ref, b_fw_ref)
        nh_bw, nc_bw = cell(x_bw, h_bw[...], c_bw[...], wx_bw_ref, wh_bw_ref, b_bw_ref)
        h_fw[...] = nh_fw
        c_fw[...] = nc_fw
        h_bw[...] = nh_bw
        c_bw[...] = nc_bw
        if final:
            # the LAST layer's sequence is never read back — only the
            # center row leaves the kernel, cutting its HBM writes ~T/2x
            if isinstance(t, int):
                if t == out_steps - 1:
                    out_fw_ref[0, :, :] = nh_fw.astype(seq_dtype)
                    out_bw_ref[0, :, :] = nh_bw.astype(seq_dtype)
            else:
                @pl.when(t == out_steps - 1)
                def _():
                    out_fw_ref[0, :, :] = nh_fw.astype(seq_dtype)
                    out_bw_ref[0, :, :] = nh_bw.astype(seq_dtype)
        else:
            out_fw_ref[pl.ds(t, 1), :, :] = nh_fw[None].astype(seq_dtype)
            out_bw_ref[pl.ds(t, 1), :, :] = nh_bw[None].astype(seq_dtype)
        return 0

    # the center-only readout needs just steps 0..center of both lanes at
    # EVERY depth (the bw lane is reversed-layout, so its center is the
    # same index; the stacks are direction-independent) — out_steps <
    # in_steps trims the recurrence and the inter-layer buffers
    n_steps = out_steps
    if n_steps <= 32:
        # static unroll: T is small and known at trace time; lets Mosaic
        # schedule loads/compute across steps without loop overhead
        for t in range(n_steps):
            body(t, 0)
    else:
        jax.lax.fori_loop(0, n_steps, body, 0)


def _run_layer(
    in_fw: jnp.ndarray,
    in_bw: jnp.ndarray,
    weights,
    out_steps: int,
    forget_bias: float,
    reverse_bw_read: bool,
    tile_b: int,
    interpret: bool,
    seq_dtype=jnp.float32,
    final: bool = False,
):
    wx_fw, wh_fw, b_fw, wx_bw, wh_bw, b_bw = weights
    in_steps = in_fw.shape[0]  # time-major: (T, B, LANE)
    batch_p = in_fw.shape[1]
    grid = (batch_p // tile_b,)
    store_steps = 1 if final else out_steps
    in_spec = pl.BlockSpec(
        (in_steps, tile_b, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (store_steps, tile_b, LANE), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    w_spec = pl.BlockSpec((LANE, GATES), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, GATES), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_fw, out_bw = pl.pallas_call(
        functools.partial(
            _layer_kernel,
            in_steps=in_steps,
            out_steps=out_steps,
            forget_bias=forget_bias,
            reverse_bw_read=reverse_bw_read,
            seq_dtype=seq_dtype,
            final=final,
        ),
        grid=grid,
        in_specs=[in_spec, in_spec, w_spec, w_spec, b_spec, w_spec, w_spec, b_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((store_steps, batch_p, LANE), seq_dtype),
            jax.ShapeDtypeStruct((store_steps, batch_p, LANE), seq_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, LANE), jnp.float32),
            pltpu.VMEM((tile_b, LANE), jnp.float32),
            pltpu.VMEM((tile_b, LANE), jnp.float32),
            pltpu.VMEM((tile_b, LANE), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 2 * batch_p * out_steps * LANE * GATES,
            bytes_accessed=4 * 4 * batch_p * out_steps * LANE,
            transcendentals=10 * batch_p * out_steps * LANE,
        ),
        interpret=interpret,
    )(in_fw, in_bw, wx_fw, wh_fw, b_fw, wx_bw, wh_bw, b_bw)
    return out_fw, out_bw


def _mono_kernel(
    x_ref,
    *rest,
    num_layers: int,
    in_steps: int,
    out_steps: int,
    forget_bias: float,
    seq_dtype=jnp.float32,
):
    """All layers in ONE kernel: inter-layer sequences never leave VMEM.

    rest = 6*num_layers weight refs, 2 output refs (center rows), then
    scratch: c_fw, h_fw, c_bw, h_bw, and 4 sequence ping-pong buffers.
    """
    w_refs = rest[: 6 * num_layers]
    out_fw_ref, out_bw_ref = rest[6 * num_layers : 6 * num_layers + 2]
    c_fw, h_fw, c_bw, h_bw, sfw_a, sbw_a, sfw_b, sbw_b = rest[6 * num_layers + 2 :]

    cell = _make_cell(seq_dtype, forget_bias)

    src_fw, src_bw = None, None  # layer 0 reads x_ref directly
    dst_fw, dst_bw = sfw_a, sbw_a
    for layer in range(num_layers):
        wx_fw_ref, wh_fw_ref, b_fw_ref, wx_bw_ref, wh_bw_ref, b_bw_ref = (
            w_refs[6 * layer : 6 * layer + 6]
        )
        # h/c live in VMEM scratch: measured ~1% faster than carrying
        # them as SSA values through the unrolled steps (Mosaic's own
        # spill placement loses to the explicit scratch round trip here)
        c_fw[...] = jnp.zeros_like(c_fw)
        h_fw[...] = jnp.zeros_like(h_fw)
        c_bw[...] = jnp.zeros_like(c_bw)
        h_bw[...] = jnp.zeros_like(h_bw)
        final = layer == num_layers - 1
        # out_steps <= 32 always (T//2+1 for T=21 is 11): static unroll
        for t in range(out_steps):
            if layer == 0:
                x_fw = x_ref[t]
                x_bw = x_ref[in_steps - 1 - t]
            else:
                x_fw = src_fw[t]
                x_bw = src_bw[t]
            nh_fw, nc_fw = cell(x_fw, h_fw[...], c_fw[...],
                                wx_fw_ref, wh_fw_ref, b_fw_ref)
            nh_bw, nc_bw = cell(x_bw, h_bw[...], c_bw[...],
                                wx_bw_ref, wh_bw_ref, b_bw_ref)
            h_fw[...] = nh_fw
            c_fw[...] = nc_fw
            h_bw[...] = nh_bw
            c_bw[...] = nc_bw
            if final:
                if t == out_steps - 1:  # only the center row leaves VMEM
                    out_fw_ref[0, :, :] = nh_fw.astype(seq_dtype)
                    out_bw_ref[0, :, :] = nh_bw.astype(seq_dtype)
            else:
                dst_fw[t] = nh_fw.astype(seq_dtype)
                dst_bw[t] = nh_bw.astype(seq_dtype)
        src_fw, src_bw = dst_fw, dst_bw
        dst_fw, dst_bw = (sfw_b, sbw_b) if layer % 2 == 0 else (sfw_a, sbw_a)


def _mono_merged_kernel(
    x_ref,
    *rest,
    num_layers: int,
    in_steps: int,
    out_steps: int,
    forget_bias: float,
    seq_dtype=jnp.float32,
):
    """Mono kernel with the [x_t; h] MERGED gate GEMM.

    Each cell step issues ONE (tile_b, 2*LANE) @ (2*LANE, GATES) matmul
    instead of two (tile_b, LANE) @ (LANE, GATES) dots — half the MXU
    dispatches at identical FLOPs, the lever an issue-rate-bound kernel
    responds to. Costs two VPU stores per step to assemble the [x; h]
    operand in VMEM scratch (probe: scripts/probe_merged_gemm.py).

    rest = 4*num_layers weight refs (packed W=[Wx;Wh] + bias per lane),
    2 output refs, then scratch: c/h per lane, xh assembly buffers, and
    4 sequence ping-pong buffers.
    """
    w_refs = rest[: 4 * num_layers]
    out_fw_ref, out_bw_ref = rest[4 * num_layers : 4 * num_layers + 2]
    (c_fw, h_fw, c_bw, h_bw, xh_fw, xh_bw,
     sfw_a, sbw_a, sfw_b, sbw_b) = rest[4 * num_layers + 2 :]

    prescaled = seq_dtype == jnp.bfloat16

    def cell(xh_ref, x_t, h, c, w_ref, b_ref):
        xh_ref[:, :LANE] = x_t
        xh_ref[:, LANE:] = h.astype(seq_dtype)
        gates = (
            jnp.dot(xh_ref[...], w_ref[...],
                    preferred_element_type=jnp.float32)
            + b_ref[...].astype(jnp.float32)
        )
        return _cell_tail(gates, c, prescaled, forget_bias)

    src_fw, src_bw = None, None
    dst_fw, dst_bw = sfw_a, sbw_a
    for layer in range(num_layers):
        w_fw_ref, b_fw_ref, w_bw_ref, b_bw_ref = (
            w_refs[4 * layer : 4 * layer + 4]
        )
        c_fw[...] = jnp.zeros_like(c_fw)
        h_fw[...] = jnp.zeros_like(h_fw)
        c_bw[...] = jnp.zeros_like(c_bw)
        h_bw[...] = jnp.zeros_like(h_bw)
        final = layer == num_layers - 1
        for t in range(out_steps):
            if layer == 0:
                x_fw = x_ref[t]
                x_bw = x_ref[in_steps - 1 - t]
            else:
                x_fw = src_fw[t]
                x_bw = src_bw[t]
            nh_fw, nc_fw = cell(xh_fw, x_fw, h_fw[...], c_fw[...],
                                w_fw_ref, b_fw_ref)
            nh_bw, nc_bw = cell(xh_bw, x_bw, h_bw[...], c_bw[...],
                                w_bw_ref, b_bw_ref)
            h_fw[...] = nh_fw
            c_fw[...] = nc_fw
            h_bw[...] = nh_bw
            c_bw[...] = nc_bw
            if final:
                if t == out_steps - 1:
                    out_fw_ref[0, :, :] = nh_fw.astype(seq_dtype)
                    out_bw_ref[0, :, :] = nh_bw.astype(seq_dtype)
            else:
                dst_fw[t] = nh_fw.astype(seq_dtype)
                dst_bw[t] = nh_bw.astype(seq_dtype)
        src_fw, src_bw = dst_fw, dst_bw
        dst_fw, dst_bw = (sfw_b, sbw_b) if layer % 2 == 0 else (sfw_a, sbw_a)


def _mono_pregemm_kernel(
    x_ref,
    *rest,
    num_layers: int,
    in_steps: int,
    out_steps: int,
    forget_bias: float,
    seq_dtype=jnp.float32,
    gate_dtype=jnp.float32,
):
    """Mono kernel with PRE-COMPUTED input projections (cuDNN-style).

    Per layer/lane ONE (out_steps*tile_b, LANE) @ (LANE, GATES) GEMM
    projects every timestep's input into a VMEM gate buffer; the serial
    recurrence then issues a single (tile_b, LANE) @ (LANE, GATES) h-dot
    per step. Same FLOPs, half the per-step MXU dispatches, and the
    x-projection runs at large-GEMM efficiency — the classic fused-LSTM
    schedule. Cost: the (out_steps, tile_b, GATES) gate buffers add VMEM
    traffic (one store + one load of 4H per row-step vs one LANE read).
    Probe: scripts/probe_pregemm.py.

    rest = 6*num_layers weight refs, 2 output refs, then scratch:
    c_fw, h_fw, c_bw, h_bw, gx_fw, gx_bw, 4 sequence ping-pong buffers.
    """
    w_refs = rest[: 6 * num_layers]
    out_fw_ref, out_bw_ref = rest[6 * num_layers : 6 * num_layers + 2]
    (c_fw, h_fw, c_bw, h_bw, gx_fw, gx_bw,
     sfw_a, sbw_a, sfw_b, sbw_b) = rest[6 * num_layers + 2 :]

    prescaled = seq_dtype == jnp.bfloat16
    tile_b = c_fw.shape[0]

    def project(xs, wx_ref, gx):
        """(S, tile_b, LANE) @ (LANE, GATES) as one collapsed GEMM."""
        flat = xs.reshape(out_steps * tile_b, LANE)
        gx[...] = jnp.dot(
            flat, wx_ref[...], preferred_element_type=jnp.float32
        ).reshape(out_steps, tile_b, GATES).astype(gate_dtype)

    def cell(gx_t, h, c, wh_ref, b_ref):
        gates = (
            gx_t.astype(jnp.float32)
            + jnp.dot(h.astype(seq_dtype), wh_ref[...],
                      preferred_element_type=jnp.float32)
            + b_ref[...].astype(jnp.float32)
        )
        return _cell_tail(gates, c, prescaled, forget_bias)

    src_fw, src_bw = None, None
    dst_fw, dst_bw = sfw_a, sbw_a
    for layer in range(num_layers):
        wx_fw_ref, wh_fw_ref, b_fw_ref, wx_bw_ref, wh_bw_ref, b_bw_ref = (
            w_refs[6 * layer : 6 * layer + 6]
        )
        if layer == 0:
            # bw lane stays in natural row order; the recurrence reads it
            # reversed (row k holds x_ref[in_steps - out_steps + k])
            project(x_ref[0:out_steps], wx_fw_ref, gx_fw)
            project(x_ref[in_steps - out_steps : in_steps], wx_bw_ref, gx_bw)
        else:
            project(src_fw[...], wx_fw_ref, gx_fw)
            project(src_bw[...], wx_bw_ref, gx_bw)
        c_fw[...] = jnp.zeros_like(c_fw)
        h_fw[...] = jnp.zeros_like(h_fw)
        c_bw[...] = jnp.zeros_like(c_bw)
        h_bw[...] = jnp.zeros_like(h_bw)
        final = layer == num_layers - 1
        for t in range(out_steps):
            bw_t = out_steps - 1 - t if layer == 0 else t
            nh_fw, nc_fw = cell(gx_fw[t], h_fw[...], c_fw[...],
                                wh_fw_ref, b_fw_ref)
            nh_bw, nc_bw = cell(gx_bw[bw_t], h_bw[...], c_bw[...],
                                wh_bw_ref, b_bw_ref)
            h_fw[...] = nh_fw
            c_fw[...] = nc_fw
            h_bw[...] = nh_bw
            c_bw[...] = nc_bw
            if final:
                if t == out_steps - 1:
                    out_fw_ref[0, :, :] = nh_fw.astype(seq_dtype)
                    out_bw_ref[0, :, :] = nh_bw.astype(seq_dtype)
            else:
                dst_fw[t] = nh_fw.astype(seq_dtype)
                dst_bw[t] = nh_bw.astype(seq_dtype)
        src_fw, src_bw = dst_fw, dst_bw
        dst_fw, dst_bw = (sfw_b, sbw_b) if layer % 2 == 0 else (sfw_a, sbw_a)


def _mono_wavefront_kernel(
    x_ref,
    *rest,
    num_layers: int,
    in_steps: int,
    out_steps: int,
    forget_bias: float,
    seq_dtype=jnp.float32,
):
    """Mono kernel, layer-wavefront schedule.

    At wavefront step s, layer L runs timestep t = s - L: layer L's read
    of the (L-1)-output at t was written one wavefront step earlier, so
    all num_layers x 2 recurrence chains are live and INDEPENDENT within
    a step — 6 interleaved chains (vs 2 in the sequential schedule) give
    the scheduler real work to hide each matmul's latency behind.
    Requires num_layers <= 3 (two ping-pong sequence buffers; a 4th layer
    would overwrite rows a lagging reader still needs). Each layer keeps
    its own h/c scratch since all layers are mid-flight at once.
    """
    w_refs = rest[: 6 * num_layers]
    out_fw_ref, out_bw_ref = rest[6 * num_layers : 6 * num_layers + 2]
    scratch = rest[6 * num_layers + 2 :]
    states = [scratch[4 * L : 4 * L + 4] for L in range(num_layers)]
    sfw_a, sbw_a, sfw_b, sbw_b = scratch[4 * num_layers :]

    cell = _make_cell(seq_dtype, forget_bias)

    for refs in states:
        for r in refs:
            r[...] = jnp.zeros_like(r)

    src = [None, (sfw_a, sbw_a), (sfw_b, sbw_b), (sfw_a, sbw_a)][: num_layers + 1]
    for s in range(out_steps + num_layers - 1):
        for layer in range(num_layers):
            t = s - layer
            if not 0 <= t < out_steps:
                continue
            (wx_fw_ref, wh_fw_ref, b_fw_ref,
             wx_bw_ref, wh_bw_ref, b_bw_ref) = w_refs[6 * layer : 6 * layer + 6]
            c_fw, h_fw, c_bw, h_bw = states[layer]
            if layer == 0:
                x_fw = x_ref[t]
                x_bw = x_ref[in_steps - 1 - t]
            else:
                x_fw = src[layer][0][t]
                x_bw = src[layer][1][t]
            nh_fw, nc_fw = cell(x_fw, h_fw[...], c_fw[...],
                                wx_fw_ref, wh_fw_ref, b_fw_ref)
            nh_bw, nc_bw = cell(x_bw, h_bw[...], c_bw[...],
                                wx_bw_ref, wh_bw_ref, b_bw_ref)
            h_fw[...] = nh_fw
            c_fw[...] = nc_fw
            h_bw[...] = nh_bw
            c_bw[...] = nc_bw
            if layer == num_layers - 1:
                if t == out_steps - 1:  # only the center row leaves VMEM
                    out_fw_ref[0, :, :] = nh_fw.astype(seq_dtype)
                    out_bw_ref[0, :, :] = nh_bw.astype(seq_dtype)
            else:
                dst_fw, dst_bw = src[layer + 1]
                dst_fw[t] = nh_fw.astype(seq_dtype)
                dst_bw[t] = nh_bw.astype(seq_dtype)


@functools.partial(jax.jit, static_argnames=("num_layers", "num_hidden",
                                             "timesteps", "forget_bias",
                                             "tile_b", "interpret",
                                             "precision", "wavefront",
                                             "merged_gemm", "pregemm",
                                             "gate_store"))
def bilstm_fused_center_mono(
    params: Dict[str, Any],
    x: jnp.ndarray,
    num_layers: int = 3,
    num_hidden: int = 100,
    timesteps: int = 21,
    forget_bias: float = 1.0,
    tile_b: int | None = None,
    interpret: bool | None = None,
    precision: str = "fp32",
    wavefront: bool = False,
    merged_gemm: bool = False,
    pregemm: bool = False,
    gate_store: str = "fp32",
) -> jnp.ndarray:
    """(B, T, F) -> (B, 2H) center features, whole stack in ONE kernel.

    Odd T only (the readout-cone truncation makes every layer's useful
    sequence exactly steps 0..T//2 of each lane). Inter-layer sequences
    live in VMEM scratch, so HBM traffic per window is one (T, F) input
    read plus one (2H,) center write — nothing else.

    wavefront=True (num_layers <= 3) runs the layers skewed by one
    timestep so all 2*num_layers recurrence chains are independent within
    a wavefront step — more ILP for the scheduler at the cost of
    per-layer h/c scratch.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert timesteps % 2 == 1, "mono kernel requires odd T"
    assert timesteps // 2 + 1 <= 32, (
        "mono kernel statically unrolls its steps; use the layered "
        "kernel (bilstm_fused_center) for T > 63"
    )
    seq_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    if tile_b is None:
        # measured on v5e (scripts/probe_mono.py): bf16 384 > 512 > 256;
        # fp32 128 > 256 (the mono kernel's smaller VMEM footprint admits
        # tiles the layered kernel OOMs at)
        tile_b = 384 if precision == "bf16" else 128
    batch, t, in_dim = x.shape
    assert t == timesteps
    h = num_hidden
    batch_p = _round_up(max(batch, 1), tile_b)
    out_steps = timesteps // 2 + 1

    x_pad = jnp.pad(
        x.astype(seq_dtype),
        ((0, batch_p - batch), (0, 0), (0, LANE - in_dim)),
    )
    x_pad = jnp.moveaxis(x_pad, 1, 0)  # time-major (T, B, LANE)

    w_args = []
    for layer in range(num_layers):
        cur_in = in_dim if layer == 0 else h
        for lane in ("fw", "bw"):
            lp = params[lane][layer]
            wx, wh = _pad_weights(
                jnp.asarray(lp["kernel"]).astype(seq_dtype), cur_in, h
            )
            b = _pad_gate_blocks(jnp.asarray(lp["bias"]), h)[None, :]
            if seq_dtype == jnp.bfloat16:
                wx, wh, b = _prescale_ifo(wx, wh, b)
            if merged_gemm:
                # one packed (2*LANE, GATES) operand: gates come from a
                # single [x; h] @ [Wx; Wh] dot per cell step
                w_args.extend([jnp.concatenate([wx, wh], axis=0), b])
            else:
                w_args.extend([wx, wh, b])

    grid = (batch_p // tile_b,)
    in_spec = pl.BlockSpec(
        (timesteps, tile_b, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec((LANE, GATES), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, GATES), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, tile_b, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    state_scratch = pltpu.VMEM((tile_b, LANE), jnp.float32)
    seq_scratch = pltpu.VMEM((out_steps, tile_b, LANE), seq_dtype)
    extra_scratch = []
    if wavefront:
        assert num_layers <= 3, "wavefront schedule needs num_layers <= 3"
        assert not merged_gemm, "merged_gemm probes the sequential schedule"
        kern = _mono_wavefront_kernel
        n_state = 4 * num_layers
        per_layer_specs = [w_spec, w_spec, b_spec]
    elif merged_gemm:
        kern = _mono_merged_kernel
        n_state = 4
        w_spec_packed = pl.BlockSpec(
            (2 * LANE, GATES), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        per_layer_specs = [w_spec_packed, b_spec]
        # [x; h] assembly buffers, one per lane
        extra_scratch = [pltpu.VMEM((tile_b, 2 * LANE), seq_dtype)] * 2
    elif pregemm:
        gate_dtype = jnp.bfloat16 if gate_store == "bf16" else jnp.float32
        kern = functools.partial(_mono_pregemm_kernel, gate_dtype=gate_dtype)
        n_state = 4
        per_layer_specs = [w_spec, w_spec, b_spec]
        # per-lane precomputed input-projection gate buffers
        extra_scratch = [
            pltpu.VMEM((out_steps, tile_b, GATES), gate_dtype)
        ] * 2
    else:
        kern = _mono_kernel
        n_state = 4
        per_layer_specs = [w_spec, w_spec, b_spec]
    out_fw, out_bw = pl.pallas_call(
        functools.partial(
            kern,
            num_layers=num_layers,
            in_steps=timesteps,
            out_steps=out_steps,
            forget_bias=forget_bias,
            seq_dtype=seq_dtype,
        ),
        grid=grid,
        in_specs=[in_spec] + per_layer_specs * (2 * num_layers),
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((1, batch_p, LANE), seq_dtype),
            jax.ShapeDtypeStruct((1, batch_p, LANE), seq_dtype),
        ),
        scratch_shapes=(
            [state_scratch] * n_state + extra_scratch + [seq_scratch] * 4
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 2 * num_layers * batch_p * out_steps * LANE * GATES,
            bytes_accessed=2 * batch_p * timesteps * LANE,
            transcendentals=10 * num_layers * batch_p * out_steps * LANE,
        ),
        interpret=interpret,
    )(x_pad, *w_args)
    fw_c = out_fw[0, :batch, :h]
    bw_c = out_bw[0, :batch, :h]
    return jnp.concatenate([fw_c, bw_c], axis=-1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_layers", "num_hidden",
                                             "timesteps", "forget_bias",
                                             "tile_b", "interpret",
                                             "precision", "mono"))
def bilstm_fused_center(
    params: Dict[str, Any],
    x: jnp.ndarray,
    num_layers: int = 3,
    num_hidden: int = 100,
    timesteps: int = 21,
    forget_bias: float = 1.0,
    tile_b: int | None = None,  # None: auto per kernel/precision
    interpret: bool | None = None,
    precision: str = "fp32",
    mono: bool | None = None,   # None: auto (mono for odd T <= 25);
                                # False forces the layered kernels
) -> jnp.ndarray:
    """(B, T, F) -> (B, 2H) center features via the fused layer kernels.

    precision='bf16' stores the inter-layer sequences and weights in
    bfloat16 (matmuls still accumulate fp32, cell state stays fp32) —
    roughly halves HBM traffic and doubles MXU rate at a small accuracy
    cost; fp32 is bit-compatible with the XLA scan path.

    Odd T (up to 25) routes through the mono kernel (whole stack in one
    pallas_call, inter-layer sequences VMEM-resident) — bit-identical to
    the layered kernel and measured faster (scripts/probe_mono.py: +1%
    bf16, +6% fp32). Larger or even T keeps the per-layer kernels: the
    mono kernel's 4 sequence scratch buffers + input block outgrow the
    16M scoped-VMEM limit around T~31 at its default tiles, and its
    static unroll has no fori_loop fallback past 32 steps.
    """
    if mono is None:
        mono = timesteps % 2 == 1 and timesteps <= 25
    if mono:
        # an explicit tile_b selects the MONO kernel's batch tile (the
        # production kernel for odd T) — it must not silently fall back
        # to the slower layered kernel; mono=False forces the layered
        # kernels (parity tests, even-T shapes)
        return bilstm_fused_center_mono(
            params, x, num_layers=num_layers, num_hidden=num_hidden,
            timesteps=timesteps, forget_bias=forget_bias, tile_b=tile_b,
            interpret=interpret, precision=precision,
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seq_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    if tile_b is None:
        tile_b = 256 if precision == "bf16" else 128
    batch, t, in_dim = x.shape
    assert t == timesteps
    batch_p = _round_up(max(batch, 1), tile_b)

    x_pad = jnp.pad(
        x.astype(seq_dtype),
        ((0, batch_p - batch), (0, 0), (0, LANE - in_dim)),
    )
    x_pad = jnp.moveaxis(x_pad, 1, 0)  # time-major (T, B, LANE)
    in_fw = x_pad
    in_bw = x_pad  # layer 0 reads the bw lane time-reversed
    reverse_bw_read = True
    h = num_hidden
    # odd T: every layer's readout cone is steps 0..center of each lane
    # (directions are independent stacks), so all layers stop there
    out_steps = (timesteps // 2 + 1) if timesteps % 2 == 1 else timesteps
    for layer in range(num_layers):
        lp_fw = params["fw"][layer]
        lp_bw = params["bw"][layer]
        cur_in = in_dim if layer == 0 else h
        wx_fw, wh_fw = _pad_weights(
            jnp.asarray(lp_fw["kernel"]).astype(seq_dtype), cur_in, h
        )
        wx_bw, wh_bw = _pad_weights(
            jnp.asarray(lp_bw["kernel"]).astype(seq_dtype), cur_in, h
        )
        b_fw = _pad_gate_blocks(jnp.asarray(lp_fw["bias"]), h)[None, :]
        b_bw = _pad_gate_blocks(jnp.asarray(lp_bw["bias"]), h)[None, :]
        if seq_dtype == jnp.bfloat16:
            wx_fw, wh_fw, b_fw = _prescale_ifo(wx_fw, wh_fw, b_fw)
            wx_bw, wh_bw, b_bw = _prescale_ifo(wx_bw, wh_bw, b_bw)
        # odd-T: the final layer stores ONLY the center row (its sequence
        # is never read back); even-T needs two different rows, keep all
        final = (layer == num_layers - 1) and timesteps % 2 == 1
        in_fw, in_bw = _run_layer(
            in_fw, in_bw,
            (wx_fw, wh_fw, b_fw, wx_bw, wh_bw, b_bw),
            out_steps, forget_bias, reverse_bw_read, tile_b, interpret,
            seq_dtype, final,
        )
        reverse_bw_read = False  # bw lane already reversed-layout
    center = timesteps // 2
    if timesteps % 2 == 1:
        # the final layer stored only the center row
        fw_c = in_fw[0, :batch, :h]
        bw_c = in_bw[0, :batch, :h]
    else:
        fw_c = in_fw[center, :batch, :h]
        bw_c = in_bw[timesteps - 1 - center, :batch, :h]
    return jnp.concatenate([fw_c, bw_c], axis=-1).astype(jnp.float32)
