"""Bidirectional stacked-LSTM modification classifier, TPU-native.

Re-implements the semantics of the reference TF1 graph
(bin/DeepMod_scripts/myMultiBiRNN.py:21-91) as pure JAX:

- 3 stacked LSTM layers per direction, hidden size 100, with the exact
  cell math of TF1 ``BasicLSTMCell(num_hidden, forget_bias=1.0)``:
  gates = [x; h] @ W + b split in (i, j, f, o) order,
  c' = c * sigmoid(f + forget_bias) + sigmoid(i) * tanh(j),
  h' = tanh(c') * sigmoid(o).
- bidirectional outputs concatenated [fw; bw] per timestep
  (``static_bidirectional_rnn``, myMultiBiRNN.py:47);
- logits read from the CENTER timestep only: ``outputs[T // 2]`` projected
  by a (2H, 2) dense layer (myMultiBiRNN.py:55), or a sigmoid-activated
  dense layer when ``output_layer == 'sigmoid'`` (myMultiBiRNN.py:52-53);
- optional class-weighted loss that multiplies the logits by (0.1, 0.9)
  before the softmax cross-entropy (myMultiBiRNN.py:13,64-65).

TPU-first design notes (NOT a translation of the TF graph):

- The input projection of every (layer, direction) is hoisted out of the
  recurrence into one large (B*T, F) @ (F, 4H) matmul that XLA tiles onto
  the MXU; the ``lax.scan`` body only performs the (B, H) @ (H, 4H)
  hidden-state matmul plus fused elementwise gate math.
- The whole classifier is jit-compatible with static window shapes; batch
  padding/masking happens in the caller (deepmod_tpu.engine).
- An optional Pallas fused-recurrence kernel (deepmod_tpu.ops.lstm_pallas)
  keeps h/c in VMEM across all timesteps; ``use_pallas=True`` switches the
  per-layer recurrence to it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BiLSTMConfig:
    """Hyperparameters (defaults match bin/DeepMod.py:336-338,305-319)."""

    num_input: int = 7          # --fnum
    num_hidden: int = 100       # --hidden
    timesteps: int = 21         # --windowsize
    num_layers: int = 3         # myMultiBiRNN.py:23
    num_classes: int = 2        # myMultiBiRNN.py:21
    forget_bias: float = 1.0    # myMultiBiRNN.py:39-40
    output_layer: str = ""      # "" (linear) or "sigmoid" (myMultiBiRNN.py:50-53)

    @property
    def center(self) -> int:
        return self.timesteps // 2


Params = Dict[str, Any]


def _truncated_normal(key, shape, stddev=1.0, dtype=jnp.float32):
    """TF ``truncated_normal`` initializer: resample beyond 2 sigma."""
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def init_bilstm_params(key: jax.Array, config: BiLSTMConfig) -> Params:
    """Initialize parameters with TF1-equivalent initializers.

    LSTM kernels use glorot-uniform (TF1 default for BasicLSTMCell), biases
    zeros; the output projection uses truncated normal for both the weight
    and the bias, matching ``tf.truncated_normal`` at myMultiBiRNN.py:31-32.
    """
    h = config.num_hidden
    keys = jax.random.split(key, 2 * config.num_layers + 2)
    params: Params = {"fw": [], "bw": []}
    ki = 0
    for direction in ("fw", "bw"):
        for layer in range(config.num_layers):
            in_dim = config.num_input if layer == 0 else h
            fan_in, fan_out = in_dim + h, 4 * h
            limit = np.sqrt(6.0 / (fan_in + fan_out))
            kernel = jax.random.uniform(
                keys[ki], (in_dim + h, 4 * h), jnp.float32, -limit, limit
            )
            ki += 1
            params[direction].append(
                {"kernel": kernel, "bias": jnp.zeros((4 * h,), jnp.float32)}
            )
    params["out_w"] = _truncated_normal(keys[ki], (2 * h, config.num_classes))
    params["out_b"] = _truncated_normal(keys[ki + 1], (config.num_classes,))
    return params


def _lstm_layer(
    kernel: jax.Array,
    bias: jax.Array,
    x_seq: jax.Array,
    forget_bias: float,
    reverse: bool,
) -> jax.Array:
    """Run one LSTM layer over a (B, T, F) sequence; returns (B, T, H).

    The input projection runs as a single large matmul before the scan so
    the MXU sees one (B*T, F) @ (F, 4H) contraction; the scan body only
    computes h @ Wh (an (B, H) @ (H, 4H) MXU matmul) plus the fused VPU
    gate math.
    """
    in_dim = x_seq.shape[-1]
    h_dim = kernel.shape[1] // 4
    w_x = kernel[:in_dim]
    w_h = kernel[in_dim:]

    # (B, T, 4H) input pre-activations, computed once.
    x_proj = jnp.einsum(
        "btf,fg->btg", x_seq, w_x, preferred_element_type=jnp.float32
    ) + bias

    def step(carry, xp_t):
        c, h = carry
        gates = xp_t + jnp.dot(h, w_h, preferred_element_type=jnp.float32)
        i, j, f, o = jnp.split(gates, 4, axis=-1)  # TF BasicLSTMCell order
        new_c = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
        return (new_c, new_h), new_h

    batch = x_seq.shape[0]
    init = (
        jnp.zeros((batch, h_dim), x_proj.dtype),
        jnp.zeros((batch, h_dim), x_proj.dtype),
    )
    # scan over time (axis 1) -> outputs stacked on axis 0, then move back.
    _, h_seq = jax.lax.scan(
        step, init, jnp.moveaxis(x_proj, 1, 0), reverse=reverse
    )
    # With reverse=True lax.scan processes t=T-1..0 but stores each output
    # at its own index, which is exactly the "reverse, run, un-reverse"
    # composition of static_bidirectional_rnn (myMultiBiRNN.py:47).
    return jnp.moveaxis(h_seq, 0, 1)


def _stack_direction(
    layers: List[Dict[str, jax.Array]],
    x_seq: jax.Array,
    forget_bias: float,
    reverse: bool,
    use_pallas: bool = False,
) -> jax.Array:
    out = x_seq
    for layer_params in layers:
        if use_pallas:
            from deepmod_tpu.ops.lstm_pallas import lstm_layer_pallas

            out = lstm_layer_pallas(
                layer_params["kernel"], layer_params["bias"], out,
                forget_bias=forget_bias, reverse=reverse,
            )
        else:
            out = _lstm_layer(
                layer_params["kernel"], layer_params["bias"], out,
                forget_bias, reverse,
            )
    return out


def _bidi_fused_features(
    params: Params, x: jax.Array, config: BiLSTMConfig
) -> jax.Array:
    """Both directions of each layer in ONE batched recurrence.

    The fw and bw stacks never interact until the output concat, so their
    per-step (B, H) @ (H, 4H) matmuls are fused into a single batched
    (2, B, H) @ (2, H, 4H) contraction — halving the number of sequential
    MXU dispatches vs running the directions one after the other. The bw
    lane lives in reversed-time layout through all layers; with odd T the
    center index is reversal-invariant, so the readout needs no flip.

    With odd T the center readout depends only on steps 0..T//2 of each
    lane at every depth (the stacks are direction-independent), so the
    whole computation runs on the truncated T//2+1-step sequences —
    identical math on the steps that reach the readout.
    """
    h = config.num_hidden
    seq = jnp.stack([x, x[:, ::-1]], axis=0)  # (2, B, T, F)
    if config.timesteps % 2 == 1:
        seq = seq[:, :, : config.center + 1]
    for layer in range(config.num_layers):
        k_fw = params["fw"][layer]
        k_bw = params["bw"][layer]
        in_dim = seq.shape[-1]
        w_x = jnp.stack([k_fw["kernel"][:in_dim], k_bw["kernel"][:in_dim]])
        w_h = jnp.stack([k_fw["kernel"][in_dim:], k_bw["kernel"][in_dim:]])
        bias = jnp.stack([k_fw["bias"], k_bw["bias"]])
        x_proj = jnp.einsum(
            "dbtf,dfg->dbtg", seq, w_x, preferred_element_type=jnp.float32
        ) + bias[:, None, None, :]

        def step(carry, xp_t):
            c, hh = carry
            gates = xp_t + jnp.einsum(
                "dbh,dhg->dbg", hh, w_h, preferred_element_type=jnp.float32
            )
            i, j, f, o = jnp.split(gates, 4, axis=-1)
            new_c = c * jax.nn.sigmoid(f + config.forget_bias) + jax.nn.sigmoid(
                i
            ) * jnp.tanh(j)
            new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
            return (new_c, new_h), new_h

        batch = seq.shape[1]
        init = (
            jnp.zeros((2, batch, h), x_proj.dtype),
            jnp.zeros((2, batch, h), x_proj.dtype),
        )
        _, h_seq = jax.lax.scan(step, init, jnp.moveaxis(x_proj, 2, 0))
        seq = jnp.moveaxis(h_seq, 0, 2)  # (2, B, T', H)
    center = config.center
    if config.timesteps % 2 == 1:
        # truncated sequences end exactly at the center step
        fw_c = seq[0, :, center]
        bw_c = seq[1, :, center]
    else:
        fw_c = seq[0, :, center]
        bw_c = seq[1, :, config.timesteps - 1 - center]
    return jnp.concatenate([fw_c, bw_c], axis=-1)


def bilstm_center_features(
    params: Params, x: jax.Array, config: BiLSTMConfig, use_pallas: bool = False,
    precision: str = "fp32", tile_b: Optional[int] = None,
) -> jax.Array:
    """(B, T, F) windows -> (B, 2H) center-timestep [fw; bw] features.

    use_pallas=True routes through the whole-layer fused Pallas kernel
    (ops.bilstm_fused) — in-kernel input projections, VMEM-resident
    state; otherwise the XLA scan path with batched fw/bw directions.
    precision='bf16' (pallas path only) stores sequences/weights in
    bfloat16 with fp32 accumulation. tile_b None auto-selects the
    measured-best batch tile (bf16 256/384 sit within the tunnel-load
    drift band of each other; see docs/Validation.md).
    """
    if not use_pallas:
        return _bidi_fused_features(params, x, config)
    from deepmod_tpu.ops.bilstm_fused import bilstm_fused_center

    return bilstm_fused_center(
        params, x,
        num_layers=config.num_layers,
        num_hidden=config.num_hidden,
        timesteps=config.timesteps,
        forget_bias=config.forget_bias,
        precision=precision,
        tile_b=tile_b,
    )


def bilstm_logits(
    params: Params, x: jax.Array, config: BiLSTMConfig, use_pallas: bool = False,
    precision: str = "fp32", tile_b: Optional[int] = None,
) -> jax.Array:
    """(B, T, F) -> (B, 2) logits, replicating myMultiBiRNN.py:50-55."""
    feats = bilstm_center_features(params, x, config, use_pallas, precision,
                                   tile_b)
    out = jnp.dot(feats, params["out_w"], preferred_element_type=jnp.float32)
    out = out + params["out_b"]
    if config.output_layer == "sigmoid":
        out = jax.nn.sigmoid(out)
    return out


def bilstm_probs(
    params: Params, x: jax.Array, config: BiLSTMConfig, use_pallas: bool = False,
    precision: str = "fp32", tile_b: Optional[int] = None,
) -> jax.Array:
    return jax.nn.softmax(
        bilstm_logits(params, x, config, use_pallas, precision, tile_b),
        axis=-1,
    )


def bilstm_predict(
    params: Params, x: jax.Array, config: BiLSTMConfig, use_pallas: bool = False,
    precision: str = "fp32", tile_b: Optional[int] = None,
) -> jax.Array:
    """argmax class per window (mfpred, myMultiBiRNN.py:59-61)."""
    return jnp.argmax(
        bilstm_logits(params, x, config, use_pallas, precision, tile_b),
        axis=-1,
    )


def bilstm_logits_trainable(
    params: Params, x: jax.Array, config: BiLSTMConfig,
    use_pallas: bool = False, tile_b: int = 0, precision: str = "fp32",
) -> jax.Array:
    """Differentiable logits; with use_pallas the recurrence runs through
    the custom-VJP fused kernels (ops.bilstm_fused_train) so BOTH the
    forward and the BPTT backward are Pallas.

    tile_b 0 auto-selects: 128 on the chip (+14% step rate vs 64 at
    batch 2048, measured v5e; 256 fails to compile), 64 under interpret
    (less padding for small test batches).

    precision 'bf16' stores the kernel's residual/gradient sequences in
    bfloat16 (fp32 compute/carries/weight-grads — bf16-checkpointed
    activations); fp32 (default) is the mode pinned against jax.grad of
    the scan path."""
    if use_pallas:
        from deepmod_tpu.ops.bilstm_fused_train import bilstm_fused_center_train

        on_tpu = jax.default_backend() == "tpu"
        if tile_b <= 0:
            tile_b = 128 if on_tpu else 64
        feats = bilstm_fused_center_train(
            params, x, config.num_layers, config.num_hidden,
            config.timesteps, config.forget_bias, tile_b,
            not on_tpu, precision,
        )
    else:
        feats = bilstm_center_features(params, x, config)
    out = jnp.dot(feats, params["out_w"], preferred_element_type=jnp.float32)
    out = out + params["out_b"]
    if config.output_layer == "sigmoid":
        out = jax.nn.sigmoid(out)
    return out


# Class weights for unbalanced training (myMultiBiRNN.py:13).
CLASS_WEIGHTS = (0.1, 0.9)


def bilstm_loss(
    params: Params,
    x: jax.Array,
    y: jax.Array,
    config: BiLSTMConfig,
    unbalanced: bool = False,
    use_pallas: bool = False,
) -> jax.Array:
    """Mean softmax cross-entropy.

    With ``unbalanced`` the LOGITS are scaled by the class weights before
    the softmax — an unusual formulation, but it is exactly what the
    reference does (myMultiBiRNN.py:64-65) and must be preserved for
    training parity.
    """
    logits = bilstm_logits(params, x, config, use_pallas)
    if unbalanced:
        logits = logits * jnp.asarray(CLASS_WEIGHTS, logits.dtype)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(y.astype(log_probs.dtype) * log_probs, axis=-1))


def count_params(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
