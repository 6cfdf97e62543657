"""Sharding specifications and sharded train/predict steps.

TPU-first scaling design (replaces the reference's per-process TF session
copies, myDetect.py:948-956):

- data parallelism: batch sharded over the 'data' axis; XLA all-reduces
  gradients (training) and nothing at all for inference;
- tensor parallelism: every LSTM kernel is sharded over its 4H gate axis
  on the 'model' axis (each shard computes a slice of the gate
  pre-activations; XLA all-gathers h between steps and re-shards at the
  gate split), the output projection is sharded on its input dim with a
  psum of partial logits. Annotation-driven: we place shardings on the
  parameter pytree and let the SPMD partitioner insert collectives.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepmod_tpu.models.bilstm import (
    BiLSTMConfig,
    bilstm_logits,
    bilstm_predict,
)


def bilstm_param_spec(
    model_axis: Optional[str] = "model", num_layers: int = 3
) -> Any:
    """PartitionSpec pytree for the BiLSTM parameter pytree.

    With a model axis: kernels (in+H, 4H) shard the gate dim, biases (4H,)
    shard dim 0, out_w (2H, C) shards the input dim (partial-sum logits).
    Without: fully replicated.
    """
    if model_axis is None:
        layer = {"kernel": P(), "bias": P()}
        return {
            "fw": [layer] * num_layers,
            "bw": [layer] * num_layers,
            "out_w": P(),
            "out_b": P(),
        }
    layer = {"kernel": P(None, model_axis), "bias": P(model_axis)}
    return {
        "fw": [layer] * num_layers,
        "bw": [layer] * num_layers,
        "out_w": P(model_axis, None),
        "out_b": P(),
    }


def _tree_shardings(mesh: Mesh, spec_tree):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def make_sharded_predict(
    model_config: BiLSTMConfig,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: Optional[str] = None,
    use_pallas: bool = False,
    precision: str = "fp32",
) -> Callable:
    """jit (params, x) -> predictions with dp (+ optional tp) shardings.

    ``use_pallas`` runs the fused kernel per data shard inside shard_map
    (a pallas_call is opaque to the SPMD partitioner). It requires fully
    replicated params, so tensor parallelism falls back to the XLA scan.
    """
    if model_axis is not None and model_axis not in mesh.axis_names:
        model_axis = None
    param_sh = _tree_shardings(
        mesh, bilstm_param_spec(model_axis, model_config.num_layers)
    )
    x_sh = NamedSharding(mesh, P(data_axis))
    out_sh = NamedSharding(mesh, P(data_axis))

    def predict(params, x):
        return bilstm_predict(
            params, x, model_config,
            use_pallas=use_pallas and model_axis is None,
            precision=precision,
        )

    if use_pallas and model_axis is None:
        predict = jax.shard_map(
            predict,
            mesh=mesh,
            in_specs=(P(), P(data_axis)),
            out_specs=P(data_axis),
            check_vma=False,
        )
    return jax.jit(
        predict,
        in_shardings=(param_sh, x_sh),
        out_shardings=out_sh,
    )


def make_sharded_train_step(
    model_config: BiLSTMConfig,
    optimizer,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: Optional[str] = None,
    unbalanced: bool = False,
) -> Callable:
    """jit train step with dp batch sharding + optional tp param sharding.

    Signature: (params, opt_state, x, y, mask) -> (params, opt_state, loss)
    """
    if model_axis is not None and model_axis not in mesh.axis_names:
        model_axis = None
    param_spec = bilstm_param_spec(model_axis, model_config.num_layers)
    param_sh = _tree_shardings(mesh, param_spec)
    batch_sh = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())

    def masked_loss(params, x, y, mask):
        logits = bilstm_logits(params, x, model_config)
        if unbalanced:
            from deepmod_tpu.models.bilstm import CLASS_WEIGHTS

            logits = logits * jnp.asarray(CLASS_WEIGHTS, logits.dtype)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_example = -jnp.sum(y.astype(logp.dtype) * logp, axis=-1)
        return jnp.sum(per_example * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def step(params, opt_state, x, y, mask):
        loss, grads = jax.value_and_grad(masked_loss)(params, x, y, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # opt_state shardings are left to inference (None): adam's m/v mirror
    # whatever layout the donated params carry
    return jax.jit(
        step,
        in_shardings=(param_sh, None, batch_sh, batch_sh, batch_sh),
        out_shardings=(param_sh, None, repl),
        donate_argnums=(0, 1),
    )
