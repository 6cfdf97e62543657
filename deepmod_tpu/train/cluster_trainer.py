"""Trainer for the cluster-effect second-stage MLP.

The reference ships only the trained checkpoint
(train_deepmod/na12878_cluster_train_mod-keep_prob0.7-nb25-chr1; its
training script is not in the repo). This trainer reproduces what the
checkpoint implies: the 14->100->20->1 sigmoid MLP of
models.cluster_mlp, Adam optimization (the checkpoint carries Adam
slots), dropout keep_prob 0.7 (from the bundled directory name), batch
4096 (hm_cluster_predict.py:16).

Training pairs come from build_cluster_features over a merged BED plus
target methylation fractions (e.g. bisulfite truth); the loss is binary
cross-entropy against fractional targets (equivalently, per-read
Bernoulli likelihood of the site's refined fraction).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from deepmod_tpu.models.cluster_mlp import (
    ClusterMLPConfig,
    cluster_forward,
    init_cluster_params,
)


@dataclasses.dataclass
class ClusterTrainConfig:
    epochs: int = 10
    batch_size: int = 4096       # hm_cluster_predict.py:16
    learning_rate: float = 1e-3
    keep_prob: float = 0.7       # bundled checkpoint name
    seed: int = 0


def train_cluster_model(
    features: np.ndarray,
    targets: np.ndarray,
    config: Optional[ClusterTrainConfig] = None,
    model_config: Optional[ClusterMLPConfig] = None,
) -> Tuple[Dict[str, jnp.ndarray], List[float]]:
    """(N, 14) features + (N,) target fractions -> trained params.

    Returns (params, per-epoch mean loss history).
    """
    config = config or ClusterTrainConfig()
    model_config = model_config or ClusterMLPConfig()
    key = jax.random.PRNGKey(config.seed)
    key, init_key = jax.random.split(key)
    params = init_cluster_params(init_key, model_config)
    optimizer = optax.adam(config.learning_rate)
    opt_state = optimizer.init(params)

    def loss_fn(p, x, y, dropout_key):
        pred = cluster_forward(
            p, x, keep_prob=config.keep_prob, dropout_key=dropout_key
        )
        pred = jnp.clip(pred, 1e-6, 1.0 - 1e-6)
        return -jnp.mean(y * jnp.log(pred) + (1.0 - y) * jnp.log(1.0 - pred))

    @jax.jit
    def step(p, opt_state, x, y, dropout_key):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y, dropout_key)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    n = len(features)
    history: List[float] = []
    for epoch in range(config.epochs):
        key, perm_key = jax.random.split(key)
        order = np.asarray(jax.random.permutation(perm_key, n))
        losses = []
        for lo in range(0, n, config.batch_size):
            idx = order[lo : lo + config.batch_size]
            key, dk = jax.random.split(key)
            params, opt_state, loss = step(
                params, opt_state,
                jnp.asarray(features[idx]), jnp.asarray(targets[idx]), dk,
            )
            losses.append(float(loss))
        history.append(float(np.mean(losses)))
    return params, history


def save_cluster_npz(path: str, params) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
