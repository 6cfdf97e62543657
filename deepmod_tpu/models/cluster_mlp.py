"""Cluster-effect second-stage model (5mC CpG refinement), TPU-native.

Re-implements the MLP restored by the reference's
DeepMod_tools/hm_cluster_predict.py:94-103 from the bundled checkpoint
``train_deepmod/na12878_cluster_train_mod-keep_prob0.7-nb25-chr1/Cg.cov5.nb25``
(the only model whose weights ship complete in the reference repo).

Architecture, extracted from that checkpoint's variables:
    X (B, 14) -> W_1 (14, 100) + b_1 -> ReLU -> dropout
              -> W_2 (100, 20) + b_2 -> ReLU -> dropout
              -> W_O (20, 1)  + b_O -> sigmoid = output:0

Inference always runs with keep_prob=1 (hm_cluster_predict.py:161), so
dropout is identity here; training-time dropout uses the keep_prob arg.

The 14-dim input per CpG site (hm_cluster_predict.py:134-154):
    [own meth frac, opposite-strand partner meth frac, neighbor CpG count,
     11-bin histogram (bin = round(frac/0.1)) of neighbor CpG meth fracs
     within +-25 bp, normalized by the count].
Feature construction lives in deepmod_tpu.tools.cluster_predict.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClusterMLPConfig:
    num_input: int = 14
    hidden1: int = 100
    hidden2: int = 20
    nb_size: int = 25      # neighbor window, hm_cluster_predict.py:83
    cov_threshold: int = 5  # coverage gate, hm_cluster_predict.py:18


Params = Dict[str, Any]


def init_cluster_params(key: jax.Array, config: ClusterMLPConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)

    def trunc(k, shape, stddev):
        return stddev * jax.random.truncated_normal(k, -2.0, 2.0, shape, jnp.float32)

    return {
        "W_1": trunc(k1, (config.num_input, config.hidden1), 0.1),
        "b_1": jnp.zeros((config.hidden1,), jnp.float32),
        "W_2": trunc(k2, (config.hidden1, config.hidden2), 0.1),
        "b_2": jnp.zeros((config.hidden2,), jnp.float32),
        "W_O": trunc(k3, (config.hidden2, 1), 0.1),
        "b_O": jnp.zeros((1,), jnp.float32),
    }


def cluster_forward(
    params: Params,
    x: jax.Array,
    keep_prob: float = 1.0,
    dropout_key: jax.Array | None = None,
) -> jax.Array:
    """(B, 14) -> (B,) sigmoid methylation percentage in [0, 1]."""
    h1 = jax.nn.relu(
        jnp.dot(x, params["W_1"], preferred_element_type=jnp.float32) + params["b_1"]
    )
    if keep_prob < 1.0 and dropout_key is not None:
        kd1, kd2 = jax.random.split(dropout_key)
        keep1 = jax.random.bernoulli(kd1, keep_prob, h1.shape)
        h1 = jnp.where(keep1, h1 / keep_prob, 0.0)
    h2 = jax.nn.relu(
        jnp.dot(h1, params["W_2"], preferred_element_type=jnp.float32) + params["b_2"]
    )
    if keep_prob < 1.0 and dropout_key is not None:
        keep2 = jax.random.bernoulli(kd2, keep_prob, h2.shape)
        h2 = jnp.where(keep2, h2 / keep_prob, 0.0)
    out = jnp.dot(h2, params["W_O"], preferred_element_type=jnp.float32) + params["b_O"]
    return jax.nn.sigmoid(out)[:, 0]
