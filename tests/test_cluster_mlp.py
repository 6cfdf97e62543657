"""Cluster-effect MLP: golden parity against the reference TF1 checkpoint.

tests/golden/cluster_weights.npz was produced by
deepmod_tpu.models.tf_import.load_cluster_checkpoint from the complete
bundled reference checkpoint (train_deepmod/na12878_cluster_train_mod-*);
cluster_parity_{x,y}.npy is the input/output of the ORIGINAL TF1
meta-graph (output:0 with keep_prob=1) restored in a TF session — so this
test pins our JAX forward pass to the reference model bit-for-bit within
fp32 tolerance.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from deepmod_tpu.models.cluster_mlp import (
    ClusterMLPConfig,
    cluster_forward,
    init_cluster_params,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _golden_params():
    data = np.load(os.path.join(GOLDEN, "cluster_weights.npz"))
    return {k: jnp.asarray(data[k]) for k in data.files}


def test_golden_parity_with_tf_checkpoint():
    params = _golden_params()
    x = np.load(os.path.join(GOLDEN, "cluster_parity_x.npy"))
    want = np.load(os.path.join(GOLDEN, "cluster_parity_y.npy")).ravel()
    got = np.asarray(cluster_forward(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_shapes_and_range():
    config = ClusterMLPConfig()
    params = init_cluster_params(jax.random.PRNGKey(0), config)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 14))
    out = np.asarray(cluster_forward(params, x))
    assert out.shape == (32,)
    assert np.all(out > 0) and np.all(out < 1)


def test_dropout_train_path():
    config = ClusterMLPConfig()
    params = init_cluster_params(jax.random.PRNGKey(0), config)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 14))
    a = cluster_forward(params, x, keep_prob=0.7, dropout_key=jax.random.PRNGKey(2))
    b = cluster_forward(params, x, keep_prob=0.7, dropout_key=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(a), np.asarray(b))
