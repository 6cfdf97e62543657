"""Full TF1-checkpoint import parity.

The reference's RNN checkpoints ship without tensor data (the repo strips
the .data blobs), so this test CREATES a TF checkpoint with the exact
reference variable naming (bidirectional_rnn/{fw,bw}/multi_rnn_cell/
cell_i/basic_lstm_cell/{kernel,bias} + Variable/Variable_1), imports it
through deepmod_tpu.models.tf_import, and checks logits parity against
the same weights loaded directly — closing the TF->JAX import loop with
the real checkpoint format.

Slow (imports TensorFlow); skipped when TF is unavailable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from deepmod_tpu.models.bilstm import (
    BiLSTMConfig,
    bilstm_logits,
    init_bilstm_params,
)
from deepmod_tpu.models.tf_import import (
    bilstm_config_from_checkpoint,
    load_bilstm_checkpoint,
)


def test_tf1_checkpoint_import_parity(tmp_path):
    tf1 = tf.compat.v1
    config = BiLSTMConfig(num_input=7, num_hidden=100, timesteps=21)
    source = init_bilstm_params(jax.random.PRNGKey(7), config)

    graph = tf1.Graph()
    with graph.as_default():
        for direction in ("fw", "bw"):
            for layer in range(3):
                prefix = (
                    f"bidirectional_rnn/{direction}/multi_rnn_cell/"
                    f"cell_{layer}/basic_lstm_cell"
                )
                tf1.Variable(
                    np.asarray(source[direction][layer]["kernel"]),
                    name=f"{prefix}/kernel",
                )
                tf1.Variable(
                    np.asarray(source[direction][layer]["bias"]),
                    name=f"{prefix}/bias",
                )
        tf1.Variable(np.asarray(source["out_w"]), name="Variable")
        tf1.Variable(np.asarray(source["out_b"]), name="Variable_1")
        saver = tf1.train.Saver()
        init = tf1.global_variables_initializer()
    prefix = str(tmp_path / "mod_train_test")
    with tf1.Session(graph=graph) as sess:
        sess.run(init)
        saver.save(sess, prefix)

    inferred = bilstm_config_from_checkpoint(prefix)
    assert inferred.num_input == 7
    assert inferred.num_hidden == 100
    assert inferred.num_layers == 3

    params, loaded_config = load_bilstm_checkpoint(prefix)
    x = jax.random.normal(jax.random.PRNGKey(8), (9, 21, 7), jnp.float32)
    got = np.asarray(bilstm_logits(params, x, config))
    want = np.asarray(bilstm_logits(source, x, config))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
