"""Checkpoint import / native .npz round-trip tests (no TF needed)."""

import numpy as np
import jax

from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
from deepmod_tpu.models.tf_import import load_bilstm_npz, save_bilstm_npz


def test_npz_round_trip(tmp_path):
    config = BiLSTMConfig(num_input=7, output_layer="")
    params = init_bilstm_params(jax.random.PRNGKey(3), config)
    path = str(tmp_path / "model.npz")
    save_bilstm_npz(path, params, config)
    params2, config2 = load_bilstm_npz(path)
    assert config2 == config  # incl. output_layer "" (0-d bytes decoding)
    for direction in ("fw", "bw"):
        for a, b in zip(params[direction], params2[direction]):
            np.testing.assert_array_equal(np.asarray(a["kernel"]), b["kernel"])
            np.testing.assert_array_equal(np.asarray(a["bias"]), b["bias"])
    np.testing.assert_array_equal(np.asarray(params["out_w"]), params2["out_w"])


def test_npz_round_trip_sigmoid_layer(tmp_path):
    config = BiLSTMConfig(num_input=57, num_hidden=100, output_layer="sigmoid")
    params = init_bilstm_params(jax.random.PRNGKey(4), config)
    path = str(tmp_path / "model57.npz")
    save_bilstm_npz(path, params, config)
    _, config2 = load_bilstm_npz(path)
    assert config2.output_layer == "sigmoid"
    assert config2.num_input == 57
