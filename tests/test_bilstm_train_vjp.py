"""Custom-VJP fused training kernel vs jax.grad of the scan path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepmod_tpu.models.bilstm import (
    BiLSTMConfig,
    bilstm_center_features,
    init_bilstm_params,
)
from deepmod_tpu.ops.bilstm_fused_train import bilstm_fused_center_train


@pytest.fixture(scope="module")
def setup():
    config = BiLSTMConfig(num_input=7, num_hidden=100, timesteps=21)
    params = init_bilstm_params(jax.random.PRNGKey(0), config)
    x = jax.random.normal(jax.random.PRNGKey(1), (12, 21, 7), jnp.float32)
    return config, params, x


def _loss_scan(params, x, config):
    feats = bilstm_center_features(params, x, config)
    return jnp.sum(feats * feats) * 0.5 + jnp.sum(feats)


def _loss_fused(params, x, config):
    feats = bilstm_fused_center_train(
        params, x, config.num_layers, config.num_hidden, config.timesteps,
        config.forget_bias, 8, True,  # tile_b=8, interpret
    )
    return jnp.sum(feats * feats) * 0.5 + jnp.sum(feats)


def test_forward_matches(setup):
    config, params, x = setup
    got = np.asarray(
        bilstm_fused_center_train(
            params, x, config.num_layers, config.num_hidden,
            config.timesteps, config.forget_bias, 8, True,
        )
    )
    want = np.asarray(bilstm_center_features(params, x, config))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gradients_match_scan(setup):
    config, params, x = setup
    g_scan = jax.grad(_loss_scan, argnums=(0, 1))(params, x, config)
    g_fused = jax.grad(_loss_fused, argnums=(0, 1))(params, x, config)

    # input gradient
    np.testing.assert_allclose(
        np.asarray(g_fused[1]), np.asarray(g_scan[1]), rtol=5e-4, atol=5e-5
    )
    # parameter gradients, every layer/direction
    for direction in ("fw", "bw"):
        for layer in range(config.num_layers):
            for field in ("kernel", "bias"):
                got = np.asarray(g_fused[0][direction][layer][field])
                want = np.asarray(g_scan[0][direction][layer][field])
                np.testing.assert_allclose(
                    got, want, rtol=5e-4, atol=5e-5,
                    err_msg=f"{direction}/{layer}/{field}",
                )
    # output projection is untouched by the center function -> zero grads
    np.testing.assert_array_equal(np.asarray(g_fused[0]["out_w"]), 0.0)
