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


def test_bf16_storage_mode_close_to_fp32(setup):
    """precision='bf16' (bf16-stored residual/gradient sequences, fp32
    compute) must track the fp32 fused path closely: forward features
    within bf16 rounding, gradients within a few e-2 relative — the
    bf16-checkpointed-activations error class, good enough to train
    (convergence exercised by the CPU smoke below)."""

    config, params, x = setup

    def loss_p(params, x, precision):
        feats = bilstm_fused_center_train(
            params, x, config.num_layers, config.num_hidden,
            config.timesteps, config.forget_bias, 8, True, precision,
        )
        return jnp.sum(feats * feats) * 0.5 + jnp.sum(feats)

    f32 = np.asarray(loss_p(params, x, "fp32"))
    b16 = np.asarray(loss_p(params, x, "bf16"))
    assert abs(f32 - b16) / max(abs(f32), 1e-6) < 2e-2

    from jax.flatten_util import ravel_pytree

    g32 = jax.grad(lambda p: loss_p(p, x, "fp32"))(params)
    g16 = jax.grad(lambda p: loss_p(p, x, "bf16"))(params)
    flat32, _ = ravel_pytree({"fw": g32["fw"], "bw": g32["bw"]})
    flat16, _ = ravel_pytree({"fw": g16["fw"], "bw": g16["bw"]})
    denom = float(jnp.linalg.norm(flat32))
    rel = float(jnp.linalg.norm(flat32 - flat16)) / max(denom, 1e-9)
    assert rel < 5e-2, rel
    # cosine similarity: the descent direction must be preserved
    cos = float(
        jnp.dot(flat32, flat16)
        / (jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16) + 1e-12)
    )
    assert cos > 0.999, cos


def test_bf16_train_step_learns():
    """A few bf16-mode fused steps must reduce the loss on a separable
    toy problem (descent-direction sanity beyond the gradient check)."""
    import optax

    from deepmod_tpu.train.trainer import make_train_step

    config = BiLSTMConfig(num_input=7, num_hidden=100, timesteps=21)
    params = init_bilstm_params(jax.random.PRNGKey(3), config)
    rng = np.random.default_rng(5)
    batch = 64
    x = rng.standard_normal((batch, 21, 7)).astype(np.float32)
    labels = (x[:, 10, 4] > 0).astype(np.int64)  # center mean column
    y = np.eye(2, dtype=np.float32)[labels]
    mask = np.ones(batch, np.float32)
    optimizer = optax.adam(1e-2)
    step = make_train_step(
        config, optimizer, unbalanced=False, use_pallas=True,
        precision="bf16",
    )
    opt_state = optimizer.init(params)
    losses = []
    for _ in range(12):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(mask),
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses
