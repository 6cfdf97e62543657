"""BiLSTM model tests: TF1 BasicLSTMCell semantics, Pallas parity, shapes.

The numpy reference below is an INDEPENDENT implementation of the TF1
semantics (BasicLSTMCell gate order i,j,f,o; forget_bias added before the
f sigmoid; static_bidirectional_rnn center-output readout, reference
myMultiBiRNN.py:21-91) written directly from the TF documentation, so a
match is meaningful evidence, not self-confirmation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepmod_tpu.models.bilstm import (
    BiLSTMConfig,
    bilstm_logits,
    bilstm_loss,
    bilstm_predict,
    bilstm_probs,
    count_params,
    init_bilstm_params,
)


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_lstm_layer(kernel, bias, x_seq, forget_bias, reverse):
    """Straight-line numpy LSTM layer, O(T) python loop."""
    batch, timesteps, in_dim = x_seq.shape
    h_dim = kernel.shape[1] // 4
    h = np.zeros((batch, h_dim), np.float32)
    c = np.zeros((batch, h_dim), np.float32)
    order = range(timesteps - 1, -1, -1) if reverse else range(timesteps)
    outs = np.zeros((batch, timesteps, h_dim), np.float32)
    for t in order:
        concat = np.concatenate([x_seq[:, t, :], h], axis=1)
        gates = concat @ kernel + bias
        i, j, f, o = np.split(gates, 4, axis=1)
        c = c * np_sigmoid(f + forget_bias) + np_sigmoid(i) * np.tanh(j)
        h = np.tanh(c) * np_sigmoid(o)
        outs[:, t, :] = h
    return outs


def np_bilstm_logits(params, x, config):
    fw = x
    for lp in params["fw"]:
        fw = np_lstm_layer(
            np.asarray(lp["kernel"]), np.asarray(lp["bias"]), fw,
            config.forget_bias, False,
        )
    bw = x
    for lp in params["bw"]:
        bw = np_lstm_layer(
            np.asarray(lp["kernel"]), np.asarray(lp["bias"]), bw,
            config.forget_bias, True,
        )
    center = config.timesteps // 2
    feats = np.concatenate([fw[:, center], bw[:, center]], axis=1)
    out = feats @ np.asarray(params["out_w"]) + np.asarray(params["out_b"])
    if config.output_layer == "sigmoid":
        out = np_sigmoid(out)
    return out


@pytest.fixture(scope="module")
def small_setup():
    config = BiLSTMConfig(num_input=7, num_hidden=100, timesteps=21)
    params = init_bilstm_params(jax.random.PRNGKey(0), config)
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (17, 21, 7), jnp.float32)
    )
    return config, params, x


def test_param_shapes(small_setup):
    config, params, _ = small_setup
    assert params["fw"][0]["kernel"].shape == (107, 400)
    assert params["fw"][1]["kernel"].shape == (200, 400)
    assert params["fw"][2]["kernel"].shape == (200, 400)
    assert params["bw"][2]["bias"].shape == (400,)
    assert params["out_w"].shape == (200, 2)
    assert params["out_b"].shape == (2,)
    # matches the reference checkpoint inventory (SURVEY.md section 2a)
    expected = 2 * (107 * 400 + 400 + 2 * (200 * 400 + 400)) + 200 * 2 + 2
    assert count_params(params) == expected


def test_logits_match_numpy_reference(small_setup):
    config, params, x = small_setup
    got = np.asarray(bilstm_logits(params, jnp.asarray(x), config))
    want = np_bilstm_logits(params, x, config)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sigmoid_output_layer(small_setup):
    _, params, x = small_setup
    config = BiLSTMConfig(num_input=7, output_layer="sigmoid")
    got = np.asarray(bilstm_logits(params, jnp.asarray(x), config))
    want = np_bilstm_logits(params, x, config)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert np.all(got > 0) and np.all(got < 1)


def test_probs_and_predict(small_setup):
    config, params, x = small_setup
    probs = np.asarray(bilstm_probs(params, jnp.asarray(x), config))
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
    preds = np.asarray(bilstm_predict(params, jnp.asarray(x), config))
    np.testing.assert_array_equal(preds, probs.argmax(axis=1))


def test_loss_weighted_vs_unweighted(small_setup):
    config, params, x = small_setup
    y = np.zeros((x.shape[0], 2), np.float32)
    y[::2, 0] = 1.0
    y[1::2, 1] = 1.0
    plain = float(bilstm_loss(params, jnp.asarray(x), jnp.asarray(y), config))
    weighted = float(
        bilstm_loss(params, jnp.asarray(x), jnp.asarray(y), config, unbalanced=True)
    )
    assert np.isfinite(plain) and np.isfinite(weighted)
    assert abs(plain - weighted) > 1e-6  # weights actually change the loss
    # hand-computed cross-entropy for the unweighted case
    logits = np.asarray(bilstm_logits(params, jnp.asarray(x), config))
    logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    want = -np.mean((y * logp).sum(axis=1))
    np.testing.assert_allclose(plain, want, rtol=1e-5)


def test_pallas_layer_matches_scan(small_setup):
    config, params, x = small_setup
    from deepmod_tpu.ops.lstm_pallas import lstm_layer_pallas
    from deepmod_tpu.models.bilstm import _lstm_layer

    lp = params["fw"][0]
    for reverse in (False, True):
        got = np.asarray(
            lstm_layer_pallas(
                lp["kernel"], lp["bias"], jnp.asarray(x),
                forget_bias=config.forget_bias, reverse=reverse,
                tile_b=8, interpret=True,
            )
        )
        want = np.asarray(
            _lstm_layer(lp["kernel"], lp["bias"], jnp.asarray(x), 1.0, reverse)
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_full_model_with_pallas(small_setup):
    config, params, x = small_setup
    got = np.asarray(bilstm_logits(params, jnp.asarray(x), config, use_pallas=True))
    want = np.asarray(bilstm_logits(params, jnp.asarray(x), config))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_jit_static_shapes(small_setup):
    config, params, x = small_setup
    fn = jax.jit(lambda p, xb: bilstm_predict(p, xb, config))
    out1 = fn(params, jnp.asarray(x))
    out2 = fn(params, jnp.asarray(x[::-1].copy()))
    assert out1.shape == out2.shape == (x.shape[0],)


def test_fused_pallas_v2_matches_scan(small_setup):
    """Whole-layer fused kernel (ops.bilstm_fused) parity in interpret mode."""
    config, params, x = small_setup
    from deepmod_tpu.ops.bilstm_fused import bilstm_fused_center
    from deepmod_tpu.models.bilstm import bilstm_center_features

    got = np.asarray(
        bilstm_fused_center(params, jnp.asarray(x), tile_b=8, interpret=True)
    )
    want = np.asarray(bilstm_center_features(params, jnp.asarray(x), config))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_pallas_bf16_close_to_fp32(small_setup):
    """bf16 mode (tanh-form sigmoid, half-width storage) stays within
    bf16-resolution distance of the fp32 features; exact-parity evidence
    is the on-chip argmax-flip study (docs/Validation.md)."""
    config, params, x = small_setup
    from deepmod_tpu.ops.bilstm_fused import bilstm_fused_center

    got = np.asarray(
        bilstm_fused_center(
            params, jnp.asarray(x), tile_b=8, interpret=True, precision="bf16"
        )
    )
    want = np.asarray(
        bilstm_fused_center(params, jnp.asarray(x), tile_b=8, interpret=True)
    )
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)


@pytest.mark.parametrize("wavefront", [False, True])
def test_mono_kernel_bit_identical_to_layered(small_setup, wavefront):
    """Whole-stack mono kernel (one pallas_call, VMEM inter-layer
    sequences) must be BIT-identical to the per-layer kernel in both
    precisions and both schedules (sequential and layer-wavefront) —
    same cell math, same order, only the buffering/schedule moved."""
    config, params, x = small_setup
    from deepmod_tpu.ops.bilstm_fused import (
        bilstm_fused_center,
        bilstm_fused_center_mono,
    )

    for precision in ("fp32", "bf16"):
        got = np.asarray(
            bilstm_fused_center_mono(
                params, jnp.asarray(x), tile_b=8, interpret=True,
                precision=precision, wavefront=wavefront,
            )
        )
        want = np.asarray(
            bilstm_fused_center(
                params, jnp.asarray(x), tile_b=8, interpret=True,
                precision=precision, mono=False,  # force the layered side
            )
        )
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("timesteps,num_layers", [(21, 1), (11, 3), (5, 2)])
@pytest.mark.parametrize("wavefront", [False, True])
def test_mono_kernel_odd_depths(timesteps, num_layers, wavefront):
    from deepmod_tpu.ops.bilstm_fused import bilstm_fused_center_mono
    from deepmod_tpu.models.bilstm import bilstm_center_features

    config = BiLSTMConfig(
        num_input=7, num_hidden=100, timesteps=timesteps, num_layers=num_layers
    )
    params = init_bilstm_params(jax.random.PRNGKey(2), config)
    x = jax.random.normal(jax.random.PRNGKey(3), (9, timesteps, 7), jnp.float32)
    got = np.asarray(
        bilstm_fused_center_mono(
            params, x, num_layers=num_layers, timesteps=timesteps,
            tile_b=8, interpret=True, wavefront=wavefront,
        )
    )
    want = np.asarray(bilstm_center_features(params, x, config))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_center_large_window_routes_to_layered():
    """Odd T beyond the mono kernel's VMEM/unroll envelope (25) must fall
    back to the per-layer kernels and still match the scan path."""
    from deepmod_tpu.ops.bilstm_fused import bilstm_fused_center
    from deepmod_tpu.models.bilstm import bilstm_center_features

    config = BiLSTMConfig(num_input=7, num_hidden=100, timesteps=49)
    params = init_bilstm_params(jax.random.PRNGKey(4), config)
    x = jax.random.normal(jax.random.PRNGKey(5), (9, 49, 7), jnp.float32)
    got = np.asarray(
        bilstm_fused_center(params, x, timesteps=49, tile_b=8, interpret=True)
    )
    want = np.asarray(bilstm_center_features(params, x, config))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "timesteps,num_layers",
    [(21, 1), (11, 3), (20, 3), (5, 2)],
)
def test_fused_pallas_v2_odd_even_depths(timesteps, num_layers):
    """Early-stop cone logic: odd T trims every layer, even T must not."""
    from deepmod_tpu.ops.bilstm_fused import bilstm_fused_center
    from deepmod_tpu.models.bilstm import bilstm_center_features

    config = BiLSTMConfig(
        num_input=7, num_hidden=100, timesteps=timesteps, num_layers=num_layers
    )
    params = init_bilstm_params(jax.random.PRNGKey(2), config)
    x = jax.random.normal(
        jax.random.PRNGKey(3), (9, timesteps, 7), jnp.float32
    )
    got = np.asarray(
        bilstm_fused_center(
            params, x, num_layers=num_layers, timesteps=timesteps,
            tile_b=8, interpret=True,
        )
    )
    want = np.asarray(bilstm_center_features(params, x, config))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_mono_kernel_pregemm_variant(small_setup):
    """Precomputed-input-projection schedule (scripts/probe_pregemm.py):
    bf16 with fp32 gate buffers is bit-identical to the two-dot mono
    kernel (same fp32 accumulation, same association); fp32 and the
    bf16-gate-store variant agree to ulp-level tolerance (the collapsed
    big GEMM may sum K in a different blocked order off-MXU)."""
    config, params, x = small_setup
    from deepmod_tpu.ops.bilstm_fused import bilstm_fused_center_mono

    base16 = np.asarray(
        bilstm_fused_center_mono(
            params, jnp.asarray(x), tile_b=8, interpret=True, precision="bf16"
        )
    )
    pre16 = np.asarray(
        bilstm_fused_center_mono(
            params, jnp.asarray(x), tile_b=8, interpret=True,
            precision="bf16", pregemm=True,
        )
    )
    np.testing.assert_array_equal(pre16, base16)

    base32 = np.asarray(
        bilstm_fused_center_mono(params, jnp.asarray(x), tile_b=8, interpret=True)
    )
    pre32 = np.asarray(
        bilstm_fused_center_mono(
            params, jnp.asarray(x), tile_b=8, interpret=True, pregemm=True
        )
    )
    np.testing.assert_allclose(pre32, base32, rtol=1e-6, atol=1e-6)

    pre16b = np.asarray(
        bilstm_fused_center_mono(
            params, jnp.asarray(x), tile_b=8, interpret=True,
            precision="bf16", pregemm=True, gate_store="bf16",
        )
    )
    np.testing.assert_allclose(pre16b, base16, rtol=0.02, atol=0.002)
