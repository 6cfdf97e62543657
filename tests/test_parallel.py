"""Mesh sharding tests on the 8-virtual-device CPU backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from deepmod_tpu.models.bilstm import (
    BiLSTMConfig,
    bilstm_predict,
    init_bilstm_params,
)
from deepmod_tpu.parallel.aggregation import sharded_position_counts
from deepmod_tpu.parallel.mesh import make_2d_mesh, make_mesh
from deepmod_tpu.parallel.shardings import (
    make_sharded_predict,
    make_sharded_train_step,
)


@pytest.fixture(scope="module")
def model():
    config = BiLSTMConfig(num_input=7, num_hidden=100, timesteps=21)
    params = init_bilstm_params(jax.random.PRNGKey(0), config)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 21, 7))
    return config, params, x


def test_mesh_sizes():
    assert make_mesh().devices.size == 8
    assert make_mesh(4).devices.size == 4
    m = make_2d_mesh(4, 2)
    assert m.axis_names == ("data", "model") and m.devices.shape == (4, 2)


def test_sharded_predict_matches_single_device(model):
    config, params, x = model
    want = np.asarray(bilstm_predict(params, x, config))
    mesh = make_mesh(8)
    fn = make_sharded_predict(config, mesh)
    got = np.asarray(fn(params, x))
    np.testing.assert_array_equal(got, want)


def test_sharded_predict_tensor_parallel(model):
    config, params, x = model
    want = np.asarray(bilstm_predict(params, x, config))
    mesh = make_2d_mesh(2, 4)
    fn = make_sharded_predict(config, mesh, model_axis="model")
    got = np.asarray(fn(params, x))
    np.testing.assert_array_equal(got, want)


def test_sharded_train_step_dp_and_tp(model):
    config, params, x = model
    y = np.zeros((64, 2), np.float32)
    y[::2, 0] = 1
    y[1::2, 1] = 1
    mask = np.ones(64, np.float32)
    optimizer = optax.adam(1e-3)

    losses = {}
    for name, mesh, model_axis in (
        ("dp", make_mesh(8), None),
        ("dp_tp", make_2d_mesh(2, 4), "model"),
    ):
        step = make_sharded_train_step(
            config, optimizer, mesh, model_axis=model_axis
        )
        p = jax.tree_util.tree_map(jnp.copy, params)
        opt_state = optimizer.init(p)
        p2, opt_state, loss = step(
            p, opt_state, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)
        )
        losses[name] = float(loss)
        # params actually moved
        assert not np.allclose(
            np.asarray(p2["out_w"]), np.asarray(params["out_w"])
        )
    # same initial loss regardless of sharding layout
    assert losses["dp"] == pytest.approx(losses["dp_tp"], rel=1e-5)


def test_sharded_position_counts():
    mesh = make_mesh(8)
    length = 1000
    rng = np.random.RandomState(0)
    n = 8 * 50
    pos = rng.randint(0, length, n)
    cov = rng.randint(0, 2, n)
    mod = cov & rng.randint(0, 2, n)
    got_cov, got_mod = sharded_position_counts(
        mesh, pos, cov, mod, length
    )
    want_cov = np.bincount(pos, cov, minlength=length).astype(np.int32)
    want_mod = np.bincount(pos, mod, minlength=length).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(got_cov), want_cov)
    np.testing.assert_array_equal(np.asarray(got_mod), want_mod)


def test_shardmap_pallas_train_step_matches_scan(model):
    """Under a mesh the trainer can route the fused custom-VJP Pallas
    kernels through shard_map (per-shard kernel + explicit psum of
    loss/grads). One step must match the auto-sharded XLA-scan step."""
    from deepmod_tpu.train.trainer import make_train_step

    config, params, x = model
    n = x.shape[0]
    y = np.zeros((n, 2), np.float32)
    y[::2, 0] = 1
    y[1::2, 1] = 1
    # a ragged mask exercises the global masked-mean denominator
    mask = np.ones(n, np.float32)
    mask[-5:] = 0.0
    optimizer = optax.adam(1e-3)
    mesh = make_mesh(8)

    results = {}
    for name, use_pallas in (("scan", False), ("pallas", True)):
        step = make_train_step(
            config, optimizer, unbalanced=True, mesh=mesh,
            use_pallas=use_pallas,
        )
        p = jax.tree_util.tree_map(jnp.copy, params)
        opt_state = optimizer.init(p)
        p2, opt_state, loss = step(
            p, opt_state, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)
        )
        results[name] = (float(loss), jax.tree_util.tree_map(np.asarray, p2))

    assert results["scan"][0] == pytest.approx(results["pallas"][0], rel=2e-5)
    flat_s = jax.tree_util.tree_leaves_with_path(results["scan"][1])
    flat_p = jax.tree_util.tree_leaves(results["pallas"][1])
    for (path, want), got in zip(flat_s, flat_p):
        np.testing.assert_allclose(
            got, want, rtol=5e-4, atol=5e-5, err_msg=str(path)
        )


def test_window_predictor_pallas_data_parallel(model):
    """WindowPredictor's multi-device branch routes the fused kernel
    through shard_map; predictions must match the scan path exactly."""
    from deepmod_tpu.engine.detect import WindowPredictor

    config, params, x = model
    xw = np.asarray(x, np.float32)
    want = WindowPredictor(
        params, config, buckets=(64,), use_pallas=False, data_parallel=True
    ).predict(xw)
    got = WindowPredictor(
        params, config, buckets=(64,), use_pallas=True, data_parallel=True
    ).predict(xw)
    np.testing.assert_array_equal(got, want)


def test_window_predictor_compact_transfer_data_parallel(model):
    """Compact transfer on the 8-device mesh: the roll-based window
    build runs under SPMD (XLA inserts the halo collective-permutes for
    windows straddling shard boundaries) feeding the shard_map'd kernel;
    predictions must equal the single-device window-transfer path for
    both kernel modes."""
    from deepmod_tpu.engine.detect import WindowPredictor

    config, params, _ = model
    rng = np.random.default_rng(9)
    feats = rng.standard_normal((700, 7)).astype(np.float32)
    centers = np.arange(10, 689, dtype=np.int64)
    want = WindowPredictor(
        params, config, buckets=(64, 256), use_pallas=False,
        data_parallel=False, compact_transfer=False,
    ).predict_from_features(feats, centers)
    for use_pallas in (False, True):
        pred = WindowPredictor(
            params, config, buckets=(64, 256), use_pallas=use_pallas,
            data_parallel=True, compact_transfer=True,
        )
        assert pred.compact_transfer and pred._data_parallel
        got = pred.predict_from_features(feats, centers)
        np.testing.assert_array_equal(
            got, want, err_msg=f"pallas={use_pallas}"
        )


def test_sharded_predict_pallas(model):
    config, params, x = model
    want = np.asarray(bilstm_predict(params, x, config))
    fn = make_sharded_predict(config, make_mesh(8), use_pallas=True)
    np.testing.assert_array_equal(np.asarray(fn(params, x)), want)


def test_cross_process_i64_split_roundtrip():
    """Gathered COO blocks ride int32 halves: jax.device_put TRUNCATES
    int64 to int32 under the default x64-disabled config, which would
    silently corrupt positions >= 2^31 on >2.1 Gbp contigs."""
    from deepmod_tpu.parallel.cross_process import _join_i64, _split_i64

    vals = np.asarray(
        [0, 1, 2**31 - 1, 2**31, 2**32 - 1, 2**32, 2**40 + 12345, 2**62],
        np.int64,
    )
    hi, lo = _split_i64(vals)
    assert hi.dtype == np.int32 and lo.dtype == np.int32
    # the halves survive a device round trip un-truncated
    hi_rt = np.asarray(jax.device_put(hi))
    lo_rt = np.asarray(jax.device_put(lo))
    np.testing.assert_array_equal(_join_i64(hi_rt, lo_rt), vals)


def test_cross_process_chunk_shape_buckets():
    from deepmod_tpu.parallel.cross_process import _chunk_shape

    chunk = 1 << 22
    assert _chunk_shape(1, chunk) == 1
    assert _chunk_shape(3, chunk) == 4
    assert _chunk_shape(chunk, chunk) == chunk
    # never exceeds the agreed chunk size (collective shape contract)
    assert _chunk_shape(chunk - 1, chunk) == chunk
    for rows in (7, 100, 4097):
        assert _chunk_shape(rows, chunk) >= rows
