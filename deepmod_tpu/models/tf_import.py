"""Import reference TF1 checkpoints into deepmod_tpu parameter pytrees.

The reference ships five BiLSTM checkpoints and one cluster-model
checkpoint under train_deepmod/ and restores them with
``tf.train.import_meta_graph`` + ``Saver.restore``
(bin/DeepMod_scripts/myDetect.py:955-956, myMultiBiRNN.py:387-388,
DeepMod_tools/hm_cluster_predict.py:94-98). Here we read the checkpoint
tensors directly — no graph import — and map them onto the JAX pytrees of
deepmod_tpu.models.bilstm / cluster_mlp.

Checkpoint variable layout (verified against the bundled
rnn_f7_wd21_chr1to10_4 and Cg.cov5.nb25 checkpoints):

BiLSTM (myMultiBiRNN.py:21-91):
    bidirectional_rnn/{fw,bw}/multi_rnn_cell/cell_{0,1,2}/basic_lstm_cell/kernel
        (in+H, 4H) with the TF (i, j, f, o) gate order — used as-is.
    .../bias  (4H,)
    Variable   (2H, 2)  output weight
    Variable_1 (2,)     output bias

Cluster MLP (hm_cluster_predict.py / its training script):
    W_1 (14,100) b_1 (100,) W_2 (100,20) b_2 (20,) W_O (20,1) b_O (1,)

TensorFlow is only needed at import time and only its checkpoint reader is
touched; everything else in deepmod_tpu is TF-free.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from .bilstm import BiLSTMConfig
from .cluster_mlp import ClusterMLPConfig


def _checkpoint_reader(prefix: str):
    try:
        from tensorflow.python.training import py_checkpoint_reader
    except Exception as exc:  # pragma: no cover - env without TF
        raise ImportError(
            "TensorFlow is required to read reference TF1 checkpoints; "
            "install it or convert the checkpoint offline."
        ) from exc
    return py_checkpoint_reader.NewCheckpointReader(prefix)


_RNN_KERNEL = "bidirectional_rnn/{d}/multi_rnn_cell/cell_{l}/basic_lstm_cell/kernel"
_RNN_BIAS = "bidirectional_rnn/{d}/multi_rnn_cell/cell_{l}/basic_lstm_cell/bias"


def bilstm_config_from_checkpoint(prefix: str) -> BiLSTMConfig:
    """Infer (num_input, num_hidden, num_layers) from checkpoint shapes."""
    reader = _checkpoint_reader(prefix)
    shapes = reader.get_variable_to_shape_map()
    k0 = _RNN_KERNEL.format(d="fw", l=0)
    if k0 not in shapes:
        raise ValueError(f"{prefix} is not a DeepMod BiLSTM checkpoint")
    num_hidden = shapes[k0][1] // 4
    num_input = shapes[k0][0] - num_hidden
    num_layers = 0
    while _RNN_KERNEL.format(d="fw", l=num_layers) in shapes:
        num_layers += 1
    num_classes = shapes["Variable"][1]
    return BiLSTMConfig(
        num_input=num_input,
        num_hidden=num_hidden,
        num_layers=num_layers,
        num_classes=num_classes,
    )


def load_bilstm_checkpoint(prefix: str) -> Tuple[Dict[str, Any], BiLSTMConfig]:
    """Read a reference BiLSTM checkpoint into a JAX-ready pytree.

    Raises if the checkpoint's tensor data is unavailable (the reference
    repo strips the .data blobs of its RNN checkpoints; shapes still
    validate via bilstm_config_from_checkpoint).
    """
    config = bilstm_config_from_checkpoint(prefix)
    reader = _checkpoint_reader(prefix)
    params: Dict[str, Any] = {"fw": [], "bw": []}
    for direction in ("fw", "bw"):
        for layer in range(config.num_layers):
            kernel = np.asarray(
                reader.get_tensor(_RNN_KERNEL.format(d=direction, l=layer)),
                dtype=np.float32,
            )
            bias = np.asarray(
                reader.get_tensor(_RNN_BIAS.format(d=direction, l=layer)),
                dtype=np.float32,
            )
            params[direction].append({"kernel": kernel, "bias": bias})
    params["out_w"] = np.asarray(reader.get_tensor("Variable"), dtype=np.float32)
    params["out_b"] = np.asarray(reader.get_tensor("Variable_1"), dtype=np.float32)
    return params, config


def load_cluster_checkpoint(prefix: str) -> Tuple[Dict[str, Any], ClusterMLPConfig]:
    """Read the cluster-effect MLP checkpoint (complete in the reference)."""
    reader = _checkpoint_reader(prefix)
    params = {
        name: np.asarray(reader.get_tensor(name), dtype=np.float32)
        for name in ("W_1", "b_1", "W_2", "b_2", "W_O", "b_O")
    }
    config = ClusterMLPConfig(
        num_input=params["W_1"].shape[0],
        hidden1=params["W_1"].shape[1],
        hidden2=params["W_2"].shape[1],
    )
    return params, config


def _flatten_bilstm_tree(tree: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flatten a params-shaped pytree (fw/bw layer lists + out_w/out_b)
    into the .npz key naming. Adam's mu/nu mirror the params structure,
    so the same flattener serializes them."""
    flat = {
        "out_w": np.asarray(tree["out_w"]),
        "out_b": np.asarray(tree["out_b"]),
    }
    for direction in ("fw", "bw"):
        for layer, lp in enumerate(tree[direction]):
            flat[f"{direction}/{layer}/kernel"] = np.asarray(lp["kernel"])
            flat[f"{direction}/{layer}/bias"] = np.asarray(lp["bias"])
    return flat


def _unflatten_bilstm_tree(get, num_layers: int) -> Dict[str, Any]:
    tree: Dict[str, Any] = {"fw": [], "bw": []}
    for direction in ("fw", "bw"):
        for layer in range(num_layers):
            tree[direction].append(
                {
                    "kernel": get(f"{direction}/{layer}/kernel"),
                    "bias": get(f"{direction}/{layer}/bias"),
                }
            )
    tree["out_w"] = get("out_w")
    tree["out_b"] = get("out_b")
    return tree


def save_bilstm_npz(
    path: str,
    params: Dict[str, Any],
    config: BiLSTMConfig,
    opt_state=None,
) -> None:
    """Persist a BiLSTM pytree as a flat .npz (native checkpoint format).

    With ``opt_state`` (an optax.adam state), the Adam slots ride along
    (``adam/count`` + ``adam/{mu,nu}/...``) so `--modfile` resume is a
    true continuation — matching the reference Saver's slot coverage
    (myMultiBiRNN.py:89 checkpoints the <var>/Adam, <var>/Adam_1 pairs)."""
    flat = {
        "meta/num_input": np.int64(config.num_input),
        "meta/num_hidden": np.int64(config.num_hidden),
        "meta/timesteps": np.int64(config.timesteps),
        "meta/num_layers": np.int64(config.num_layers),
        "meta/num_classes": np.int64(config.num_classes),
        "meta/output_layer": np.bytes_(config.output_layer.encode()),
    }
    flat.update(_flatten_bilstm_tree(params))
    if opt_state is not None:
        adam = opt_state[0]  # ScaleByAdamState of optax.adam's chain
        flat["adam/count"] = np.asarray(adam.count)
        for name, tree in (("mu", adam.mu), ("nu", adam.nu)):
            for key, arr in _flatten_bilstm_tree(tree).items():
                flat[f"adam/{name}/{key}"] = arr
    np.savez(path, **flat)


def load_adam_state(path: str, optimizer, params):
    """Rebuild the optax.adam state stored by ``save_bilstm_npz``.

    Returns None when the checkpoint predates slot saving (params-only
    .npz) — callers then fall back to a fresh ``optimizer.init``."""
    data = np.load(path)
    if "adam/count" not in data:
        return None
    state = optimizer.init(params)
    num_layers = int(data["meta/num_layers"])
    mu = _unflatten_bilstm_tree(
        lambda k: data[f"adam/mu/{k}"], num_layers
    )
    nu = _unflatten_bilstm_tree(
        lambda k: data[f"adam/nu/{k}"], num_layers
    )
    adam = state[0]._replace(
        count=data["adam/count"], mu=mu, nu=nu
    )
    return (adam,) + tuple(state[1:])


def load_bilstm_npz(path: str) -> Tuple[Dict[str, Any], BiLSTMConfig]:
    data = np.load(path)
    config = BiLSTMConfig(
        num_input=int(data["meta/num_input"]),
        num_hidden=int(data["meta/num_hidden"]),
        timesteps=int(data["meta/timesteps"]),
        num_layers=int(data["meta/num_layers"]),
        num_classes=int(data["meta/num_classes"]),
        output_layer=data["meta/output_layer"].item().decode(),
    )
    params: Dict[str, Any] = {"fw": [], "bw": []}
    for direction in ("fw", "bw"):
        for layer in range(config.num_layers):
            params[direction].append(
                {
                    "kernel": data[f"{direction}/{layer}/kernel"],
                    "bias": data[f"{direction}/{layer}/bias"],
                }
            )
    params["out_w"] = data["out_w"]
    params["out_b"] = data["out_b"]
    return params, config


def load_model(prefix: str) -> Tuple[Dict[str, Any], BiLSTMConfig]:
    """Load a BiLSTM model from either a native .npz or a TF checkpoint."""
    if prefix.endswith(".npz"):
        return load_bilstm_npz(prefix)
    return load_bilstm_checkpoint(prefix)
