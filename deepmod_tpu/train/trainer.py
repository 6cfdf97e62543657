"""Data-parallel BiLSTM training (pjit/NamedSharding over a device mesh).

The reference trains single-process single-device with a Python feed loop
(train_save_model, myMultiBiRNN.py:96-228). Here the same optimization —
Adam lr 1e-3, batch 2048, 4 epochs, optional class-weighted loss — runs
as one jitted train step with the batch sharded over the mesh's 'data'
axis and parameters replicated; gradients are averaged by XLA's psum
under jit, so the same code drives 1 chip or a full slice. Checkpoints
use the native .npz format (per-epoch + mid-epoch, mirroring the
reference's Saver cadence at :210-225).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepmod_tpu.models.bilstm import (
    BiLSTMConfig,
    bilstm_logits,
    bilstm_logits_trainable,
    init_bilstm_params,
)
from deepmod_tpu.models.tf_import import save_bilstm_npz
from .loader import TestSplit, iterate_training_batches


@dataclasses.dataclass
class TrainConfig:
    out_folder: str
    file_id: str = "mod"
    fnum: int = 7
    hidden: int = 100
    window_size: int = 21
    epochs: int = 4                # training_steps (myMultiBiRNN.py:97)
    batch_size: int = 2048         # :12
    learning_rate: float = 1e-3    # :27
    unbalanced: bool = False       # :64-65 class-weighted loss
    output_layer: str = ""
    test: Optional[str] = None     # 'E,1,2' | 'P,10'
    seed: int = 0
    log_every: int = 10
    mesh_axis: str = "data"
    use_pallas: Optional[bool] = None  # None: pallas on TPU
    # 'bf16' stores the fused VJP's residual/gradient sequences in
    # bfloat16 (fp32 compute/carries/weight grads): 1.50x step rate at
    # batch 65536 on v5e, loss delta 1e-5 (probe_train_bf16.py). fp32
    # default = the mode pinned against jax.grad of the scan path and
    # the reference's own arithmetic.
    precision: str = "fp32"


class TrainState:
    def __init__(self, params, opt_state, config: BiLSTMConfig):
        self.params = params
        self.opt_state = opt_state
        self.config = config


def _pad_to(batch_x: np.ndarray, batch_y: np.ndarray, multiple: int,
            bucket: int = 256):
    """Pad a minibatch up to a shard-divisible BUCKET boundary.

    np.array_split hands the train loop slightly-varying sizes (2083,
    2084, arbitrary tails); padding only to `multiple` would compile a
    fresh XLA step per distinct size. Rounding up to ``bucket`` bounds
    the set of compiled shapes to a handful for the whole run."""
    n = len(batch_y)
    q = max(bucket, multiple)
    target = ((max(n, 1) + q - 1) // q) * q
    target = ((target + multiple - 1) // multiple) * multiple
    if target == n:
        mask = np.ones(n, np.float32)
        return batch_x, batch_y, mask
    pad = target - n
    x = np.concatenate([batch_x, np.zeros((pad,) + batch_x.shape[1:], batch_x.dtype)])
    y = np.concatenate([batch_y, np.zeros((pad, 2), batch_y.dtype)])
    mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    return x, y, mask


def make_train_step(
    model_config: BiLSTMConfig,
    optimizer,
    unbalanced: bool,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    use_pallas: bool = False,
    precision: str = "fp32",
) -> Callable:
    """Jitted (params, opt_state, x, y, mask) -> (params, opt_state, loss).

    With a mesh, x/y/mask are sharded over `axis` and params replicated;
    XLA inserts the gradient all-reduce. use_pallas routes forward AND
    backward through the fused kernels (custom VJP); under a mesh the
    kernel runs per-shard inside shard_map (XLA's SPMD partitioner cannot
    split a pallas_call itself) with explicit psums of loss and grads —
    numerically the same global masked mean as the auto-sharded path.
    """

    def _weighted_per_example(params, x, y, use_pallas_here):
        logits = bilstm_logits_trainable(
            params, x, model_config, use_pallas=use_pallas_here,
            precision=precision,
        )
        if unbalanced:
            from deepmod_tpu.models.bilstm import CLASS_WEIGHTS

            logits = logits * jnp.asarray(CLASS_WEIGHTS, logits.dtype)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.sum(y.astype(logp.dtype) * logp, axis=-1)

    def masked_loss(params, x, y, mask):
        per_example = _weighted_per_example(params, x, y, use_pallas)
        return jnp.sum(per_example * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def step(params, opt_state, x, y, mask):
        loss, grads = jax.value_and_grad(masked_loss)(params, x, y, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    batch_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    if use_pallas:
        # Per-shard fused kernel: compute the *sum* of masked losses and
        # its gradient locally, then psum both plus the mask count; the
        # global masked mean (and its grads) follow by one division. The
        # division happens after the psum, so grads are bit-comparable to
        # the single-device masked-mean formulation up to reduction order.
        def local_loss_and_grads(params, x, y, mask):
            def sum_loss(p):
                return jnp.sum(_weighted_per_example(p, x, y, True) * mask)

            lsum, grads = jax.value_and_grad(sum_loss)(params)
            denom = jnp.maximum(jax.lax.psum(jnp.sum(mask), axis), 1.0)
            loss = jax.lax.psum(lsum, axis) / denom
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, axis) / denom, grads
            )
            return loss, grads

        grads_fn = jax.shard_map(
            local_loss_and_grads,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )

        def step(params, opt_state, x, y, mask):  # noqa: F811
            loss, grads = grads_fn(params, x, y, mask)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(replicated, replicated, batch_sharding, batch_sharding, batch_sharding),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=(0, 1),
    )


def batch_metrics(params, model_config, x, y) -> Dict[str, float]:
    """loss/acc/AUC/precision/recall on one batch (the reference's
    periodic sess.run of its metric ops, myMultiBiRNN.py:176-184)."""
    logits = np.asarray(bilstm_logits(params, jnp.asarray(x), model_config))
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    pred = probs.argmax(axis=1)
    truth = y.argmax(axis=1)
    logp = np.log(np.maximum(probs, 1e-12))
    loss = float(-np.mean((y * logp).sum(axis=1)))
    acc = float((pred == truth).mean())
    tp = int(((pred == 1) & (truth == 1)).sum())
    fp = int(((pred == 1) & (truth == 0)).sum())
    fn = int(((pred == 0) & (truth == 1)).sum())
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    try:
        from sklearn.metrics import roc_auc_score

        auc = float(roc_auc_score(truth, probs[:, 1])) if len(set(truth)) > 1 else 0.0
    except Exception:
        auc = 0.0
    return {"loss": loss, "acc": acc, "auc": auc, "p": precision, "r": recall}


def train_run(
    file_groups: Sequence[Sequence[str]],
    config: TrainConfig,
    mesh: Optional[Mesh] = None,
    init_params=None,
    resume_opt_from: Optional[str] = None,
) -> Tuple[Any, BiLSTMConfig, List[Dict[str, float]]]:
    """Full training loop; returns (params, model_config, metric history).

    ``file_groups``: list of feature-file lists; group 0 drives the epoch
    (largest group first, like myMultiBiRNN.py:457-458). ``init_params``
    resumes from an existing pytree (the reference parses --modfile but
    never actually resumes, DeepMod.py:204-207 / myMultiBiRNN.py:117 —
    here it works); ``resume_opt_from`` (an .npz path saved by this
    trainer) additionally restores the Adam moments + step count, making
    resume a TRUE continuation (tested bitwise against an uninterrupted
    run).
    """
    model_config = BiLSTMConfig(
        num_input=config.fnum,
        num_hidden=config.hidden,
        timesteps=config.window_size,
        output_layer=config.output_layer,
    )
    params = init_params
    if params is None:
        params = init_bilstm_params(jax.random.PRNGKey(config.seed), model_config)
    optimizer = optax.adam(config.learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = None
    if resume_opt_from is not None:
        from deepmod_tpu.models.tf_import import load_adam_state

        opt_state = load_adam_state(resume_opt_from, optimizer, params)
    if opt_state is None:
        opt_state = optimizer.init(params)

    if mesh is None and jax.device_count() > 1:
        mesh = Mesh(np.asarray(jax.devices()), (config.mesh_axis,))
    n_shards = mesh.devices.size if mesh is not None else 1
    use_pallas = config.use_pallas
    if use_pallas is None:
        # fused-VJP kernels are the default whenever we're on TPU; under a
        # mesh they run per-shard via shard_map (make_train_step)
        use_pallas = jax.default_backend() == "tpu"
    step_fn = make_train_step(
        model_config, optimizer, config.unbalanced, mesh, config.mesh_axis,
        use_pallas=use_pallas, precision=config.precision,
    )

    split = TestSplit.parse(config.test)
    history: List[Dict[str, float]] = []
    os.makedirs(config.out_folder, exist_ok=True)
    start = time.time()
    io_time = 0.0

    for epoch in range(1, config.epochs + 1):
        step_count = 0
        epoch_files = len(file_groups[0])
        saved_half = False
        progress: Dict[str, int] = {"files_consumed": 0}
        io_mark = time.time()
        for group_batches in iterate_training_batches(
            file_groups,
            batch_size=config.batch_size,
            window_size=config.window_size,
            split=split,
            progress=progress,
        ):
            io_time += time.time() - io_mark
            for bx, by in group_batches:
                if len(by) == 0:
                    continue
                x, y, mask = _pad_to(bx, by, n_shards)
                params, opt_state, loss = step_fn(
                    params, opt_state, jnp.asarray(x), jnp.asarray(y),
                    jnp.asarray(mask),
                )
            step_count += 1
            if step_count % config.log_every == 0:
                # evaluate across ALL groups' current minibatches: a
                # single group is often single-class (mod vs control
                # folders), which pins AUC/precision/recall to 0
                mx = np.concatenate([b[0] for b in group_batches if len(b[1])])
                my_ = np.concatenate([b[1] for b in group_batches if len(b[1])])
                m = batch_metrics(params, model_config, mx, my_)
                m["epoch"] = epoch
                m["step"] = step_count
                m["io_frac"] = io_time / max(time.time() - start, 1e-9)
                history.append(m)
                print(
                    f"[train] epoch {epoch} step {step_count} "
                    f"loss={m['loss']:.3f} auc={m['auc']:.3f} acc={m['acc']:.3f} "
                    f"p={m['p']:.3f} r={m['r']:.3f} io={m['io_frac']:.2f}",
                    flush=True,
                )
            # mid-epoch checkpoint at ~50% of group-0 FILES consumed —
            # the reference's unit (myMultiBiRNN.py:210-214); a step
            # counter drifts with rows-per-file and can fire never/early
            if (not saved_half and epoch_files
                    and progress["files_consumed"] >= epoch_files // 2 > 0):
                half_dir = os.path.join(config.out_folder, f"{epoch - 1}.50")
                os.makedirs(half_dir, exist_ok=True)
                save_bilstm_npz(
                    os.path.join(half_dir, config.file_id + ".npz"),
                    params, model_config, opt_state=opt_state,
                )
                saved_half = True
            io_mark = time.time()
        epoch_dir = os.path.join(config.out_folder, str(epoch))
        os.makedirs(epoch_dir, exist_ok=True)
        save_bilstm_npz(
            os.path.join(epoch_dir, config.file_id + ".npz"),
            params, model_config, opt_state=opt_state,
        )
    return params, model_config, history


def predict_feature_files(
    params,
    model_config: BiLSTMConfig,
    feature_files: Sequence[str],
    out_path: str,
    window_size: int = 21,
    batch_size: int = 2048,
    split: Optional[TestSplit] = None,
) -> Dict[str, Tuple[int, int, int, int]]:
    """Standalone prediction over feature files with tp/fp/fn/tn per file
    (mPred, myMultiBiRNN.py:382-420)."""
    from deepmod_tpu.models.bilstm import bilstm_predict
    from .loader import load_feature_file

    fn_jit = jax.jit(lambda p, x: bilstm_predict(p, x, model_config))
    results: Dict[str, Tuple[int, int, int, int]] = {}
    with open(out_path, "w") as fh:
        for path in feature_files:
            x, y = load_feature_file(path, window_size, split, for_test=True)
            if len(y) == 0:
                continue
            preds = []
            for lo in range(0, len(x), batch_size):
                chunk = x[lo : lo + batch_size]
                padded = np.zeros((batch_size,) + chunk.shape[1:], chunk.dtype)
                padded[: len(chunk)] = chunk
                preds.append(np.asarray(fn_jit(params, jnp.asarray(padded)))[: len(chunk)])
            pred = np.concatenate(preds)
            truth = y.argmax(axis=1)
            tp = int(((pred == 1) & (truth == 1)).sum())
            fp = int(((pred == 1) & (truth == 0)).sum())
            fnn = int(((pred == 0) & (truth == 1)).sum())
            tn = int(((pred == 0) & (truth == 0)).sum())
            results[path] = (tp, fp, fnn, tn)
            fh.write(f"tp={tp} fp={fp} fn={fnn} tn={tn} {path}\n")
    return results
