"""Device-mesh construction.

The reference's only parallelism is multiprocessing over files with
filesystem merges (SURVEY.md section 2c); the TPU-native replacements all
hang off a ``jax.sharding.Mesh``:

- 1-D 'data' mesh: window batches / training batches sharded, params
  replicated, psum-merged gradients and position counts;
- 2-D ('data', 'model') mesh: adds tensor-parallel sharding of the LSTM
  gate matrices over the model axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None, axis: str = "data"
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)} "
                f"({[d.platform for d in devices[:3]]}...)"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_2d_mesh(
    data: int, model: int, axis_names: Sequence[str] = ("data", "model")
) -> Mesh:
    devices = jax.devices()
    need = data * model
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(grid, tuple(axis_names))
