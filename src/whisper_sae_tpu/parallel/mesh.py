"""Device-mesh construction.

The reference has no parallelism at all (single ``.to(device)``, SURVEY
§2.9); this module is the TPU-native replacement: a 2-D logical mesh
``(data, model)`` over which pjit shards the token batch (gradient
all-reduce over ICI) and, optionally, the SAE feature dimension.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh.

    ``data=-1`` consumes all remaining devices after the model axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model < 1 or n % model != 0:
        raise ValueError(f"model axis {model} does not divide device count {n}")
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(cfg: MeshConfig, devices: list | None = None) -> Mesh:
    return make_mesh(data=cfg.data, model=cfg.model, devices=devices)
