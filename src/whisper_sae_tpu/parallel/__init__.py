"""Parallelism: device meshes, shardings, distributed top-k, multihost."""

from .mesh import DATA_AXIS, MODEL_AXIS, make_mesh, mesh_from_config
from .multihost import initialize_if_needed, is_primary
from .tp_topk import topk_mask_sharded, topk_threshold_sharded

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "initialize_if_needed",
    "is_primary",
    "make_mesh",
    "mesh_from_config",
    "topk_mask_sharded",
    "topk_threshold_sharded",
]
