"""Checkpoint serialization.

The reference pickles torch state dicts (training.py:318-353,
scripts/train.py:209-211).  Here the native format is a single ``.npz``
per checkpoint (keeps the reference's flat-file layout contract
``checkpoint_epoch{N}.*`` / ``final.*``), with an optional orbax backend
for sharded/async checkpoints at scale, plus a torch ``state_dict``
export so reference tooling can consume ``sae_final.pt`` unchanged.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np

_SEP = "::"


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_pytree(path: str | Path, tree: Any, meta: dict | None = None) -> Path:
    """Save a pytree to a single ``.npz`` file (atomic: tmp -> rename,
    the reference's cloud-path behavior, modal_app/train.py:325-349)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    flat = _flatten(tree)
    if meta is not None:
        flat["__meta__"] = np.frombuffer(
            json.dumps(meta).encode("utf-8"), dtype=np.uint8
        ).copy()
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    tmp.replace(path)
    return path


def load_pytree(path: str | Path, target: Any) -> tuple[Any, dict | None]:
    """Restore a pytree saved by :func:`save_pytree` into the structure of
    ``target`` (an example pytree with the same treedef)."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    meta = None
    if "__meta__" in flat:
        meta = json.loads(bytes(flat.pop("__meta__")).decode("utf-8"))

    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
    leaves = []
    for path_elems, example in paths_and_leaves:
        key = _SEP.join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path_elems
        )
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        leaves.append(jax.numpy.asarray(arr, dtype=np.asarray(example).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


# ---------------------------------------------------------------------------
# orbax backend (for multi-host / sharded checkpoints at scale)
# ---------------------------------------------------------------------------


def save_pytree_orbax(path: str | Path, tree: Any) -> Path:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    return path


def load_pytree_orbax(path: str | Path, target: Any) -> Any:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, abstract)


# ---------------------------------------------------------------------------
# torch-compatible export
# ---------------------------------------------------------------------------

# Mapping between our TPU-first layout and the reference torch state_dict
# (model.py:63-67: encoder.weight [H,D], decoder.weight [D,H], b_pre [D]).
_TORCH_EXPORT_TOPK = {
    "encoder.weight": ("w_enc", lambda a: a.T),
    "encoder.bias": ("b_enc", lambda a: a),
    "decoder.weight": ("w_dec", lambda a: a.T),
    "decoder.bias": ("b_dec", lambda a: a),
    "b_pre": ("b_pre", lambda a: a),
}


def export_torch_state_dict(params: dict, state=None, path: str | Path | None = None):
    """Export SAE params as a reference-compatible torch ``state_dict``.

    Returns the dict; if ``path`` given, also ``torch.save``s it (the
    ``sae_final.pt`` drop-in contract, scripts/train.py:209-211).
    """
    import torch

    sd = {}
    for torch_key, (our_key, fn) in _TORCH_EXPORT_TOPK.items():
        if our_key in params:
            sd[torch_key] = torch.from_numpy(np.asarray(fn(np.asarray(params[our_key]))).copy())
    if state is not None:
        sd["feature_last_activated"] = torch.from_numpy(
            np.asarray(state.feature_last_activated).astype(np.int64)
        )
        sd["step_count"] = torch.tensor(int(state.step_count), dtype=torch.int64)
    if path is not None:
        torch.save(sd, str(path))
    return sd


def import_torch_state_dict(sd) -> dict:
    """Inverse of :func:`export_torch_state_dict` (accepts a loaded torch
    state_dict; tensors or numpy arrays)."""
    import numpy as _np

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else _np.asarray(v)

    params = {}
    for torch_key, (our_key, fn) in _TORCH_EXPORT_TOPK.items():
        if torch_key in sd:
            params[our_key] = jax.numpy.asarray(fn(to_np(sd[torch_key])))
    return params
