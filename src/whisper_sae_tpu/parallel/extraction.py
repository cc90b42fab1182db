"""Data-parallel activation extraction over a device mesh.

The capture forward is embarrassingly batch-parallel (each clip's
activations depend only on its own mel), so multi-chip extraction is pure
GSPMD: the mel batch is sharded over the ``data`` axis, Whisper params are
replicated, and XLA partitions the jitted
:func:`whisper_sae_tpu.models.whisper.extract_activations` program with no
collectives in the forward.  Per-layer outputs come back sharded over the
batch dim; the host gather happens once per batch when the extraction loop
streams them to cache shards.

The reference has no extraction parallelism at all (one
``.to(device)`` hook pipeline, SURVEY §2.9); this module is the TPU
replacement for "spin up more extraction GPUs".
"""

from __future__ import annotations

import functools
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.whisper import WhisperArch, extract_activations
from .mesh import DATA_AXIS


def place_mel(mesh: Mesh, mel: Any) -> jax.Array:
    """Shard a [B, n_mels, T] mel batch over the ``data`` axis.

    B must divide the data-axis size (extraction batches are caller-
    chosen; pad or resize the batch upstream if needed).
    """
    return jax.device_put(mel, NamedSharding(mesh, P(DATA_AXIS, None, None)))


def replicate_params(mesh: Mesh, params: dict) -> dict:
    """Replicate Whisper params across the mesh (done once per run)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), params)


def extract_activations_sharded(
    params: dict,
    mel: Any,
    arch: WhisperArch,
    mesh: Mesh,
    apply_layer_norm: bool = True,
    with_decoder: bool = True,
    compute_dtype=None,
) -> dict[str, jax.Array]:
    """:func:`extract_activations` with the batch sharded over ``data``.

    ``params`` should be pre-placed with :func:`replicate_params` (a raw
    host pytree works too — GSPMD replicates it on first use).
    """
    mel = place_mel(mesh, mel)
    return extract_activations(
        params,
        mel,
        arch,
        apply_layer_norm=apply_layer_norm,
        with_decoder=with_decoder,
        compute_dtype=compute_dtype,
    )


@functools.lru_cache(maxsize=8)
def _shard_map_extract_fn(
    mesh: Mesh, arch: WhisperArch, apply_layer_norm: bool, with_decoder: bool,
    compute_dtype, with_mlp: bool, capture_dtype,
):
    """Build (once per flag set) the shard_mapped capture forward.

    Unlike the GSPMD path above, shard_map partitions the batch
    EXPLICITLY: each shard runs the whole single-device program —
    including the fused Pallas encoder blocks, which GSPMD would treat
    as opaque and replicate (models/whisper.py:encoder_forward's
    ``use_fused`` note).  The forward is embarrassingly batch-parallel,
    so there are no collectives and per-shard results are bitwise
    identical to single-device extraction on the same rows.
    """
    def local(params, mel):
        return extract_activations(
            params, mel, arch,
            apply_layer_norm=apply_layer_norm,
            with_decoder=with_decoder,
            compute_dtype=compute_dtype,
            with_mlp=with_mlp,
            capture_dtype=capture_dtype,
        )

    batch_layered = P(None, DATA_AXIS)  # [L, B, T, D]
    out_specs = {"encoder": batch_layered, "encoder_last": P(DATA_AXIS)}
    if with_mlp:
        out_specs["encoder_mlp_in"] = batch_layered
        out_specs["encoder_mlp_out"] = batch_layered
    if with_decoder:
        out_specs["decoder"] = batch_layered
        if with_mlp:
            out_specs["decoder_mlp_in"] = batch_layered
            out_specs["decoder_mlp_out"] = batch_layered
    return jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=out_specs,
        # the forward has no collectives; pallas calls carry no varying-
        # manifest rules, so the static vma check is skipped
        check_vma=False,
    ))


def extract_activations_shard_map(
    params: dict,
    mel: Any,
    arch: WhisperArch,
    mesh: Mesh,
    apply_layer_norm: bool = True,
    with_decoder: bool = True,
    compute_dtype=None,
    with_mlp: bool = False,
    capture_dtype=None,
) -> dict[str, jax.Array]:
    """Mesh extraction through shard_map: the ``data`` axis splits the
    batch, every shard runs the full fast path (fused encoder blocks
    included).  B must be divisible by the data-axis size (the
    extraction driver pads ragged batches)."""
    fn = _shard_map_extract_fn(
        mesh, arch, apply_layer_norm, with_decoder, compute_dtype,
        with_mlp, capture_dtype,
    )
    return fn(params, mel)
