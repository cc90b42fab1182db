"""Sharded activation cache + functional extraction driver.

Keeps the reference cache contract
(/root/reference/src/whisper_sae/data/feature_cache.py:60-197): path
scheme ``{model_short}_{component}_layer{N}.*`` with a ``_meta.json``
sidecar, ``has_cache``/``load``/``save``/``get_dataloader`` API and the
same metadata fields — but stores raw ``.npy`` shards instead of torch
pickles, memmaps on load, and writes incrementally so a full-scale
encoder layer (~230 GB f32 at 100k clips, SURVEY §5.8) streams to disk
instead of accumulating in RAM.

The extraction driver replaces the hook pipeline (feature_cache.py:200-306):
one jitted forward returns every requested layer's activations; there is
no per-layer device->host sync inside the model.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from datetime import datetime
from pathlib import Path
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DataConfig, WhisperConfig
from ..models.whisper import WhisperArch, extract_activations
from .loader import ActivationLoader

# "encoder"/"decoder" are the reference's components (layer outputs);
# the *_mlp_in/out pairs are this framework's transcoder training data
# (the reference's transcoders have no data path at all)
Component = Literal[
    "encoder", "decoder",
    "encoder_mlp_in", "encoder_mlp_out",
    "decoder_mlp_in", "decoder_mlp_out",
]

# ~256 MiB f32 shards at d=384: 2^21 tokens * 384 * 4 B
DEFAULT_SHARD_TOKENS = 1 << 21


@dataclass
class CacheMetadata:
    """Per-layer cache metadata (reference feature_cache.py:23-57)."""

    model_name: str
    component: str
    layer_idx: int
    hidden_dim: int
    num_samples: int
    num_tokens: int
    created_at: str
    data_config: dict
    shards: list[str] | None = None
    dtype: str = "float32"

    def to_json(self) -> str:
        data = {
            k: ({kk: str(vv) if isinstance(vv, Path) else vv for kk, vv in v.items()}
                if isinstance(v, dict) else str(v) if isinstance(v, Path) else v)
            for k, v in asdict(self).items()
        }
        return json.dumps(data, indent=2)

    @classmethod
    def from_json(cls, s: str) -> "CacheMetadata":
        return cls(**json.loads(s))


class CacheWriter:
    """Incremental shard writer for one (component, layer)."""

    def __init__(self, cache: "FeatureCache", component: Component, layer_idx: int,
                 shard_tokens: int = DEFAULT_SHARD_TOKENS, dtype: str = "float32"):
        self.cache = cache
        self.component = component
        self.layer_idx = layer_idx
        self.shard_tokens = shard_tokens
        self.dtype = np.dtype(dtype)
        self._buf: list[np.ndarray] = []
        self._buf_tokens = 0
        self._shards: list[str] = []
        self.num_tokens = 0
        self.hidden_dim: int | None = None

    def append(self, tokens: np.ndarray) -> None:
        tokens = np.asarray(tokens, self.dtype)
        self.hidden_dim = tokens.shape[-1]
        self._buf.append(tokens)
        self._buf_tokens += tokens.shape[0]
        self.num_tokens += tokens.shape[0]
        if self._buf_tokens >= self.shard_tokens:
            self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        shard = np.concatenate(self._buf, axis=0)
        idx = len(self._shards)
        path = self.cache._shard_path(self.component, self.layer_idx, idx)
        tmp = path.with_suffix(".tmp.npy")
        np.save(tmp, shard)
        tmp.replace(path)
        self._shards.append(path.name)
        self._buf, self._buf_tokens = [], 0

    def state(self) -> dict:
        """Resumable-extraction cut: force-flush the buffer to a shard
        (possibly under-sized — metadata lists shards explicitly, so
        irregular shard lengths are fine) and return the progress needed
        to continue appending after a restart."""
        self._flush()
        return {
            "shards": list(self._shards),
            "num_tokens": self.num_tokens,
            "hidden_dim": self.hidden_dim,
        }

    def restore(self, state: dict) -> None:
        """Continue a previous run from a :meth:`state` snapshot (the
        listed shards must already be on disk)."""
        self._shards = list(state["shards"])
        self.num_tokens = int(state["num_tokens"])
        self.hidden_dim = state["hidden_dim"]
        self._buf, self._buf_tokens = [], 0

    def finalize(self, num_samples: int) -> CacheMetadata:
        self._flush()
        meta = CacheMetadata(
            model_name=self.cache.whisper_config.model_name,
            component=self.component,
            layer_idx=self.layer_idx,
            hidden_dim=int(self.hidden_dim or 0),
            num_samples=num_samples,
            num_tokens=self.num_tokens,
            created_at=datetime.now().isoformat(),
            data_config=json.loads(self.cache.data_config.model_dump_json()),
            shards=self._shards,
            dtype=str(self.dtype),
        )
        self.cache._write_meta(self.component, self.layer_idx, meta)
        return meta


def _view_stored_dtype(arr: np.ndarray, dtype_name: str | None) -> np.ndarray:
    """Re-view a loaded shard to its metadata dtype.  .npy headers cannot
    persist third-party dtypes, so bf16 shards parse back as void-2; the
    cache metadata carries the real element type."""
    if not dtype_name:
        return arr
    want = np.dtype(dtype_name)
    if arr.dtype == want:
        return arr
    if arr.dtype.itemsize != want.itemsize:
        raise ValueError(
            f"cache metadata dtype {want} (itemsize {want.itemsize}) does "
            f"not match shard dtype {arr.dtype} (itemsize "
            f"{arr.dtype.itemsize}) — mixed-dtype or corrupt cache"
        )
    return arr.view(want)


class _LazyShardRows:
    """Lazy row access over multiple ``.npy`` shards (memmap per shard).

    Row gathers (``arr[idx]`` with an int or index array) touch only the
    shards that hold the requested rows — the concatenated [N, D] array
    is never materialized.  ``np.asarray`` materializes explicitly (small
    caches only; guarded by callers' residency thresholds)."""

    def __init__(self, paths: list[Path], dtype: str | None = None):
        # memmaps open lazily-on-disk anyway (no data is read until rows
        # are touched), and carry shape/dtype without private header APIs
        self._maps = [
            _view_stored_dtype(np.load(p, mmap_mode="r"), dtype)
            for p in paths
        ]
        self._cum = np.cumsum([0] + [m.shape[0] for m in self._maps])
        self.dtype = self._maps[0].dtype
        self.shape = (int(self._cum[-1]),) + tuple(self._maps[0].shape[1:])

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.shape)) * self.dtype.itemsize

    def __len__(self) -> int:
        return self.shape[0]

    def __getitem__(self, idx):
        n = self.shape[0]
        if isinstance(idx, slice):
            start, stop, step = idx.indices(n)
            idx = np.arange(start, stop, step)
        if isinstance(idx, (int, np.integer)):
            if idx < 0:
                idx += n
            if not 0 <= idx < n:
                raise IndexError(f"row {idx} out of range for {n} rows")
            s = int(np.searchsorted(self._cum, idx, side="right")) - 1
            return self._maps[s][idx - self._cum[s]]
        idx = np.asarray(idx)
        if idx.dtype == bool:
            idx = np.nonzero(idx)[0]
        idx = np.where(idx < 0, idx + n, idx)
        if idx.size and (idx.min() < 0 or idx.max() >= n):
            raise IndexError(f"row indices out of range for {n} rows")
        out = np.empty((len(idx),) + self.shape[1:], self.dtype)
        s_ids = np.searchsorted(self._cum, idx, side="right") - 1
        for s in np.unique(s_ids):
            m = s_ids == s
            out[m] = self._maps[int(s)][idx[m] - self._cum[s]]
        return out

    def mean0(self, chunk_rows: int = 1 << 20) -> np.ndarray:
        """Bounded-memory mean over axis 0 (one shard-gathered chunk at a
        time; f64 accumulation)."""
        total = np.zeros(self.shape[1:], np.float64)
        for lo in range(0, self.shape[0], chunk_rows):
            hi = min(lo + chunk_rows, self.shape[0])
            total += np.asarray(self[lo:hi]).sum(axis=0, dtype=np.float64)
        return (total / self.shape[0]).astype(np.float32)

    def __array__(self, dtype=None, copy=None):
        arr = np.concatenate(list(self._maps))
        return arr.astype(dtype) if dtype is not None else arr


class FeatureCache:
    """Per-layer activation cache (reference feature_cache.py:60-197)."""

    def __init__(self, cache_dir: Path | str, whisper_config: WhisperConfig,
                 data_config: DataConfig):
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.whisper_config = whisper_config
        self.data_config = data_config
        self.model_short = whisper_config.model_name.split("/")[-1]

    def _stem(self, component: Component, layer_idx: int) -> str:
        return f"{self.model_short}_{component}_layer{layer_idx}"

    def _shard_path(self, component: Component, layer_idx: int, shard: int) -> Path:
        return self.cache_dir / f"{self._stem(component, layer_idx)}_shard{shard:04d}.npy"

    def _meta_path(self, component: Component, layer_idx: int) -> Path:
        return self.cache_dir / f"{self._stem(component, layer_idx)}_meta.json"

    def _write_meta(self, component: Component, layer_idx: int, meta: CacheMetadata) -> None:
        self._meta_path(component, layer_idx).write_text(meta.to_json())

    def has_cache(self, component: Component, layer_idx: int) -> bool:
        mp = self._meta_path(component, layer_idx)
        if not mp.exists():
            return False
        meta = CacheMetadata.from_json(mp.read_text())
        return all(
            (self.cache_dir / s).exists() for s in (meta.shards or [])
        ) and bool(meta.shards)

    def load_metadata(self, component: Component, layer_idx: int) -> CacheMetadata:
        return CacheMetadata.from_json(self._meta_path(component, layer_idx).read_text())

    def load(self, component: Component, layer_idx: int, mmap: bool = True
             ) -> tuple[np.ndarray, CacheMetadata]:
        """-> ([num_tokens, hidden_dim], metadata). Single-shard caches are
        memmapped; multi-shard caches are concatenated (set mmap=False to
        force a materialized array)."""
        meta = self.load_metadata(component, layer_idx)
        shards = meta.shards or []
        if len(shards) == 1 and mmap:
            arr = _view_stored_dtype(
                np.load(self.cache_dir / shards[0], mmap_mode="r"), meta.dtype
            )
        else:
            arr = np.concatenate(
                [_view_stored_dtype(np.load(self.cache_dir / s), meta.dtype)
                 for s in shards],
                axis=0,
            )
        return arr, meta

    def load_rows(self, component: Component, layer_idx: int
                  ) -> tuple[np.ndarray | _LazyShardRows, CacheMetadata]:
        """Like :meth:`load` but NEVER materializes multi-shard caches:
        single-shard -> memmap, multi-shard -> :class:`_LazyShardRows`
        (lazy row gather across shards).  Use for residency-aware callers
        (the launcher's coder training jobs)."""
        meta = self.load_metadata(component, layer_idx)
        shards = meta.shards or []
        if len(shards) == 1:
            arr = _view_stored_dtype(
                np.load(self.cache_dir / shards[0], mmap_mode="r"), meta.dtype
            )
            return arr, meta
        return _LazyShardRows(
            [self.cache_dir / s for s in shards], dtype=meta.dtype
        ), meta

    def save(self, features, component: Component, layer_idx: int, num_samples: int,
             shard_tokens: int = DEFAULT_SHARD_TOKENS) -> CacheMetadata:
        """One-shot save (reference feature_cache.py:136-167)."""
        w = self.writer(component, layer_idx, shard_tokens=shard_tokens)
        w.append(np.asarray(features))
        return w.finalize(num_samples)

    def writer(self, component: Component, layer_idx: int, **kw) -> CacheWriter:
        return CacheWriter(self, component, layer_idx, **kw)

    def get_dataloader(self, component: Component, layer_idx: int, batch_size: int,
                       shuffle: bool = True, seed: int = 0,
                       out_of_core: bool | None = None, **_ignored):
        """Batch loader over a cached layer.

        ``out_of_core=None`` auto-selects: multi-shard caches stream from
        disk through the native shard reader (runtime/shard_reader.py)
        with a prefetch thread; single-shard caches load in-memory
        (the trainer can then use the fused-scan epoch path).
        """
        meta = self.load_metadata(component, layer_idx)
        if out_of_core is None:
            out_of_core = len(meta.shards or []) > 1
        if out_of_core:
            from ..runtime.shard_reader import PrefetchLoader, ShardReader

            reader = ShardReader(
                [self.cache_dir / s for s in meta.shards], dtype=meta.dtype
            )
            return PrefetchLoader(
                reader, batch_size=batch_size, shuffle=shuffle, seed=seed
            )
        features, _ = self.load(component, layer_idx)
        return ActivationLoader(features, batch_size=batch_size, shuffle=shuffle, seed=seed)


def extract_and_cache_features(
    whisper_params: dict,
    arch: WhisperArch,
    audio_dataloader,
    cache: FeatureCache,
    encoder_layers: list[int],
    decoder_layers: list[int],
    max_samples: int | None = None,
    apply_layer_norm: bool = True,
    progress: bool = True,
    compute_dtype=None,
    mesh=None,
    capture_mlp: bool = False,
    checkpoint_every: int | None = None,
    resume: bool = False,
    cache_dtype: str | None = None,
) -> None:
    """Extraction loop (reference feature_cache.py:200-306, hook-free).

    One jitted forward per batch returns [L, B, T, D] for all layers; the
    requested layers are flattened to [B*T, D] and streamed to shards.
    ``compute_dtype=jnp.bfloat16`` selects fast extraction (flash
    attention + bf16 matmuls); activations are stored f32 by default.
    ``cache_dtype="bfloat16"`` (bf16 fast mode only) writes bf16 shards
    instead: bit-identical values to the f32 widening of the same
    transfer (the data already carries bf16 precision), half the disk
    and half the training-time read traffic, and no per-batch host-side
    widening cast.  The training paths consume bf16 caches natively
    (chunked fused epochs stage them as-is; kernels cast rows on entry).
    With ``mesh``, the batch is sharded over the ``data`` axis and GSPMD
    partitions the capture forward across chips (parallel/extraction.py).

    Host-transfer discipline (vs the reference's per-layer ``.cpu()`` in
    every hook, hooks.py:78-93):
    - only the REQUESTED layers leave the device (sliced from the stacked
      [L, B, T, D] capture before the D2H);
    - in bf16 fast mode the transfer itself is bf16 (half the bytes; the
      values already carry bf16 compute precision) and is widened to f32
      on the host, so the cache format is unchanged;
    - the device->host pull of batch i happens AFTER batch i+1's forward
      is dispatched, so the copy overlaps the next batch's compute.

    Elasticity: with ``checkpoint_every`` (samples), writer progress is
    checkpointed to ``extraction_progress.json`` at shard-consistent
    cuts; a restarted run with ``resume=True`` (and the same
    deterministic dataloader + batch cadence) restores the writers and
    skips the already-extracted samples, producing a cache identical to
    an uninterrupted run.  The reference's Modal extract job restarts
    from scratch on its 4 h timeout (modal_app/extract_features.py:45).
    """
    transfer_bf16 = compute_dtype == jnp.bfloat16
    if cache_dtype is None:
        cache_dtype = "float32"
    if cache_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"unsupported cache_dtype {cache_dtype!r}")
    if cache_dtype == "bfloat16" and not transfer_bf16:
        raise ValueError("cache_dtype='bfloat16' requires bf16 compute "
                         "(compute_dtype=jnp.bfloat16)")
    store_bf16 = cache_dtype == "bfloat16"
    wkw = dict(dtype=cache_dtype)
    writers_e = {l: cache.writer("encoder", l, **wkw) for l in encoder_layers}
    writers_d = {l: cache.writer("decoder", l, **wkw) for l in decoder_layers}
    writers_mlp: dict[str, dict[int, CacheWriter]] = {}
    if capture_mlp:
        # (mlp_in, mlp_out) pairs — transcoder training data the
        # reference's hook capture cannot produce (hooks.py only sees
        # layer outputs)
        for comp, layers in (("encoder", encoder_layers), ("decoder", decoder_layers)):
            for kind in ("mlp_in", "mlp_out"):
                writers_mlp[f"{comp}_{kind}"] = {
                    l: cache.writer(f"{comp}_{kind}", l, **wkw) for l in layers
                }

    def _flat_writers() -> dict[str, CacheWriter]:
        flat = {f"encoder:{l}": w for l, w in writers_e.items()}
        flat.update({f"decoder:{l}": w for l, w in writers_d.items()})
        for comp_kind, ws in writers_mlp.items():
            flat.update({f"{comp_kind}:{l}": w for l, w in ws.items()})
        return flat

    progress_path = cache.cache_dir / "extraction_progress.json"

    def _write_progress(samples_done: int) -> None:
        snap = {
            "model_name": cache.whisper_config.model_name,
            "cache_dtype": cache_dtype,
            "num_samples": samples_done,
            "writers": {k: w.state() for k, w in _flat_writers().items()},
        }
        tmp = progress_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(snap))
        tmp.rename(progress_path)

    skip_samples = 0
    if resume and progress_path.exists():
        snap = json.loads(progress_path.read_text())
        flat = _flat_writers()
        compatible = (
            snap.get("model_name") == cache.whisper_config.model_name
            # a dtype change mid-cache would append shards of a second
            # dtype onto the restored ones (metadata records only one)
            and snap.get("cache_dtype", "float32") == cache_dtype
            and set(snap.get("writers", {})) == set(flat)
            and all(
                (cache.cache_dir / s).exists()
                for st in snap["writers"].values() for s in st["shards"]
            )
        )
        if compatible:
            for k, w in flat.items():
                w.restore(snap["writers"][k])
            skip_samples = int(snap["num_samples"])
            if progress:
                print(f"resuming extraction at sample {skip_samples}", flush=True)
        elif progress:
            print("extraction progress file incompatible; starting fresh",
                  flush=True)

    num_samples = 0
    target = max_samples if max_samples is not None else float("inf")
    n_data = 1
    if mesh is not None:
        from ..parallel.extraction import place_mel, replicate_params
        from ..parallel.mesh import DATA_AXIS

        whisper_params = replicate_params(mesh, whisper_params)
        n_data = mesh.shape[DATA_AXIS]

    def select(stack, layers, rows):
        # slice the requested layers (and any mesh-divisibility padding
        # rows) on-device before the transfer
        if len(layers) < stack.shape[0]:
            stack = jnp.take(stack, jnp.asarray(sorted(layers)), axis=0)
        if rows < stack.shape[1]:
            stack = stack[:, :rows]
        if transfer_bf16:
            # bf16-compute mode only (an explicit f32 compute_dtype keeps
            # full-precision transfers); the post-LN f32 values round to
            # bf16 here — max rel ~2e-3, documented in docs/PARITY.md
            stack = stack.astype(jnp.bfloat16)
        return stack

    def drain(pulled):
        for stack, layers, writers in pulled:
            host = np.asarray(stack)  # one D2H per component per batch
            if host.dtype != np.float32 and not store_bf16:
                host = host.astype(np.float32)
            for j, l in enumerate(sorted(layers)):
                writers[l].append(host[j].reshape(-1, host.shape[-1]))

    pending = None
    pending_upto = 0  # num_samples covered once `pending` drains
    last_ckpt = skip_samples
    for batch in audio_dataloader:
        if num_samples >= target:
            break
        if isinstance(batch, (tuple, list)):
            batch = batch[0]
        if skip_samples > 0:
            # resume: these samples are already in the restored shards
            nrows = np.asarray(batch).shape[0]
            if nrows > skip_samples:
                raise ValueError(
                    f"resume cut ({skip_samples} samples left to skip) falls "
                    f"inside a {nrows}-row batch — rerun with the original "
                    "batch size so checkpoint cuts align with batches"
                )
            skip_samples -= nrows
            num_samples += nrows
            continue
        if transfer_bf16:
            # upload mels bf16 too: the forward casts mel to bf16 as its
            # first op, so rounding on host is bit-identical and the H2D
            # copy halves
            import ml_dtypes

            batch = np.asarray(batch, np.float32).astype(ml_dtypes.bfloat16)
        batch = np.asarray(batch)
        rows = batch.shape[0]
        if rows % n_data:
            # a data-sharded device_put rejects ragged batches; pad with
            # repeated rows (cheap — the padded activations are sliced off
            # on-device before the transfer, see select())
            pad = n_data - rows % n_data
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)])
        mel = jnp.asarray(batch)
        if mesh is not None:
            mel = place_mel(mesh, mel)
        capture_kwargs = dict(
            apply_layer_norm=apply_layer_norm,
            with_decoder=bool(decoder_layers),
            compute_dtype=compute_dtype,
            with_mlp=capture_mlp,
            # bf16 captures straight out of the forward (bit-identical to
            # casting f32 captures here, minus the [L,B,T,D] f32 HBM
            # round-trip); select()'s astype becomes a no-op
            capture_dtype=jnp.bfloat16 if transfer_bf16 else None,
        )
        if mesh is not None:
            # shard_map (not GSPMD): explicit batch partitioning keeps
            # the fused Pallas encoder blocks, which GSPMD would treat
            # as opaque and replicate
            from ..parallel.extraction import extract_activations_shard_map

            acts = extract_activations_shard_map(
                whisper_params, mel, arch, mesh, **capture_kwargs
            )
        else:
            acts = extract_activations(
                whisper_params, mel, arch, **capture_kwargs
            )  # async dispatch: device starts while the host drains i-1
        pulled = []
        if encoder_layers:
            pulled.append((select(acts["encoder"], encoder_layers, rows), encoder_layers, writers_e))
        if decoder_layers:
            pulled.append((select(acts["decoder"], decoder_layers, rows), decoder_layers, writers_d))
        for comp_kind, writers in writers_mlp.items():
            layers = encoder_layers if comp_kind.startswith("encoder") else decoder_layers
            if layers:
                pulled.append((select(acts[comp_kind], layers, rows), layers, writers))
        if pending is not None:
            drain(pending)
            if checkpoint_every and pending_upto - last_ckpt >= checkpoint_every:
                _write_progress(pending_upto)
                last_ckpt = pending_upto
        pending = pulled
        num_samples += rows
        pending_upto = num_samples
        if progress and num_samples % (rows * 8) == 0:
            print(f"extracted {num_samples} samples", flush=True)
    if pending is not None:
        drain(pending)

    for w in _flat_writers().values():
        w.finalize(num_samples)
    progress_path.unlink(missing_ok=True)
