#!/usr/bin/env python3
"""Synthesize a large multi-shard activation cache for out-of-core tests.

Writes a whisper-tiny-geometry encoder-layer cache (f32 [N, D] rows in
DEFAULT_SHARD_TOKENS shards) straight through CacheWriter — the same
files `launcher extract` would produce, at any requested size, without
running Whisper.  Used to validate the 230 GB/layer design story
(SURVEY §5.8): the chunked fused-epoch trainer must hold RSS bounded and
stay within ~2x of in-core throughput on caches that exceed
``max_resident_bytes``.

    python tools/synth_cache.py --gb 20 --cache-dir /scratch/cache
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gb", type=float, default=20.0, help="target cache size")
    p.add_argument("--d", type=int, default=384, help="hidden dim (tiny=384)")
    p.add_argument("--component", default="encoder")
    p.add_argument("--layer-idx", type=int, default=0)
    p.add_argument("--cache-dir", default="cache/features")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="shard dtype (bfloat16 = half the bytes per token, "
                        "matching extract --cache-dtype bfloat16)")
    args = p.parse_args()

    from whisper_sae_tpu.config import DataConfig, WhisperConfig
    from whisper_sae_tpu.data.feature_cache import DEFAULT_SHARD_TOKENS, FeatureCache

    itemsize = 4 if args.dtype == "float32" else 2
    tokens = int(args.gb * (1 << 30) / (args.d * itemsize))
    cache = FeatureCache(Path(args.cache_dir), WhisperConfig(), DataConfig())
    writer = cache.writer(args.component, args.layer_idx, dtype=args.dtype)
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    written = 0
    chunk = DEFAULT_SHARD_TOKENS  # one shard per append
    # Generate ONE random base shard, then emit rolled copies: this host's
    # numpy links an unoptimized single-core BLAS (~1.8 GFLOPS measured)
    # and its RNG sustains only ~30M floats/s, so generating 20 GB of
    # fresh gaussians takes ~15 min while a roll-copy runs at memcpy
    # speed.  Throughput/RSS of the training path is content-independent;
    # the per-shard roll keeps gathers from returning identical rows.
    base = rng.standard_normal((chunk, args.d), dtype=np.float32) * 0.2
    shard_no = 0
    while written < tokens:
        n = min(chunk, tokens - written)
        block = np.roll(base[:n], shard_no * 379, axis=0)
        writer.append(block)
        written += n
        shard_no += 1
        gb = written * args.d * itemsize / (1 << 30)
        print(f"{gb:.1f} / {args.gb} GB ({written:,} tokens, "
              f"{gb / (time.time() - t0):.2f} GB/s)", flush=True)
    meta = writer.finalize(num_samples=tokens // 1500)
    print(f"wrote {len(meta.shards)} shards, {meta.num_tokens:,} tokens, "
          f"dim {meta.hidden_dim}, {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
