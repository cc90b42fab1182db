#!/usr/bin/env python3
"""Throughput of the analyze job's streamed encode+track pass (VERDICT r3
next #7 — this loop replaces the reference's slowest code,
feature_viz.py:425-484: a per-token python heap loop there; a fused
Pallas encode + vectorized [F, k] device tracker here).

Builds a synthetic whisper-tiny-geometry cache, then streams it through
EXACTLY the launcher analyze loop (`FeatureCache.load_rows` ->
`TopKSAE.encode` -> `TopKTracker.update`), timing tokens/sec for the
full pass and for the encode alone, and asserting the fused Pallas
encode path is engaged (not the XLA fallback).

    python tools/analyze_bench.py [--samples 256] [--batch-samples 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

D, H, K_SAE, FRAMES = 384, 3072, 32, 1500


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--batch-samples", type=int, default=16,
                   help="analyze's streaming batch (chunk rows = this x 1500)")
    p.add_argument("--top-k", type=int, default=20)
    p.add_argument("--cache-dir", default="/tmp/wst_analyze_bench")
    args = p.parse_args()

    import numpy as np

    import jax

    from whisper_sae_tpu.analysis.feature_viz import TopKTracker
    from whisper_sae_tpu.config import DataConfig, WhisperConfig
    from whisper_sae_tpu.data.feature_cache import FeatureCache
    from whisper_sae_tpu.models.sae import TopKSAE
    from whisper_sae_tpu.ops import pallas_sae

    cache = FeatureCache(Path(args.cache_dir), WhisperConfig(), DataConfig())
    if not cache.has_cache("encoder", 0):
        rng = np.random.default_rng(0)
        writer = cache.writer("encoder", 0)
        for lo in range(0, args.samples, 64):
            n = min(64, args.samples - lo)
            writer.append(rng.standard_normal((n * FRAMES, D)).astype(np.float32))
        writer.finalize(num_samples=args.samples)

    rows = cache.load_rows("encoder", 0)[0]
    meta = cache.load_metadata("encoder", 0)
    frames = max(meta.num_tokens // max(meta.num_samples, 1), 1)
    sae = TopKSAE(input_dim=D, hidden_dim=H, k=K_SAE, seed=0)

    chunk_rows = args.batch_samples * frames
    assert pallas_sae.supported((chunk_rows, D), H), (
        "analyze geometry must take the fused Pallas encode"
    )

    tracker = TopKTracker(num_features=H, k=args.top_k)

    def full_pass():
        for lo in range(0, meta.num_samples, args.batch_samples):
            hi = min(lo + args.batch_samples, meta.num_samples)
            chunk = np.asarray(rows[lo * frames: hi * frames], dtype=np.float32)
            hidden = sae.encode(chunk)
            tracker.update(
                hidden.reshape(hi - lo, frames, H),
                sample_indices=np.arange(lo, hi),
            )
        jax.block_until_ready(tracker._values)

    def encode_only():
        out = None
        for lo in range(0, meta.num_samples, args.batch_samples):
            hi = min(lo + args.batch_samples, meta.num_samples)
            chunk = np.asarray(rows[lo * frames: hi * frames], dtype=np.float32)
            out = sae.encode(chunk)
        jax.block_until_ready(out)

    tokens = meta.num_samples * frames
    results = {}
    for name, fn in (("encode_only", encode_only), ("encode_and_track", full_pass)):
        fn()  # compile + warm
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = max(best, tokens / (time.perf_counter() - t0))
        results[f"{name}_tokens_per_sec"] = round(best, 1)
    results.update(samples=meta.num_samples, batch_samples=args.batch_samples,
                   d=D, features=H)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
