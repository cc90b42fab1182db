#!/usr/bin/env python3
"""Out-of-core training measurement (VERDICT round-2 next #2).

Trains one SAE layer from a multi-shard disk cache through the chunked
fused-epoch path (`SAETrainer.train_epoch_out_of_core` over the native
shard reader) with a hard residency bound, and records:

  - act/s/chip per epoch (staging + compute, the end-to-end number)
  - peak RSS (must stay ~chunk-sized however big the cache is)
  - the in-core comparison at the same chunk size (same geometry, data
    resident in RAM, same fused-epoch programs) so the out-of-core tax
    is measured, not guessed

    python tools/synth_cache.py --gb 20 --cache-dir /root/ooc/features
    python tools/ooc_bench.py --cache-dir /root/ooc/features --epochs 2
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def peak_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)


def anon_rss_gb() -> float:
    """Anonymous (non-file-backed) resident memory — the number the
    bounded-RSS design claim is about.  ru_maxrss counts the memmapped
    shard pages too, which are CLEAN file pages the kernel reclaims under
    pressure: a 20 GB cache read through mmaps inflates peak RSS by up to
    20 GB without any actual memory commitment."""
    for line in open("/proc/self/status"):
        if line.startswith("RssAnon"):
            return int(line.split()[1]) / (1 << 20)
    return float("nan")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cache-dir", default="cache/features")
    p.add_argument("--component", default="encoder")
    p.add_argument("--layer-idx", type=int, default=0)
    p.add_argument("--batch", type=int, default=32768)
    p.add_argument("--epochs", type=int, default=2)
    # the flat fused epoch shuffles with an in-jit gather, so HBM holds
    # chunk + gathered copy: 2^21 tokens x 384 f32 = 3.2 GB chunk ->
    # ~6.4 GB transient (2^22 OOMs a 16 GB v5e once params/moments are up)
    p.add_argument("--chunk-tokens", type=int, default=1 << 21)
    p.add_argument("--expansion-factor", type=int, default=8)
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--in-core-tokens", type=int, default=1 << 21,
                   help="rows for the in-core comparison run")
    p.add_argument("--skip-in-core", action="store_true")
    args = p.parse_args()

    import jax

    from whisper_sae_tpu.config import DataConfig, TrainingConfig, WhisperConfig
    from whisper_sae_tpu.data.feature_cache import FeatureCache
    from whisper_sae_tpu.models.sae import TopKSAE
    from whisper_sae_tpu.runtime.shard_reader import ShardReader
    from whisper_sae_tpu.training.trainer import SAETrainer

    cache = FeatureCache(Path(args.cache_dir), WhisperConfig(), DataConfig())
    meta = cache.load_metadata(args.component, args.layer_idx)
    reader = ShardReader(
        [cache.cache_dir / s for s in meta.shards]
    )
    gb = meta.num_tokens * meta.hidden_dim * 4 / (1 << 30)
    print(f"cache: {meta.num_tokens:,} tokens x {meta.hidden_dim} "
          f"({gb:.1f} GB, {len(meta.shards)} shards)", flush=True)

    def make_trainer(run_dir):
        model = TopKSAE(
            input_dim=meta.hidden_dim,
            hidden_dim=args.expansion_factor * meta.hidden_dim,
            k=args.k, seed=0,
        )
        cfg = TrainingConfig(
            batch_size=args.batch, learning_rate=1e-4, epochs=1,
            warmup_steps=1000, use_amp=True,
        )
        t = SAETrainer(model, cfg, run_dir=Path(run_dir))
        t.setup_scheduler(total_steps=10 * (meta.num_tokens // args.batch))
        return t

    result = {
        "cache_gb": round(gb, 2),
        "num_shards": len(meta.shards),
        "chunk_tokens": args.chunk_tokens,
        "batch": args.batch,
    }

    # in-core comparison first (smaller, compiles the same epoch programs)
    if not args.skip_in_core:
        t_ic = make_trainer("/tmp/wst_ooc_ic")
        n_ic = min(args.in_core_tokens, meta.num_tokens)
        data = reader.gather(np.arange(n_ic))
        t_ic.train_epoch_fused(data, shuffle=True)  # compile + warm
        jax.block_until_ready(t_ic.model.params["w_enc"])
        t0 = time.perf_counter()
        t_ic.train_epoch_fused(data, shuffle=True)
        jax.block_until_ready(t_ic.model.params["w_enc"])
        dt = time.perf_counter() - t0
        result["in_core_act_per_sec"] = round(n_ic / dt, 1)
        print(f"in-core ({n_ic:,} resident rows): {n_ic/dt:,.0f} act/s",
              flush=True)
        del data

    t = make_trainer("/tmp/wst_ooc")
    rates = []
    for ep in range(args.epochs):
        t0 = time.perf_counter()
        ms = t.train_epoch_out_of_core(reader, chunk_tokens=args.chunk_tokens)
        jax.block_until_ready(t.model.params["w_enc"])
        dt = time.perf_counter() - t0
        rates.append(meta.num_tokens / dt)
        print(f"epoch {ep + 1}: {meta.num_tokens / dt:,.0f} act/s "
              f"({dt:.0f}s, {len(ms)} steps, loss {ms[-1].loss:.4f}, "
              f"peak RSS {peak_rss_gb():.2f} GB, "
              f"anon RSS {anon_rss_gb():.2f} GB)", flush=True)
    result["out_of_core_act_per_sec"] = round(max(rates), 1)
    result["peak_rss_gb"] = round(peak_rss_gb(), 2)
    result["anon_rss_gb"] = round(anon_rss_gb(), 2)
    if "in_core_act_per_sec" in result:
        result["ooc_vs_in_core"] = round(
            result["out_of_core_act_per_sec"] / result["in_core_act_per_sec"], 3
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
