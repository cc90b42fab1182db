#!/usr/bin/env python3
"""End-to-end feature analysis walkthrough (fully offline).

Covers the complete analysis surface on synthetic audio with a randomly
initialized Whisper (swap in ``load_pretrained`` + LibriSpeech when
online):

1. extract layer-0 encoder activations (functional capture),
2. train a TopK SAE on them,
3. collect top-activating examples (vectorized tracker),
4. write feature reports (summary.json + per-feature JSON),
5. extract audio clips for the top features,
6. causally validate the SAE by substitution (logit KL + token agreement).

    JAX_PLATFORMS=cpu python examples/analyze_features.py --out /tmp/wst_demo
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=Path, default=Path("analysis_demo"))
    parser.add_argument("--num-samples", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument(
        "--arch", choices=["demo", "tiny"], default="demo",
        help="'demo' = small random Whisper (fast on CPU); 'tiny' = full "
             "whisper-tiny geometry (use on TPU)",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisper_sae_tpu.analysis import (
        AudioClipExtractor,
        FeatureReport,
        TopKTracker,
        create_synthetic_audio_loader,
    )
    from whisper_sae_tpu.causal import substitution_effect
    from whisper_sae_tpu.config import SAEConfig, TrainingConfig
    from whisper_sae_tpu.data.librispeech import SyntheticSpeechDataset
    from whisper_sae_tpu.models.sae import create_sae
    from whisper_sae_tpu.models.whisper import WhisperArch, extract_activations, init_whisper
    from whisper_sae_tpu.training.trainer import SAETrainer

    out = args.out
    out.mkdir(parents=True, exist_ok=True)

    # 1. subject model + data -> activations
    if args.arch == "tiny":
        arch = WhisperArch()  # whisper-tiny geometry
    else:
        arch = WhisperArch(
            d_model=64, encoder_layers=2, decoder_layers=2, num_heads=2,
            ffn_dim=128, max_source_positions=1500, max_target_positions=32,
            vocab_size=500, decoder_start_token_id=42,
        )
    params = init_whisper(jax.random.PRNGKey(0), arch)
    ds = SyntheticSpeechDataset(num_samples=args.num_samples, seed=0)
    mels = jnp.stack([jnp.asarray(ds[i]["input_features"]) for i in range(len(ds))])
    acts = extract_activations(params, mels, arch, with_decoder=False)
    layer0 = np.asarray(acts["encoder"][0])  # [B, T, D]
    tokens = layer0.reshape(-1, layer0.shape[-1])
    print(f"1. extracted {tokens.shape[0]:,} activation tokens (dim {tokens.shape[1]})")

    # 2. train the SAE
    sae = create_sae(SAEConfig(expansion_factor=8, k=32), input_dim=tokens.shape[1])
    cfg = TrainingConfig(batch_size=2048, learning_rate=3e-4, epochs=args.epochs,
                         warmup_steps=20, use_amp=True, checkpoint_every=100)
    trainer = SAETrainer(sae, cfg, run_dir=out / "sae")
    from whisper_sae_tpu.data.loader import ActivationLoader

    trainer.train(ActivationLoader(tokens, 2048, seed=0), epochs=args.epochs)
    trainer.save_final()
    print(f"2. trained SAE; final loss {trainer.metrics_history[-1].loss:.4f}")

    # 3. top activations per feature — only over frames with real audio
    # (synthetic clips are shorter than the 30 s window; the padded tail
    # is silence and its activations have no audio to clip)
    real_frames = int(ds.duration_s * 100)  # 10 ms/frame convention
    tracker = TopKTracker(num_features=sae.hidden_dim, k=10)
    for i in range(layer0.shape[0]):
        hidden = sae.encode(jnp.asarray(layer0[i : i + 1, :real_frames]))
        tracker.update(
            np.asarray(hidden), sample_indices=[i], transcriptions=[ds[i]["text"]]
        )
    print(f"3. tracked {tracker.total_activations:,} activations over "
          f"{tracker.samples_processed} clips")

    # 4. reports
    report = FeatureReport(tracker, out / "reports")
    report.save_reports(top_n=20)
    summary = json.loads((out / "reports" / "summary.json").read_text())
    top = summary["top_features"][0]
    print(f"4. reports written; top feature {top['feature_idx']} "
          f"max act {top['max_activation']:.3f}")

    # 5. audio clips for the top 5 features
    extractor = AudioClipExtractor(
        tracker, create_synthetic_audio_loader(ds), out / "clips"
    )
    clips = extractor.extract_all_clips(
        feature_indices=[f["feature_idx"] for f in summary["top_features"][:5]],
        max_clips_per_feature=3,
    )
    extractor.save_manifest()
    print(f"5. wrote {sum(len(v) for v in clips.values())} clips for {len(clips)} features")

    # 6. causal validation
    effect = substitution_effect(
        params, mels[:2], arch, sae, layer_idx=0, apply_layer_norm=True, max_len=8
    )
    (out / "causal_validation.json").write_text(json.dumps(effect, indent=2))
    print(f"6. substitution effect: logit KL {effect['logit_kl']:.4f}, "
          f"token agreement {effect['token_agreement']:.2%}")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
