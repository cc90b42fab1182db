#!/usr/bin/env python3
"""Online smoke gate: first-networked-environment validation, one command.

Everything network-gated in this framework (HF pretrained Whisper weights,
streaming LibriSpeech) is implemented but has never executed from the
air-gapped build image (docs/ROADMAP.md item 1).  This script is the
de-risking recipe: in the FIRST environment with network (or a local HF
cache), run

    python tools/online_gate.py [--config configs/tiny_test.yaml]

and it will, end to end:

1. download `openai/whisper-tiny` weights + processor and import them
   into the JAX model (`models/whisper.py:from_hf_torch`);
2. check JAX-vs-torch encoder parity on one real mel (atol 2e-3 — the
   offline parity suite only ever saw randomly-initialized oracles);
3. stream the configured LibriSpeech split through the sharded mel cache
   (`data/librispeech.py`), transcribe one clip and report it;
4. extract layer activations with the functional capture path and cache
   them (`data/feature_cache.py`);
5. train the configured SAE on the cached activations with the fused
   trainer and record the quality gate (recon MSE + L0 at k);
6. write `online_gate.json` with every stage's status and metrics.

Each stage records ok/error independently so a partial failure still
produces a useful report, and the report file is rewritten after EVERY
stage, so progress is visible mid-run.

Resumability (a flaky network must not restart the gate from scratch):
- stage 1 rides the HF download cache (a retry fetches only missing
  shards);
- stage 3's dataset layer caches mels to disk, so a re-stream is cheap;
- stage 4 skips extraction entirely when the feature cache already holds
  the component/layer (``resumed: true`` in the report);
- stage 5 auto-resumes from the latest training checkpoint in the run
  dir (same contract as the launcher's ``auto_resume``).

``--offline-dryrun`` executes every stage end-to-end with synthetic audio
and randomly-initialized weights (no network), against separate
``*_dryrun`` cache/output dirs, and prints the artifact checklist the
first networked run should produce — run it on the TPU to pre-validate
the whole recipe.

Offline behavior without the flag: stages 1 and 3 fail fast with a clear
message; nothing else in the repo depends on this script.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "src"))


def stage(report: dict, name: str, out_path: Path | None = None):
    """Decorator: run a stage, record ok/duration/error, keep going.
    The report file is rewritten after every stage so a partial run
    leaves a useful artifact."""

    def wrap(fn):
        t0 = time.time()
        entry: dict = {"ok": False}
        try:
            out = fn()
            entry.update(ok=True, **(out or {}))
        except Exception as e:  # noqa: BLE001 — report and continue
            entry["error"] = f"{type(e).__name__}: {e}"
            entry["trace"] = traceback.format_exc(limit=3)
            out = None
        entry["seconds"] = round(time.time() - t0, 1)
        report[name] = entry
        status = "ok" if entry["ok"] else f"FAILED ({entry.get('error')})"
        print(f"[online_gate] {name}: {status} ({entry['seconds']}s)")
        if out_path is not None:
            out_path.write_text(json.dumps(report, indent=2, default=str))
        return out

    return wrap


CHECKLIST = """\
[online_gate] artifact checklist for the first NETWORKED run
  (python tools/online_gate.py — no flags):
  1. online_gate.json ... 5 stage entries, all "ok": true, "pass": true
  2. pretrained_weights . model=openai/whisper-tiny, random_init=false
  3. encoder_parity ..... max_abs_diff < 2e-3 vs REAL torch weights
  4. streaming_data ..... samples == config data.max_samples,
                          "transcription" non-empty, wer < 0.5
  5. extraction ......... <cache_dir>/features/encoder_layer0/*.npy
                          + metadata.json (tokens == samples x 1500)
  6. training gate ...... outputs/online_gate/{sae_final.npz,
                          metrics.json}; recon_mse finite, l0 == k,
                          explained_variance > 0
  A flaky network can interrupt any stage: re-running the same command
  resumes (HF download cache, mel disk cache, feature-cache skip,
  training checkpoint auto-resume) instead of starting over."""


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=str(REPO / "configs" / "tiny_test.yaml"))
    parser.add_argument("--out", default="online_gate.json")
    parser.add_argument("--max-samples", type=int, default=None,
                        help="override config data.max_samples")
    parser.add_argument("--random-whisper", action="store_true",
                        help="randomly-initialized torch Whisper instead of "
                             "the HF download (offline plumbing check)")
    parser.add_argument("--synthetic", action="store_true",
                        help="synthetic audio instead of streaming "
                             "LibriSpeech (offline plumbing check)")
    parser.add_argument("--offline-dryrun", action="store_true",
                        help="run EVERY stage end-to-end offline (synthetic "
                             "audio + random weights, separate *_dryrun "
                             "dirs) and print the networked-run artifact "
                             "checklist")
    args = parser.parse_args()

    import numpy as np

    from whisper_sae_tpu.config import ExperimentConfig

    config = ExperimentConfig.from_yaml(args.config)
    if args.offline_dryrun:
        args.random_whisper = True
        args.synthetic = True
        if args.max_samples is None:
            args.max_samples = 16
        # keep dryrun artifacts out of the real gate's cache/run dirs
        config.data.cache_dir = Path(str(config.data.cache_dir) + "_dryrun")
        if args.out == "online_gate.json":
            args.out = "online_gate_dryrun.json"
    if args.max_samples:
        config.data.max_samples = args.max_samples
    out_path = Path(args.out)
    report: dict = {"config": str(args.config),
                    "offline_dryrun": bool(args.offline_dryrun)}

    # ---- 1. pretrained weights ----
    state = {}

    @stage(report, "pretrained_weights", out_path)
    def _load():
        from transformers import WhisperForConditionalGeneration

        from whisper_sae_tpu.models.whisper import from_hf_torch

        processor = None
        if args.random_whisper:
            from transformers import WhisperConfig as HFWhisperConfig

            d = config.whisper.hidden_dim
            torch_model = WhisperForConditionalGeneration(
                HFWhisperConfig(
                    d_model=d,
                    encoder_layers=config.whisper.num_encoder_layers,
                    decoder_layers=config.whisper.num_decoder_layers,
                    encoder_attention_heads=6,
                    decoder_attention_heads=6,
                    encoder_ffn_dim=d * 4,
                    decoder_ffn_dim=d * 4,
                )
            ).eval()
        else:
            from transformers import WhisperProcessor

            torch_model = WhisperForConditionalGeneration.from_pretrained(
                config.whisper.model_name
            )
            processor = WhisperProcessor.from_pretrained(config.whisper.model_name)
        params, arch = from_hf_torch(torch_model)
        state.update(torch_model=torch_model, processor=processor,
                     params=params, arch=arch)
        n = sum(int(np.prod(p.shape)) for p in torch_model.state_dict().values())
        return {"model": config.whisper.model_name, "torch_params": n,
                "random_init": bool(args.random_whisper)}

    # ---- 2. real-weight parity ----
    @stage(report, "encoder_parity", out_path)
    def _parity():
        import torch

        import jax
        import jax.numpy as jnp

        from whisper_sae_tpu.models.whisper import encoder_forward

        rng = np.random.default_rng(0)
        mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.1
        with torch.no_grad():
            want = (
                state["torch_model"].model.encoder(torch.from_numpy(mel))
                .last_hidden_state.numpy()
            )
        # TPU matmuls default to bf16 inputs; force f32 accumulation so
        # this measures implementation parity, not precision policy
        # (CPU-vs-torch parity at this geometry is ~2e-6)
        with jax.default_matmul_precision("highest"):
            got, _ = encoder_forward(
                state["params"], jnp.asarray(mel), state["arch"]
            )
        diff = float(np.abs(np.asarray(got) - want).max())
        assert diff < 2e-3, f"encoder parity diff {diff}"
        return {"max_abs_diff": diff}

    # ---- 3. streaming data + ASR sanity ----
    @stage(report, "streaming_data", out_path)
    def _data():
        if args.synthetic:
            from whisper_sae_tpu.data.librispeech import SyntheticSpeechDataset

            ds = SyntheticSpeechDataset(
                num_samples=args.max_samples or min(config.data.max_samples, 16)
            )
        else:
            from whisper_sae_tpu.data.librispeech import LibriSpeechDataset

            ds = LibriSpeechDataset(config.data, processor=None)
        assert len(ds) > 0, "no samples streamed"
        state["dataset"] = ds
        out = {"samples": len(ds), "first_id": ds[0]["id"]}
        if state.get("processor") is not None:
            from whisper_sae_tpu.models.whisper import greedy_decode_cached

            import jax.numpy as jnp

            tok = state["processor"].tokenizer
            forced = tuple(t for _, t in sorted(tok.get_decoder_prompt_ids()))
            # ONE batched decode at ONE static max_len serves both the
            # display transcript and the WER gate (greedy_decode_cached
            # compiles per (batch, max_len) shape and compiles are
            # multi-minute on this host); 160 tokens clears dev-clean's
            # longest ~30 s utterances so truncation never inflates WER
            n_wer = min(len(ds), 8)
            mels = jnp.stack(
                [jnp.asarray(ds[i]["input_features"]) for i in range(n_wer)]
            )
            ids = np.asarray(greedy_decode_cached(
                state["params"], mels, state["arch"],
                max_len=160, forced_ids=forced,
            ))
            hyps = tok.batch_decode(ids, skip_special_tokens=True)
            out["transcription"] = hyps[0]
            out["ground_truth"] = ds[0]["text"]
            # real-weight ASR quality: tiny greedy no-timestamps decoding
            # lands ~10-20% WER on clean LibriSpeech; > 50% indicates
            # broken weights/frontend.  Clips whose decode hit the token
            # ceiling without EOS are skipped (their tail would count as
            # deletions).
            from whisper_sae_tpu.utils.metrics import corpus_wer

            eos = state["arch"].eos_token_id
            pairs = [
                (ds[i]["text"], hyps[i])
                for i in range(n_wer)
                if eos in ids[i, 1:]
            ]
            if pairs:
                out["wer_clips"] = len(pairs)
                out["wer"] = round(corpus_wer(pairs), 4)
                assert out["wer"] < 0.5, (
                    f"real-weight WER {out['wer']} — frontend/weights broken"
                )
        return out

    # ---- 4. extraction -> feature cache ----
    @stage(report, "extraction", out_path)
    def _extract():
        from whisper_sae_tpu.data.feature_cache import (
            FeatureCache,
            extract_and_cache_features,
        )
        from whisper_sae_tpu.data.librispeech import (
            AudioBatchLoader,
            LibriSpeechFeaturesOnly,
        )

        cache = FeatureCache(
            cache_dir=Path(config.data.cache_dir) / "features",
            whisper_config=config.whisper,
            data_config=config.data,
        )
        component, layer_idx = (
            ("encoder", config.encoder_layers[0])
            if config.encoder_layers
            else ("decoder", config.decoder_layers[0])
        )
        resumed = cache.has_cache(component, layer_idx)
        if not resumed:  # a retried gate skips the finished extraction
            loader = AudioBatchLoader(
                LibriSpeechFeaturesOnly(state["dataset"]), batch_size=8
            )
            extract_and_cache_features(
                state["params"], state["arch"], loader, cache,
                encoder_layers=[layer_idx] if component == "encoder" else [],
                decoder_layers=[layer_idx] if component == "decoder" else [],
            )
        state["cache"] = cache
        state["layer"] = (component, layer_idx)
        tokens = cache.load(component, layer_idx)[0].shape[0]
        return {"component": component, "layer": layer_idx, "tokens": tokens,
                "resumed": resumed}

    # ---- 5. training + quality gate ----
    @stage(report, "training_quality_gate", out_path)
    def _train():
        import jax.numpy as jnp

        from whisper_sae_tpu.data.feature_cache import ActivationLoader
        from whisper_sae_tpu.models.sae import create_sae, topk_sae_apply
        from whisper_sae_tpu.training.trainer import SAETrainer

        component, layer_idx = state["layer"]
        acts, _ = state["cache"].load(component, layer_idx)
        sae = create_sae(config.sae, acts.shape[1])
        run_name = "online_gate_dryrun" if args.offline_dryrun else "online_gate"
        trainer = SAETrainer(
            sae, config.training, run_dir=Path("outputs") / run_name
        )
        # elastic: a retried gate continues from the latest checkpoint
        # (launcher auto_resume contract)
        ckpts = sorted(
            trainer.run_dir.glob("checkpoint_epoch*.npz"),
            key=lambda p: int("".join(filter(str.isdigit, p.stem)) or 0),
        )
        resumed_from = None
        if ckpts:
            trainer.load_checkpoint(ckpts[-1])
            resumed_from = ckpts[-1].name
        loader = ActivationLoader(acts, batch_size=config.training.batch_size)
        trainer.train(loader, epochs=config.training.epochs)
        out, _ = topk_sae_apply(sae.params, jnp.asarray(acts[:8192]), sae.k)
        var = float(np.var(np.asarray(acts[:8192])))
        mse = float(out.reconstruction_loss)
        return {
            "recon_mse": mse,
            "explained_variance": 1.0 - mse / max(var, 1e-9),
            "l0": float(out.l0),
            "k": sae.k,
            "steps": trainer.global_step,
            "resumed_from": resumed_from,
        }

    report["pass"] = all(
        report[s].get("ok") for s in report if isinstance(report[s], dict)
    )
    out_path.write_text(json.dumps(report, indent=2, default=str))
    if args.offline_dryrun:
        print(CHECKLIST)
    print(json.dumps({"online_gate_pass": report["pass"], "report": args.out}))


if __name__ == "__main__":
    main()
