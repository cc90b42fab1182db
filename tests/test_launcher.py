"""Launcher elasticity: kill-and-resume must complete the run with the
same final state and metrics.json schema as an uninterrupted run
(round-1 VERDICT item 9; the reference's Modal jobs restart from scratch
on timeout, modal_app/train.py:45)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "launcher"))

from launch import (  # noqa: E402
    _latest_checkpoint,
    _strip_supervise_args,
    _supervise,
    extract_features,
    train_crosscoder,
    train_sae,
)

from whisper_sae_tpu.config import DataConfig, WhisperConfig  # noqa: E402
from whisper_sae_tpu.data.feature_cache import FeatureCache  # noqa: E402
from whisper_sae_tpu.training.trainer import SAETrainer  # noqa: E402

_METRIC_KEYS = {
    "step", "loss", "reconstruction_loss", "sparsity_loss", "l0",
    "dead_feature_ratio", "learning_rate",
}


@pytest.fixture
def cache_dir(tmp_path, rng):
    cache = FeatureCache(
        tmp_path / "cache" / "features", WhisperConfig(), DataConfig()
    )
    feats = rng.standard_normal((4096, 64)).astype(np.float32)
    cache.save(feats, "encoder", 0, num_samples=4)
    return tmp_path / "cache"


def _run(cache_dir, out_dir, **kw):
    return train_sae(
        component="encoder",
        layer_idx=0,
        batch_size=512,
        learning_rate=1e-3,
        epochs=4,
        warmup_steps=0,
        use_amp=False,
        cache_dir=cache_dir,
        output_dir=out_dir,
        checkpoint_every=1,
        **kw,
    )


class TestSupervisor:
    """Restart supervision (`launcher ... --supervise`): crashed jobs
    relaunch (and, combined with auto_resume, continue from the latest
    checkpoint).  The reference has Modal timeouts only (SURVEY §5.3)."""

    @pytest.fixture(autouse=True)
    def _no_axon_register(self, monkeypatch):
        # child interpreters must skip the axon sitecustomize register()
        # (it can block while another process holds the chip); the
        # supervised children here are pure-python and never need it
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")

    def test_restarts_until_success_and_logs(self, tmp_path):
        sentinel = tmp_path / "crashed_once"
        # child exits 1 on first run (creating the sentinel), 0 after —
        # a crash-then-recover job
        child = [
            sys.executable, "-c",
            "import pathlib, sys\n"
            f"p = pathlib.Path({str(sentinel)!r})\n"
            "if p.exists(): sys.exit(0)\n"
            "print('boom: device lost')\n"
            "p.write_text('x'); sys.exit(1)",
        ]
        log = tmp_path / "out" / "supervisor_log.json"
        rc = _supervise(child, max_restarts=3, backoff_s=0.0, log_path=log)
        assert rc == 0
        attempts = json.loads(log.read_text())
        assert [a["returncode"] for a in attempts] == [1, 0]
        # the failed attempt preserves its output tail for diagnosis
        assert "boom: device lost" in attempts[0]["output_tail"]
        assert "output_tail" not in attempts[1]

    def test_gives_up_after_budget(self, tmp_path):
        child = [sys.executable, "-c", "import sys; sys.exit(7)"]
        log = tmp_path / "log.json"
        rc = _supervise(child, max_restarts=2, backoff_s=0.0, log_path=log)
        assert rc == 7
        attempts = json.loads(log.read_text())
        assert [a["returncode"] for a in attempts] == [7, 7, 7]  # 1 + 2 restarts

    def test_strip_supervise_args(self):
        argv = [
            "train", "--component", "encoder", "--supervise",
            "--max-restarts", "5", "--restart-backoff=2.5",
            "--layer-idx", "1",
        ]
        assert _strip_supervise_args(argv) == [
            "train", "--component", "encoder", "--layer-idx", "1",
        ]


class TestExtractMeshEquivalence:
    """CLI-level check for the auto-mesh extraction wiring (VERDICT
    round-2 next #3): `launcher extract` on the 8-device CPU mesh must
    produce the same caches as the single-device path."""

    def test_mesh_extract_matches_single_device(self, tmp_path):
        def run(sub, use_mesh):
            extract_features(
                layers_encoder="0", layers_decoder="",
                max_samples=11,  # ragged final batch under the mesh
                batch_size=8, dataset="synthetic",
                cache_dir=tmp_path / sub, random_whisper=True,
                use_mesh=use_mesh,
            )
            cache = FeatureCache(
                tmp_path / sub / "features", WhisperConfig(), DataConfig()
            )
            return cache.load("encoder", 0)

        got, meta = run("mesh", True)
        want, meta_ref = run("single", False)
        assert meta.num_samples == meta_ref.num_samples == 11
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestLatestCheckpoint:
    def test_picks_numerically_largest(self, tmp_path):
        for n in (1, 2, 10):
            (tmp_path / f"checkpoint_epoch{n}.npz").touch()
        assert _latest_checkpoint(tmp_path).name == "checkpoint_epoch10.npz"

    def test_none_when_empty(self, tmp_path):
        assert _latest_checkpoint(tmp_path) is None


class TestKillAndResume:
    def test_resume_matches_uninterrupted(self, cache_dir, tmp_path, monkeypatch):
        # --- reference: uninterrupted 4-epoch run ---
        res_a = _run(cache_dir, tmp_path / "outA")
        run_a = Path(res_a["run_dir"])
        assert res_a["resumed_from"] is None

        # --- crash during epoch 3 (checkpoint write raises) ---
        orig = SAETrainer.save_checkpoint

        def crashing(self, filename):
            if filename == "checkpoint_epoch3.npz":
                raise RuntimeError("simulated preemption")
            return orig(self, filename)

        monkeypatch.setattr(SAETrainer, "save_checkpoint", crashing)
        with pytest.raises(RuntimeError, match="simulated preemption"):
            _run(cache_dir, tmp_path / "outB")
        monkeypatch.setattr(SAETrainer, "save_checkpoint", orig)

        run_b = Path(tmp_path / "outB" / "launch_encoder_layer0")
        assert _latest_checkpoint(run_b).name == "checkpoint_epoch2.npz"
        assert not (run_b / "final.npz").exists()

        # --- restart the same command: must resume, not retrain ---
        res_b = _run(cache_dir, tmp_path / "outB")
        assert res_b["resumed_from"] == "checkpoint_epoch2.npz"

        # identical final parameters to the uninterrupted run (the LR
        # schedule spans the full 4 epochs in both; epoch-keyed shuffles
        # replay identically after the restore)
        a = np.load(run_a / "sae_final.npz")
        b = np.load(run_b / "sae_final.npz")
        assert set(a.files) == set(b.files)
        for key in a.files:
            np.testing.assert_allclose(a[key], b[key], atol=1e-6, err_msg=key)

        # metrics.json: same schema; resumed file holds epochs 3-4 only
        ma = json.loads((run_a / "metrics.json").read_text())
        mb = json.loads((run_b / "metrics.json").read_text())
        assert set(ma[0]) == set(mb[0]) == _METRIC_KEYS
        assert mb[-1]["step"] == ma[-1]["step"]  # both end at the same step

    def test_no_resume_flag_starts_fresh(self, cache_dir, tmp_path):
        _run(cache_dir, tmp_path / "out")
        res = _run(cache_dir, tmp_path / "out", auto_resume=False)
        assert res["resumed_from"] is None


class TestTrainCrosscoder:
    @pytest.fixture
    def multilayer_cache(self, tmp_path, rng):
        cache = FeatureCache(
            tmp_path / "cache" / "features", WhisperConfig(), DataConfig()
        )
        base = rng.standard_normal((2048, 64)).astype(np.float32)
        for l in range(3):
            # correlated layers (shared base + per-layer noise): the
            # crosscoder should find cross-layer structure
            feats = base + 0.3 * rng.standard_normal((2048, 64)).astype(np.float32)
            cache.save(feats, "encoder", l, num_samples=2)
        return tmp_path / "cache"

    def test_end_to_end(self, multilayer_cache, tmp_path):
        res = train_crosscoder(
            component="encoder",
            layers="0,1,2",
            expansion_factor=4,
            k=8,
            batch_size=512,
            learning_rate=1e-3,
            epochs=3,
            warmup_steps=0,
            use_amp=False,
            cache_dir=multilayer_cache,
            output_dir=tmp_path / "out",
        )
        run_dir = Path(res["run_dir"])
        assert res["layers"] == [0, 1, 2]
        assert res["num_tokens"] == 2048
        assert np.isfinite(res["final_loss"])

        params = np.load(run_dir / "crosscoder_final.npz")
        assert params["w_enc"].shape == (3, 64, 256)
        assert params["w_dec"].shape == (256, 3, 64)
        metrics = json.loads((run_dir / "metrics.json").read_text())
        assert set(metrics[0]) == _METRIC_KEYS
        assert metrics[-1]["loss"] < metrics[0]["loss"]
        tc = json.loads((run_dir / "training_config.json").read_text())
        assert tc["crosscoder"]["n_layers"] == 3

    def test_streaming_loader_matches_capability(self, multilayer_cache, tmp_path):
        # force the out-of-core [B, L, D] streaming path
        res = train_crosscoder(
            component="encoder",
            layers="0,1,2",
            expansion_factor=4,
            k=8,
            batch_size=512,
            learning_rate=1e-3,
            epochs=1,
            warmup_steps=0,
            use_amp=False,
            cache_dir=multilayer_cache,
            output_dir=tmp_path / "out2",
            max_resident_bytes=1,
        )
        assert np.isfinite(res["final_loss"])


class TestTrainTranscoder:
    @pytest.fixture
    def mlp_cache(self, tmp_path, rng):
        """Tiny end-to-end capture with MLP pairs (random whisper)."""
        import jax
        import jax.numpy as jnp

        from whisper_sae_tpu.data.feature_cache import extract_and_cache_features
        from whisper_sae_tpu.models.whisper import WhisperArch, init_whisper

        arch = WhisperArch(
            d_model=64, encoder_layers=2, decoder_layers=1, num_heads=2,
            ffn_dim=128, max_source_positions=75, max_target_positions=8,
            vocab_size=100, decoder_start_token_id=3,
        )
        params = init_whisper(jax.random.PRNGKey(0), arch)
        mels = rng.standard_normal((8, 80, 150)).astype(np.float32)
        cache = FeatureCache(
            tmp_path / "cache" / "features", WhisperConfig(), DataConfig()
        )
        extract_and_cache_features(
            params, arch, [mels], cache,
            encoder_layers=[0], decoder_layers=[],
            progress=False, capture_mlp=True,
        )
        return tmp_path / "cache"

    @pytest.mark.parametrize("use_skip", [True, False])
    def test_end_to_end(self, mlp_cache, tmp_path, use_skip):
        from launch import train_transcoder

        res = train_transcoder(
            component="encoder",
            layer_idx=0,
            expansion_factor=4,
            k=8,
            use_skip=use_skip,
            batch_size=256,
            learning_rate=1e-3,
            epochs=2,
            warmup_steps=0,
            use_amp=False,
            cache_dir=mlp_cache,
            output_dir=tmp_path / f"out_{use_skip}",
        )
        run_dir = Path(res["run_dir"])
        assert res["num_tokens"] == 8 * 75
        assert np.isfinite(res["final_loss"])
        params = np.load(run_dir / "transcoder_final.npz")
        assert params["w_enc"].shape == (64, 256)
        assert ("w_skip" in params.files) == use_skip
        metrics = json.loads((run_dir / "metrics.json").read_text())
        assert set(metrics[0]) == _METRIC_KEYS
        # (no monotonicity check: the post-step decoder renorm rescales a
        # near-zero-init model, so the loss first jumps then relearns)

    def test_analyze_transcoder_features(self, mlp_cache, tmp_path):
        """analyze --job-type transcoder: trained transcoder latents
        tracked over the mlp_in cache, same report layout."""
        from launch import analyze, train_transcoder

        train_transcoder(
            component="encoder", layer_idx=0, expansion_factor=4, k=8,
            batch_size=256, epochs=1, warmup_steps=0, use_amp=False,
            cache_dir=mlp_cache, output_dir=tmp_path / "out",
        )
        res = analyze(
            component="encoder", layer_idx=0, job_type="transcoder",
            top_k=4, top_n=5, batch_samples=3,
            cache_dir=mlp_cache, output_dir=tmp_path / "out",
            dashboard=True,
        )
        assert res["job_type"] == "transcoder"
        assert res["num_features"] == 256
        adir = Path(res["analysis_dir"])
        assert adir == tmp_path / "out" / "launch_encoder_transcoder_layer0" / "analysis"
        summary = json.loads((adir / "summary.json").read_text())
        assert len(summary["top_features"]) == 5
        assert (adir / "dashboard.html").exists()

    def test_analyze_clips_complete_the_dashboard(self, tmp_path):
        """analyze --clips: audio clips for the top features land in
        <analysis>/audio and the dashboard links them (one command from
        cache to listenable report)."""
        from launch import analyze, extract_features, train_sae

        extract_features(
            layers_encoder="0", layers_decoder="", max_samples=6,
            batch_size=3, dataset="synthetic", cache_dir=tmp_path / "c",
            random_whisper=True, use_mesh=False, seed=7,
        )
        train_sae(
            component="encoder", layer_idx=0, batch_size=512, epochs=1,
            warmup_steps=0, use_amp=False, cache_dir=tmp_path / "c",
            output_dir=tmp_path / "o",
        )
        res = analyze(
            component="encoder", layer_idx=0, top_k=3, top_n=4,
            batch_samples=3, cache_dir=tmp_path / "c",
            output_dir=tmp_path / "o", dashboard=True, clips=2,
            clips_per_feature=2,
        )
        assert res["clips_written"] > 0
        adir = Path(res["analysis_dir"])
        wavs = list((adir / "audio").glob("feature_*/rank*.wav"))
        assert len(wavs) == res["clips_written"]
        assert (adir / "audio" / "manifest.json").exists()
        doc = (adir / "dashboard.html").read_text()
        assert "<audio" in doc and "audio/feature_" in doc

    def test_analyze_transcoder_requires_mlp_cache(self, cache_dir, tmp_path):
        from launch import analyze

        with pytest.raises(FileNotFoundError, match="capture-mlp"):
            analyze(component="encoder", layer_idx=0, job_type="transcoder",
                    cache_dir=cache_dir, output_dir=tmp_path)

    def test_analyze_encode_takes_pallas_path_at_production_geometry(
        self, tmp_path, rng, monkeypatch
    ):
        """The analyze job streams the cache through ``TopKSAE.encode``;
        at production geometry (D=384, H=3072 — whisper-tiny 8x) that
        call must engage the fused Pallas encode kernel, not the XLA
        fallback (VERDICT r3 #7 — replaces the reference's slowest code,
        feature_viz.py:425-484).  CPU test env: only the platform clause
        of ``supported()`` is bypassed — every geometry rule stays real —
        and the kernel entry is recorded, then delegated to the composed
        path so the job completes."""
        import jax.numpy as jnp

        from launch import analyze
        from whisper_sae_tpu.ops import pallas_sae
        from whisper_sae_tpu.ops.topk import topk_mask_dense

        d, expansion = 384, 8
        cache = FeatureCache(
            tmp_path / "cache" / "features", WhisperConfig(), DataConfig()
        )
        feats = rng.standard_normal((4 * 384, d)).astype(np.float32)
        cache.save(feats, "encoder", 0, num_samples=4)
        train_sae(
            component="encoder", layer_idx=0, expansion_factor=expansion,
            k=32, batch_size=512, epochs=1, warmup_steps=0, use_amp=False,
            cache_dir=tmp_path / "cache", output_dir=tmp_path / "out",
        )

        calls = []
        real_supported = pallas_sae.supported

        def fake_supported(x_shape, hidden_dim):
            # the real gate minus the platform check (we're on CPU here)
            return (
                len(x_shape) == 2
                and hidden_dim % 128 == 0
                and x_shape[1] % 128 == 0
                and hidden_dim <= pallas_sae._MAX_H
            )

        def fake_fused_topk_encode(x, w_enc, b_enc, b_pre, k, block_rows,
                                   compute_dtype=jnp.float32):
            calls.append((tuple(x.shape), block_rows))
            pre = (x - b_pre) @ w_enc + b_enc
            return topk_mask_dense(pre, k)

        monkeypatch.setattr(pallas_sae, "supported", fake_supported)
        monkeypatch.setattr(
            pallas_sae, "fused_topk_encode", fake_fused_topk_encode
        )
        res = analyze(
            component="encoder", layer_idx=0, top_k=4, top_n=5,
            batch_samples=2, cache_dir=tmp_path / "cache",
            output_dir=tmp_path / "out",
        )
        monkeypatch.setattr(pallas_sae, "supported", real_supported)
        assert res["num_features"] == d * expansion
        assert calls, "analyze encode must take the fused Pallas path"
        # every streamed chunk is [batch_samples*frames, D] = [768, 384]
        assert all(shape == (768, d) for shape, _ in calls)
        # and the row blocking divides the chunk (kernel grid constraint)
        assert all(768 % br == 0 for _, br in calls)

    def test_analyze_crosscoder_features(self, mlp_cache, tmp_path):
        """analyze --job-type crosscoder: trained crosscoder latents over
        stacked row-aligned layer caches."""
        from launch import analyze, train_crosscoder

        # the mlp_cache fixture also cached encoder layer 0; train a
        # 1-layer crosscoder on it (cross-layer mechanics identical)
        train_crosscoder(
            component="encoder", layers="0", expansion_factor=4, k=8,
            batch_size=256, epochs=1, warmup_steps=0, use_amp=False,
            cache_dir=mlp_cache, output_dir=tmp_path / "out",
        )
        res = analyze(
            component="encoder", job_type="crosscoder", layers="0",
            top_k=4, top_n=5, batch_samples=3,
            cache_dir=mlp_cache, output_dir=tmp_path / "out",
        )
        assert res["job_type"] == "crosscoder"
        assert res["num_features"] == 256
        adir = Path(res["analysis_dir"])
        assert adir == (tmp_path / "out" / "launch_encoder_crosscoder_l0"
                        / "analysis")
        summary = json.loads((adir / "summary.json").read_text())
        assert len(summary["top_features"]) == 5
        cross = json.loads((adir / "cross_layer.json").read_text())
        assert cross["layer_indices"] == [0]
        assert 0 <= cross["cross_layer_fraction"] <= 1
        profile = cross["top_feature_layer_profiles"][
            str(summary["top_features"][0]["feature_idx"])
        ]
        assert len(profile) == 1  # one layer in this run
        assert res["cross_layer_features"] == cross["num_cross_layer_features"]

    def test_out_of_core_chunked_fused(self, mlp_cache, tmp_path):
        """max_resident_bytes=1 forces the lazy path: chunked fused epochs
        through the pair reader (never per-step dispatch), bounded-memory
        skip-bias mean."""
        from launch import train_transcoder

        res = train_transcoder(
            component="encoder",
            layer_idx=0,
            expansion_factor=4,
            k=8,
            use_skip=True,
            batch_size=100,
            learning_rate=1e-3,
            epochs=1,
            warmup_steps=0,
            use_amp=False,
            cache_dir=mlp_cache,
            output_dir=tmp_path / "ooc",
            max_resident_bytes=1,
        )
        assert np.isfinite(res["final_loss"])
        metrics = json.loads(
            (Path(res["run_dir"]) / "metrics.json").read_text()
        )
        assert len(metrics) == 6  # 600 tokens / batch 100


class TestAnalyzeJob:
    """`launcher analyze`: trained SAE + cache -> streamed tracker ->
    reports.  The reference's analysis pipeline is library-only; here it
    is a job with bounded host memory at any cache size."""

    def test_reports_written_with_transcriptions(self, cache_dir, tmp_path):
        from launch import analyze

        _run(cache_dir, tmp_path / "out")
        # extraction-side sidecar: sample_idx -> transcription
        (cache_dir / "features" / "transcripts.json").write_text(
            json.dumps({str(i): f"utt {i}" for i in range(4)})
        )
        res = analyze(
            component="encoder",
            layer_idx=0,
            top_k=5,
            top_n=10,
            batch_samples=3,  # forces a remainder sample batch
            cache_dir=cache_dir,
            output_dir=tmp_path / "out",
            dashboard=True,
            coactivation=6,
        )
        adir = Path(res["analysis_dir"])
        dash = Path(res["dashboard"])
        assert dash == adir / "dashboard.html"
        assert 'id="feature-' in dash.read_text()
        assert res["num_samples"] == 4 and res["num_tokens"] == 4096
        summary = json.loads((adir / "summary.json").read_text())
        assert len(summary["top_features"]) == 10
        assert summary["samples_processed"] == 4
        top = summary["top_features"][0]
        assert top["max_activation"] == pytest.approx(
            res["top_feature"]["max_activation"]
        )
        per_feature = sorted((adir / "features").glob("feature_*.json"))
        assert len(per_feature) == 10
        report = json.loads(per_feature[0].read_text())
        assert report["top_examples"][0]["transcription"].startswith("utt ")
        state = json.loads((adir / "tracker_state.json").read_text())
        assert state["k"] == 5
        assert json.loads((adir / "analysis_log.json").read_text()) == res
        co = json.loads((adir / "coactivation.json").read_text())
        assert co["num_tokens"] == 4096
        assert len(co["features"]) == 6
        assert all(0 <= r <= 1 for r in map(float, co["firing_rate"].values()))

    def test_load_trained_sae_round_trip(self, cache_dir, tmp_path):
        from whisper_sae_tpu.models.sae import load_trained_sae

        res = _run(cache_dir, tmp_path / "out")
        run_dir = Path(res["run_dir"])
        sae = load_trained_sae(run_dir)
        saved = np.load(run_dir / "sae_final.npz")
        assert sae.k == 32 and sae.hidden_dim == 64 * 8
        np.testing.assert_array_equal(np.asarray(sae.params["w_enc"]),
                                      saved["w_enc"])

    def test_missing_cache_raises(self, tmp_path):
        from launch import analyze

        with pytest.raises(FileNotFoundError):
            analyze(component="encoder", layer_idx=3,
                    cache_dir=tmp_path / "nocache", output_dir=tmp_path)


class TestTranscribeJob:
    def test_synthetic_offline(self, tmp_path):
        """Random-weight ASR produces garbage tokens but a working
        pipeline: wav + synthetic inputs, EOS-trimmed ids, JSON output."""
        from launch import transcribe_job

        from whisper_sae_tpu.utils.wavio import write_wav

        wav = tmp_path / "clip.wav"
        rng = np.random.default_rng(0)
        write_wav(wav, rng.standard_normal(16000).astype(np.float32) * 0.1)
        out_path = tmp_path / "transcripts.json"
        res = transcribe_job(
            inputs=[str(tmp_path)],  # directory form
            random_whisper=True,
            max_len=3,
            num_synthetic=1,
            output=out_path,
        )
        assert res["num_clips"] == 2
        saved = json.loads(out_path.read_text())
        assert set(saved["transcripts"]) == {str(wav), "synthetic_0"}
        ids = saved["transcripts"][str(wav)]["token_ids"]
        assert ids[0] == 50258  # BOS
        assert 1 <= len(ids) <= 3

    def test_ragged_final_batch_padded_not_recompiled(self, tmp_path):
        """3 clips at batch 2: the final batch pads to the SAME decode
        shape (one compile) and the pad row's transcript is dropped."""
        from launch import transcribe_job

        res = transcribe_job(
            random_whisper=True, max_len=3, num_synthetic=3, batch_size=2,
        )
        assert res["num_clips"] == 3
        assert set(res["transcripts"]) == {
            "synthetic_0", "synthetic_1", "synthetic_2"
        }


class TestCausalValidate:
    def test_substitution_and_sweep(self, tmp_path):
        from launch import analyze, causal_validate, extract_features, train_sae

        extract_features(
            layers_encoder="0", layers_decoder="", max_samples=4,
            batch_size=2, dataset="synthetic", cache_dir=tmp_path / "c",
            random_whisper=True, use_mesh=False, seed=5,
        )
        train_sae(
            component="encoder", layer_idx=0, batch_size=512, epochs=1,
            warmup_steps=0, use_amp=False, cache_dir=tmp_path / "c",
            output_dir=tmp_path / "o",
        )
        analyze(
            component="encoder", layer_idx=0, top_k=3, top_n=4,
            batch_samples=2, cache_dir=tmp_path / "c",
            output_dir=tmp_path / "o",
        )
        res = causal_validate(
            component="encoder", layer_idx=0, num_samples=2,
            sweep_features=3, random_whisper=True,
            cache_dir=tmp_path / "c", output_dir=tmp_path / "o",
        )
        assert np.isfinite(res["logit_kl"])
        assert 0.0 <= res["token_agreement"] <= 1.0
        assert len(res["ablation_sweep"]) == 3
        kls = [r["marginal_logit_kl"] for r in res["ablation_sweep"]]
        assert kls == sorted(kls, reverse=True)
        saved = json.loads(
            (tmp_path / "o" / "launch_encoder_layer0" / "analysis"
             / "causal_validation.json").read_text()
        )
        assert saved["layer_idx"] == 0

    def test_decoder_component(self, tmp_path):
        """Decoder-side causal validation (round-5; VERDICT r4 #7): train
        a decoder-layer SAE, then patch it into the decoder residual
        stream live at every generation step."""
        from launch import causal_validate, extract_features, train_sae

        extract_features(
            layers_encoder="", layers_decoder="0", max_samples=4,
            batch_size=2, dataset="synthetic", cache_dir=tmp_path / "c",
            random_whisper=True, use_mesh=False, seed=5,
        )
        train_sae(
            component="decoder", layer_idx=0, batch_size=512, epochs=1,
            warmup_steps=0, use_amp=False, cache_dir=tmp_path / "c",
            output_dir=tmp_path / "o",
        )
        res = causal_validate(
            component="decoder", layer_idx=0, num_samples=2,
            random_whisper=True,
            cache_dir=tmp_path / "c", output_dir=tmp_path / "o",
        )
        assert np.isfinite(res["logit_kl"])
        assert 0.0 <= res["token_agreement"] <= 1.0
        saved = json.loads(
            (tmp_path / "o" / "launch_decoder_layer0" / "analysis"
             / "causal_validation.json").read_text()
        )
        assert saved["component"] == "decoder"

    def test_invalid_component_rejected(self, tmp_path):
        from launch import causal_validate

        with pytest.raises(ValueError, match="encoder or decoder"):
            causal_validate(component="both", output_dir=tmp_path)


class TestCacheDtype:
    def test_bf16_cache_bit_identical_and_trainable(self, tmp_path):
        """--cache-dtype bfloat16 shards carry exactly the widened-f32
        cache's values (the transfer is bf16 either way) at half the
        bytes, and the training job consumes them directly."""
        import ml_dtypes

        def run(sub, cache_dtype):
            extract_features(
                layers_encoder="0", layers_decoder="",
                max_samples=4, batch_size=2, dataset="synthetic",
                cache_dir=tmp_path / sub, random_whisper=True,
                use_mesh=False, cache_dtype=cache_dtype,
            )
            cache = FeatureCache(
                tmp_path / sub / "features", WhisperConfig(), DataConfig()
            )
            return cache.load("encoder", 0)

        f32, meta32 = run("f32", None)
        b16, meta16 = run("b16", "bfloat16")
        assert meta32.dtype == "float32" and meta16.dtype == "bfloat16"
        f32 = np.asarray(f32)
        b16 = np.asarray(b16)
        assert b16.dtype == ml_dtypes.bfloat16
        assert b16.nbytes * 2 == f32.nbytes
        np.testing.assert_array_equal(f32.astype(ml_dtypes.bfloat16), b16)

        res = train_sae(
            component="encoder", layer_idx=0, batch_size=512,
            epochs=1, warmup_steps=0, use_amp=False,
            cache_dir=tmp_path / "b16", output_dir=tmp_path / "out",
        )
        assert np.isfinite(res["final_loss"])

    def test_bf16_cache_requires_bf16_compute(self, tmp_path):
        from whisper_sae_tpu.data.feature_cache import (
            extract_and_cache_features,
        )

        with pytest.raises(ValueError, match="requires bf16 compute"):
            extract_and_cache_features(
                {}, None, [], FeatureCache(
                    tmp_path / "features", WhisperConfig(), DataConfig()
                ),
                encoder_layers=[0], decoder_layers=[],
                cache_dtype="bfloat16", compute_dtype=None,
            )
