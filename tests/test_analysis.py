"""Analysis-layer tests (contracts of /root/reference/tests/test_analysis.py)
plus a brute-force oracle for the vectorized tracker."""

import json

import numpy as np
import pytest

from whisper_sae_tpu.analysis import (
    AudioClipConfig,
    AudioClipExtractor,
    FeatureActivation,
    FeatureReport,
    TopKTracker,
    collect_top_activations,
    create_indexed_audio_loader,
)
from whisper_sae_tpu.models.sae import TopKSAE
from whisper_sae_tpu.utils.wavio import read_wav, write_wav

F = 16  # features


class TestFeatureActivation:
    def test_dict_round_trip(self):
        fa = FeatureActivation(
            feature_idx=3, activation_value=1.5, sample_idx=7, position_idx=100,
            timestamp_ms=1000.0, transcription="hello", metadata={"speaker": 1},
        )
        back = FeatureActivation.from_dict(fa.to_dict())
        assert back == fa


class TestTopKTracker:
    def test_2d_batch(self):
        tracker = TopKTracker(num_features=F, k=4)
        acts = np.zeros((3, F), np.float32)
        acts[0, 2] = 1.0
        acts[1, 2] = 3.0
        acts[2, 5] = 0.5
        tracker.update(acts, sample_indices=[10, 11, 12])
        ex = tracker.get_top_examples(2)
        assert len(ex) == 2
        assert ex[0].activation_value == 3.0
        assert ex[0].sample_idx == 11
        assert ex[0].position_idx == 0
        assert tracker.total_activations == 3
        assert tracker.samples_processed == 3

    def test_3d_batch_positions_and_timestamps(self):
        tracker = TopKTracker(num_features=F, k=4)
        acts = np.zeros((1, 5, F), np.float32)
        acts[0, 3, 7] = 2.0
        tracker.update(acts, sample_indices=[0])
        ex = tracker.get_top_examples(7)
        assert ex[0].position_idx == 3
        assert ex[0].timestamp_ms == 30.0  # 10 ms/frame convention

    def test_k_cap_keeps_largest(self):
        tracker = TopKTracker(num_features=F, k=3)
        for step in range(10):
            acts = np.zeros((1, F), np.float32)
            acts[0, 0] = float(step + 1)
            tracker.update(acts, sample_indices=[step])
        ex = tracker.get_top_examples(0)
        assert [e.activation_value for e in ex] == [10.0, 9.0, 8.0]

    def test_transcriptions_joined(self):
        tracker = TopKTracker(num_features=F, k=2)
        acts = np.zeros((2, F), np.float32)
        acts[0, 1] = 1.0
        acts[1, 1] = 2.0
        tracker.update(acts, sample_indices=[0, 1], transcriptions=["aa", "bb"])
        ex = tracker.get_top_examples(1)
        assert ex[0].transcription == "bb"
        assert ex[1].transcription == "aa"

    def test_zero_activations_ignored(self):
        tracker = TopKTracker(num_features=F, k=3)
        tracker.update(np.zeros((4, F), np.float32), sample_indices=[0, 1, 2, 3])
        assert tracker.total_activations == 0
        assert tracker.get_top_examples(0) == []

    def test_matches_bruteforce_oracle(self, rng):
        tracker = TopKTracker(num_features=F, k=5)
        best: dict[int, list] = {i: [] for i in range(F)}
        sample = 0
        for _ in range(4):
            acts = np.maximum(rng.standard_normal((3, 6, F)), 0).astype(np.float32)
            tracker.update(acts, sample_indices=list(range(sample, sample + 3)))
            for b in range(3):
                for s in range(6):
                    for f in range(F):
                        if acts[b, s, f] > 0:
                            best[f].append((acts[b, s, f], sample + b, s))
            sample += 3
        for f in range(F):
            want = sorted(best[f], reverse=True)[:5]
            got = tracker.get_top_examples(f)
            assert len(got) == len(want)
            np.testing.assert_allclose(
                [g.activation_value for g in got], [w[0] for w in want], rtol=1e-6
            )

    def test_save_load_round_trip(self, tmp_path):
        tracker = TopKTracker(num_features=F, k=3)
        acts = np.zeros((2, F), np.float32)
        acts[0, 4] = 1.5
        acts[1, 9] = 0.7
        tracker.update(acts, sample_indices=[5, 6], transcriptions=["x", "y"])
        path = tmp_path / "tracker.json"
        tracker.save(path)
        loaded = TopKTracker.load(path)
        assert loaded.num_features == F and loaded.k == 3
        assert loaded.total_activations == tracker.total_activations
        ex = loaded.get_top_examples(4)
        assert ex[0].activation_value == 1.5
        assert ex[0].transcription == "x"

    def test_feature_stats(self):
        tracker = TopKTracker(num_features=F, k=4)
        acts = np.zeros((2, F), np.float32)
        acts[0, 0] = 2.0
        acts[1, 0] = 4.0
        tracker.update(acts, sample_indices=[0, 1])
        stats = tracker.get_feature_stats()
        assert stats[0]["num_examples"] == 2
        assert stats[0]["max_activation"] == 4.0
        assert stats[0]["min_activation"] == 2.0
        assert stats[0]["mean_activation"] == 3.0
        assert stats[1]["num_examples"] == 0


class TestFeatureReport:
    def _tracker(self):
        tracker = TopKTracker(num_features=F, k=3)
        acts = np.zeros((3, F), np.float32)
        acts[0, 0] = 5.0
        acts[1, 1] = 3.0
        acts[2, 1] = 1.0
        tracker.update(acts, sample_indices=[0, 1, 2], transcriptions=["a", "b", "c"])
        return tracker

    def test_file_layout(self, tmp_path):
        report = FeatureReport(self._tracker(), tmp_path / "reports")
        report.save_reports(top_n=2)
        assert (tmp_path / "reports" / "summary.json").exists()
        assert (tmp_path / "reports" / "tracker_state.json").exists()
        assert (tmp_path / "reports" / "features" / "feature_00000.json").exists()
        assert (tmp_path / "reports" / "features" / "feature_00001.json").exists()

    def test_summary_sorted_by_max_activation(self, tmp_path):
        report = FeatureReport(self._tracker(), tmp_path)
        summary = report.generate_summary_report(top_n=3)
        tops = summary["top_features"]
        assert tops[0]["feature_idx"] == 0
        assert tops[0]["max_activation"] == 5.0
        assert summary["samples_processed"] == 3

    def test_interpretation_included(self, tmp_path):
        report = FeatureReport(self._tracker(), tmp_path)
        report.add_interpretation(0, "phoneme", "responds to /s/", confidence=0.8)
        rep = report.generate_feature_report(0)
        assert rep["interpretation"]["category"] == "phoneme"
        assert rep["stats"]["max_activation"] == 5.0
        assert rep["top_examples"][0]["transcription"] == "a"

    def test_tracker_save_roundtrip_bulk_path(self, tmp_path):
        """The vectorized bulk save must produce the exact schema the
        loader (and the reference) expects."""
        tracker = self._tracker()
        tracker.save(tmp_path / "state.json")
        loaded = TopKTracker.load(tmp_path / "state.json")
        for fi in (0, 1):
            want = [e.to_dict() for e in tracker.get_top_examples(fi)]
            got = [e.to_dict() for e in loaded.get_top_examples(fi)]
            assert got == want

    def test_save_reports_at_whisper_large_scale(self, tmp_path):
        """40960 features (whisper-large 32x): the full report write must
        finish in seconds, not minutes (round-1 weak #7 — per-feature
        Python loops were quadratic-ish at this width)."""
        import time

        F_large = 40960
        rng = np.random.default_rng(0)
        tracker = TopKTracker(num_features=F_large, k=20)
        acts = rng.standard_normal((64, F_large)).astype(np.float32)
        tracker.update(acts, sample_indices=list(range(64)))
        report = FeatureReport(tracker, tmp_path / "reports")
        t0 = time.time()
        report.save_reports(top_n=100)
        elapsed = time.time() - t0
        # typical: ~17 s on the 1-core dev host; the regression this guards
        # (per-feature Python loops) took minutes.  120 s leaves headroom
        # for a loaded host (e.g. a concurrent TPU bench on the same core).
        assert elapsed < 120, f"save_reports took {elapsed:.1f}s at F=40960"
        assert (tmp_path / "reports" / "tracker_state.json").exists()
        files = list((tmp_path / "reports" / "features").glob("*.json"))
        assert len(files) == 100


@pytest.fixture
def mock_audio_loader():
    """Sine-wave loader (the reference's only mock, test_analysis.py:334-347)."""

    def load(sample_idx: int) -> np.ndarray:
        t = np.arange(16000 * 3) / 16000.0
        return (0.5 * np.sin(2 * np.pi * (220 + 10 * sample_idx) * t)).astype(np.float32)

    return load


class TestAudioClipExtractor:
    def _tracker(self):
        tracker = TopKTracker(num_features=4, k=3)
        acts = np.zeros((1, 200, 4), np.float32)
        acts[0, 100, 0] = 2.0   # 1.0 s into the audio
        acts[0, 10, 0] = 1.0
        acts[0, 150, 2] = 0.5
        tracker.update(acts, sample_indices=[0], transcriptions=["hello world"])
        return tracker

    def test_clip_length_about_1s(self, tmp_path, mock_audio_loader):
        ex = AudioClipExtractor(self._tracker(), mock_audio_loader, tmp_path / "clips")
        clips = ex.extract_feature_clips(0)
        assert len(clips) == 2
        audio, rate = read_wav(clips[0])
        assert rate == 16000
        assert abs(len(audio) - 16000) < 160  # ~1 s

    def test_file_naming(self, tmp_path, mock_audio_loader):
        ex = AudioClipExtractor(self._tracker(), mock_audio_loader, tmp_path / "clips")
        clips = ex.extract_feature_clips(0)
        assert clips[0].name == "rank00_act2.000.wav"
        assert clips[0].parent.name == "feature_00000"

    def test_max_clips(self, tmp_path, mock_audio_loader):
        ex = AudioClipExtractor(self._tracker(), mock_audio_loader, tmp_path / "clips")
        clips = ex.extract_feature_clips(0, max_clips=1)
        assert len(clips) == 1

    def test_normalization(self, tmp_path, mock_audio_loader):
        ex = AudioClipExtractor(self._tracker(), mock_audio_loader, tmp_path / "clips")
        clips = ex.extract_feature_clips(0)
        audio, _ = read_wav(clips[0])
        assert np.abs(audio).max() == pytest.approx(0.95, abs=0.01)

    def test_clip_at_start_is_clamped(self, tmp_path, mock_audio_loader):
        ex = AudioClipExtractor(self._tracker(), mock_audio_loader, tmp_path / "clips")
        clips = ex.extract_feature_clips(0)
        # rank1 activation at frame 10 -> center 1600 < context 8000 -> start 0
        audio, _ = read_wav(clips[1])
        assert len(audio) == 16000

    def test_extract_all_and_manifest(self, tmp_path, mock_audio_loader):
        ex = AudioClipExtractor(self._tracker(), mock_audio_loader, tmp_path / "clips")
        all_clips = ex.extract_all_clips(max_clips_per_feature=2)
        assert set(all_clips) == {0, 2}
        manifest_path = ex.save_manifest()
        manifest = json.loads(manifest_path.read_text())
        assert manifest["config"]["sample_rate"] == 16000
        assert set(manifest["features"]) == {"0", "2"}
        entry = manifest["features"]["0"][0]
        assert entry["rank"] == 0
        assert entry["transcription"] == "hello world"
        assert entry["audio_path"].endswith("rank00_act2.000.wav")


class TestIndexedLoader:
    def test_loads_and_range_errors(self, tmp_path, rng):
        paths = []
        for i in range(2):
            p = tmp_path / f"a{i}.wav"
            write_wav(p, rng.uniform(-0.5, 0.5, 4000).astype(np.float32))
            paths.append(p)
        loader = create_indexed_audio_loader(paths)
        assert loader(0).shape == (4000,)
        with pytest.raises(IndexError):
            loader(5)


class TestCollectTopActivations:
    def test_with_sae_encode(self, rng):
        sae = TopKSAE(input_dim=8, hidden_dim=F, k=2, seed=0)
        data = rng.standard_normal((12, 8)).astype(np.float32)
        batches = [data[:4], data[4:8], data[8:]]
        tracker = collect_top_activations(sae, batches, num_features=F, k=5)
        assert tracker.samples_processed == 12
        assert tracker.total_activations > 0
        # every example recorded must be reproducible from the model
        ex = [e for i in range(F) for e in tracker.get_top_examples(i)]
        assert len(ex) > 0
        hidden = np.asarray(sae.encode(data))
        for e in ex[:10]:
            assert hidden[e.sample_idx, e.feature_idx] == pytest.approx(
                e.activation_value, rel=1e-5
            )


class TestCoactivation:
    def test_counts_and_jaccard_match_bruteforce(self):
        from whisper_sae_tpu.analysis import compute_coactivation

        rng = np.random.default_rng(0)
        hidden = (rng.standard_normal((40, 16)) > 0.8).astype(np.float32)
        hidden *= rng.random((40, 16)).astype(np.float32)  # positive acts

        def encode_chunk(lo, hi):
            return hidden[lo * 4 : hi * 4]  # 4 frames per "sample"

        feats = [2, 5, 11]
        out = compute_coactivation(encode_chunk, 10, 3, feats, top_pairs=3)
        assert out["num_tokens"] == 40
        act = hidden[:, feats] > 0
        for i, f in enumerate(feats):
            assert out["firing_rate"][str(f)] == pytest.approx(
                act[:, i].mean(), abs=1e-6
            )
        for pair in out["top_pairs"]:
            a = feats.index(pair["feature_a"])
            b = feats.index(pair["feature_b"])
            inter = int((act[:, a] & act[:, b]).sum())
            union = int((act[:, a] | act[:, b]).sum())
            assert pair["co_count"] == inter
            assert pair["jaccard"] == pytest.approx(inter / union, abs=1e-4)
        # sorted by jaccard descending
        js = [p["jaccard"] for p in out["top_pairs"]]
        assert js == sorted(js, reverse=True)

    def test_empty_overlap_yields_no_pairs(self):
        from whisper_sae_tpu.analysis import compute_coactivation

        hidden = np.zeros((8, 4), np.float32)
        hidden[:4, 0] = 1.0
        hidden[4:, 1] = 1.0  # never co-fire

        out = compute_coactivation(lambda lo, hi: hidden[lo:hi], 8, 8, [0, 1])
        assert out["top_pairs"] == []


class TestDashboard:
    def _reports(self, tmp_path):
        tracker = TopKTracker(num_features=F, k=3)
        acts = np.zeros((3, F), np.float32)
        acts[0, 0] = 5.0
        acts[1, 1] = 3.0
        acts[2, 1] = 1.0
        tracker.update(acts, sample_indices=[0, 1, 2],
                       transcriptions=["hello <world>", "b", "c"])
        report = FeatureReport(tracker, tmp_path / "analysis")
        report.add_interpretation(0, "phonetic", "vowel onset", 0.8)
        report.save_reports(top_n=2)
        return tmp_path / "analysis"

    def test_generates_self_contained_html(self, tmp_path):
        from whisper_sae_tpu.analysis import generate_dashboard

        adir = self._reports(tmp_path)
        out = generate_dashboard(adir)
        assert out == adir / "dashboard.html"
        doc = out.read_text()
        assert "<!doctype html>" in doc
        assert 'id="feature-0"' in doc and 'id="feature-1"' in doc
        assert "5.000" in doc  # max activation rendered
        assert "vowel onset" in doc  # interpretation rendered
        assert "hello &lt;world&gt;" in doc  # transcription escaped
        assert "<script" not in doc  # static, no JS

    def test_links_audio_clips_relative(self, tmp_path):
        from whisper_sae_tpu.analysis import generate_dashboard

        adir = self._reports(tmp_path)
        clip = adir / "audio" / "feature_00000" / "rank00_act5.000.wav"
        clip.parent.mkdir(parents=True)
        clip.write_bytes(b"RIFF")
        doc = generate_dashboard(adir).read_text()
        assert 'src="audio/feature_00000/rank00_act5.000.wav"' in doc

    def test_skipped_clip_ranks_stay_aligned(self, tmp_path):
        """The extractor skips ranks whose audio failed; surviving clips
        must attach to their OWN rank, not shift up."""
        from whisper_sae_tpu.analysis import generate_dashboard

        adir = self._reports(tmp_path)
        fdir = adir / "audio" / "feature_00000"
        fdir.mkdir(parents=True)
        (fdir / "rank00_act5.000.wav").write_bytes(b"RIFF")
        (fdir / "rank02_act1.000.wav").write_bytes(b"RIFF")  # rank 1 skipped
        doc = generate_dashboard(adir).read_text()
        assert 'rank00_act5.000.wav' in doc
        assert 'rank02_act1.000.wav' not in doc  # feature 0 has < 3 examples
        # with 3 tracked examples the rank-2 row would get rank02; pin the
        # mapping directly on the helper
        from whisper_sae_tpu.analysis.dashboard import _feature_panel
        report = {"feature_idx": 0, "stats": {},
                  "top_examples": [{}, {}, {}]}
        html_out = _feature_panel(report, adir, adir / "audio")
        assert "rank00_act5.000.wav" in html_out
        assert "rank02_act1.000.wav" in html_out
        # the skipped rank-1 row has no player
        assert html_out.count("<audio") == 2

    def test_top_n_caps_listing(self, tmp_path):
        from whisper_sae_tpu.analysis import generate_dashboard

        adir = self._reports(tmp_path)
        doc = generate_dashboard(adir, top_n=1).read_text()
        assert 'id="feature-0"' in doc
        assert 'id="feature-1"' not in doc


class TestAutoLabel:
    def test_distinctive_words_surface(self):
        from whisper_sae_tpu.analysis import auto_label_features

        tracker = TopKTracker(num_features=2, k=8)
        # feature 0 fires on "cat"-ish clips, feature 1 on "dog"-ish
        for i, text in enumerate(
            ["the cat sat", "a cat ran", "cat on a mat",
             "the dog barked", "a dog ran", "dog in the park"]
        ):
            acts = np.zeros((1, 2), np.float32)
            acts[0, 0 if i < 3 else 1] = 1.0 + i
            tracker.update(acts, sample_indices=[i], transcriptions=[text])
        report = FeatureReport(tracker, "/tmp/unused_auto_label")
        labels = auto_label_features(tracker, report, min_examples=3)
        assert "cat" in labels[0] and "dog" in labels[1]
        interp = report.interpretations[0]
        assert interp.category == "auto/lexical"
        assert 0 < interp.confidence <= 1
        assert "cat" in interp.description

    def test_skips_sparse_features(self):
        from whisper_sae_tpu.analysis import auto_label_features

        tracker = TopKTracker(num_features=1, k=4)
        acts = np.ones((1, 1), np.float32)
        tracker.update(acts, sample_indices=[0], transcriptions=["hello"])
        report = FeatureReport(tracker, "/tmp/unused_auto_label2")
        assert auto_label_features(tracker, report, min_examples=3) == {}


class TestDashboardCoactivation:
    def test_pairs_table_rendered_when_present(self, tmp_path):
        from whisper_sae_tpu.analysis import generate_dashboard

        tracker = TopKTracker(num_features=F, k=3)
        acts = np.zeros((2, F), np.float32)
        acts[0, 0] = 2.0
        acts[1, 1] = 1.0
        tracker.update(acts, sample_indices=[0, 1])
        report = FeatureReport(tracker, tmp_path / "analysis")
        report.save_reports(top_n=2)
        (tmp_path / "analysis" / "coactivation.json").write_text(json.dumps({
            "num_tokens": 100,
            "top_pairs": [
                {"feature_a": 0, "feature_b": 1, "jaccard": 0.25, "co_count": 5}
            ],
        }))
        doc = generate_dashboard(tmp_path / "analysis").read_text()
        assert "Co-activating feature pairs" in doc
        assert "0.250" in doc
