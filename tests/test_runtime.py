"""Native shard-IO runtime tests (C++ libwstio + Python fallback)."""

import numpy as np
import pytest

from whisper_sae_tpu.runtime import shard_reader as sr
from whisper_sae_tpu.runtime.shard_reader import PrefetchLoader, ShardReader


@pytest.fixture(scope="module", autouse=True)
def _built():
    sr.build_native()


@pytest.fixture
def shards(tmp_path, rng):
    data = rng.standard_normal((250, 16)).astype(np.float32)
    paths = []
    for i, sl in enumerate([data[:100], data[100:180], data[180:]]):
        p = tmp_path / f"shard{i}.npy"
        np.save(p, sl)
        paths.append(p)
    return paths, data


class TestShardReader:
    def test_native_lib_builds(self):
        assert sr.native_available(), "libwstio.so should build in this image"

    def test_gather_across_shards(self, shards, rng):
        paths, data = shards
        reader = ShardReader(paths)
        assert reader.num_rows == 250
        assert reader.dim == 16
        idx = rng.permutation(250)[:64].astype(np.int64)
        out = reader.gather(idx)
        np.testing.assert_array_equal(out, data[idx])
        reader.close()

    def test_native_and_fallback_agree(self, shards, rng, monkeypatch):
        paths, data = shards
        idx = rng.integers(0, 250, 90).astype(np.int64)
        native = ShardReader(paths)
        got_native = native.gather(idx).copy()
        native.close()
        monkeypatch.setattr(sr, "_lib", None)
        monkeypatch.setattr(sr, "_LIB_PATH", sr._LIB_PATH.with_name("missing.so"))
        fallback = ShardReader(paths)
        assert not fallback.native
        got_fb = fallback.gather(idx)
        np.testing.assert_array_equal(got_native, got_fb)

    def test_boundary_rows(self, shards):
        paths, data = shards
        reader = ShardReader(paths)
        idx = np.asarray([0, 99, 100, 179, 180, 249], np.int64)
        np.testing.assert_array_equal(reader.gather(idx), data[idx])
        reader.close()


class TestPrefetchLoader:
    def test_epoch_covers_all_rows(self, shards):
        paths, data = shards
        loader = PrefetchLoader(ShardReader(paths), batch_size=64, seed=0)
        assert len(loader) == 4
        batches = list(loader)
        assert [len(b) for b in batches] == [64, 64, 64, 58]
        all_rows = np.concatenate(batches)
        np.testing.assert_allclose(
            np.sort(all_rows, axis=0), np.sort(data, axis=0), rtol=1e-6
        )

    def test_reshuffles(self, shards):
        paths, _ = shards
        loader = PrefetchLoader(ShardReader(paths), batch_size=250, seed=0)
        e1 = next(iter(loader)).copy()
        e2 = next(iter(loader)).copy()
        assert not np.array_equal(e1, e2)

    def test_chunked_out_of_core_epoch(self, tmp_path, rng):
        from whisper_sae_tpu.config import DataConfig, TrainingConfig, WhisperConfig
        from whisper_sae_tpu.data.feature_cache import FeatureCache
        from whisper_sae_tpu.models.sae import TopKSAE
        from whisper_sae_tpu.training.trainer import SAETrainer

        cache = FeatureCache(tmp_path / "f", WhisperConfig(), DataConfig(max_samples=1))
        w = cache.writer("encoder", 0, shard_tokens=100)
        data = rng.standard_normal((520, 32)).astype(np.float32)
        for c in np.array_split(data, 4):
            w.append(c)
        w.finalize(num_samples=4)

        loader = cache.get_dataloader("encoder", 0, batch_size=64, seed=0)
        model = TopKSAE(input_dim=32, hidden_dim=128, k=8, seed=0)
        cfg = TrainingConfig(batch_size=64, learning_rate=1e-3, epochs=1,
                             warmup_steps=0, use_amp=False)
        t = SAETrainer(model, cfg, run_dir=tmp_path / "run")
        ms = t.train_epoch_out_of_core(loader.reader, chunk_tokens=256)
        # 520 tokens in chunks of 256 (=4 batches) + 256 + 8 remainder:
        # every token is seen exactly once per epoch
        assert sum(1 for _ in ms) == len(ms)
        assert t.global_step == len(ms)
        assert t.epoch == 1
        total = sum(64 if m.step else 0 for m in ms)  # steps counted
        assert len(ms) == 9  # 4 + 4 + 1 (8-token remainder batch)
        assert np.isfinite([m.loss for m in ms]).all()

    def test_bf16_chunk_staging_lossless_for_bf16_values(self, tmp_path, rng):
        """Under AMP, out-of-core chunks stage bf16 (halves H2D).  For
        caches whose values already carry bf16 rounding (the fast-
        extraction default), the cast is exact — the trajectory must be
        IDENTICAL to f32 staging."""
        import ml_dtypes

        from whisper_sae_tpu.config import DataConfig, TrainingConfig, WhisperConfig
        from whisper_sae_tpu.data.feature_cache import FeatureCache
        from whisper_sae_tpu.models.sae import TopKSAE
        from whisper_sae_tpu.training.trainer import SAETrainer

        # bf16-representable values, stored f32 (what bf16 extraction writes)
        data = (
            rng.standard_normal((512, 32))
            .astype(ml_dtypes.bfloat16)
            .astype(np.float32)
        )
        cache = FeatureCache(tmp_path / "f", WhisperConfig(), DataConfig(max_samples=1))
        w = cache.writer("encoder", 0, shard_tokens=128)
        for c in np.array_split(data, 4):
            w.append(c)
        w.finalize(num_samples=4)
        loader = cache.get_dataloader("encoder", 0, batch_size=64, seed=0)

        def run(stage_bf16):
            model = TopKSAE(input_dim=32, hidden_dim=128, k=8, seed=0)
            cfg = TrainingConfig(batch_size=64, learning_rate=1e-3, epochs=1,
                                 warmup_steps=0, use_amp=True)
            t = SAETrainer(model, cfg, run_dir=tmp_path / f"run{stage_bf16}")
            t.stage_chunks_bf16 = stage_bf16
            ms = t.train_epoch_out_of_core(loader.reader, chunk_tokens=256)
            return t, ms

        t_bf, ms_bf = run(True)
        t_f32, ms_f32 = run(False)
        for a, b in zip(ms_bf, ms_f32):
            assert a.loss == b.loss  # exact: the cast was the identity
        for name in t_f32.model.params:
            np.testing.assert_array_equal(
                np.asarray(t_bf.model.params[name]),
                np.asarray(t_f32.model.params[name]),
                err_msg=name,
            )

    def test_trains_through_cache(self, tmp_path, rng):
        # end-to-end: multi-shard cache -> out-of-core loader -> trainer
        from whisper_sae_tpu.config import DataConfig, TrainingConfig, WhisperConfig
        from whisper_sae_tpu.data.feature_cache import FeatureCache
        from whisper_sae_tpu.models.sae import TopKSAE
        from whisper_sae_tpu.training.trainer import SAETrainer

        cache = FeatureCache(tmp_path / "f", WhisperConfig(), DataConfig(max_samples=1))
        w = cache.writer("encoder", 0, shard_tokens=100)
        data = rng.standard_normal((300, 32)).astype(np.float32)
        for c in np.split(data, 3):
            w.append(c)
        w.finalize(num_samples=3)

        loader = cache.get_dataloader("encoder", 0, batch_size=64, seed=0)
        assert isinstance(loader, PrefetchLoader)
        model = TopKSAE(input_dim=32, hidden_dim=128, k=8, seed=0)
        cfg = TrainingConfig(batch_size=64, learning_rate=1e-3, epochs=1,
                             warmup_steps=0, use_amp=False)
        t = SAETrainer(model, cfg, run_dir=tmp_path / "run")
        metrics = t.train_epoch(loader)
        assert len(metrics) == 5
        assert np.isfinite(metrics[-1].loss)
