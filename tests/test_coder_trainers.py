"""Transcoder / crosscoder trainer tests (no reference analogue — the
reference hand-rolls torch loops; these pin the generalized trainer)."""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_sae_tpu.config import TrainingConfig
from whisper_sae_tpu.data.loader import ActivationLoader
from whisper_sae_tpu.models.crosscoder import TopKCrossLayerCrosscoder
from whisper_sae_tpu.models.transcoder import SkipTranscoder, TopKTranscoder
from whisper_sae_tpu.training.coder_trainers import CrosscoderTrainer, TranscoderTrainer

DIN, DOUT, H, K = 16, 24, 64, 4


def cfg(**kw):
    base = dict(batch_size=32, learning_rate=3e-3, epochs=3, warmup_steps=0, use_amp=False)
    return TrainingConfig(**{**base, **kw})


class PairLoader:
    """Yields (x, y) batches."""

    def __init__(self, x, y, batch):
        self.x, self.y, self.batch = x, y, batch
        self.num_tokens = len(x)

    def __len__(self):
        return -(-len(self.x) // self.batch)

    def __iter__(self):
        for s in range(0, len(self.x), self.batch):
            yield (self.x[s : s + self.batch], self.y[s : s + self.batch])


class TestTranscoderTrainer:
    @pytest.fixture
    def xy(self, rng):
        x = rng.standard_normal((256, DIN)).astype(np.float32)
        A = rng.standard_normal((DIN, DOUT)).astype(np.float32) * 0.3
        return x, x @ A

    def test_loss_decreases(self, tmp_path, xy):
        x, y = xy
        model = SkipTranscoder(DIN, DOUT, H, k=K, seed=0)
        t = TranscoderTrainer(model, cfg(), run_dir=tmp_path)
        loader = PairLoader(x, y, 32)
        t.train(loader, epochs=3, checkpoint_every=100)
        first = np.mean([m.loss for m in t.metrics_history[:8]])
        last = np.mean([m.loss for m in t.metrics_history[-8:]])
        assert last < first * 0.7

    def test_step_metrics(self, tmp_path, xy):
        x, y = xy
        model = TopKTranscoder(DIN, DOUT, H, k=K, seed=0)
        t = TranscoderTrainer(model, cfg(), run_dir=tmp_path)
        m = t.train_step((x[:32], y[:32]))
        assert m.step == 1
        assert m.l0 <= K + 1e-5
        norms = np.linalg.norm(np.asarray(model.params["w_dec"]), axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    def test_fused_matches_per_step(self, tmp_path, xy):
        x, y = xy
        t1 = TranscoderTrainer(TopKTranscoder(DIN, DOUT, H, k=K, seed=0), cfg(), run_dir=tmp_path)
        ms1 = t1.train_epoch(PairLoader(x, y, 32))
        t2 = TranscoderTrainer(TopKTranscoder(DIN, DOUT, H, k=K, seed=0), cfg(), run_dir=tmp_path)
        ms2 = t2.train_epoch_fused((x, y), shuffle=False)
        assert len(ms1) == len(ms2)
        for a, b in zip(ms1, ms2):
            assert a.loss == pytest.approx(b.loss, rel=1e-5)

    @pytest.mark.parametrize("use_skip", [False, True])
    def test_indexed_epoch_matches_flat(self, tmp_path, xy, monkeypatch, use_skip):
        """The scalar-prefetch indexed transcoder epoch must be
        bit-identical to the flat epoch through the same fused kernel
        (CPU: interpret mode with the geometry gate forced open)."""
        from jax.experimental.pallas import tpu as pltpu

        from whisper_sae_tpu.ops import pallas_sae

        monkeypatch.setattr(
            pallas_sae, "fused_coder_supported", lambda *a, **k: True
        )
        x, y = xy
        perm = np.random.default_rng(5).permutation(len(x))
        cls = SkipTranscoder if use_skip else TopKTranscoder

        def run(indexed):
            monkeypatch.setenv("WST_INDEXED_EPOCH", "1" if indexed else "0")
            t = TranscoderTrainer(
                cls(DIN, DOUT, H, k=K, seed=0), cfg(use_amp=True),
                run_dir=tmp_path,
            )
            assert t._use_indexed_epoch() == indexed
            with pltpu.force_tpu_interpret_mode():
                ms = t.train_epoch_fused((x, y), perm=perm)
            return ms, t.model.params

        m_i, p_i = run(True)
        m_f, p_f = run(False)
        assert len(m_i) == len(m_f) == 8
        for a, b in zip(m_i, m_f):
            assert a.loss == b.loss and a.l0 == b.l0
        for key in p_f:
            np.testing.assert_array_equal(
                np.asarray(p_i[key]), np.asarray(p_f[key]), err_msg=key
            )

    def test_resampling(self, tmp_path, xy):
        x, y = xy
        model = TopKTranscoder(DIN, DOUT, H, k=K, dead_feature_threshold=1, seed=0)
        t = TranscoderTrainer(model, cfg(), run_dir=tmp_path, resample_dead_every=2)
        t.set_resample_dataset((x, y))
        for _ in range(2):
            t.train_step((x[:32], y[:32]))
            model.state = model.state._replace(step_count=model.state.step_count + 100)
        assert t.num_resampled_total > 0

    def test_checkpoint_round_trip(self, tmp_path, xy):
        x, y = xy
        model = SkipTranscoder(DIN, DOUT, H, k=K, seed=0)
        t = TranscoderTrainer(model, cfg(), run_dir=tmp_path)
        t.train_step((x[:32], y[:32]))
        path = t.save_checkpoint("c.npz")
        t2 = TranscoderTrainer(SkipTranscoder(DIN, DOUT, H, k=K, seed=1), cfg(), run_dir=tmp_path)
        t2.load_checkpoint(path)
        assert t2.global_step == 1
        np.testing.assert_array_equal(
            np.asarray(t2.model.params["w_skip"]), np.asarray(model.params["w_skip"])
        )


class TestCrosscoderTrainer:
    L, D, S = 3, 16, 64

    @pytest.fixture
    def data(self, rng):
        base = rng.standard_normal((256, self.D)).astype(np.float32)
        layers = np.stack(
            [base + 0.1 * rng.standard_normal((256, self.D)).astype(np.float32)
             for _ in range(self.L)],
            axis=1,
        )  # [N, L, D]
        return layers

    def test_loss_decreases(self, tmp_path, data):
        model = TopKCrossLayerCrosscoder(d_model=self.D, n_layers=self.L, d_sae=self.S, k=4, seed=0)
        t = CrosscoderTrainer(model, cfg(), run_dir=tmp_path)
        loader = ActivationLoader(data, batch_size=32, shuffle=True, seed=0)
        t.train(loader, epochs=3, checkpoint_every=100)
        first = np.mean([m.loss for m in t.metrics_history[:8]])
        last = np.mean([m.loss for m in t.metrics_history[-8:]])
        assert last < first

    def test_renorm_is_flat_unit_norm(self, tmp_path, data):
        model = TopKCrossLayerCrosscoder(d_model=self.D, n_layers=self.L, d_sae=self.S, k=4, seed=0)
        t = CrosscoderTrainer(model, cfg(), run_dir=tmp_path)
        t.train_step(data[:32])
        flat = np.asarray(model.params["w_dec"]).reshape(self.S, -1)
        np.testing.assert_allclose(np.linalg.norm(flat, axis=1), 1.0, rtol=1e-5)

    def test_fused_epoch(self, tmp_path, data):
        model = TopKCrossLayerCrosscoder(d_model=self.D, n_layers=self.L, d_sae=self.S, k=4, seed=0)
        t = CrosscoderTrainer(model, cfg(), run_dir=tmp_path)
        ms = t.train_epoch_fused(data, shuffle=False)
        assert len(ms) == 8
        assert np.isfinite(ms[-1].loss)
        assert ms[0].l0 == pytest.approx(4, abs=1e-4)

    @pytest.mark.parametrize("variant", ["topk", "relu"])
    def test_indexed_epoch_matches_flat(self, tmp_path, data, monkeypatch, variant):
        """Indexed crosscoder epochs (flattened [N, L*D] buffer read by
        the kernel via scalar prefetch) bit-identical to the flat epoch,
        for both the TopK and ReLU (decoder-norm-weighted L1) variants."""
        from jax.experimental.pallas import tpu as pltpu

        from whisper_sae_tpu.models.crosscoder import CrossLayerCrosscoder
        from whisper_sae_tpu.ops import pallas_sae

        monkeypatch.setattr(
            pallas_sae, "fused_coder_supported", lambda *a, **k: True
        )
        perm = np.random.default_rng(7).permutation(len(data))

        def make_model():
            if variant == "topk":
                return TopKCrossLayerCrosscoder(
                    d_model=self.D, n_layers=self.L, d_sae=self.S, k=4, seed=0
                )
            return CrossLayerCrosscoder(
                d_model=self.D, n_layers=self.L, d_sae=self.S, seed=0
            )

        def run(indexed):
            monkeypatch.setenv("WST_INDEXED_EPOCH", "1" if indexed else "0")
            t = CrosscoderTrainer(
                make_model(), cfg(use_amp=True), run_dir=tmp_path
            )
            assert t._use_indexed_epoch() == indexed
            with pltpu.force_tpu_interpret_mode():
                ms = t.train_epoch_fused(data, perm=perm)
            return ms, t.model.params

        m_i, p_i = run(True)
        m_f, p_f = run(False)
        assert len(m_i) == len(m_f) == 8
        for a, b in zip(m_i, m_f):
            assert a.loss == b.loss and a.l0 == b.l0
            assert a.sparsity_loss == b.sparsity_loss
        for key in p_f:
            np.testing.assert_array_equal(
                np.asarray(p_i[key]), np.asarray(p_f[key]), err_msg=key
            )
