"""Trainer tests.

Ports the behavioral contracts of /root/reference/tests/test_training.py:
run-dir creation, scheduler setup (warmup = min(cfg, total//10)), metrics
from train_step, tuple/list batch handling, step progression, epoch
bookkeeping, loss decrease over epochs, checkpoint round-trip, metrics.json
schema, decoder unit-norm after step, resampling plumbing, AMP behavior —
plus a torch-oracle test pinning the LR schedule to the reference curve.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_sae_tpu.config import TrainingConfig
from whisper_sae_tpu.data.loader import ActivationLoader
from whisper_sae_tpu.models.sae import ReLUSAE, TopKSAE
from whisper_sae_tpu.training.schedule import warmup_cosine_schedule
from whisper_sae_tpu.training.trainer import SAETrainer, TrainingMetrics

D, H, K = 32, 128, 8


def make_trainer(tmp_path, **cfg_kwargs):
    defaults = dict(
        batch_size=16, learning_rate=1e-3, epochs=2, warmup_steps=10, use_amp=False
    )
    cfg = TrainingConfig(**{**defaults, **cfg_kwargs})
    model = TopKSAE(input_dim=D, hidden_dim=H, k=K, seed=0)
    return SAETrainer(model, cfg, run_dir=tmp_path / "run")


@pytest.fixture
def data(rng):
    return rng.standard_normal((128, D)).astype(np.float32)


class TestSetup:
    def test_run_dir_created(self, tmp_path):
        t = make_trainer(tmp_path)
        assert (tmp_path / "run").is_dir()
        assert t.global_step == 0 and t.epoch == 0

    def test_scheduler_warmup_capped_at_tenth(self, tmp_path):
        t = make_trainer(tmp_path)
        t.config.warmup_steps = 1000
        t.setup_scheduler(total_steps=100)
        # warmup = min(1000, 100//10) = 10 -> step 10 is the peak
        assert t.learning_rate_at(10) == pytest.approx(1e-3, rel=1e-6)
        assert t.learning_rate_at(0) == pytest.approx(1e-5, rel=1e-4)

    def test_schedule_floor_is_tenth_of_lr(self, tmp_path):
        t = make_trainer(tmp_path)
        t.setup_scheduler(total_steps=100)
        assert t.learning_rate_at(100) == pytest.approx(1e-4, rel=1e-4)


class TestTorchScheduleOracle:
    def test_matches_torch_sequential_lr(self):
        torch = pytest.importorskip("torch")
        base, total, warm_cfg = 1e-3, 60, 100
        w = min(warm_cfg, total // 10)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.AdamW([p], lr=base)
        sched = torch.optim.lr_scheduler.SequentialLR(
            opt,
            schedulers=[
                torch.optim.lr_scheduler.LinearLR(
                    opt, start_factor=0.01, end_factor=1.0, total_iters=w
                ),
                torch.optim.lr_scheduler.CosineAnnealingLR(
                    opt, T_max=total - w, eta_min=base * 0.1
                ),
            ],
            milestones=[w],
        )
        ours = warmup_cosine_schedule(base, total, warm_cfg)
        torch_lrs, our_lrs = [], []
        for t in range(total):
            torch_lrs.append(opt.param_groups[0]["lr"])
            our_lrs.append(float(ours(t)))
            opt.step()
            sched.step()
        np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-5)


class TestTrainStep:
    def test_metrics_contract(self, tmp_path, data):
        t = make_trainer(tmp_path)
        m = t.train_step(data[:16])
        assert isinstance(m, TrainingMetrics)
        assert m.step == 1
        assert m.l0 == pytest.approx(K, abs=1e-4)
        assert m.sparsity_loss == 0.0
        assert m.loss == m.reconstruction_loss
        assert np.isfinite(m.loss)

    def test_tuple_and_list_batches(self, tmp_path, data):
        t = make_trainer(tmp_path)
        m1 = t.train_step((data[:16],))
        m2 = t.train_step([data[16:32]])
        assert m1.step == 1 and m2.step == 2

    def test_decoder_unit_norm_after_step(self, tmp_path, data):
        t = make_trainer(tmp_path)
        t.train_step(data[:16])
        norms = np.linalg.norm(np.asarray(t.model.params["w_dec"]), axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    def test_step_progression_and_state_sync(self, tmp_path, data):
        t = make_trainer(tmp_path)
        for i in range(3):
            t.train_step(data[:16])
        assert t.global_step == 3
        assert int(t.model.state.step_count) == 3

    def test_amp_bf16_runs(self, tmp_path, data):
        t = make_trainer(tmp_path)
        t.compute_dtype = jnp.bfloat16
        t._step_fn = None
        m = t.train_step(data[:16])
        assert np.isfinite(m.loss)
        # params stay f32 regardless of compute dtype
        assert t.model.params["w_enc"].dtype == jnp.float32


class TestEpochs:
    def test_epoch_bookkeeping(self, tmp_path, data):
        t = make_trainer(tmp_path)
        loader = ActivationLoader(data, batch_size=16, seed=0)
        metrics = t.train_epoch(loader)
        assert len(metrics) == 8
        assert t.epoch == 1
        assert t.global_step == 8
        assert len(t.metrics_history) == 8

    def test_loss_decreases_over_epochs(self, tmp_path, data):
        t = make_trainer(tmp_path, epochs=5)
        loader = ActivationLoader(data, batch_size=16, seed=0)
        t.train(loader, epochs=5, checkpoint_every=100)
        first = np.mean([m.loss for m in t.metrics_history[:8]])
        last = np.mean([m.loss for m in t.metrics_history[-8:]])
        assert last < first

    def test_partial_final_batch(self, tmp_path, rng):
        t = make_trainer(tmp_path)
        uneven = rng.standard_normal((40, D)).astype(np.float32)
        loader = ActivationLoader(uneven, batch_size=16, seed=0)
        assert len(loader) == 3
        metrics = t.train_epoch(loader)
        assert len(metrics) == 3


class TestWandbLogging:
    def test_fused_epoch_logs_every_100_steps(self, rng, tmp_path):
        """Reference cadence (training.py:246-256) must survive the fused
        path, where metrics come back stacked after the dispatch."""
        model = TopKSAE(input_dim=16, hidden_dim=64, k=4, seed=0)
        cfg = TrainingConfig(batch_size=8, learning_rate=1e-3, epochs=1,
                             warmup_steps=0, use_amp=False)
        t = SAETrainer(model, cfg, run_dir=tmp_path)

        logged = []

        class FakeRun:
            def log(self, payload, step=None):
                logged.append((step, payload))

        t.wandb_run = FakeRun()
        data = rng.standard_normal((8 * 250, 16)).astype(np.float32)
        t.train_epoch_fused(data, shuffle=False)
        steps = [s for s, _ in logged]
        assert steps == [100, 200]
        assert set(logged[0][1]) == {
            "train/loss", "train/reconstruction_loss", "train/l0",
            "train/dead_ratio", "train/lr",
        }


class TestCheckpointing:
    def test_round_trip_restores_everything(self, tmp_path, data):
        t = make_trainer(tmp_path)
        t.setup_scheduler(100)
        for _ in range(4):
            t.train_step(data[:16])
        t.epoch = 2
        path = t.save_checkpoint("ckpt.npz")
        assert path.exists()

        t2 = make_trainer(tmp_path)
        t2.load_checkpoint(path)
        assert t2.global_step == 4
        assert t2.epoch == 2
        np.testing.assert_array_equal(
            np.asarray(t2.model.params["w_enc"]), np.asarray(t.model.params["w_enc"])
        )
        np.testing.assert_array_equal(
            np.asarray(t2.model.state.feature_last_activated),
            np.asarray(t.model.state.feature_last_activated),
        )

    def test_training_continues_after_restore(self, tmp_path, data):
        t = make_trainer(tmp_path)
        for _ in range(2):
            t.train_step(data[:16])
        path = t.save_checkpoint("c.npz")
        t2 = make_trainer(tmp_path)
        t2.load_checkpoint(path)
        m = t2.train_step(data[:16])
        assert m.step == 3

    def test_periodic_checkpoints_written(self, tmp_path, data):
        t = make_trainer(tmp_path)
        loader = ActivationLoader(data, batch_size=16, seed=0)
        t.train(loader, epochs=2, checkpoint_every=1)
        assert (tmp_path / "run" / "checkpoint_epoch1.npz").exists()
        assert (tmp_path / "run" / "checkpoint_epoch2.npz").exists()
        assert (tmp_path / "run" / "final.npz").exists()

    def test_save_final_exports_torch(self, tmp_path, data):
        torch = pytest.importorskip("torch")
        t = make_trainer(tmp_path)
        t.train_step(data[:16])
        t.save_final()
        assert (tmp_path / "run" / "sae_final.npz").exists()
        pt = tmp_path / "run" / "sae_final.pt"
        assert pt.exists()
        sd = torch.load(pt, weights_only=True)
        assert sd["encoder.weight"].shape == (H, D)
        assert sd["decoder.weight"].shape == (D, H)
        np.testing.assert_allclose(
            sd["decoder.weight"].numpy().T, np.asarray(t.model.params["w_dec"]),
            rtol=1e-6,
        )


class TestMetricsFile:
    def test_metrics_json_schema(self, tmp_path, data):
        t = make_trainer(tmp_path)
        loader = ActivationLoader(data, batch_size=16, seed=0)
        t.train_epoch(loader)
        path = t.save_metrics()
        entries = json.loads(path.read_text())
        assert len(entries) == 8
        assert set(entries[0]) == {
            "step",
            "loss",
            "reconstruction_loss",
            "sparsity_loss",
            "l0",
            "dead_feature_ratio",
            "learning_rate",
        }
        assert entries[0]["step"] == 1


class TestFusedEpoch:
    def test_matches_per_step_path(self, tmp_path, data):
        # Same data, no shuffling: the fused lax.scan epoch must produce
        # the same per-step metrics as the per-step jit path.
        t1 = make_trainer(tmp_path)
        loader = ActivationLoader(data, batch_size=16, shuffle=False)
        m_step = t1.train_epoch(loader)

        t2 = make_trainer(tmp_path)
        m_fused = t2.train_epoch_fused(data, shuffle=False)

        assert len(m_step) == len(m_fused) == 8
        for a, b in zip(m_step, m_fused):
            assert a.loss == pytest.approx(b.loss, rel=1e-5)
            assert a.l0 == pytest.approx(b.l0, abs=1e-5)
            assert a.step == b.step
        np.testing.assert_allclose(
            np.asarray(t1.model.params["w_enc"]),
            np.asarray(t2.model.params["w_enc"]),
            atol=1e-5,
        )

    def test_partial_batch_included(self, tmp_path, rng):
        t = make_trainer(tmp_path)
        uneven = rng.standard_normal((40, D)).astype(np.float32)
        metrics = t.train_epoch_fused(uneven, shuffle=False)
        assert len(metrics) == 3
        assert t.global_step == 3
        assert len(t.metrics_history) == 3

    def test_in_jit_shuffle_matches_eager_shuffle(self, tmp_path, data):
        """The flat epoch path shuffles inside the jitted program; it must
        visit the same batches (same key derivation) as shuffling the data
        eagerly and running the per-step path."""
        import jax

        t1 = make_trainer(tmp_path)
        m_fused = t1.train_epoch_fused(data, shuffle=True, seed=7)

        key = jax.random.fold_in(jax.random.PRNGKey(7), 0)
        perm = np.asarray(jax.random.permutation(key, len(data)))
        t2 = make_trainer(tmp_path)
        loader = ActivationLoader(data[perm], batch_size=16, shuffle=False)
        m_step = t2.train_epoch(loader)

        assert len(m_step) == len(m_fused) == 8
        for a, b in zip(m_step, m_fused):
            assert a.loss == pytest.approx(b.loss, rel=1e-5)
        np.testing.assert_allclose(
            np.asarray(t1.model.params["w_enc"]),
            np.asarray(t2.model.params["w_enc"]),
            atol=1e-5,
        )

    def test_indexed_epoch_matches_flat_epoch(self, tmp_path, data, monkeypatch):
        """The scalar-prefetch indexed epoch (kernel reads its batch window
        from the epoch buffer) must be bit-identical to the flat epoch
        (per-step slice into the same fused kernel).  CPU: interpret mode,
        with the kernel gate forced open."""
        from jax.experimental.pallas import tpu as pltpu

        from whisper_sae_tpu.ops import pallas_sae

        monkeypatch.setattr(pallas_sae, "fused_loss_supported", lambda *a: True)
        perm = np.random.default_rng(3).permutation(len(data))

        def run(indexed: bool):
            monkeypatch.setenv("WST_INDEXED_EPOCH", "1" if indexed else "0")
            t = make_trainer(tmp_path, use_amp=True)
            assert t._use_indexed_epoch() == indexed
            with pltpu.force_tpu_interpret_mode():
                metrics = t.train_epoch_fused(data, perm=perm)
            return metrics, t.model.params

        m_idx, p_idx = run(True)
        m_flat, p_flat = run(False)
        assert len(m_idx) == len(m_flat) == 8
        for a, b in zip(m_idx, m_flat):
            assert a.loss == b.loss and a.l0 == b.l0
        for key in p_flat:
            np.testing.assert_array_equal(
                np.asarray(p_idx[key]), np.asarray(p_flat[key]), err_msg=key
            )

    def test_indexed_auto_mode_any_dtype(self, tmp_path, data, monkeypatch):
        """Unset WST_INDEXED_EPOCH = auto: indexed engages for the SAE
        families on any staging dtype (the round-5 quiet-host probe
        measured indexed >= sliced on f32 AND bf16 stacks; the r4
        bf16-only restriction was a contaminated measurement); 1/0 force
        either path, and no data in sight means the slicing scan."""
        from whisper_sae_tpu.ops import pallas_sae

        monkeypatch.setattr(pallas_sae, "fused_loss_supported", lambda *a: True)
        monkeypatch.delenv("WST_INDEXED_EPOCH", raising=False)
        t = make_trainer(tmp_path, use_amp=True)
        f32 = jnp.asarray(data)
        bf16 = f32.astype(jnp.bfloat16)
        assert t._use_indexed_epoch(f32)
        assert t._use_indexed_epoch(bf16)
        assert not t._use_indexed_epoch()  # no data in sight: slicing scan
        monkeypatch.setenv("WST_INDEXED_EPOCH", "1")
        assert t._use_indexed_epoch(f32)
        monkeypatch.setenv("WST_INDEXED_EPOCH", "0")
        assert not t._use_indexed_epoch(bf16)

    def test_explicit_perm_overrides_shuffle(self, tmp_path, rng):
        """train_epoch_fused(perm=...) must visit the batches of data[perm]
        in order, including the remainder tail — the quality gate replays
        a torch oracle's numpy permutation stream through this parameter."""
        uneven = rng.standard_normal((40, D)).astype(np.float32)
        perm = np.random.default_rng(0).permutation(40)

        t1 = make_trainer(tmp_path)
        m_perm = t1.train_epoch_fused(uneven, perm=perm)

        t2 = make_trainer(tmp_path)
        loader = ActivationLoader(uneven[perm], batch_size=16, shuffle=False)
        m_step = t2.train_epoch(loader)

        assert len(m_step) == len(m_perm) == 3
        for a, b in zip(m_step, m_perm):
            assert a.loss == pytest.approx(b.loss, rel=1e-5)
        np.testing.assert_allclose(
            np.asarray(t1.model.params["w_enc"]),
            np.asarray(t2.model.params["w_enc"]),
            atol=1e-5,
        )

    def test_shuffled_remainder_trains_on_tail(self, tmp_path, rng):
        """With N % batch != 0 and shuffle on, the remainder step must see
        exactly the shuffled tail rows (flat path leaves data unshuffled)."""
        import jax

        uneven = rng.standard_normal((40, D)).astype(np.float32)
        t1 = make_trainer(tmp_path)
        m_fused = t1.train_epoch_fused(uneven, shuffle=True, seed=3)

        key = jax.random.fold_in(jax.random.PRNGKey(3), 0)
        perm = np.asarray(jax.random.permutation(key, 40))
        t2 = make_trainer(tmp_path)
        loader = ActivationLoader(uneven[perm], batch_size=16, shuffle=False)
        m_step = t2.train_epoch(loader)

        assert len(m_fused) == len(m_step) == 3
        assert m_fused[-1].loss == pytest.approx(m_step[-1].loss, rel=1e-5)

    def test_train_epochs_fused_matches_sequential(self, tmp_path, data):
        """Pipelined multi-epoch dispatch must reproduce the sequential
        per-epoch trajectory exactly (same shuffle keys, same metrics,
        same counters)."""
        t1 = make_trainer(tmp_path)
        m_pipe = t1.train_epochs_fused(data, epochs=3, shuffle=True, seed=11)

        t2 = make_trainer(tmp_path)
        m_seq = []
        for _ in range(3):
            m_seq.extend(t2.train_epoch_fused(data, shuffle=True, seed=11))

        assert len(m_pipe) == len(m_seq) == 24
        assert t1.global_step == t2.global_step == 24
        assert t1.epoch == t2.epoch == 3
        assert len(t1.metrics_history) == 24
        for a, b in zip(m_pipe, m_seq):
            assert a.step == b.step
            assert a.loss == pytest.approx(b.loss, rel=1e-6)
            assert a.learning_rate == pytest.approx(b.learning_rate, rel=1e-6)
        np.testing.assert_allclose(
            np.asarray(t1.model.params["w_enc"]),
            np.asarray(t2.model.params["w_enc"]),
            atol=1e-6,
        )

    def test_train_epochs_fused_remainder_falls_back(self, tmp_path, rng):
        uneven = rng.standard_normal((40, D)).astype(np.float32)
        t = make_trainer(tmp_path)
        metrics = t.train_epochs_fused(uneven, epochs=2, shuffle=False)
        assert len(metrics) == 6  # (2 full + 1 remainder) x 2 epochs
        assert t.global_step == 6
        assert t.epoch == 2

    def test_fused_resample_fires_at_epoch_boundary(self, tmp_path, data):
        cfg = TrainingConfig(
            batch_size=16, learning_rate=1e-3, epochs=1, warmup_steps=0, use_amp=False
        )
        model = TopKSAE(input_dim=D, hidden_dim=H, k=K, dead_feature_threshold=1, seed=0)
        t = SAETrainer(model, cfg, run_dir=tmp_path / "run", resample_dead_every=4)
        t.set_resample_dataset(data)
        model.state = model.state._replace(step_count=jnp.asarray(10_000, jnp.int32))
        t.global_step = 0
        t.train_epoch_fused(data, shuffle=False)  # 8 steps -> crosses 4
        assert t.num_resampled_total > 0


class TestResampling:
    def test_resample_fires_on_schedule(self, tmp_path, data):
        cfg = TrainingConfig(
            batch_size=16, learning_rate=1e-3, epochs=1, warmup_steps=0, use_amp=False
        )
        model = TopKSAE(input_dim=D, hidden_dim=H, k=K, dead_feature_threshold=1, seed=0)
        t = SAETrainer(
            model, cfg, run_dir=tmp_path / "run", resample_dead_every=3,
            resample_batch_size=64,
        )
        t.set_resample_dataset(data)
        # Force many dead features: jump the step count far ahead.
        for i in range(3):
            t.train_step(data[:16])
            model.state = model.state._replace(
                step_count=model.state.step_count + 100
            )
        assert t.num_resampled_total > 0

    def test_no_resample_without_dataset(self, tmp_path, data):
        t = make_trainer(tmp_path)
        t.resample_dead_every = 1
        t.train_step(data[:16])
        assert t.num_resampled_total == 0


class TestReLUTrainer:
    def test_relu_sae_trains(self, tmp_path, data):
        cfg = TrainingConfig(batch_size=16, learning_rate=1e-3, epochs=1, use_amp=False)
        model = ReLUSAE(input_dim=D, hidden_dim=H, seed=0)
        t = SAETrainer(model, cfg, run_dir=tmp_path / "run")
        m = t.train_step(data[:16])
        assert np.isfinite(m.loss)
        assert m.sparsity_loss > 0

    def test_matmul_precision_knob_applies(self, tmp_path, data):
        """`matmul_precision="highest"` must reach the jax config (true-f32
        MXU dots — the exact-f32 parity lever for the ReLU/L1 families,
        docs/PARITY.md "ReLU-SAE deviation") and still train."""
        import jax

        prev = jax.config.jax_default_matmul_precision
        try:
            cfg = TrainingConfig(batch_size=16, learning_rate=1e-3, epochs=1,
                                 use_amp=False, matmul_precision="highest")
            model = ReLUSAE(input_dim=D, hidden_dim=H, seed=0)
            t = SAETrainer(model, cfg, run_dir=tmp_path / "run")
            assert jax.config.jax_default_matmul_precision == "highest"
            m = t.train_step(data[:16])
            assert np.isfinite(m.loss)
        finally:
            jax.config.update("jax_default_matmul_precision", prev)


class TestResampleRngCheckpointed:
    def test_rng_state_round_trips(self, tmp_path):
        """The resample rng must persist through checkpoints so a resumed
        run's resampling draws match the uninterrupted trajectory
        (launcher elastic-resume guarantee)."""
        from whisper_sae_tpu.models.sae import TopKSAE

        model = TopKSAE(input_dim=16, hidden_dim=64, k=4, seed=0)
        cfg = TrainingConfig(batch_size=8, learning_rate=1e-3, epochs=1,
                             warmup_steps=0, use_amp=False)
        t1 = SAETrainer(model, cfg, run_dir=tmp_path)
        # consume some draws (as resampling would)
        t1._resample_rng.permutation(100)
        t1._resample_rng.permutation(100)
        t1.num_resampled_total = 7
        t1.save_checkpoint("checkpoint_epoch1.npz")

        t2 = SAETrainer(
            TopKSAE(input_dim=16, hidden_dim=64, k=4, seed=0), cfg,
            run_dir=tmp_path,
        )
        t2.load_checkpoint(tmp_path / "checkpoint_epoch1.npz")
        assert t2.num_resampled_total == 7
        np.testing.assert_array_equal(
            t1._resample_rng.permutation(50), t2._resample_rng.permutation(50)
        )


class TestMetricsSurviveResume:
    """A killed attempt's metrics must survive into the resumed run's
    metrics.json (persisted at checkpoint time, restored on load) — the
    20 GB kill/resume run lost epoch 1's 427 steps without this."""

    def test_checkpoint_persists_metrics(self, tmp_path, data):
        t = make_trainer(tmp_path)
        loader = ActivationLoader(data, batch_size=16, seed=0)
        t.train(loader, epochs=2, checkpoint_every=1)
        entries = json.loads((tmp_path / "run" / "metrics.json").read_text())
        assert [e["step"] for e in entries] == list(range(1, 17))
        assert not (tmp_path / "run" / "metrics.json.tmp").exists()

    def test_resume_restores_prefix_and_drops_crashed_tail(self, tmp_path, data):
        t = make_trainer(tmp_path)
        loader = ActivationLoader(data, batch_size=16, seed=0)
        # full run writes metrics for steps 1..16; resuming from the
        # epoch-1 checkpoint must restore exactly steps 1..8 (the entries
        # beyond the checkpoint belong to a crashed attempt's progress)
        t.train(loader, epochs=2, checkpoint_every=1)
        full = json.loads((tmp_path / "run" / "metrics.json").read_text())

        t2 = make_trainer(tmp_path)
        t2.load_checkpoint(tmp_path / "run" / "checkpoint_epoch1.npz")
        assert [m.step for m in t2.metrics_history] == list(range(1, 9))
        for m, e in zip(t2.metrics_history, full[:8]):
            assert m.loss == e["loss"] and m.learning_rate == e["learning_rate"]

        # resumed epoch 2 reproduces the uninterrupted trajectory
        t2.train(loader, epochs=2, checkpoint_every=1)
        resumed = json.loads((tmp_path / "run" / "metrics.json").read_text())
        assert [e["step"] for e in resumed] == list(range(1, 17))
        np.testing.assert_allclose(
            [e["loss"] for e in resumed], [e["loss"] for e in full], rtol=1e-6
        )

    def test_unreadable_metrics_file_is_ignored(self, tmp_path, data):
        t = make_trainer(tmp_path)
        for _ in range(2):
            t.train_step(data[:16])
        path = t.save_checkpoint("c.npz")
        (tmp_path / "run" / "metrics.json").write_text("{not json")
        t2 = make_trainer(tmp_path)
        t2.load_checkpoint(path)  # must not raise
        assert t2.metrics_history == []
