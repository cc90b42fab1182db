"""Additional behavioral contracts (depth parity with the reference's
denser per-area suites): transcoder/crosscoder edge semantics, Whisper
greedy decode vs a torch oracle, bf16 capture tolerance, checkpoint
import/export round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_sae_tpu.models.crosscoder import (
    CrossLayerCrosscoder,
    TopKCrossLayerCrosscoder,
)
from whisper_sae_tpu.models.sae import TopKSAE
from whisper_sae_tpu.models.transcoder import SkipTranscoder, TopKTranscoder
from whisper_sae_tpu.utils.checkpoint import (
    export_torch_state_dict,
    import_torch_state_dict,
    load_pytree,
    save_pytree,
)

DIN, DOUT, H, K = 16, 24, 64, 4


class TestTranscoderContracts:
    @pytest.fixture
    def xy(self, rng):
        return (
            jnp.asarray(rng.standard_normal((8, DIN)), jnp.float32),
            jnp.asarray(rng.standard_normal((8, DOUT)), jnp.float32),
        )

    def test_output_fields(self, xy):
        out = TopKTranscoder(DIN, DOUT, H, k=K, seed=0)(*xy)
        assert out._fields == (
            "predicted", "hidden", "loss", "reconstruction_loss",
            "sparsity_loss", "l0",
        )

    def test_eval_determinism(self, xy):
        tc = TopKTranscoder(DIN, DOUT, H, k=K, seed=0).eval()
        a = np.asarray(tc(*xy).predicted)
        b = np.asarray(tc(*xy).predicted)
        np.testing.assert_array_equal(a, b)

    def test_encode_decode_consistency(self, xy):
        tc = TopKTranscoder(DIN, DOUT, H, k=K, seed=0)
        x, y = xy
        manual = np.asarray(tc.decode(tc.encode(x)))
        np.testing.assert_allclose(np.asarray(tc(x, y).predicted), manual, atol=1e-5)

    def test_l0_equals_k_gaussian(self, xy):
        out = TopKTranscoder(DIN, DOUT, H, k=K, seed=0)(*xy)
        assert float(out.l0) == pytest.approx(K, abs=1e-5)

    def test_dead_ratio_progression(self, xy):
        tc = TopKTranscoder(DIN, DOUT, H, k=K, dead_feature_threshold=2, seed=0)
        assert tc.get_dead_feature_ratio() == 0.0
        for _ in range(4):
            tc(*xy)
        # features never selected in 4 steps with threshold 2 are dead
        assert tc.get_dead_feature_ratio() > 0.0

    def test_skip_resample_keeps_skip_params(self, rng):
        tc = SkipTranscoder(DIN, DOUT, H, k=K, dead_feature_threshold=1, seed=0)
        tc.state = tc.state._replace(step_count=jnp.asarray(100, jnp.int32))
        skip_before = np.asarray(tc.params["w_skip"]).copy()
        x = jnp.asarray(rng.standard_normal((32, DIN)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((32, DOUT)), jnp.float32)
        n = tc.resample_dead_features(x, y, num_resample=4)
        assert n == 4
        np.testing.assert_array_equal(np.asarray(tc.params["w_skip"]), skip_before)


class TestCrosscoderContracts:
    D, L, S = 16, 2, 32

    def test_decode_dict_api(self, rng):
        cc = TopKCrossLayerCrosscoder(d_model=self.D, n_layers=self.L, d_sae=self.S, k=4, seed=0)
        hidden = jnp.asarray(rng.standard_normal((4, self.S)), jnp.float32)
        recon = cc.decode(hidden)
        assert set(recon) == {0, 1}
        assert recon[0].shape == (4, self.D)

    def test_noncontiguous_layer_indices(self, rng):
        cc = TopKCrossLayerCrosscoder(
            d_model=self.D, n_layers=2, d_sae=self.S, k=4, layer_indices=[1, 3], seed=0
        )
        acts = {
            1: jnp.asarray(rng.standard_normal((4, self.D)), jnp.float32),
            3: jnp.asarray(rng.standard_normal((4, self.D)), jnp.float32),
        }
        out = cc(acts)
        assert set(out.reconstructed) == {1, 3}
        assert set(out.per_layer_loss) == {1, 3}

    def test_unknown_activation_raises(self):
        with pytest.raises(ValueError):
            CrossLayerCrosscoder(d_model=self.D, n_layers=2, d_sae=self.S, activation="softmax")

    def test_eval_freezes_counters(self, rng):
        cc = TopKCrossLayerCrosscoder(d_model=self.D, n_layers=self.L, d_sae=self.S, k=4, seed=0)
        acts = {i: jnp.asarray(rng.standard_normal((4, self.D)), jnp.float32) for i in range(2)}
        cc.eval()
        cc(acts)
        assert cc.step_count == 0
        cc.train()
        cc(acts)
        assert cc.step_count == 1


class TestGreedyDecodeOracle:
    def test_matches_torch_manual_greedy(self, rng):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")

        from whisper_sae_tpu.models.whisper import from_hf_torch, greedy_decode

        cfg = transformers.WhisperConfig(
            vocab_size=200, num_mel_bins=80, d_model=64, encoder_layers=2,
            decoder_layers=2, encoder_attention_heads=2, decoder_attention_heads=2,
            encoder_ffn_dim=128, decoder_ffn_dim=128, max_source_positions=75,
            max_target_positions=16, decoder_start_token_id=42,
            pad_token_id=0, bos_token_id=0, eos_token_id=1,
        )
        torch.manual_seed(0)
        model = transformers.WhisperForConditionalGeneration(cfg).eval()
        params, arch = from_hf_torch(model)

        mel = rng.standard_normal((2, 80, 150)).astype(np.float32)
        ours = np.asarray(greedy_decode(params, jnp.asarray(mel), arch, max_len=6))

        # torch oracle: manual greedy loop over the full decoder
        with torch.no_grad():
            enc = model.model.encoder(torch.from_numpy(mel)).last_hidden_state
            ids = torch.full((2, 1), 42, dtype=torch.long)
            for _ in range(5):
                dec = model.model.decoder(input_ids=ids, encoder_hidden_states=enc)
                logits = dec.last_hidden_state[:, -1, :] @ model.model.decoder.embed_tokens.weight.T
                nxt = logits.argmax(-1, keepdim=True)
                ids = torch.cat([ids, nxt], dim=1)
        np.testing.assert_array_equal(ours, ids.numpy())


class TestBF16Capture:
    def test_close_to_f32(self, rng):
        from whisper_sae_tpu.models.whisper import (
            WhisperArch,
            extract_activations,
            init_whisper,
        )

        arch = WhisperArch(
            d_model=64, encoder_layers=2, decoder_layers=2, num_heads=2,
            ffn_dim=128, max_source_positions=75, max_target_positions=16,
            vocab_size=200, decoder_start_token_id=42,
        )
        params = init_whisper(jax.random.PRNGKey(0), arch)
        mel = jnp.asarray(rng.standard_normal((2, 80, 150)), jnp.float32)
        a = extract_activations(params, mel, arch)
        b = extract_activations(params, mel, arch, compute_dtype=jnp.bfloat16)
        assert b["encoder"].dtype == jnp.float32  # stored f32 either way
        scale = float(jnp.abs(a["encoder"]).max())
        diff = float(jnp.abs(a["encoder"] - b["encoder"]).max())
        assert diff < 0.05 * scale


class TestCheckpointUtils:
    def test_pytree_round_trip_with_meta(self, tmp_path, rng):
        tree = {
            "a": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32),
            "nested": {"b": jnp.arange(3), "c": (jnp.ones(2), jnp.zeros(()))},
        }
        path = save_pytree(tmp_path / "t.npz", tree, meta={"step": 7})
        back, meta = load_pytree(path, tree)
        assert meta == {"step": 7}
        np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(tree["a"]))
        np.testing.assert_array_equal(
            np.asarray(back["nested"]["c"][0]), np.ones(2)
        )

    def test_missing_leaf_raises(self, tmp_path):
        tree = {"a": jnp.ones(2)}
        path = save_pytree(tmp_path / "t.npz", tree)
        with pytest.raises(KeyError):
            load_pytree(path, {"a": jnp.ones(2), "b": jnp.ones(2)})

    def test_torch_export_import_round_trip(self, rng):
        pytest.importorskip("torch")
        sae = TopKSAE(input_dim=8, hidden_dim=16, k=2, seed=0)
        sd = export_torch_state_dict(sae.params, state=sae.state)
        back = import_torch_state_dict(sd)
        for key in ("w_enc", "b_enc", "w_dec", "b_dec", "b_pre"):
            np.testing.assert_allclose(
                np.asarray(back[key]), np.asarray(sae.params[key]), rtol=1e-6
            )

    def test_orbax_backend_round_trip(self, tmp_path, rng):
        from whisper_sae_tpu.utils.checkpoint import (
            load_pytree_orbax,
            save_pytree_orbax,
        )

        tree = {"w": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)}
        save_pytree_orbax(tmp_path / "ckpt", tree)
        back = load_pytree_orbax(tmp_path / "ckpt", tree)
        np.testing.assert_array_equal(np.asarray(back["w"]), np.asarray(tree["w"]))


class TestTranscribe:
    def test_returns_tokens_without_tokenizer(self, rng):
        from whisper_sae_tpu.models.whisper import WhisperArch, init_whisper, transcribe

        arch = WhisperArch(
            d_model=64, encoder_layers=2, decoder_layers=2, num_heads=2,
            ffn_dim=128, max_source_positions=1500, max_target_positions=16,
            vocab_size=200, decoder_start_token_id=42,
        )
        import jax

        params = init_whisper(jax.random.PRNGKey(0), arch)
        audio = rng.standard_normal(16000).astype(np.float32)
        tokens = transcribe(params, arch, audio, max_len=6)
        assert tokens.shape == (1, 6)
        assert int(tokens[0, 0]) == 42


class TestWER:
    def test_exact_match_zero(self):
        from whisper_sae_tpu.utils.metrics import wer

        assert wer("HELLO WORLD", "hello, world!") == 0.0

    def test_known_edit_counts(self):
        from whisper_sae_tpu.utils.metrics import wer

        # 1 sub + 1 del over 4 ref words
        assert wer("a b c d", "a x c") == pytest.approx(0.5)
        # pure insertion
        assert wer("a b", "a b c") == pytest.approx(0.5)

    def test_empty_cases(self):
        from whisper_sae_tpu.utils.metrics import wer

        assert wer("", "") == 0.0
        assert wer("", "something") == 1.0
        assert wer("something", "") == 1.0

    def test_corpus_pools_edits_over_words(self):
        from whisper_sae_tpu.utils.metrics import corpus_wer

        pairs = [("a b c d", "a b c d"), ("x y", "x z")]
        assert corpus_wer(pairs) == pytest.approx(1 / 6)
