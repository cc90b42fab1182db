"""Causal-intervention tests (the reference has no implementation to
mirror — these pin the semantics of the TPU build's patching layer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_sae_tpu.causal import (
    encoder_forward_patched,
    feature_ablation_patch,
    logit_kl,
    patched_logits,
    sae_reconstruction_patch,
    substitution_effect,
    token_agreement,
)
from whisper_sae_tpu.models.sae import TopKSAE
from whisper_sae_tpu.models.whisper import (
    WhisperArch,
    encoder_forward,
    greedy_decode,
    init_whisper,
)

ARCH = WhisperArch(
    d_model=64, encoder_layers=2, decoder_layers=2, num_heads=2, ffn_dim=128,
    max_source_positions=75, max_target_positions=24, vocab_size=200,
    decoder_start_token_id=42, eos_token_id=3,
)


@pytest.fixture(scope="module")
def params():
    return init_whisper(jax.random.PRNGKey(0), ARCH)


@pytest.fixture
def mel(rng):
    return jnp.asarray(rng.standard_normal((2, 80, 150)), jnp.float32)


class TestPatchedForward:
    def test_identity_patch_matches_clean(self, params, mel):
        clean_last, clean_layers = encoder_forward(params, mel, ARCH)
        pat_last, pat_layers = encoder_forward_patched(
            params, mel, ARCH, layer_idx=0, patch_fn=lambda h: h
        )
        np.testing.assert_allclose(
            np.asarray(pat_last), np.asarray(clean_last), atol=1e-5
        )

    def test_zero_patch_changes_downstream_only(self, params, mel):
        _, clean_layers = encoder_forward(params, mel, ARCH)
        _, pat_layers = encoder_forward_patched(
            params, mel, ARCH, layer_idx=0, patch_fn=lambda h: jnp.zeros_like(h)
        )
        # layer 0 output IS the patch
        np.testing.assert_allclose(np.asarray(pat_layers[0]), 0.0, atol=1e-7)
        # layer 1 differs from clean
        assert (
            np.abs(np.asarray(pat_layers[1]) - np.asarray(clean_layers[1])).max()
            > 1e-3
        )

    def test_additive_patch_on_last_layer(self, params, mel):
        # (a pure scaling patch would be invisible: the final LayerNorm
        # is scale-invariant — use a direction-changing patch)
        clean_last, _ = encoder_forward(params, mel, ARCH)
        delta = jnp.ones((1, 1, 64)) * jnp.arange(64)
        pat_last, _ = encoder_forward_patched(
            params, mel, ARCH, layer_idx=1, patch_fn=lambda h: h + delta
        )
        assert np.abs(np.asarray(pat_last) - np.asarray(clean_last)).max() > 1e-3


class TestGreedyDecode:
    def test_shape_and_bos(self, params, mel):
        tokens = greedy_decode(params, mel, ARCH, max_len=8)
        assert tokens.shape == (2, 8)
        assert (np.asarray(tokens[:, 0]) == 42).all()

    def test_deterministic(self, params, mel):
        a = np.asarray(greedy_decode(params, mel, ARCH, max_len=8))
        b = np.asarray(greedy_decode(params, mel, ARCH, max_len=8))
        np.testing.assert_array_equal(a, b)

    def test_kv_cached_decode_matches_uncached(self, params, mel):
        from whisper_sae_tpu.models.whisper import greedy_decode_cached

        want = np.asarray(greedy_decode(params, mel, ARCH, max_len=10))
        got = np.asarray(greedy_decode_cached(params, mel, ARCH, max_len=10))
        np.testing.assert_array_equal(got, want)

    def test_forced_decoder_ids(self, params, mel):
        from whisper_sae_tpu.models.whisper import greedy_decode_cached

        forced = (7, 11, 13)
        for fn in (greedy_decode, greedy_decode_cached):
            tokens = np.asarray(
                fn(params, mel, ARCH, max_len=10, forced_ids=forced)
            )
            assert (tokens[:, 1:4] == np.asarray(forced)).all()

    def test_eos_freezes_sequence(self, params, mel):
        """Once EOS is emitted every later position must stay EOS (no
        post-EOS garbage for batch_decode to concatenate)."""
        from whisper_sae_tpu.models.whisper import greedy_decode_cached

        # force EOS at position 1; everything after must be EOS too
        for fn in (greedy_decode, greedy_decode_cached):
            tokens = np.asarray(
                fn(params, mel, ARCH, max_len=8, forced_ids=(ARCH.eos_token_id,))
            )
            assert (tokens[:, 1:] == ARCH.eos_token_id).all()


class TestSAEInterventions:
    def _good_sae(self, params, mel, apply_ln=True):
        """An SAE with enough capacity trained briefly on this layer."""
        import optax

        from whisper_sae_tpu.models.sae import normalize_decoder, topk_sae_loss
        from whisper_sae_tpu.models.whisper import extract_activations

        acts = extract_activations(
            params, mel, ARCH, apply_layer_norm=apply_ln, with_decoder=False
        )["encoder"][0].reshape(-1, 64)
        sae = TopKSAE(input_dim=64, hidden_dim=512, k=48, seed=0)
        opt = optax.adam(3e-3)
        ost = opt.init(sae.params)

        @jax.jit
        def step(p, o):
            l, g = jax.value_and_grad(lambda q: topk_sae_loss(q, acts, 48)[0])(p)
            u, o = opt.update(g, o, p)
            return normalize_decoder(optax.apply_updates(p, u)), o, l

        p = sae.params
        for _ in range(300):
            p, ost, loss = step(p, ost)
        sae.params = p
        return sae, float(loss), acts

    def test_substitution_effect_tracks_sae_quality(self, params, mel):
        sae, loss, acts = self._good_sae(params, mel)
        good = substitution_effect(params, mel, ARCH, sae, layer_idx=0, max_len=8)
        bad_sae = TopKSAE(input_dim=64, hidden_dim=512, k=48, seed=1)  # untrained
        bad = substitution_effect(params, mel, ARCH, bad_sae, layer_idx=0, max_len=8)
        assert good["logit_kl"] < bad["logit_kl"]
        assert good["token_agreement"] >= bad["token_agreement"]

    def test_reconstruction_patch_ln_inverse(self, params, mel):
        # a perfect "SAE" (identity reconstruction) must leave the
        # forward unchanged, exercising the LN inversion
        class IdentitySAE:
            def __call__(self, x):
                from whisper_sae_tpu.models.sae import SAEOutput

                z = jnp.zeros(())
                return SAEOutput(x, x, z, z, z, z)

        patch = sae_reconstruction_patch(IdentitySAE(), params, apply_layer_norm=True)
        clean = patched_logits(params, mel, ARCH, 0, lambda h: h)
        pat = patched_logits(params, mel, ARCH, 0, patch)
        np.testing.assert_allclose(np.asarray(pat), np.asarray(clean), atol=1e-3)

    def test_feature_ablation_changes_output(self, params, mel):
        sae, _, _ = self._good_sae(params, mel)
        patch_none = sae_reconstruction_patch(sae, params)
        patch_abl = feature_ablation_patch(sae, list(range(64)), params)
        a = patched_logits(params, mel, ARCH, 0, patch_none)
        b = patched_logits(params, mel, ARCH, 0, patch_abl)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4

    def test_steering_scale_one_matches_substitution(self, params, mel):
        from whisper_sae_tpu.causal import feature_steering_patch

        sae, _, _ = self._good_sae(params, mel)
        steer = feature_steering_patch(sae, [3, 7], params, scale=1.0)
        sub = sae_reconstruction_patch(sae, params)
        a = patched_logits(params, mel, ARCH, 0, steer)
        b = patched_logits(params, mel, ARCH, 0, sub)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_steering_scale_zero_is_ablation(self, params, mel):
        from whisper_sae_tpu.causal import feature_steering_patch

        sae, _, _ = self._good_sae(params, mel)
        idxs = list(range(32))
        steer = feature_steering_patch(sae, idxs, params, scale=0.0)
        abl = feature_ablation_patch(sae, idxs, params)
        a = patched_logits(params, mel, ARCH, 0, steer)
        b = patched_logits(params, mel, ARCH, 0, abl)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_steering_set_value_moves_output(self, params, mel):
        from whisper_sae_tpu.causal import feature_steering_patch

        sae, _, _ = self._good_sae(params, mel)
        base = sae_reconstruction_patch(sae, params)
        clamp = feature_steering_patch(sae, [5], params, set_value=25.0)
        a = patched_logits(params, mel, ARCH, 0, base)
        b = patched_logits(params, mel, ARCH, 0, clamp)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4

    def test_steering_arg_validation(self, params, mel):
        from whisper_sae_tpu.causal import feature_steering_patch

        sae = TopKSAE(input_dim=64, hidden_dim=512, k=48, seed=0)
        with pytest.raises(ValueError):
            feature_steering_patch(sae, [0], params)
        with pytest.raises(ValueError):
            feature_steering_patch(sae, [0], params, scale=2.0, set_value=1.0)

    def test_substitution_does_not_leak_tracers_into_state(self, params, mel):
        """Regression: the patch used to call the stateful training-mode
        facade inside the traced forward, leaving DynamicJaxprTracer in
        sae.state and breaking any later state read."""
        sae = TopKSAE(input_dim=64, hidden_dim=512, k=48, seed=0)
        assert sae.training  # the leak only happened in training mode
        before = sae.state
        substitution_effect(params, mel, ARCH, sae, layer_idx=0, max_len=4)
        assert int(sae.state.step_count) == 0  # concrete, unchanged
        np.testing.assert_array_equal(
            np.asarray(sae.state.feature_last_activated),
            np.asarray(before.feature_last_activated),
        )

    def test_metrics(self):
        t1 = jnp.asarray([[1, 2, 3, 4]])
        t2 = jnp.asarray([[1, 2, 0, 4]])
        assert float(token_agreement(t1, t2)) == pytest.approx(0.75)
        logits = jnp.asarray([[1.0, 2.0, 3.0]])
        assert float(logit_kl(logits, logits)) == pytest.approx(0.0, abs=1e-6)


class TestDecoderPatching:
    def test_identity_patch_matches_clean(self, params, mel):
        from whisper_sae_tpu.causal import decoder_forward_patched
        from whisper_sae_tpu.models.whisper import decoder_forward

        enc, _ = encoder_forward(params, mel, ARCH)
        ids = jnp.asarray([[42, 5, 9], [42, 1, 2]], jnp.int32)
        want, _ = decoder_forward(params, ids, enc, ARCH)
        got, _ = decoder_forward_patched(
            params, ids, enc, ARCH, layer_idx=0, patch_fn=lambda h: h
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_zero_patch_changes_output(self, params, mel):
        from whisper_sae_tpu.causal import decoder_forward_patched
        from whisper_sae_tpu.models.whisper import decoder_forward

        enc, _ = encoder_forward(params, mel, ARCH)
        ids = jnp.asarray([[42, 5], [42, 1]], jnp.int32)
        want, _ = decoder_forward(params, ids, enc, ARCH)
        got, layers = decoder_forward_patched(
            params, ids, enc, ARCH, layer_idx=0, patch_fn=jnp.zeros_like
        )
        np.testing.assert_allclose(np.asarray(layers[0]), 0.0, atol=1e-7)
        assert np.abs(np.asarray(got) - np.asarray(want)).max() > 1e-3

    def test_decoder_component_patch_factory(self, params, mel):
        from whisper_sae_tpu.causal import decoder_forward_patched

        class IdentitySAE:
            def __call__(self, x):
                from whisper_sae_tpu.models.sae import SAEOutput

                z = jnp.zeros(())
                return SAEOutput(x, x, z, z, z, z)

        from whisper_sae_tpu.models.whisper import decoder_forward

        patch = sae_reconstruction_patch(
            IdentitySAE(), params, apply_layer_norm=True, component="decoder"
        )
        enc, _ = encoder_forward(params, mel, ARCH)
        ids = jnp.asarray([[42, 5], [42, 1]], jnp.int32)
        want, _ = decoder_forward(params, ids, enc, ARCH)
        got, _ = decoder_forward_patched(params, ids, enc, ARCH, 1, patch)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


class _IdentitySAE:
    """A perfect 'SAE' (identity reconstruction) for LN-inverse checks."""

    def __call__(self, x):
        from whisper_sae_tpu.models.sae import SAEOutput

        z = jnp.zeros(())
        return SAEOutput(x, x, z, z, z, z)


class TestDecoderCausalValidation:
    """End-to-end decoder-side validation (VERDICT r4 #7): the decoder
    intervention path must support the same substitution / ablation /
    decode metrics as the encoder path."""

    def test_identity_logits_match_clean_bos(self, params, mel):
        from whisper_sae_tpu.causal import patched_logits_decoder
        from whisper_sae_tpu.models.whisper import decoder_forward, decoder_logits

        enc, _ = encoder_forward(params, mel, ARCH)
        bos = jnp.full((2, 1), ARCH.decoder_start_token_id, jnp.int32)
        hidden, _ = decoder_forward(params, bos, enc, ARCH)
        want = decoder_logits(params, hidden[:, 0, :])
        got = patched_logits_decoder(
            params, mel, ARCH, 0, lambda h: h, encoder_hidden=enc
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_identity_patched_decode_matches_cached(self, params, mel):
        from whisper_sae_tpu.causal import greedy_decode_patched_decoder
        from whisper_sae_tpu.models.whisper import greedy_decode_cached

        want = np.asarray(greedy_decode_cached(params, mel, ARCH, max_len=8))
        got = np.asarray(
            greedy_decode_patched_decoder(
                params, mel, ARCH, 0, lambda h: h, max_len=8
            )
        )
        np.testing.assert_array_equal(got, want)

    def test_substitution_effect_decoder_identity_sae(self, params, mel):
        res = substitution_effect(
            params, mel, ARCH, _IdentitySAE(), layer_idx=0,
            max_len=8, component="decoder",
        )
        assert res["logit_kl"] == pytest.approx(0.0, abs=1e-4)
        assert res["token_agreement"] == 1.0

    def test_substitution_effect_decoder_tracks_quality(self, params, mel):
        bad = TopKSAE(input_dim=64, hidden_dim=512, k=48, seed=1)  # untrained
        good = substitution_effect(
            params, mel, ARCH, _IdentitySAE(), 0, max_len=8, component="decoder"
        )
        worse = substitution_effect(
            params, mel, ARCH, bad, 0, max_len=8, component="decoder"
        )
        assert good["logit_kl"] < worse["logit_kl"]
        assert good["token_agreement"] >= worse["token_agreement"]

    def test_ablation_sweep_decoder_component(self, params, mel):
        from whisper_sae_tpu.causal import feature_ablation_sweep

        sae = TopKSAE(input_dim=64, hidden_dim=512, k=48, seed=0)
        out = feature_ablation_sweep(
            params, mel, ARCH, sae, 0, [3, 7, 11], component="decoder"
        )
        assert len(out) == 3
        kls = [r["marginal_logit_kl"] for r in out]
        assert kls == sorted(kls, reverse=True)
        assert all(np.isfinite(k) for k in kls)


class TestAblationSweep:
    def test_ranked_marginal_effects(self, params, mel):
        from whisper_sae_tpu.causal import feature_ablation_sweep

        sae, _, acts = TestSAEInterventions()._good_sae(params, mel)
        # the most-active features should carry most of the causal load
        hidden = np.asarray(sae.encode(np.asarray(acts)))
        top = np.argsort(hidden.sum(axis=0))[-4:]
        out = feature_ablation_sweep(params, mel, ARCH, sae, 0, top)
        assert len(out) == 4
        kls = [r["marginal_logit_kl"] for r in out]
        assert kls == sorted(kls, reverse=True)
        # ablating an active feature must hurt (positive marginal KL)
        assert kls[0] > 0
        assert {r["feature_idx"] for r in out} == set(int(i) for i in top)
