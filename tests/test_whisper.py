"""JAX Whisper parity tests against HF torch Whisper.

Mirrors the numerical-parity oracle of reference tests/test_hooks.py:312-358
(hook output == manual recompute), but offline: a *randomly initialized*
torch WhisperForConditionalGeneration is the oracle — no network needed,
and random weights exercise every code path the pretrained ones do.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from whisper_sae_tpu.models.whisper import (
    WhisperArch,
    arch_for,
    decoder_forward,
    encoder_forward,
    extract_activations,
    flatten_activations,
    from_hf_torch,
    init_whisper,
)

ATOL = 2e-4


@pytest.fixture(scope="module")
def torch_whisper():
    cfg = transformers.WhisperConfig(
        vocab_size=500,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        max_source_positions=75,
        max_target_positions=20,
        decoder_start_token_id=42,
        pad_token_id=0,
        bos_token_id=0,
        eos_token_id=1,
    )
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_whisper(torch_whisper):
    return from_hf_torch(torch_whisper)


@pytest.fixture
def mel(rng):
    return rng.standard_normal((2, 80, 150)).astype(np.float32)


def torch_layer_outputs(model, mel, bos_id):
    """Capture per-layer outputs with forward hooks, exactly like the
    reference extractor (hooks.py:75-124)."""
    enc_outs, dec_outs = [], []
    hooks = []
    for layer in model.model.encoder.layers:
        hooks.append(
            layer.register_forward_hook(
                lambda m, i, o: enc_outs.append(o[0].detach().numpy())
            )
        )
    for layer in model.model.decoder.layers:
        hooks.append(
            layer.register_forward_hook(
                lambda m, i, o: dec_outs.append(o[0].detach().numpy())
            )
        )
    with torch.no_grad():
        enc = model.model.encoder(torch.from_numpy(mel))
        ids = torch.full((mel.shape[0], 1), bos_id, dtype=torch.long)
        model.model.decoder(input_ids=ids, encoder_hidden_states=enc.last_hidden_state)
    for h in hooks:
        h.remove()
    return enc.last_hidden_state.numpy(), enc_outs, dec_outs


class TestEncoderParity:
    def test_last_hidden_state(self, torch_whisper, jax_whisper, mel):
        params, arch = jax_whisper
        want, _, _ = torch_layer_outputs(torch_whisper, mel, arch.decoder_start_token_id)
        got, _ = encoder_forward(params, jnp.asarray(mel), arch)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)

    def test_per_layer_outputs_match_hooks(self, torch_whisper, jax_whisper, mel):
        params, arch = jax_whisper
        _, enc_outs, _ = torch_layer_outputs(
            torch_whisper, mel, arch.decoder_start_token_id
        )
        _, layers = encoder_forward(params, jnp.asarray(mel), arch)
        assert layers.shape[0] == len(enc_outs) == 2
        for i, want in enumerate(enc_outs):
            np.testing.assert_allclose(np.asarray(layers[i]), want, atol=ATOL)

    def test_shapes(self, jax_whisper, mel):
        params, arch = jax_whisper
        last, layers = encoder_forward(params, jnp.asarray(mel), arch)
        assert last.shape == (2, 75, 64)
        assert layers.shape == (2, 2, 75, 64)

    @pytest.mark.parametrize("cap_dt", [jnp.float32, jnp.bfloat16])
    def test_capture_final_ln_matches_manual(self, jax_whisper, mel, cap_dt):
        """capture_final_ln returns captures with the final LN already
        applied at capture_dtype — byte-identical to casting the raw
        captures and LN-ing them (the pre-fold extraction pipeline)."""
        from whisper_sae_tpu.models.whisper import _layer_norm

        params, arch = jax_whisper
        _, raw = encoder_forward(params, jnp.asarray(mel), arch)
        got_last, got = encoder_forward(
            params, jnp.asarray(mel), arch,
            capture_final_ln=True, capture_dtype=cap_dt,
        )
        g = params["encoder"]["ln_f_g"].astype(jnp.float32)
        b = params["encoder"]["ln_f_b"].astype(jnp.float32)
        want = _layer_norm(raw.astype(cap_dt), g, b)
        assert got.dtype == cap_dt
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        )


class TestDecoderParity:
    def test_decoder_layers_with_bos(self, torch_whisper, jax_whisper, mel):
        params, arch = jax_whisper
        _, _, dec_outs = torch_layer_outputs(
            torch_whisper, mel, arch.decoder_start_token_id
        )
        enc_last, _ = encoder_forward(params, jnp.asarray(mel), arch)
        bos = jnp.full((2, 1), arch.decoder_start_token_id, jnp.int32)
        _, dec_layers = decoder_forward(params, bos, enc_last, arch)
        assert dec_layers.shape == (2, 2, 1, 64)
        for i, want in enumerate(dec_outs):
            np.testing.assert_allclose(np.asarray(dec_layers[i]), want, atol=ATOL)

    def test_multi_token_causal(self, torch_whisper, jax_whisper, mel):
        params, arch = jax_whisper
        ids_np = np.array([[42, 7, 13], [42, 99, 3]], dtype=np.int64)
        with torch.no_grad():
            enc = torch_whisper.model.encoder(torch.from_numpy(mel))
            dec = torch_whisper.model.decoder(
                input_ids=torch.from_numpy(ids_np),
                encoder_hidden_states=enc.last_hidden_state,
            )
        enc_last, _ = encoder_forward(params, jnp.asarray(mel), arch)
        got, _ = decoder_forward(params, jnp.asarray(ids_np, jnp.int32), enc_last, arch)
        np.testing.assert_allclose(
            np.asarray(got), dec.last_hidden_state.numpy(), atol=ATOL
        )


class TestExtractActivations:
    def test_layer_norm_applied_matches_manual(self, torch_whisper, jax_whisper, mel):
        params, arch = jax_whisper
        _, enc_outs, _ = torch_layer_outputs(
            torch_whisper, mel, arch.decoder_start_token_id
        )
        acts = extract_activations(params, jnp.asarray(mel), arch, apply_layer_norm=True)
        ln = torch_whisper.model.encoder.layer_norm
        for i, raw in enumerate(enc_outs):
            want = ln(torch.from_numpy(raw)).detach().numpy()
            np.testing.assert_allclose(np.asarray(acts["encoder"][i]), want, atol=ATOL)

    def test_no_layer_norm_differs(self, jax_whisper, mel):
        params, arch = jax_whisper
        a = extract_activations(params, jnp.asarray(mel), arch, apply_layer_norm=True)
        b = extract_activations(params, jnp.asarray(mel), arch, apply_layer_norm=False)
        assert np.abs(np.asarray(a["encoder"]) - np.asarray(b["encoder"])).max() > 1e-3

    def test_decoder_capture_shape(self, jax_whisper, mel):
        params, arch = jax_whisper
        acts = extract_activations(params, jnp.asarray(mel), arch)
        assert acts["decoder"].shape == (2, 2, 1, 64)
        assert acts["encoder"].shape == (2, 2, 75, 64)
        assert acts["encoder_last"].shape == (2, 75, 64)

    def test_capture_dtype_bf16_bit_identical(self, jax_whisper, mel):
        """bf16 captures out of the forward == f32 captures cast after
        (layer norms reduce in f32 either way) — the fast extraction
        pipeline's transfer bytes are unchanged by capture_dtype."""
        params, arch = jax_whisper
        a = extract_activations(
            params, jnp.asarray(mel), arch, compute_dtype=jnp.bfloat16,
            with_mlp=True,
        )
        b = extract_activations(
            params, jnp.asarray(mel), arch, compute_dtype=jnp.bfloat16,
            with_mlp=True, capture_dtype=jnp.bfloat16,
        )
        for k in ("encoder", "decoder", "encoder_mlp_in", "encoder_mlp_out"):
            assert b[k].dtype == jnp.bfloat16, k
            np.testing.assert_array_equal(
                np.asarray(a[k]).astype(np.dtype("bfloat16")),
                np.asarray(b[k]), err_msg=k,
            )

    def test_bf16_params_f32_enc_hidden(self, jax_whisper, mel):
        """Pre-cast bf16 params with compute_dtype=None must not trip the
        decoder scan's carry-dtype check (enc_last is f32 there; the
        cross-attention K/V cast keeps the carry bf16)."""
        params, arch = jax_whisper
        p16 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )
        acts = extract_activations(
            p16, jnp.asarray(mel).astype(jnp.bfloat16), arch, with_mlp=True
        )
        assert acts["decoder"].shape == (2, 2, 1, 64)

    def test_without_decoder(self, jax_whisper, mel):
        params, arch = jax_whisper
        acts = extract_activations(
            params, jnp.asarray(mel), arch, with_decoder=False
        )
        assert "decoder" not in acts

    def test_mlp_pair_capture_matches_torch(self, torch_whisper, jax_whisper, mel):
        """The (mlp_in, mlp_out) capture — transcoder training data — must
        equal what the HF model's fc1 consumes / fc2 produces (the quantity
        the reference's transcoders were designed for but its hook capture
        never produces)."""
        params, arch = jax_whisper
        mlp_ins, mlp_outs, dec_ins, dec_outs = [], [], [], []
        hooks = []
        for layer in torch_whisper.model.encoder.layers:
            hooks.append(layer.fc1.register_forward_pre_hook(
                lambda m, args, store=mlp_ins: store.append(args[0].detach().numpy())
            ))
            hooks.append(layer.fc2.register_forward_hook(
                lambda m, a, out, store=mlp_outs: store.append(out.detach().numpy())
            ))
        for layer in torch_whisper.model.decoder.layers:
            hooks.append(layer.fc1.register_forward_pre_hook(
                lambda m, args, store=dec_ins: store.append(args[0].detach().numpy())
            ))
            hooks.append(layer.fc2.register_forward_hook(
                lambda m, a, out, store=dec_outs: store.append(out.detach().numpy())
            ))
        with torch.no_grad():
            enc = torch_whisper.model.encoder(torch.from_numpy(mel))
            ids = torch.full((mel.shape[0], 1), arch.decoder_start_token_id,
                             dtype=torch.long)
            torch_whisper.model.decoder(
                input_ids=ids, encoder_hidden_states=enc.last_hidden_state
            )
        for h in hooks:
            h.remove()

        acts = extract_activations(params, jnp.asarray(mel), arch, with_mlp=True)
        assert acts["encoder_mlp_in"].shape == (2, 2, 75, 64)
        for i in range(arch.encoder_layers):
            np.testing.assert_allclose(
                np.asarray(acts["encoder_mlp_in"][i]), mlp_ins[i], atol=ATOL
            )
            np.testing.assert_allclose(
                np.asarray(acts["encoder_mlp_out"][i]), mlp_outs[i], atol=ATOL
            )
        for i in range(arch.decoder_layers):
            np.testing.assert_allclose(
                np.asarray(acts["decoder_mlp_in"][i]), dec_ins[i], atol=ATOL
            )
            np.testing.assert_allclose(
                np.asarray(acts["decoder_mlp_out"][i]), dec_outs[i], atol=ATOL
            )

    def test_without_mlp_no_extra_keys(self, jax_whisper, mel):
        params, arch = jax_whisper
        acts = extract_activations(params, jnp.asarray(mel), arch)
        assert not any(k.endswith(("mlp_in", "mlp_out")) for k in acts)


class TestHooksFacade:
    """Reference-shaped capture facade (hooks.py:16-210) over the
    functional extractor."""

    def test_extract_features_batch_matches_functional(self, jax_whisper, mel):
        from whisper_sae_tpu.models.hooks import extract_features_batch

        params, arch = jax_whisper
        out = extract_features_batch(
            params, arch, mel, encoder_layers=[0, 1], decoder_layers=[1]
        )
        direct = extract_activations(params, jnp.asarray(mel), arch)
        for idx in (0, 1):
            np.testing.assert_allclose(
                out["encoder"][idx], np.asarray(direct["encoder"][idx]), atol=1e-6
            )
        np.testing.assert_allclose(
            out["decoder"][1], np.asarray(direct["decoder"][1]), atol=1e-6
        )

    def test_matches_torch_hooked_capture(self, torch_whisper, jax_whisper, mel):
        """Facade output == the reference's hooked capture with final-LN
        post-processing (hooks.py:87-92)."""
        from whisper_sae_tpu.models.hooks import extract_features_batch

        params, arch = jax_whisper
        out = extract_features_batch(params, arch, mel, encoder_layers=[1])
        _, enc_outs, _ = torch_layer_outputs(
            torch_whisper, mel, arch.decoder_start_token_id
        )
        ln = torch_whisper.model.encoder.layer_norm
        with torch.no_grad():
            expect = ln(torch.from_numpy(enc_outs[1])).numpy()
        np.testing.assert_allclose(out["encoder"][1], expect, atol=ATOL)

    def test_cache_concatenates_batches(self, jax_whisper, mel):
        from whisper_sae_tpu.models.hooks import WhisperActivationExtractor

        params, arch = jax_whisper
        ex = WhisperActivationExtractor(params, arch, encoder_layers=[0])
        with ex:
            ex.capture(mel)
            ex.capture(mel)
        acts = ex.cache.get_encoder_activations(0)
        assert acts.shape[0] == 2 * mel.shape[0]
        np.testing.assert_array_equal(acts[: mel.shape[0]], acts[mel.shape[0] :])
        assert ex.cache.get_encoder_activations(1) is None
        ex.clear_cache()
        assert ex.cache.get_encoder_activations(0) is None

    def test_reference_hook_api_is_noop(self, jax_whisper):
        from whisper_sae_tpu.models.hooks import WhisperActivationExtractor

        params, arch = jax_whisper
        ex = WhisperActivationExtractor(params, arch, encoder_layers=[0])
        ex.register_hooks()
        ex.remove_hooks()

    def test_decoder_skipped_when_not_requested(self, jax_whisper, mel):
        from whisper_sae_tpu.models.hooks import extract_features_batch

        params, arch = jax_whisper
        out = extract_features_batch(params, arch, mel, encoder_layers=[0])
        assert out["decoder"] == {}


class TestFlatten:
    def test_row_major(self):
        x = jnp.arange(2 * 3 * 4).reshape(2, 3, 4)
        flat = flatten_activations(x)
        assert flat.shape == (6, 4)
        np.testing.assert_array_equal(np.asarray(flat[0]), np.arange(4))
        np.testing.assert_array_equal(np.asarray(flat[3]), np.arange(12, 16))


class TestOtherGeometries:
    @pytest.mark.parametrize("d_model,heads,ffn", [(128, 4, 256), (96, 3, 192)])
    def test_parity_across_geometries(self, rng, d_model, heads, ffn):
        cfg = transformers.WhisperConfig(
            vocab_size=300, num_mel_bins=80, d_model=d_model,
            encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=heads, decoder_attention_heads=heads,
            encoder_ffn_dim=ffn, decoder_ffn_dim=ffn,
            max_source_positions=50, max_target_positions=12,
            decoder_start_token_id=7, pad_token_id=0, bos_token_id=0,
            eos_token_id=1,
        )
        torch.manual_seed(1)
        model = transformers.WhisperForConditionalGeneration(cfg).eval()
        params, arch = from_hf_torch(model)
        mel = rng.standard_normal((1, 80, 100)).astype(np.float32)
        with torch.no_grad():
            want = model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
        got, _ = encoder_forward(params, jnp.asarray(mel), arch)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


class TestArchTable:
    def test_tiny(self):
        a = arch_for("openai/whisper-tiny")
        assert (a.d_model, a.encoder_layers, a.num_heads) == (384, 4, 6)

    def test_large_v3_mels(self):
        assert arch_for("openai/whisper-large-v3").n_mels == 128

    def test_random_init_runs(self, mel):
        arch = WhisperArch(
            d_model=64, encoder_layers=2, decoder_layers=2, num_heads=2,
            ffn_dim=128, max_source_positions=75, max_target_positions=20,
            vocab_size=500, decoder_start_token_id=42,
        )
        params = init_whisper(jax.random.PRNGKey(0), arch)
        acts = extract_activations(params, jnp.asarray(mel), arch)
        assert acts["encoder"].shape == (2, 2, 75, 64)


class TestFewQueryCrossAttention:
    """The reassociated few-query cross-attention (whisper.py:_attention
    fast path) is exact algebra — pin it against the composed
    project-K/V-then-attend formulation at f32 tolerance."""

    def _params(self, rng, d):
        def w():
            return jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) / d**0.5)

        def bias():
            return jnp.asarray(rng.standard_normal((d,)).astype(np.float32))

        return {
            "wq": w(), "bq": bias(), "wk": w(), "wv": w(), "bv": bias(),
            "wo": w(), "bo": bias(),
        }

    def _composed(self, x_q, x_kv, p, num_heads):
        b, tq, d = x_q.shape
        tk = x_kv.shape[1]
        hd = d // num_heads
        q = (x_q @ p["wq"] + p["bq"]) * hd**-0.5
        k = x_kv @ p["wk"]
        v = x_kv @ p["wv"] + p["bv"]
        q = q.reshape(b, tq, num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, tk, num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, tk, num_heads, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
        return out @ p["wo"] + p["bo"]

    @pytest.mark.parametrize("tq", [1, 3])
    def test_matches_composed(self, rng, tq):
        from whisper_sae_tpu.models.whisper import _attention

        b, tk, d, heads = 2, 64, 48, 4
        p = self._params(rng, d)
        x_q = jnp.asarray(rng.standard_normal((b, tq, d)).astype(np.float32))
        x_kv = jnp.asarray(rng.standard_normal((b, tk, d)).astype(np.float32))
        assert tq * heads * 2 <= d and tk >= 8 * tq  # fast path engages
        got = _attention(x_q, x_kv, p, heads, causal=False)
        want = self._composed(x_q, x_kv, p, heads)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_value_bias_folds_exactly(self, rng):
        # the fast path relies on softmax rows summing to 1 to add bv
        # post-contraction; a large bias magnifies any folding error
        from whisper_sae_tpu.models.whisper import _attention

        b, tq, tk, d, heads = 1, 1, 32, 16, 2
        p = self._params(rng, d)
        p["bv"] = p["bv"] + 100.0
        x_q = jnp.asarray(rng.standard_normal((b, tq, d)).astype(np.float32))
        x_kv = jnp.asarray(rng.standard_normal((b, tk, d)).astype(np.float32))
        got = _attention(x_q, x_kv, p, heads, causal=False)
        want = self._composed(x_q, x_kv, p, heads)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-5
        )


class TestGreedyDecodeHFParity:
    """Token-for-token parity of our greedy decode against HF
    ``generate(do_sample=False)`` on the same random weights — the oracle
    the reference never has (it ships no decode at all); our ``transcribe``
    job and the causal KL/agreement metrics sit on this loop.  Same
    random-weight-oracle style as TestEncoderParity above (reference
    tests/test_hooks.py:27-33 runs the pretrained flavor online)."""

    MAX_NEW = 12

    def _hf_tokens(self, torch_whisper, mel, forced=None):
        kwargs = {}
        if forced is not None:
            # transformers >= 4.50 dropped forced_decoder_ids; priming
            # decoder_input_ids with [start, *forced] is the equivalent
            start = torch_whisper.config.decoder_start_token_id
            prompt = torch.tensor(
                [[start, *forced]] * mel.shape[0], dtype=torch.long
            )
            kwargs["decoder_input_ids"] = prompt
        with torch.no_grad():
            out = torch_whisper.generate(
                input_features=torch.from_numpy(mel),
                do_sample=False,
                max_new_tokens=self.MAX_NEW,
                # the tiny vocab (500) makes HF's default whisper
                # begin-suppression list ([220, 50256]) partly in-vocab;
                # disable suppression on both sides
                suppress_tokens=None,
                begin_suppress_tokens=None,
                **kwargs,
            )
        return np.asarray(out)

    def _mask_after_eos(self, toks, eos):
        """Zero everything after (and including) the first EOS per row so
        padding conventions don't leak into the comparison."""
        toks = toks.copy()
        for r in range(toks.shape[0]):
            hits = np.where(toks[r] == eos)[0]
            if len(hits):
                toks[r, hits[0]:] = eos
        return toks

    @pytest.mark.parametrize("cached", [False, True])
    def test_tokens_match_hf_generate(self, torch_whisper, jax_whisper, mel, cached):
        from whisper_sae_tpu.models.whisper import greedy_decode, greedy_decode_cached

        params, arch = jax_whisper
        hf = self._hf_tokens(torch_whisper, mel)
        fn = greedy_decode_cached if cached else greedy_decode
        ours = np.asarray(fn(params, jnp.asarray(mel), arch, max_len=self.MAX_NEW + 1))
        assert (ours[:, 0] == arch.decoder_start_token_id).all()
        # HF strips the decoder-start token from the returned sequences
        # when it emits exactly max_new_tokens columns; align on content
        ours_new = ours[:, 1:]
        if hf.shape[1] == self.MAX_NEW + 1:
            assert (hf[:, 0] == arch.decoder_start_token_id).all()
            hf = hf[:, 1:]
        n = min(hf.shape[1], ours_new.shape[1])
        eos = arch.eos_token_id
        np.testing.assert_array_equal(
            self._mask_after_eos(ours_new[:, :n], eos),
            self._mask_after_eos(hf[:, :n], eos),
        )

    def test_forced_ids_match_hf_generate(self, torch_whisper, jax_whisper, mel):
        from whisper_sae_tpu.models.whisper import greedy_decode_cached

        params, arch = jax_whisper
        forced = (7, 11, 13)
        hf = self._hf_tokens(torch_whisper, mel, forced=forced)
        ours = np.asarray(
            greedy_decode_cached(
                params, jnp.asarray(mel), arch,
                max_len=self.MAX_NEW + len(forced) + 1, forced_ids=forced,
            )
        )
        # HF generate returns only the continuation after the primed
        # prompt [start, *forced]; align our buffer the same way
        ours_new = ours[:, 1 + len(forced):]
        n = min(hf.shape[1], ours_new.shape[1])
        eos = arch.eos_token_id
        np.testing.assert_array_equal(
            self._mask_after_eos(ours_new[:, :n], eos),
            self._mask_after_eos(hf[:, :n], eos),
        )
