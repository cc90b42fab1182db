"""CPU guard for the fused encoder layer blocks (ops/pallas_encoder.py)
via Pallas interpret mode, against the composed bf16 XLA encoder layer.

The kernels are TPU-gated (``pallas_encoder.supported`` rejects CPU), so
the unit suite never runs them compiled; ``scripts/check_tpu_kernels.py``
verifies them on-chip.  Small shapes: interpret mode executes serially.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from whisper_sae_tpu.models import whisper as W
from whisper_sae_tpu.ops import pallas_encoder as pe

B, T, D, HEADS, F = 2, 100, 128, 2, 256
T_PAD = 128
BF = jnp.bfloat16


@pytest.fixture(scope="module")
def layer():
    arch = W.WhisperArch(d_model=D, encoder_layers=1, decoder_layers=1,
                         num_heads=HEADS, ffn_dim=F)
    params = W.init_whisper(jax.random.PRNGKey(0), arch)
    lp = jax.tree_util.tree_map(lambda a: a[0], params["encoder"]["layers"])
    lp16 = jax.tree_util.tree_map(lambda a: a.astype(BF), lp)
    x = (jax.random.normal(jax.random.PRNGKey(1), (B, T, D), jnp.float32)
         .astype(BF))
    return lp16, x, arch


def _pad(x):
    return jnp.pad(x, ((0, 0), (0, T_PAD - T), (0, 0)))


class TestErfPolynomial:
    def test_matches_scipy_erf(self):
        """_erf_f32 (transcendental-free odd polynomial, input clamped
        at +-3.2) vs the exact erf: max abs err must stay ~3.4e-5,
        three decades under the bf16 rounding the fused outputs carry."""
        xs = jnp.asarray(np.linspace(-12.0, 12.0, 100001, dtype=np.float32))
        got = np.asarray(pe._erf_f32(xs), np.float64)
        want = np.asarray(jax.scipy.special.erf(xs), np.float64)
        assert np.abs(got - want).max() < 5e-5

    def test_gelu_absolute_error(self):
        """GELU built on the polynomial erf: the absolute error bound
        0.5*|x|*erf_err (the quantity bf16 rounding of the layer values
        is compared against; relative error is meaningless in the
        negative tail where exact gelu nearly cancels)."""
        xs = jnp.asarray(np.linspace(-8.0, 8.0, 50001, dtype=np.float32))
        got = np.asarray(
            xs * 0.5 * (1.0 + pe._erf_f32(xs * np.float32(2.0**-0.5))),
            np.float64,
        )
        want = np.asarray(jax.nn.gelu(xs, approximate=False), np.float64)
        bound = 6e-5 * (1.0 + np.abs(np.asarray(xs, np.float64)))
        assert (np.abs(got - want) <= bound).all()


class TestFusedAttentionBlock:
    def test_matches_composed_attention_sublayer(self, layer):
        lp, x, arch = layer
        ln = W._layer_norm(x, lp["ln1_g"], lp["ln1_b"])
        want = x + W._attention(ln, ln, lp["attn"], HEADS, causal=False)
        with pltpu.force_tpu_interpret_mode():
            got = pe.fused_attention_block(
                _pad(x), lp["ln1_g"], lp["ln1_b"], lp["attn"],
                n_heads=HEADS, t_real=T,
            )[:, :T]
        np.testing.assert_allclose(
            got.astype(jnp.float32), want.astype(jnp.float32),
            atol=3e-2, rtol=0,
        )

    def test_pad_rows_stay_finite(self, layer):
        lp, x, _ = layer
        with pltpu.force_tpu_interpret_mode():
            got = pe.fused_attention_block(
                _pad(x), lp["ln1_g"], lp["ln1_b"], lp["attn"],
                n_heads=HEADS, t_real=T,
            )
        assert bool(jnp.all(jnp.isfinite(got.astype(jnp.float32))))


class TestFusedMLPBlock:
    def test_matches_composed_mlp_sublayer(self, layer):
        lp, x, _ = layer
        mlp_in = W._layer_norm(x, lp["ln2_g"], lp["ln2_b"])
        mlp_out = W._mlp(mlp_in, lp["mlp"])
        want = x + mlp_out
        flat = x.reshape(B * T, D)
        with pltpu.force_tpu_interpret_mode():
            got, got_in, got_out = pe.fused_mlp_block(
                flat, lp["ln2_g"], lp["ln2_b"], lp["mlp"], capture=True
            )
        np.testing.assert_allclose(
            got.reshape(B, T, D).astype(jnp.float32),
            want.astype(jnp.float32), atol=3e-2, rtol=0,
        )
        np.testing.assert_allclose(
            got_in.reshape(B, T, D).astype(jnp.float32),
            mlp_in.astype(jnp.float32), atol=1e-2, rtol=0,
        )
        np.testing.assert_allclose(
            got_out.reshape(B, T, D).astype(jnp.float32),
            mlp_out.astype(jnp.float32), atol=3e-2, rtol=0,
        )

    def test_single_output_mode(self, layer):
        lp, x, _ = layer
        flat = x.reshape(B * T, D)
        with pltpu.force_tpu_interpret_mode():
            got = pe.fused_mlp_block(
                flat, lp["ln2_g"], lp["ln2_b"], lp["mlp"], capture=False
            )
        assert got.shape == (B * T, D)

    @pytest.mark.parametrize("cap_dt", [jnp.bfloat16, jnp.float32])
    def test_final_ln_capture_matches_external_ln(self, layer, cap_dt):
        """final_ln=(g, b) emits ln_f(out) in-kernel, matching
        _layer_norm applied to the kernel's own bf16 output afterwards
        (the pre-fold extraction pipeline).

        Interpret mode carries bf16 intermediates at f32 precision, so
        the kernel's LN input (the residual sum before its store-
        rounding) can sit 1 bf16 ulp off the stored capture — this test
        pins values at the file's bf16 tolerance; BYTE-identity on real
        hardware (where the bf16 vector add rounds) is pinned by
        scripts/check_tpu_kernels.py check 4b."""
        lp, x, _ = layer
        rng = np.random.default_rng(9)
        fg = jnp.asarray(rng.standard_normal(D).astype(np.float32))
        fb = jnp.asarray(rng.standard_normal(D).astype(np.float32))
        flat = x.reshape(B * T, D)
        with pltpu.force_tpu_interpret_mode():
            out, cap, mi, mo = pe.fused_mlp_block(
                flat, lp["ln2_g"], lp["ln2_b"], lp["mlp"], capture=True,
                final_ln=(fg, fb), capture_dtype=cap_dt,
            )
        assert cap.dtype == cap_dt
        want = np.asarray(W._layer_norm(out.astype(cap_dt), fg, fb), np.float32)
        got = np.asarray(cap, np.float32)
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=0)

    def test_final_ln_without_capture(self, layer):
        lp, x, _ = layer
        flat = x.reshape(B * T, D)
        fg = lp["ln2_g"].astype(jnp.float32)
        fb = lp["ln2_b"].astype(jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out, cap = pe.fused_mlp_block(
                flat, lp["ln2_g"], lp["ln2_b"], lp["mlp"], capture=False,
                final_ln=(fg, fb),
            )
        assert out.shape == cap.shape == (B * T, D)


class TestFusedEncoderStack:
    def test_matches_composed_encoder_forward(self, layer):
        """Full fused stack (pad once -> attention+MLP kernels per layer ->
        slice) against the composed bf16 encoder_forward."""
        arch = W.WhisperArch(d_model=D, encoder_layers=2, decoder_layers=1,
                             num_heads=HEADS, ffn_dim=F)
        params = W.init_whisper(jax.random.PRNGKey(2), arch)
        p16 = jax.tree_util.tree_map(lambda a: a.astype(BF), params)
        x = (jax.random.normal(jax.random.PRNGKey(3), (B, T, D), jnp.float32)
             .astype(BF) * 0.5)
        # composed path
        def body(h, lp):
            h, mi, mo = W._encoder_layer(h, lp, HEADS)
            return h, (h, mi, mo)
        want_x, (want_layers, want_mi, want_mo) = jax.lax.scan(
            body, x, p16["encoder"]["layers"]
        )
        with pltpu.force_tpu_interpret_mode():
            got_x, got_layers, (got_mi, got_mo) = W._fused_encoder_layers(
                x, p16["encoder"], arch, with_mlp=True
            )
        for got, want in [(got_x, want_x), (got_layers, want_layers),
                          (got_mi, want_mi), (got_mo, want_mo)]:
            np.testing.assert_allclose(
                got.astype(jnp.float32), want.astype(jnp.float32),
                atol=6e-2, rtol=0,
            )

    def test_supported_gates_cpu(self):
        assert not pe.supported(1536, 384, 6)  # CPU backend in tests
        assert not pe.stem_supported(80, 3000, 384)


class TestFusedExtractActivations:
    def test_full_capture_dict_through_fused_path(self, monkeypatch):
        """extract_activations wiring with BOTH fused gates forced on
        (interpret mode): same keys/shapes/values as the composed bf16
        path — catches pad/slice/capture-threading regressions in CI."""
        arch = W.WhisperArch(d_model=D, encoder_layers=2, decoder_layers=1,
                             num_heads=HEADS, ffn_dim=F, n_mels=80,
                             max_source_positions=T, max_target_positions=8,
                             vocab_size=64, decoder_start_token_id=1,
                             eos_token_id=2)
        params = W.init_whisper(jax.random.PRNGKey(6), arch)
        mel = (jax.random.normal(jax.random.PRNGKey(7), (2, 80, 2 * T),
                                 jnp.float32) * 0.3)
        kw = dict(compute_dtype=BF, with_mlp=True, capture_dtype=BF)
        want = W.extract_activations(params, mel, arch, **kw)
        monkeypatch.setattr(W, "_use_fused_encoder", lambda *a: True)
        monkeypatch.setattr(
            pe, "supported", lambda *a: True
        )
        monkeypatch.setattr(pe, "stem_supported", lambda *a: True)
        with pltpu.force_tpu_interpret_mode():
            # bypass the jit cache (same static args would replay the
            # composed trace)
            got = W.extract_activations.__wrapped__(params, mel, arch, **kw)
        assert set(got) == set(want)
        for k in want:
            assert got[k].shape == want[k].shape, k
            np.testing.assert_allclose(
                np.asarray(got[k], np.float32), np.asarray(want[k], np.float32),
                atol=6e-2, err_msg=k,
            )


class TestFusedConvStem:
    def test_matches_xla_stem(self):
        """Shifted-matmul conv decomposition vs jax.lax.conv + GELU + pos."""
        arch = W.WhisperArch(d_model=D, encoder_layers=1, decoder_layers=1,
                             num_heads=HEADS, ffn_dim=F, n_mels=80,
                             max_source_positions=T)
        params = W.init_whisper(jax.random.PRNGKey(4), arch)
        enc16 = jax.tree_util.tree_map(
            lambda a: a.astype(BF), params["encoder"]
        )
        mel = (jax.random.normal(jax.random.PRNGKey(5), (B, 80, 2 * T),
                                 jnp.float32) * 0.3).astype(BF)
        dn = ("NCH", "OIH", "NCH")
        x = jax.lax.conv_general_dilated(
            mel, enc16["conv1_w"], (1,), [(1, 1)], dimension_numbers=dn
        ) + enc16["conv1_b"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        x = jax.lax.conv_general_dilated(
            x, enc16["conv2_w"], (2,), [(1, 1)], dimension_numbers=dn
        ) + enc16["conv2_b"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        want = x.transpose(0, 2, 1) + enc16["pos"][:T]
        with pltpu.force_tpu_interpret_mode():
            got = pe.fused_conv_stem(mel, enc16, T_PAD)
        assert got.shape == (B, T_PAD, D)
        np.testing.assert_allclose(
            got[:, :T].astype(jnp.float32), want.astype(jnp.float32),
            atol=3e-2, rtol=0,
        )
        assert bool(jnp.all(jnp.isfinite(got.astype(jnp.float32))))


class TestAttentionSupported:
    """VMEM gates for the fused attention block: tiny/base/small run the
    full (whole-sequence-live) kernel; medium/large exceed its measured
    spilled live set (171 MB scoped VMEM at d=1280 vs the 128 MB budget)
    and dispatch to the query-row-tiled variant instead."""

    def test_small_geometries_full_kernel(self):
        assert pe.attention_supported(1536, 384, 6)    # tiny
        assert pe.attention_supported(1536, 512, 8)    # base
        assert pe.attention_supported(1536, 768, 12)   # small

    def test_large_geometries_route_to_tiled(self):
        for d, h in ((1024, 16), (1280, 20)):  # medium, large
            assert not pe.attention_supported(1536, d, h)
            assert pe._pick_attention_tq(1536, d) is not None
            assert pe.attention_block_available(1536, d, h)

    def test_tiled_kernel_matches_composed(self, layer, monkeypatch):
        """The row-tiled body must reproduce the composed sublayer with
        MULTIPLE tiles engaged (tq forced to half of T_PAD2)."""
        lp, x, arch = layer
        t_pad2 = 2 * T_PAD
        monkeypatch.setenv("WST_ATTENTION_TQ", str(T_PAD))
        monkeypatch.setattr(pe, "attention_supported", lambda *a: False)
        ln = W._layer_norm(x, lp["ln1_g"], lp["ln1_b"])
        want = x + W._attention(ln, ln, lp["attn"], HEADS, causal=False)
        xp = jnp.pad(x, ((0, 0), (0, t_pad2 - T), (0, 0)))
        with pltpu.force_tpu_interpret_mode():
            got = pe.fused_attention_block(
                xp, lp["ln1_g"], lp["ln1_b"], lp["attn"],
                n_heads=HEADS, t_real=T,
            )
        assert got.shape == (B, t_pad2, D)
        np.testing.assert_allclose(
            got[:, :T].astype(jnp.float32), want.astype(jnp.float32),
            atol=3e-2, rtol=0,
        )
        assert bool(jnp.all(jnp.isfinite(got.astype(jnp.float32))))
