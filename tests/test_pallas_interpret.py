"""CPU guard for the fused Pallas kernels via interpret mode.

The real kernels are TPU-gated (``pallas_sae.supported`` rejects CPU), so
the unit suite never exercises them; ``scripts/check_tpu_kernels.py``
verifies them on-chip.  These tests run the SAME kernel bodies through
``pltpu.force_tpu_interpret_mode`` against the composed bf16 XLA paths,
so kernel-body regressions are caught in CI without a chip.  Small
shapes: interpret mode executes the grid serially on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from whisper_sae_tpu.ops import pallas_sae as ps
from whisper_sae_tpu.ops.topk import topk_threshold

B, D, H, K = 32, 128, 256, 8
BLOCK = 8
BF = jnp.bfloat16


@pytest.fixture
def data():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32)
    return x, y


def _params(seed: int, with_skip: bool = False, b_pre: bool = False):
    keys = jax.random.split(jax.random.PRNGKey(seed), 6)
    p = {
        "w_enc": jax.random.normal(keys[0], (D, H)) * 0.2,
        "b_enc": jax.random.normal(keys[1], (H,)) * 0.05,
        "w_dec": jax.random.normal(keys[2], (H, D)) * 0.2,
        "b_dec": jax.random.normal(keys[3], (D,)) * 0.05,
    }
    if with_skip:
        p["w_skip"] = jax.random.normal(keys[4], (D, D)) * 0.1
        p["b_skip"] = jax.random.normal(keys[5], (D,)) * 0.05
    if b_pre:
        p["b_pre"] = jax.random.normal(keys[4], (D,)) * 0.05
    return p


def _xla_mask(pre, k):
    xi, th = topk_threshold(pre, k)
    return jnp.where(xi >= th, jax.nn.relu(pre), 0.0)


def _bf_dot(a, b):
    return jnp.dot(a.astype(BF), b.astype(BF), preferred_element_type=jnp.float32)


class TestFusedSAELoss:
    def test_matches_composed_amp_path(self, data):
        x, _ = data
        p = _params(1, b_pre=True)

        with pltpu.force_tpu_interpret_mode():
            loss, l0, active = ps.fused_sae_loss(
                x, p["w_enc"], p["b_enc"], p["b_pre"], p["w_dec"], p["b_dec"],
                K, BLOCK,
            )

        pre = _bf_dot(x - p["b_pre"], p["w_enc"]) + p["b_enc"]
        hidden = _xla_mask(pre, K).astype(BF)
        recon = _bf_dot(hidden, p["w_dec"]) + p["b_dec"] + p["b_pre"]
        want = jnp.mean(jnp.square(recon - x))
        np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)
        assert float(l0) == float(jnp.mean(jnp.sum(hidden > 0, axis=-1)))
        np.testing.assert_array_equal(
            np.asarray(active), np.asarray(jnp.any(hidden > 0, axis=0))
        )


class TestGlobalPrecisionImmunity:
    """The kernels pin precision=_MXU (Precision.DEFAULT) on every dot:
    a global jax_default_matmul_precision override must neither crash the
    trace (on chip, Mosaic rejects fp32 contract precision on bf16
    operands — the round-5 Q4a amp-mode failure) nor change kernel
    numerics."""

    def test_fused_losses_bit_identical_under_global_highest(self, data):
        x, y = data
        p = _params(1, b_pre=True)

        def run():
            with pltpu.force_tpu_interpret_mode():
                sae = ps.fused_sae_loss(
                    x, p["w_enc"], p["b_enc"], p["b_pre"], p["w_dec"],
                    p["b_dec"], K, BLOCK,
                )
                relu = ps.fused_relu_sae_loss(
                    x, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"],
                    np.float32(3e-4), BLOCK,
                )
            return [np.asarray(v) for v in (*sae, *relu[:2])]

        base = run()
        prev = jax.config.jax_default_matmul_precision
        try:
            jax.config.update("jax_default_matmul_precision", "highest")
            override = run()
        finally:
            jax.config.update("jax_default_matmul_precision", prev)
        for a, b in zip(base, override):
            np.testing.assert_array_equal(a, b)


class TestIndexedFusedLoss:
    """fused_sae_loss_indexed reads its batch window from the epoch buffer
    via scalar prefetch; per window it must match fused_sae_loss on the
    explicit slice — loss, metrics, and every parameter gradient — both
    standalone and as a lax.scan over the step index (the trainer's
    indexed-epoch shape, trainer.py:_build_epoch_indexed_fn)."""

    def test_matches_sliced_fused_loss_with_grads(self, data, monkeypatch):
        monkeypatch.setenv("WST_SAE_XC", "1")  # slice path persists xc too
        x, y = data
        buf = jnp.concatenate([x, y])  # [2B, D] epoch buffer, 2 windows
        p = _params(1, b_pre=True)

        def loss_idx(p, step):
            with pltpu.force_tpu_interpret_mode():
                return ps.fused_sae_loss_indexed(
                    buf, step, p["w_enc"], p["b_enc"], p["b_pre"],
                    p["w_dec"], p["b_dec"], K, BLOCK, B,
                )[0]

        def loss_slice(p, rows):
            with pltpu.force_tpu_interpret_mode():
                return ps.fused_sae_loss(
                    rows, p["w_enc"], p["b_enc"], p["b_pre"], p["w_dec"],
                    p["b_dec"], K, BLOCK,
                )[0]

        for step, rows in ((0, x), (1, y)):
            l_i, g_i = jax.value_and_grad(loss_idx)(p, jnp.int32(step))
            l_s, g_s = jax.value_and_grad(loss_slice)(p, rows)
            assert float(l_i) == float(l_s)
            for key in g_s:
                np.testing.assert_array_equal(
                    np.asarray(g_i[key]), np.asarray(g_s[key]),
                    err_msg=f"step {step}: {key}",
                )

    @pytest.mark.parametrize("family", ["transcoder", "skip", "relu", "relu_cc", "topk_cc"])
    def test_coder_indexed_matches_sliced(self, data, monkeypatch, family):
        """Each coder family's indexed wrapper must match its sliced
        wrapper bit-for-bit (loss + every parameter gradient) per window."""
        monkeypatch.setenv("WST_SAE_XC", "1")  # sliced path persists xc too
        x, y = data
        p = _params(3, with_skip=(family == "skip"))
        zero = jnp.zeros((), jnp.float32)
        xbuf = jnp.concatenate([x, y])
        ybuf = jnp.concatenate([y, x])

        def loss_idx(p, step):
            with pltpu.force_tpu_interpret_mode():
                if family in ("transcoder", "skip"):
                    return ps.fused_transcoder_loss_indexed(
                        xbuf, ybuf, step, p["w_enc"], p["b_enc"], p["w_dec"],
                        p["b_dec"], p.get("w_skip", zero), p.get("b_skip", zero),
                        K, BLOCK, B, family == "skip",
                    )[0]
                if family == "topk_cc":
                    return ps.fused_transcoder_loss_indexed(
                        xbuf, xbuf, step, p["w_enc"], p["b_enc"], p["w_dec"],
                        p["b_dec"], zero, zero, K, BLOCK, B, False, True,
                    )[0]
                if family == "relu":
                    return ps.fused_relu_sae_loss_indexed(
                        xbuf, step, p["w_enc"], p["b_enc"], p["w_dec"],
                        p["b_dec"], 0.01, BLOCK, B,
                    )[0]
                norms = jnp.sqrt(jnp.sum(jnp.square(p["w_dec"]), axis=1))
                return ps.fused_relu_crosscoder_loss_indexed(
                    xbuf, step, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"],
                    norms, 0.01, 4, BLOCK, B,
                )[0]

        def loss_slice(p, rows, targets):
            with pltpu.force_tpu_interpret_mode():
                if family in ("transcoder", "skip"):
                    return ps.fused_transcoder_loss(
                        rows, targets, p["w_enc"], p["b_enc"], p["w_dec"],
                        p["b_dec"], p.get("w_skip", zero), p.get("b_skip", zero),
                        K, BLOCK, family == "skip",
                    )[0]
                if family == "topk_cc":
                    return ps.fused_transcoder_loss(
                        rows, rows, p["w_enc"], p["b_enc"], p["w_dec"],
                        p["b_dec"], zero, zero, K, BLOCK, False, True,
                    )[0]
                if family == "relu":
                    return ps.fused_relu_sae_loss(
                        rows, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"],
                        0.01, BLOCK,
                    )[0]
                norms = jnp.sqrt(jnp.sum(jnp.square(p["w_dec"]), axis=1))
                return ps.fused_relu_crosscoder_loss(
                    rows, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"],
                    norms, 0.01, 4, BLOCK,
                )[0]

        for step in range(2):
            rows = (x, y)[step]
            targets = (y, x)[step]
            l_i, g_i = jax.value_and_grad(loss_idx)(p, jnp.int32(step))
            l_s, g_s = jax.value_and_grad(loss_slice)(p, rows, targets)
            assert float(l_i) == float(l_s), (family, step)
            for key in g_s:
                np.testing.assert_array_equal(
                    np.asarray(g_i[key]), np.asarray(g_s[key]),
                    err_msg=f"{family} step {step}: {key}",
                )

    def test_scan_over_steps_matches_per_window_calls(self, data):
        x, y = data
        buf = jnp.concatenate([x, y])
        p = _params(2, b_pre=True)

        def one(step):
            with pltpu.force_tpu_interpret_mode():
                loss, l0, active = ps.fused_sae_loss_indexed(
                    buf, step, p["w_enc"], p["b_enc"], p["b_pre"],
                    p["w_dec"], p["b_dec"], K, BLOCK, B,
                )
            return loss, l0, active

        def body(carry, step):
            loss, l0, active = one(step)
            return carry, (loss, l0)

        _, (losses, l0s) = jax.lax.scan(
            body, 0, jnp.arange(2, dtype=jnp.int32)
        )
        for step in range(2):
            want_loss, want_l0, _ = one(jnp.int32(step))
            assert float(losses[step]) == float(want_loss)
            assert float(l0s[step]) == float(want_l0)


class TestXCResidualPath:
    """WST_SAE_XC=1 stores the kernel's centered bf16 rows as a VJP
    residual (the backward then never re-reads the f32 batch).  The two
    paths compute (f32(x) - b_pre).astype(bf16) with identical bits, so
    loss AND every gradient must match exactly."""

    @pytest.mark.parametrize("row_dtype", [jnp.float32, BF])
    def test_grads_bit_identical(self, data, monkeypatch, row_dtype):
        x, _ = data
        x = x.astype(row_dtype)
        p = _params(1, b_pre=True)

        def loss(p, rows):
            with pltpu.force_tpu_interpret_mode():
                return ps.fused_sae_loss(
                    rows, p["w_enc"], p["b_enc"], p["b_pre"], p["w_dec"],
                    p["b_dec"], K, BLOCK,
                )[0]

        monkeypatch.delenv("WST_SAE_XC", raising=False)
        l_ref, g_ref = jax.value_and_grad(loss)(p, x)
        monkeypatch.setenv("WST_SAE_XC", "1")
        l_xc, g_xc = jax.value_and_grad(loss)(p, x)
        assert float(l_ref) == float(l_xc)
        for key in g_ref:
            np.testing.assert_array_equal(
                np.asarray(g_ref[key]), np.asarray(g_xc[key]), err_msg=key
            )

    @pytest.mark.parametrize("family", ["transcoder", "skip", "relu", "relu_cc"])
    def test_coder_families_bit_identical(self, data, monkeypatch, family):
        x, y = data
        p = _params(2, with_skip=(family == "skip"))
        zero = jnp.zeros((), jnp.float32)

        def loss(p, rows, targets):
            with pltpu.force_tpu_interpret_mode():
                if family in ("transcoder", "skip"):
                    return ps.fused_transcoder_loss(
                        rows, targets, p["w_enc"], p["b_enc"], p["w_dec"],
                        p["b_dec"], p.get("w_skip", zero), p.get("b_skip", zero),
                        K, BLOCK, family == "skip",
                    )[0]
                if family == "relu":
                    return ps.fused_relu_sae_loss(
                        rows, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"],
                        0.01, BLOCK,
                    )[0]
                norms = jnp.sqrt(jnp.sum(jnp.square(p["w_dec"]), axis=1))
                return ps.fused_relu_crosscoder_loss(
                    rows, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"],
                    norms, 0.01, 4, BLOCK,
                )[0]

        monkeypatch.delenv("WST_SAE_XC", raising=False)
        l_ref, g_ref = jax.value_and_grad(loss)(p, x, y)
        monkeypatch.setenv("WST_SAE_XC", "1")
        l_xc, g_xc = jax.value_and_grad(loss)(p, x, y)
        assert float(l_ref) == float(l_xc)
        for key in g_ref:
            np.testing.assert_array_equal(
                np.asarray(g_ref[key]), np.asarray(g_xc[key]), err_msg=key
            )


class TestBF16RowInputs:
    """Out-of-core chunks may stage bf16; the kernels must accept bf16
    rows with semantics equal to feeding the same (bf16-rounded) values
    as f32, and the VJP must return cotangents in the input dtype."""

    def test_sae_loss_bf16_rows(self, data):
        x, _ = data
        xb = x.astype(BF)
        p = _params(1, b_pre=True)
        with pltpu.force_tpu_interpret_mode():
            loss_b, l0_b, act_b = ps.fused_sae_loss(
                xb, p["w_enc"], p["b_enc"], p["b_pre"], p["w_dec"], p["b_dec"],
                K, BLOCK,
            )
            loss_f, l0_f, act_f = ps.fused_sae_loss(
                xb.astype(jnp.float32), p["w_enc"], p["b_enc"], p["b_pre"],
                p["w_dec"], p["b_dec"], K, BLOCK,
            )
        np.testing.assert_allclose(float(loss_b), float(loss_f), rtol=1e-6)
        assert float(l0_b) == float(l0_f)
        np.testing.assert_array_equal(np.asarray(act_b), np.asarray(act_f))

    def test_transcoder_bf16_rows_grads(self, data):
        x, y = data
        xb, yb = x.astype(BF), y.astype(BF)
        p = _params(2)
        zero = jnp.zeros((), jnp.float32)

        def loss(p, rows, targets):
            with pltpu.force_tpu_interpret_mode():
                return ps.fused_transcoder_loss(
                    rows, targets, p["w_enc"], p["b_enc"], p["w_dec"],
                    p["b_dec"], zero, zero, K, BLOCK, False,
                )[0]

        gb = jax.grad(loss)(p, xb, yb)
        gf = jax.grad(loss)(p, xb.astype(jnp.float32), yb.astype(jnp.float32))
        for key in gf:
            np.testing.assert_allclose(
                np.asarray(gb[key]), np.asarray(gf[key]), atol=1e-6, err_msg=key
            )


class TestFusedTranscoderLoss:
    @pytest.mark.parametrize("use_skip", [False, True])
    def test_matches_composed_amp_path(self, data, use_skip):
        x, y = data
        p = _params(2, with_skip=use_skip)
        zero = jnp.zeros((), jnp.float32)

        with pltpu.force_tpu_interpret_mode():
            loss, l0, active, resid, hid = ps.fused_transcoder_loss(
                x, y, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"],
                p.get("w_skip", zero), p.get("b_skip", zero), K, BLOCK, use_skip,
            )

        pre = _bf_dot(x, p["w_enc"]) + p["b_enc"]
        hidden = _xla_mask(pre, K).astype(BF)
        pred = _bf_dot(hidden, p["w_dec"]) + p["b_dec"]
        if use_skip:
            pred = pred + _bf_dot(x, p["w_skip"]) + p["b_skip"]
        want = jnp.mean(jnp.square(pred - y))
        np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)
        assert float(l0) == float(jnp.mean(jnp.sum(hidden > 0, axis=-1)))
        np.testing.assert_allclose(
            np.asarray(resid), np.asarray(pred - y), atol=1e-5
        )

    def test_gradients_match_composed_path(self, data):
        x, y = data
        p = _params(3)
        zero = jnp.zeros((), jnp.float32)

        def loss_fused(p):
            with pltpu.force_tpu_interpret_mode():
                return ps.fused_transcoder_loss(
                    x, y, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"],
                    zero, zero, K, BLOCK, False,
                )[0]

        def loss_xla(p):
            pre = _bf_dot(x, p["w_enc"]) + p["b_enc"]
            hidden = _xla_mask(pre, K)
            pred = _bf_dot(hidden, p["w_dec"]) + p["b_dec"]
            return jnp.mean(jnp.square(pred - y))

        gf = jax.grad(loss_fused)(p)
        gx = jax.grad(loss_xla)(p)
        for key in gx:
            f, w = np.asarray(gf[key]), np.asarray(gx[key])
            scale = np.abs(w).max() + 1e-12
            np.testing.assert_allclose(f / scale, w / scale, atol=5e-3)


class TestAuxOutputCotangents:
    """Gradients THROUGH the kernels' auxiliary outputs (resid/hidden for
    the transcoder, component losses for the ReLU SAE) must match the
    composed path — analysis code differentiates these, not just the
    scalar loss."""

    def test_transcoder_resid_and_hidden_grads(self, data):
        x, y = data
        p = _params(5)
        zero = jnp.zeros((), jnp.float32)

        def f_fused(p):
            with pltpu.force_tpu_interpret_mode():
                loss, l0, act, resid, hid = ps.fused_transcoder_loss(
                    x, y, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"],
                    zero, zero, K, BLOCK, False,
                )
            return jnp.sum(resid**2) + jnp.sum(hid.astype(jnp.float32) ** 2)

        def f_xla(p):
            pre = _bf_dot(x, p["w_enc"]) + p["b_enc"]
            hid = _xla_mask(pre, K).astype(BF)
            pred = _bf_dot(hid, p["w_dec"]) + p["b_dec"]
            return jnp.sum((pred - y) ** 2) + jnp.sum(hid.astype(jnp.float32) ** 2)

        gf, gx = jax.grad(f_fused)(p), jax.grad(f_xla)(p)
        for key in gx:
            f, w = np.asarray(gf[key]), np.asarray(gx[key])
            scale = np.abs(w).max() + 1e-12
            np.testing.assert_allclose(f / scale, w / scale, atol=5e-3, err_msg=key)

    def test_relu_component_loss_grads(self, data):
        x, _ = data
        p = _params(6)
        sw = 0.01

        def f_fused(p):
            with pltpu.force_tpu_interpret_mode():
                out = ps.fused_relu_sae_loss(
                    x, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"], sw, BLOCK
                )
            # recon_loss + 3*sparsity: distinct coefficients exercise the
            # per-component cotangent combination
            return out[1] + 3.0 * out[2]

        def f_xla(p):
            pre = _bf_dot(x, p["w_enc"]) + p["b_enc"]
            hidden = jax.nn.relu(pre)
            recon = _bf_dot(hidden, p["w_dec"]) + p["b_dec"]
            return jnp.mean(jnp.square(recon - x)) + 3.0 * jnp.mean(jnp.abs(hidden))

        gf, gx = jax.grad(f_fused)(p), jax.grad(f_xla)(p)
        for key in gx:
            f, w = np.asarray(gf[key]), np.asarray(gx[key])
            scale = np.abs(w).max() + 1e-12
            np.testing.assert_allclose(f / scale, w / scale, atol=5e-3, err_msg=key)


class TestFusedReluCrosscoderLoss:
    """ReLU crosscoder on the flattened view: decoder-norm-weighted L1
    semantics and the d(norm)/d(w_dec) VJP term (through the explicit
    ``norms`` input) must match the composed path (VERDICT round-2 #4 —
    the last coder family to be fused)."""

    L = 2  # D = L * 64 lanes per layer -> flattened L*D = 128

    def _cc_params(self, seed):
        d_layer = D // self.L
        keys = jax.random.split(jax.random.PRNGKey(seed), 4)
        return {
            "w_enc": jax.random.normal(keys[0], (self.L, d_layer, H)) * 0.2,
            "b_enc": jax.random.normal(keys[1], (H,)) * 0.05,
            "w_dec": jax.random.normal(keys[2], (H, self.L, d_layer)) * 0.2,
            "b_dec": jax.random.normal(keys[3], (self.L, d_layer)) * 0.05,
        }

    def _composed(self, p, acts, sw):
        # reference semantics (crosscoder.py:204-219) on [L, B, D] acts,
        # with the AMP path's bf16 matmuls
        from whisper_sae_tpu.models.crosscoder import decoder_norms

        l, b, d = acts.shape
        pre = jnp.einsum(
            "lbd,lds->bs", acts.astype(BF), p["w_enc"].astype(BF),
            preferred_element_type=jnp.float32,
        ) + p["b_enc"]
        hidden = jax.nn.relu(pre).astype(BF)
        recon = jnp.einsum(
            "bs,sld->lbd", hidden, p["w_dec"].astype(BF),
            preferred_element_type=jnp.float32,
        ) + p["b_dec"][:, None, :]
        recon_loss = jnp.sum(jnp.mean(jnp.square(recon - acts), axis=(1, 2)))
        sparsity = jnp.mean(
            jnp.abs(hidden.astype(jnp.float32)) @ decoder_norms(p)
        )
        return recon_loss + sw * sparsity, recon_loss, sparsity, hidden

    def _fused(self, p, acts, sw):
        from whisper_sae_tpu.models.crosscoder import decoder_norms

        l, b, d = acts.shape
        x2d = acts.transpose(1, 0, 2).reshape(b, l * d)
        with pltpu.force_tpu_interpret_mode():
            return ps.fused_relu_crosscoder_loss(
                x2d,
                p["w_enc"].reshape(l * d, H),
                p["b_enc"],
                p["w_dec"].reshape(H, l * d),
                p["b_dec"].reshape(l * d),
                decoder_norms(p),
                sw, l, BLOCK,
            )

    def test_matches_composed_amp_path(self):
        p = self._cc_params(7)
        acts = jax.random.normal(
            jax.random.PRNGKey(8), (self.L, B, D // self.L), jnp.float32
        )
        sw = 0.02
        loss, recon_loss, sparsity, l0, active = self._fused(p, acts, sw)
        want_loss, want_recon, want_sp, hidden = self._composed(p, acts, sw)
        np.testing.assert_allclose(float(recon_loss), float(want_recon), rtol=1e-5)
        np.testing.assert_allclose(float(sparsity), float(want_sp), rtol=2e-5)
        np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
        assert float(l0) == float(jnp.mean(jnp.sum(hidden > 0, axis=-1)))
        np.testing.assert_array_equal(
            np.asarray(active), np.asarray(jnp.any(hidden > 0, axis=0))
        )

    def test_gradients_match_composed_path(self):
        p = self._cc_params(9)
        acts = jax.random.normal(
            jax.random.PRNGKey(10), (self.L, B, D // self.L), jnp.float32
        )
        sw = 0.02

        def f_fused(p):
            out = self._fused(p, acts, sw)
            # loss + 2*sparsity exercises the component cotangents AND the
            # norm-path w_dec term twice over
            return out[0] + 2.0 * out[2]

        def f_xla(p):
            loss, _, sp, _ = self._composed(p, acts, sw)
            return loss + 2.0 * sp

        gf, gx = jax.grad(f_fused)(p), jax.grad(f_xla)(p)
        for key in gx:
            f, w = np.asarray(gf[key]), np.asarray(gx[key])
            scale = np.abs(w).max() + 1e-12
            # 8e-3: the composed einsum path rounds bf16 at slightly
            # different points than the flattened-matmul kernel path
            np.testing.assert_allclose(f / scale, w / scale, atol=8e-3, err_msg=key)


class TestFusedReluSAELoss:
    def test_matches_composed_amp_path(self, data):
        x, _ = data
        p = _params(4)
        sw = 0.01

        with pltpu.force_tpu_interpret_mode():
            loss, recon_loss, sparsity, l0, active = ps.fused_relu_sae_loss(
                x, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"], sw, BLOCK
            )

        pre = _bf_dot(x, p["w_enc"]) + p["b_enc"]
        hidden = jax.nn.relu(pre)
        recon = _bf_dot(hidden, p["w_dec"]) + p["b_dec"]
        want_recon = jnp.mean(jnp.square(recon - x))
        want_sparsity = jnp.mean(jnp.abs(hidden))
        np.testing.assert_allclose(float(recon_loss), float(want_recon), rtol=1e-5)
        np.testing.assert_allclose(float(sparsity), float(want_sparsity), rtol=1e-5)
        np.testing.assert_allclose(
            float(loss), float(want_recon + sw * want_sparsity), rtol=1e-5
        )
        assert float(l0) == float(jnp.mean(jnp.sum(hidden > 0, axis=-1)))
