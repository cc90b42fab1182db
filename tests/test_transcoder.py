"""Transcoder tests (contracts of /root/reference/tests/test_transcoder.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from whisper_sae_tpu.models.transcoder import (
    SkipTranscoder,
    TopKTranscoder,
    TranscoderOutput,
    create_transcoder,
    transcoder_loss,
)

DIN, DOUT, H, K = 32, 48, 128, 8


@pytest.fixture
def xy(rng):
    x = jnp.asarray(rng.standard_normal((16, DIN)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((16, DOUT)), jnp.float32)
    return x, y


class TestTopKTranscoder:
    def test_shapes_with_different_dims(self, xy):
        tc = TopKTranscoder(DIN, DOUT, H, k=K, seed=0)
        out = tc(*xy)
        assert isinstance(out, TranscoderOutput)
        assert out.predicted.shape == (16, DOUT)
        assert out.hidden.shape == (16, H)

    def test_k_sparsity(self, xy):
        tc = TopKTranscoder(DIN, DOUT, H, k=K, seed=0)
        out = tc(*xy)
        assert (np.asarray((out.hidden > 0).sum(-1)) <= K).all()
        assert float(out.l0) <= K

    def test_loss_is_mse_vs_target(self, xy):
        tc = TopKTranscoder(DIN, DOUT, H, k=K, seed=0)
        x, y = xy
        out = tc(x, y)
        mse = float(jnp.mean(jnp.square(out.predicted - y)))
        assert float(out.loss) == pytest.approx(mse, rel=1e-5)
        assert float(out.sparsity_loss) == 0.0

    def test_decoder_init_norm(self):
        tc = TopKTranscoder(DIN, DOUT, H, k=K, seed=0)
        norms = np.linalg.norm(np.asarray(tc.params["w_dec"]), axis=1)
        np.testing.assert_allclose(norms, 0.1, rtol=1e-5)

    def test_dead_tracking(self, xy):
        tc = TopKTranscoder(DIN, DOUT, H, k=K, seed=0)
        tc(*xy)
        assert tc.step_count == 1
        tc.eval()
        tc(*xy)
        assert tc.step_count == 1

    def test_gradient_flow(self, xy):
        tc = TopKTranscoder(DIN, DOUT, H, k=K, seed=0)
        x, y = xy
        grads = jax.grad(lambda p: transcoder_loss(p, x, y, K)[0])(tc.params)
        for name in ("w_enc", "b_enc", "w_dec", "b_dec"):
            assert np.abs(np.asarray(grads[name])).sum() > 0, name

    def test_resample_sets_decoder_to_residual_direction(self, rng):
        tc = TopKTranscoder(DIN, DOUT, H, k=K, dead_feature_threshold=5, seed=0)
        tc.state = tc.state._replace(step_count=jnp.asarray(1000, jnp.int32))
        x = jnp.asarray(rng.standard_normal((64, DIN)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((64, DOUT)), jnp.float32)
        n = tc.resample_dead_features(x, y, num_resample=8)
        assert n == 8
        w_dec = np.asarray(tc.params["w_dec"])
        w_enc = np.asarray(tc.params["w_enc"])
        resampled = np.where(np.asarray(tc.state.feature_last_activated) == 1000)[0]
        for i in resampled:
            np.testing.assert_allclose(np.linalg.norm(w_dec[i]), 1.0, rtol=1e-4)
            np.testing.assert_allclose(np.linalg.norm(w_enc[:, i]), 1.0, rtol=1e-4)
            # decoder direction is a residual direction, NOT the input dir
            assert not np.allclose(w_dec[i][:DIN], w_enc[:, i], atol=1e-3)


class TestSkipTranscoder:
    def test_zero_init(self):
        tc = SkipTranscoder(DIN, DOUT, H, k=K, seed=0)
        assert float(jnp.abs(tc.params["w_dec"]).max()) == 0.0
        assert float(jnp.abs(tc.params["w_skip"]).max()) == 0.0
        assert float(jnp.abs(tc.params["b_skip"]).max()) == 0.0

    def test_starts_as_constant_function(self, xy):
        tc = SkipTranscoder(DIN, DOUT, H, k=K, seed=0)
        x, y = xy
        out = tc(x, y)
        np.testing.assert_allclose(np.asarray(out.predicted), 0.0, atol=1e-6)

    def test_set_output_bias(self, xy):
        tc = SkipTranscoder(DIN, DOUT, H, k=K, seed=0)
        x, y = xy
        mean_out = jnp.mean(y, axis=0)
        tc.set_output_bias(mean_out)
        out = tc(x, y)
        np.testing.assert_allclose(
            np.asarray(out.predicted), np.tile(np.asarray(mean_out), (16, 1)), atol=1e-6
        )

    def test_forward_is_sparse_plus_skip(self, rng, xy):
        tc = SkipTranscoder(DIN, DOUT, H, k=K, seed=0)
        x, y = xy
        tc.params = {
            **tc.params,
            "w_dec": jnp.asarray(rng.standard_normal((H, DOUT)), jnp.float32) * 0.1,
            "w_skip": jnp.asarray(rng.standard_normal((DIN, DOUT)), jnp.float32) * 0.1,
        }
        out = tc(x, y)
        manual = tc.decode(tc.encode(x)) + tc.skip(x)
        np.testing.assert_allclose(np.asarray(out.predicted), np.asarray(manual), atol=1e-4)

    def test_skip_r2_on_linear_map(self, rng):
        x = jnp.asarray(rng.standard_normal((128, DIN)), jnp.float32)
        A = jnp.asarray(rng.standard_normal((DIN, DOUT)), jnp.float32) * 0.3
        y = x @ A
        tc = SkipTranscoder(DIN, DOUT, H, k=K, seed=0)
        tc.params = {**tc.params, "w_skip": A}
        r2 = tc.get_skip_contribution(x, y)
        assert r2 == pytest.approx(1.0, abs=1e-4)

    def test_grads_through_both_paths(self, rng, xy):
        tc = SkipTranscoder(DIN, DOUT, H, k=K, seed=0)
        # zero decoder blocks encoder grads by construction; perturb it
        tc.params = {
            **tc.params,
            "w_dec": jnp.asarray(rng.standard_normal((H, DOUT)), jnp.float32) * 0.1,
        }
        x, y = xy
        grads = jax.grad(lambda p: transcoder_loss(p, x, y, K)[0])(tc.params)
        assert np.abs(np.asarray(grads["w_skip"])).sum() > 0
        assert np.abs(np.asarray(grads["w_enc"])).sum() > 0

    def test_skip_beats_plain_on_linear_map(self, rng):
        # Reference test_transcoder.py:422-467: on y = Ax, the skip
        # transcoder should reach much lower loss than the plain one.
        x = jnp.asarray(rng.standard_normal((256, DIN)), jnp.float32)
        A = jnp.asarray(rng.standard_normal((DIN, DOUT)), jnp.float32) * 0.5
        y = x @ A

        def train(params, use_skip):
            opt = optax.adam(3e-3)
            ost = opt.init(params)

            @jax.jit
            def step(p, o):
                l, g = jax.value_and_grad(
                    lambda q: transcoder_loss(q, x, y, K, use_skip=use_skip)[0]
                )(p)
                u, o = opt.update(g, o, p)
                return optax.apply_updates(p, u), o, l

            for _ in range(200):
                params, ost, loss = step(params, ost)
            return float(loss)

        skip_loss = train(SkipTranscoder(DIN, DOUT, H, k=K, seed=0).params, True)
        plain_loss = train(TopKTranscoder(DIN, DOUT, H, k=K, seed=0).params, False)
        assert skip_loss < plain_loss * 0.5


class TestFactory:
    def test_skip_default(self):
        tc = create_transcoder(DIN, DOUT, H)
        assert isinstance(tc, SkipTranscoder)
        assert tc.k == 32

    def test_plain(self):
        tc = create_transcoder(DIN, DOUT, H, k=4, use_skip=False)
        assert isinstance(tc, TopKTranscoder)
        assert tc.k == 4

    def test_kwargs_threading(self):
        tc = create_transcoder(DIN, DOUT, H, dead_feature_threshold=99)
        assert tc.dead_feature_threshold == 99
