"""Crosscoder tests (contracts of /root/reference/tests/test_crosscoder.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from whisper_sae_tpu.models.crosscoder import (
    CrossLayerCrosscoder,
    CrosscoderOutput,
    TopKCrossLayerCrosscoder,
    create_crosscoder,
    crosscoder_loss,
    normalize_crosscoder_decoder,
)

D, L, S = 32, 3, 128


@pytest.fixture
def acts(rng):
    return {
        i: jnp.asarray(rng.standard_normal((16, D)), jnp.float32) for i in range(L)
    }


class TestWeights:
    def test_shapes(self):
        cc = CrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, seed=0)
        assert cc.W_enc.shape == (L, D, S)
        assert cc.W_dec.shape == (S, L, D)
        assert cc.params["b_enc"].shape == (S,)
        assert cc.params["b_dec"].shape == (L, D)

    def test_decoder_init_flat_norm(self):
        cc = CrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, seed=0)
        flat = np.asarray(cc.W_dec).reshape(S, -1)
        np.testing.assert_allclose(np.linalg.norm(flat, axis=1), 0.1, rtol=1e-5)

    def test_encoder_is_decoder_transpose(self):
        cc = CrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, seed=0)
        for l in range(L):
            np.testing.assert_allclose(
                np.asarray(cc.W_enc[l]), np.asarray(cc.W_dec[:, l, :]).T, atol=1e-7
            )

    def test_normalize_decoder(self):
        cc = CrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, seed=0)
        cc.params = {**cc.params, "w_dec": cc.params["w_dec"] * 7.0}
        cc.normalize_decoder_weights()
        flat = np.asarray(cc.W_dec).reshape(S, -1)
        np.testing.assert_allclose(np.linalg.norm(flat, axis=1), 1.0, rtol=1e-5)


class TestForward:
    def test_encode_sums_layer_contributions(self, acts):
        cc = CrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, seed=0)
        pre_manual = np.asarray(cc.params["b_enc"]).copy()
        pre_manual = sum(
            np.asarray(acts[l]) @ np.asarray(cc.W_enc[l]) for l in range(L)
        ) + np.asarray(cc.params["b_enc"])
        hidden = np.asarray(cc.encode(acts))
        np.testing.assert_allclose(hidden, np.maximum(pre_manual, 0), atol=1e-4)

    def test_output_contract(self, acts):
        cc = CrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, seed=0)
        out = cc(acts)
        assert isinstance(out, CrosscoderOutput)
        assert set(out.reconstructed) == {0, 1, 2}
        assert out.reconstructed[0].shape == (16, D)
        assert set(out.per_layer_loss) == {0, 1, 2}

    def test_loss_decomposition(self, acts):
        cc = CrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, sparsity_weight=0.05, seed=0)
        out = cc(acts)
        recon_sum = sum(float(v) for v in out.per_layer_loss.values())
        assert float(out.reconstruction_loss) == pytest.approx(recon_sum, rel=1e-5)
        assert float(out.loss) == pytest.approx(
            recon_sum + 0.05 * float(out.sparsity_loss), rel=1e-5
        )

    def test_sparsity_is_decoder_norm_weighted(self, acts):
        cc = CrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, seed=0)
        out = cc(acts)
        norms = np.asarray(cc.get_decoder_norms())
        manual = float(np.mean(np.abs(np.asarray(out.hidden)) @ norms))
        assert float(out.sparsity_loss) == pytest.approx(manual, rel=1e-4)

    def test_per_layer_loss_is_mse(self, acts):
        cc = CrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, seed=0)
        out = cc(acts)
        for l in range(L):
            manual = float(
                jnp.mean(jnp.square(out.reconstructed[l] - acts[l]))
            )
            assert float(out.per_layer_loss[l]) == pytest.approx(manual, rel=1e-5)


class TestCrossLayerDetection:
    def test_cross_layer_features(self):
        cc = CrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=4, seed=0)
        w = np.zeros((4, L, D), np.float32)
        w[0, 0, 0] = 1.0                        # single-layer feature
        w[1, 0, 0] = 1.0; w[1, 1, 0] = 0.9      # cross-layer
        w[2, :, 0] = 0.5                        # all layers
        w[3, 2, 5] = 1.0; w[3, 0, 5] = 0.05     # below threshold
        cc.params = {**cc.params, "w_dec": jnp.asarray(w)}
        mask = np.asarray(cc.get_cross_layer_features(threshold=0.1))
        np.testing.assert_array_equal(mask, [False, True, True, False])

    def test_feature_layer_norms_shape(self):
        cc = CrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, seed=0)
        assert cc.get_feature_layer_norms().shape == (S, L)


class TestTopKVariant:
    def test_l0_equals_k_and_no_sparsity_loss(self, acts):
        cc = TopKCrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, k=8, seed=0)
        out = cc(acts)
        assert float(out.l0) == pytest.approx(8, abs=1e-5)
        assert float(out.sparsity_loss) == 0.0
        nnz = np.asarray((out.hidden > 0).sum(-1))
        assert (nnz <= 8).all()

    def test_dead_tracking(self, acts):
        cc = TopKCrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, k=8, seed=0)
        cc(acts)
        assert cc.step_count == 1
        cc.eval()
        cc(acts)
        assert cc.step_count == 1


class TestFactory:
    def test_topk_default(self):
        cc = create_crosscoder(d_model=D, n_layers=L, d_sae=S)
        assert isinstance(cc, TopKCrossLayerCrosscoder)
        assert cc.k == 32

    def test_relu_variant(self):
        cc = create_crosscoder(d_model=D, n_layers=L, d_sae=S, use_topk=False)
        assert isinstance(cc, CrossLayerCrosscoder)
        assert not isinstance(cc, TopKCrossLayerCrosscoder)

    def test_layer_indices(self):
        cc = create_crosscoder(d_model=D, n_layers=2, d_sae=S, layer_indices=[1, 3])
        assert cc.layer_indices == [1, 3]


class TestLearning:
    def test_finds_shared_features_across_correlated_layers(self, rng):
        # Reference test_crosscoder.py:349-415: correlated synthetic
        # activations (shared base + per-layer noise) should yield
        # cross-layer decoder structure after training.
        base = rng.standard_normal((256, D)).astype(np.float32)
        acts = jnp.stack(
            [
                jnp.asarray(base + 0.1 * rng.standard_normal((256, D)).astype(np.float32))
                for _ in range(L)
            ]
        )
        params = TopKCrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, k=8, seed=0).params
        opt = optax.adam(3e-3)
        ost = opt.init(params)

        @jax.jit
        def step(p, o):
            l, g = jax.value_and_grad(lambda q: crosscoder_loss(q, acts, k=8)[0])(p)
            u, o = opt.update(g, o, p)
            p = optax.apply_updates(p, u)
            return normalize_crosscoder_decoder(p), o, l

        first = None
        for _ in range(150):
            params, ost, loss = step(params, ost)
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.6
        cc = TopKCrossLayerCrosscoder(d_model=D, n_layers=L, d_sae=S, k=8, params=params)
        # most live features should be cross-layer given correlated inputs
        assert int(np.asarray(cc.get_cross_layer_features()).sum()) > S // 4

    def test_whisper_tiny_dims_smoke(self, rng):
        cc = TopKCrossLayerCrosscoder(d_model=384, n_layers=4, d_sae=3072, k=32, seed=0)
        acts = {
            i: jnp.asarray(rng.standard_normal((4, 384)), jnp.float32) for i in range(4)
        }
        out = cc(acts)
        assert out.hidden.shape == (4, 3072)
        assert float(out.l0) == pytest.approx(32, abs=1e-4)


class TestArrayBatchFacade:
    """The facade accepts the trainer/loader's stacked [B, L, D] layout
    (not just the reference's dict-of-layers), so analysis tooling
    (collect_top_activations) works on crosscoders directly."""

    def test_encode_array_matches_dict(self, rng):
        from whisper_sae_tpu.models.crosscoder import TopKCrossLayerCrosscoder

        m = TopKCrossLayerCrosscoder(d_model=16, n_layers=3, d_sae=64, k=4, seed=0)
        batch = rng.standard_normal((8, 3, 16)).astype(np.float32)
        as_dict = {li: batch[:, i] for i, li in enumerate(m.layer_indices)}
        np.testing.assert_array_equal(
            np.asarray(m.encode(batch)), np.asarray(m.encode(as_dict))
        )

    def test_bad_shape_raises(self):
        from whisper_sae_tpu.models.crosscoder import TopKCrossLayerCrosscoder

        m = TopKCrossLayerCrosscoder(d_model=16, n_layers=3, d_sae=64, k=4, seed=0)
        with pytest.raises(ValueError, match="expected dict"):
            m.encode(np.zeros((8, 2, 16), np.float32))

    def test_collect_top_activations_on_crosscoder(self, rng):
        from whisper_sae_tpu.analysis.feature_viz import collect_top_activations
        from whisper_sae_tpu.models.crosscoder import TopKCrossLayerCrosscoder

        m = TopKCrossLayerCrosscoder(d_model=16, n_layers=2, d_sae=64, k=4, seed=0)
        batches = [rng.standard_normal((8, 2, 16)).astype(np.float32) for _ in range(3)]
        tracker = collect_top_activations(m, batches, num_features=64, k=5)
        stats = tracker.get_feature_stats()
        assert sum(s["num_examples"] for s in stats.values()) > 0
        examples = tracker.get_all_top_examples()
        assert any(len(v) > 0 for v in examples.values())
