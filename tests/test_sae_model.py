"""SAE core tests.

Ports the behavioral contracts of /root/reference/tests/test_sae_model.py:
decoder init norm 0.1, renorm to 1.0, exact-k sparsity, top-k picks the k
largest pre-activations, loss == MSE for TopK, dead-feature semantics with
eval-mode freeze, gradient flow, determinism, resampling, ReLU L1 loss
composition, factory dispatch, and the learning tests (loss halves,
capacity monotone in k, identity-weights near-perfect reconstruction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from whisper_sae_tpu.config import SAEConfig
from whisper_sae_tpu.models.sae import (
    ReLUSAE,
    SAEOutput,
    TopKSAE,
    create_sae,
    dead_feature_mask,
    init_dead_state,
    init_topk_sae,
    normalize_decoder,
    topk_sae_apply,
    topk_sae_loss,
    update_dead_state,
)

D, H, K = 64, 256, 8


@pytest.fixture
def sae():
    return TopKSAE(input_dim=D, hidden_dim=H, k=K, seed=0)


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.standard_normal((32, D)), jnp.float32)


class TestInit:
    def test_decoder_init_norm_is_0p1(self, sae):
        norms = jnp.linalg.norm(sae.params["w_dec"], axis=1)
        np.testing.assert_allclose(np.asarray(norms), 0.1, rtol=1e-5)

    def test_normalize_decoder_weights_gives_unit_norm(self, sae):
        sae.params["w_dec"] = sae.params["w_dec"] * 3.7
        sae.normalize_decoder_weights()
        norms = jnp.linalg.norm(sae.params["w_dec"], axis=1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, rtol=1e-5)

    def test_param_shapes(self, sae):
        assert sae.params["w_enc"].shape == (D, H)
        assert sae.params["b_enc"].shape == (H,)
        assert sae.params["w_dec"].shape == (H, D)
        assert sae.params["b_dec"].shape == (D,)
        assert sae.params["b_pre"].shape == (D,)


class TestTopKForward:
    def test_exactly_k_nonzeros_for_gaussian(self, sae, x):
        out = sae(x)
        nnz = np.asarray((out.hidden > 0).sum(axis=-1))
        # Gaussian pre-activations: all top-k values positive w.h.p. when
        # k << H; the reference asserts == k under the same conditions.
        assert (nnz == K).all()

    def test_topk_picks_largest_preactivations(self, sae, x):
        pre = (x - sae.params["b_pre"]) @ sae.params["w_enc"] + sae.params["b_enc"]
        hidden = np.asarray(sae.encode(x))
        pre = np.asarray(pre)
        for b in range(x.shape[0]):
            chosen = set(np.where(hidden[b] > 0)[0])
            expected = set(np.argsort(pre[b])[-K:])
            assert chosen <= expected

    def test_negative_topk_values_are_zeroed(self):
        # Force all pre-activations negative: relu-after-topk zeroes them,
        # so nonzeros < k (exact reference op order, model.py:114-116).
        sae = TopKSAE(input_dim=D, hidden_dim=H, k=K, seed=0)
        sae.params["b_enc"] = jnp.full((H,), -100.0)
        x = jnp.ones((4, D))
        out = sae(x)
        assert int((out.hidden > 0).sum()) == 0
        assert float(out.l0) == 0.0

    def test_output_contract(self, sae, x):
        out = sae(x)
        assert isinstance(out, SAEOutput)
        assert out.reconstructed.shape == x.shape
        assert out.hidden.shape == (x.shape[0], H)
        assert out.loss.shape == ()
        assert out.reconstruction_loss.shape == ()
        assert out.sparsity_loss.shape == ()
        assert out.l0.shape == ()

    def test_loss_is_mse(self, sae, x):
        out = sae(x)
        mse = float(jnp.mean(jnp.square(out.reconstructed - x)))
        assert float(out.loss) == pytest.approx(mse, rel=1e-5)
        assert float(out.reconstruction_loss) == pytest.approx(mse, rel=1e-5)

    def test_sparsity_loss_zero_l0_equals_k(self, sae, x):
        out = sae(x)
        assert float(out.sparsity_loss) == 0.0
        assert float(out.l0) == pytest.approx(K, abs=1e-5)

    def test_decode_matches_dense_path(self, sae, x):
        # The hot-path sparse decode must equal dense hidden @ w_dec.
        out = sae(x)
        dense = np.asarray(sae.decode(out.hidden))
        np.testing.assert_allclose(np.asarray(out.reconstructed), dense, atol=1e-4)

    def test_eval_determinism(self, sae, x):
        sae.eval()
        a = np.asarray(sae(x).reconstructed)
        b = np.asarray(sae(x).reconstructed)
        np.testing.assert_array_equal(a, b)

    def test_hot_path_loss_matches_apply(self, sae, x):
        loss, aux = jax.jit(lambda p, v: topk_sae_loss(p, v, K))(sae.params, x)
        out, active = topk_sae_apply(sae.params, x, K)
        assert float(loss) == pytest.approx(float(out.loss), rel=1e-6)
        assert float(aux["l0"]) == pytest.approx(float(out.l0), rel=1e-6)
        np.testing.assert_array_equal(np.asarray(aux["active"]), np.asarray(active))


class TestDeadFeatures:
    def test_step_count_increments_in_train_mode(self, sae, x):
        assert sae.step_count == 0
        sae(x)
        assert sae.step_count == 1
        sae(x)
        assert sae.step_count == 2

    def test_eval_mode_freezes_counters(self, sae, x):
        sae.eval()
        sae(x)
        assert sae.step_count == 0

    def test_active_features_get_current_step(self, sae, x):
        out = sae(x)
        active = np.asarray((out.hidden > 0).any(axis=0))
        last = np.asarray(sae.feature_last_activated)
        assert (last[active] == 1).all()
        assert (last[~active] == 0).all()

    def test_get_dead_features_threshold(self):
        state = init_dead_state(4)
        state = state._replace(
            step_count=jnp.asarray(100, jnp.int32),
            feature_last_activated=jnp.asarray([100, 95, 0, 50], jnp.int32),
        )
        dead = np.asarray(dead_feature_mask(state, threshold=10))
        np.testing.assert_array_equal(dead, [False, False, True, True])

    def test_update_dead_state(self):
        state = init_dead_state(3)
        active = jnp.asarray([True, False, True])
        state = update_dead_state(state, active)
        assert int(state.step_count) == 1
        np.testing.assert_array_equal(np.asarray(state.feature_last_activated), [1, 0, 1])

    def test_resample_dead_features(self, rng):
        sae = TopKSAE(input_dim=D, hidden_dim=H, k=K, dead_feature_threshold=5, seed=0)
        # Mark every feature dead by advancing the step count far ahead.
        sae.state = sae.state._replace(step_count=jnp.asarray(1000, jnp.int32))
        inputs = jnp.asarray(rng.standard_normal((64, D)), jnp.float32)
        n = sae.resample_dead_features(inputs, num_resample=16)
        assert n == 16
        # Resampled encoder rows are unit-norm input directions and the
        # matching decoder rows equal them.
        w_enc = np.asarray(sae.params["w_enc"])
        w_dec = np.asarray(sae.params["w_dec"])
        resampled = np.where(np.asarray(sae.state.feature_last_activated) == 1000)[0]
        assert len(resampled) == 16
        for i in resampled:
            np.testing.assert_allclose(np.linalg.norm(w_enc[:, i]), 1.0, rtol=1e-4)
            np.testing.assert_allclose(w_dec[i], w_enc[:, i], atol=1e-6)
            assert float(np.asarray(sae.params["b_enc"])[i]) == 0.0

    def test_resample_noop_when_no_dead(self, sae, x):
        assert sae.resample_dead_features(x) == 0


class TestGradients:
    def test_gradient_flow_to_all_params(self, sae, x):
        grads = jax.grad(lambda p: topk_sae_loss(p, x, K)[0])(sae.params)
        for name in ("w_enc", "b_enc", "w_dec", "b_dec", "b_pre"):
            g = np.asarray(grads[name])
            assert np.isfinite(g).all(), name
            assert np.abs(g).sum() > 0, name


class TestLearning:
    def test_loss_decreases_with_adam(self, rng):
        sae_params = init_topk_sae(jax.random.PRNGKey(0), 32, 128)
        data = jnp.asarray(rng.standard_normal((256, 32)), jnp.float32)
        opt = optax.adam(1e-3)
        opt_state = opt.init(sae_params)

        @jax.jit
        def step(params, opt_state):
            loss, grads = jax.value_and_grad(lambda p: topk_sae_loss(p, data, 8)[0])(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = normalize_decoder(params)
            return params, opt_state, loss

        first = None
        for i in range(100):
            sae_params, opt_state, loss = step(sae_params, opt_state)
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.5

    def test_capacity_monotone_in_k(self, rng):
        data = jnp.asarray(rng.standard_normal((512, 32)), jnp.float32)
        losses = {}
        for k in (2, 8, 24):
            params = init_topk_sae(jax.random.PRNGKey(0), 32, 128)
            opt = optax.adam(1e-3)
            opt_state = opt.init(params)

            @jax.jit
            def step(params, opt_state, k=k):
                loss, grads = jax.value_and_grad(
                    lambda p: topk_sae_loss(p, data, k)[0]
                )(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            for _ in range(150):
                params, opt_state, loss = step(params, opt_state)
            losses[k] = float(loss)
        assert losses[24] < losses[8] < losses[2]

    def test_identity_weights_near_perfect_recon(self, rng):
        # With W_enc = [I; 0], W_dec = [I; 0]^T and k >= D, the SAE is an
        # identity map on nonnegative inputs.
        d = 16
        h = 64
        params = init_topk_sae(jax.random.PRNGKey(0), d, h)
        eye = jnp.zeros((d, h)).at[:, :d].set(jnp.eye(d))
        params = {
            **params,
            "w_enc": eye,
            "b_enc": jnp.zeros((h,)),
            "w_dec": eye.T,
            "b_dec": jnp.zeros((d,)),
            "b_pre": jnp.zeros((d,)),
        }
        x = jnp.abs(jnp.asarray(rng.standard_normal((8, d)), jnp.float32))
        out, _ = topk_sae_apply(params, x, k=d)
        np.testing.assert_allclose(np.asarray(out.reconstructed), np.asarray(x), atol=1e-5)


class TestReLUSAE:
    def test_loss_composition(self, rng):
        sae = ReLUSAE(input_dim=D, hidden_dim=H, sparsity_weight=0.05, seed=0)
        x = jnp.asarray(rng.standard_normal((16, D)), jnp.float32)
        out = sae(x)
        mse = float(jnp.mean(jnp.square(out.reconstructed - x)))
        l1 = float(jnp.mean(jnp.abs(out.hidden)))
        assert float(out.reconstruction_loss) == pytest.approx(mse, rel=1e-5)
        assert float(out.sparsity_loss) == pytest.approx(l1, rel=1e-5)
        assert float(out.loss) == pytest.approx(mse + 0.05 * l1, rel=1e-5)

    def test_hidden_nonnegative(self, rng):
        sae = ReLUSAE(input_dim=D, hidden_dim=H, seed=0)
        x = jnp.asarray(rng.standard_normal((16, D)), jnp.float32)
        out = sae(x)
        assert float(out.hidden.min()) >= 0.0

    def test_decoder_unit_norm_at_init(self):
        sae = ReLUSAE(input_dim=D, hidden_dim=H, normalize_decoder=True, seed=0)
        norms = np.linalg.norm(np.asarray(sae.params["w_dec"]), axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


class TestFactory:
    def test_topk_dispatch(self):
        cfg = SAEConfig(activation="topk", expansion_factor=4, k=16)
        sae = create_sae(cfg, input_dim=D)
        assert isinstance(sae, TopKSAE)
        assert sae.hidden_dim == 4 * D
        assert sae.k == 16

    def test_relu_dispatch(self):
        cfg = SAEConfig(activation="relu", expansion_factor=4)
        sae = create_sae(cfg, input_dim=D)
        assert isinstance(sae, ReLUSAE)
        assert sae.hidden_dim == 4 * D

    def test_config_threading(self):
        cfg = SAEConfig(activation="topk", dead_feature_threshold=77)
        sae = create_sae(cfg, input_dim=D)
        assert sae.dead_feature_threshold == 77


class TestKernelDispatch:
    def test_tp_shards_clear_single_block_threshold(self):
        """DESIGN/SURVEY §2.9: at whisper-large 32x (D=1280, H=40960) a
        single chip must stream the 105 MB w_enc per row block (blocked
        kernel), but at TP>=4 the per-shard H_local=10240 gives a 26 MB
        w_enc shard that fits VMEM — the fast single-block fused kernel
        applies and the re-stream disappears."""
        from whisper_sae_tpu.ops.pallas_sae import uses_blocked

        assert uses_blocked((8192, 1280), 40960)          # 1 chip
        assert uses_blocked((8192, 1280), 40960 // 2)     # TP=2: still 52 MB
        assert not uses_blocked((8192, 1280), 40960 // 4) # TP=4: 26 MB
        assert not uses_blocked((8192, 1280), 40960 // 8)

    def test_fused_loss_gating(self, monkeypatch):
        from whisper_sae_tpu.ops import pallas_sae as ps

        # CPU backend: the kernel path must be off entirely
        assert not ps.fused_loss_supported((256, 128), 512)
        # with the backend gate forced open, the geometry rules apply
        monkeypatch.setattr(ps, "supported", lambda *a: True)
        assert ps.fused_loss_supported((256, 128), 512)
        assert not ps.fused_loss_supported((8192, 1280), 40960)  # blocked w_enc
        assert not ps.fused_loss_supported((9, 128), 512)  # rows not divisible
