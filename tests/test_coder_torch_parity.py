"""Training-trajectory parity for transcoders/crosscoders vs torch oracles.

The reference defines the transcoder/crosscoder model semantics
(reference transcoder.py:32-241, crosscoder.py:287-379) but ships no
trainer for them; this framework's coder trainers apply the same
training contract as the SAE trainer (AdamW + global-norm clip +
post-step decoder renorm, reference training.py:161-217).  These tests
pin that: starting from IDENTICAL parameters and batch order, a plain
torch loop implementing those semantics and the jitted coder trainers
must produce the same loss trajectory and final parameters up to f32
associativity.  (Mirrors tests/test_torch_parity.py for the SAE.)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from whisper_sae_tpu.config import TrainingConfig
from whisper_sae_tpu.models.crosscoder import TopKCrossLayerCrosscoder
from whisper_sae_tpu.models.transcoder import TopKTranscoder
from whisper_sae_tpu.training.coder_trainers import CrosscoderTrainer, TranscoderTrainer

LR = 1e-3
STEPS = 20


def _adamw(params):
    return torch.optim.AdamW(params, lr=LR, weight_decay=0.0)


class TestTranscoderTrajectoryParity:
    D_IN, D_OUT, H, K = 32, 32, 128, 8

    def test_same_losses_and_params(self, tmp_path, rng):
        D, DO, H, K = self.D_IN, self.D_OUT, self.H, self.K
        batches = [
            (
                rng.standard_normal((64, D)).astype(np.float32),
                rng.standard_normal((64, DO)).astype(np.float32),
            )
            for _ in range(STEPS)
        ]

        torch.manual_seed(0)
        enc = torch.nn.Linear(D, H)
        dec_w = torch.nn.Parameter(torch.empty(H, DO))
        dec_b = torch.nn.Parameter(torch.zeros(DO))
        with torch.no_grad():
            torch.nn.init.xavier_uniform_(dec_w)
            dec_w.data = torch.nn.functional.normalize(dec_w.data, dim=1) * 0.1
        params_t = list(enc.parameters()) + [dec_w, dec_b]
        # jnp.array COPIES (jnp.asarray can alias torch CPU memory, which
        # the in-place optimizer updates below would silently mutate)
        init = {
            "w_enc": jnp.array(enc.weight.detach().numpy().T),
            "b_enc": jnp.array(enc.bias.detach().numpy()),
            "w_dec": jnp.array(dec_w.detach().numpy()),
            "b_dec": jnp.array(dec_b.detach().numpy()),
        }

        opt = _adamw(params_t)
        torch_losses = []
        for x, y in batches:
            pre = enc(torch.from_numpy(x))
            vals, idx = torch.topk(pre, K, dim=-1)
            hidden = torch.zeros_like(pre).scatter_(-1, idx, torch.relu(vals))
            loss = torch.nn.functional.mse_loss(hidden @ dec_w + dec_b, torch.from_numpy(y))
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(params_t, 1.0)
            opt.step()
            with torch.no_grad():
                dec_w.data = torch.nn.functional.normalize(dec_w.data, dim=1)
            torch_losses.append(float(loss.detach()))

        model = TopKTranscoder(D, DO, H, k=K, params=init)
        cfg = TrainingConfig(
            batch_size=64, learning_rate=LR, epochs=1, warmup_steps=0, use_amp=False
        )
        trainer = TranscoderTrainer(model, cfg, run_dir=tmp_path)
        ours = [trainer.train_step(b).loss for b in batches]

        np.testing.assert_allclose(ours, torch_losses, rtol=2e-4)
        np.testing.assert_allclose(
            np.asarray(model.params["w_enc"]), enc.weight.detach().numpy().T, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(model.params["w_dec"]), dec_w.detach().numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(model.params["b_dec"]), dec_b.detach().numpy(), atol=2e-4
        )


class TestCrosscoderTrajectoryParity:
    L, D, S, K = 3, 16, 128, 8

    def test_same_losses_and_params(self, tmp_path, rng):
        L, D, S, K = self.L, self.D, self.S, self.K
        batches = [
            rng.standard_normal((32, L, D)).astype(np.float32) for _ in range(STEPS)
        ]

        torch.manual_seed(1)
        w_dec = torch.nn.Parameter(torch.empty(S, L, D))
        with torch.no_grad():
            torch.nn.init.xavier_uniform_(w_dec.view(S, L * D))
            flat = torch.nn.functional.normalize(w_dec.view(S, L * D), dim=1)
            w_dec.data = flat.view(S, L, D) * 0.1
        w_enc = torch.nn.Parameter(w_dec.detach().permute(1, 2, 0).clone())
        b_enc = torch.nn.Parameter(torch.zeros(S))
        b_dec = torch.nn.Parameter(torch.zeros(L, D))
        params_t = [w_enc, b_enc, w_dec, b_dec]
        # jnp.array COPIES (jnp.asarray can alias torch CPU memory, which
        # the in-place optimizer updates below would silently mutate)
        init = {
            "w_enc": jnp.array(w_enc.detach().numpy()),
            "b_enc": jnp.array(b_enc.detach().numpy()),
            "w_dec": jnp.array(w_dec.detach().numpy()),
            "b_dec": jnp.array(b_dec.detach().numpy()),
        }

        opt = _adamw(params_t)
        torch_losses = []
        for b in batches:
            acts = torch.from_numpy(b).permute(1, 0, 2)  # [L, B, D]
            pre = torch.einsum("lbd,lds->bs", acts, w_enc) + b_enc
            vals, idx = torch.topk(pre, K, dim=-1)
            hidden = torch.zeros_like(pre).scatter_(-1, idx, torch.relu(vals))
            recon = torch.einsum("bs,sld->lbd", hidden, w_dec) + b_dec[:, None, :]
            loss = torch.mean((recon - acts) ** 2, dim=(1, 2)).sum()
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(params_t, 1.0)
            opt.step()
            with torch.no_grad():
                flat = torch.nn.functional.normalize(w_dec.view(S, L * D), dim=1)
                w_dec.data = flat.view(S, L, D)
            torch_losses.append(float(loss.detach()))

        model = TopKCrossLayerCrosscoder(
            d_model=D, n_layers=L, d_sae=S, k=K, params=init
        )
        cfg = TrainingConfig(
            batch_size=32, learning_rate=LR, epochs=1, warmup_steps=0, use_amp=False
        )
        trainer = CrosscoderTrainer(model, cfg, run_dir=tmp_path)
        ours = [trainer.train_step(b).loss for b in batches]

        np.testing.assert_allclose(ours, torch_losses, rtol=2e-4)
        np.testing.assert_allclose(
            np.asarray(model.params["w_dec"]), w_dec.detach().numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(model.params["w_enc"]), w_enc.detach().numpy(), atol=2e-4
        )
