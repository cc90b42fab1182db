#!/usr/bin/env python3
"""Quality gate: train the REFERENCE implementation and this framework on
identical activations with identical configs, compare recon MSE and L0.

This is BASELINE.json's quality clause made executable offline: the
reference's own ``TopKSAE`` + ``SAETrainer`` (imported at runtime from
/root/reference — used as an oracle, not copied) train on activations
extracted by this framework's pipeline; our trainer runs the same config
on the same data from the same initial parameters.

    JAX_PLATFORMS=cpu python tools/quality_gate.py
    python tools/quality_gate.py --epochs 3 --tokens 12000

Prints one JSON line:
    {"reference": {"mse": ..., "l0": ...}, "tpu": {"mse": ..., "l0": ...},
     "mse_ratio": ..., "pass": true}
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "src"))
REFERENCE = Path("/root/reference/src")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--tokens", type=int, default=12_000)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--k", type=int, default=32)
    parser.add_argument("--expansion", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--amp", action="store_true",
                        help="train THIS framework in bf16 AMP (engages the "
                             "fused Pallas forward on TPU); the reference "
                             "oracle stays f32")
    args = parser.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    # ---- 1. identical activation data from OUR extraction pipeline ----
    from whisper_sae_tpu.data.librispeech import SyntheticSpeechDataset
    from whisper_sae_tpu.models.whisper import WhisperArch, extract_activations, init_whisper

    arch = WhisperArch()
    params = init_whisper(jax.random.PRNGKey(0), arch)
    n_clips = max(1, args.tokens // 1500)
    ds = SyntheticSpeechDataset(num_samples=n_clips, seed=0)
    mels = jnp.stack([jnp.asarray(ds[i]["input_features"]) for i in range(n_clips)])
    acts = extract_activations(params, mels, arch, with_decoder=False)
    tokens = np.asarray(acts["encoder"][0]).reshape(-1, arch.d_model)[: args.tokens]
    d = tokens.shape[1]
    h = d * args.expansion
    print(f"activations: {tokens.shape} from {n_clips} clips", file=sys.stderr)

    # ---- 2. the reference implementation (oracle, imported at runtime) ----
    sys.path.insert(0, str(REFERENCE))
    import torch
    from whisper_sae.config import TrainingConfig as RefTrainingConfig
    from whisper_sae.sae.model import TopKSAE as RefTopKSAE
    from whisper_sae.sae.training import SAETrainer as RefSAETrainer

    torch.manual_seed(0)
    ref_model = RefTopKSAE(input_dim=d, hidden_dim=h, k=args.k)
    init_sd = {k2: v.detach().clone() for k2, v in ref_model.state_dict().items()}
    ref_cfg = RefTrainingConfig(
        batch_size=args.batch_size, learning_rate=args.lr, epochs=args.epochs,
        warmup_steps=100, use_amp=False,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        trainer = RefSAETrainer(ref_model, ref_cfg, device="cpu", run_dir=Path(td))
        from torch.utils.data import DataLoader, TensorDataset

        loader = DataLoader(
            TensorDataset(torch.from_numpy(tokens)),
            batch_size=args.batch_size, shuffle=True,
        )
        trainer.train(loader, epochs=args.epochs, checkpoint_every=10_000)

    ref_model.eval()
    with torch.no_grad():
        out = ref_model(torch.from_numpy(tokens))
        ref_mse = float(out.reconstruction_loss)
        ref_l0 = float(out.l0)

    # ---- 3. this framework, same config, same initial parameters ----
    from whisper_sae_tpu.config import TrainingConfig
    from whisper_sae_tpu.data.loader import ActivationLoader
    from whisper_sae_tpu.models.sae import TopKSAE
    from whisper_sae_tpu.training.trainer import SAETrainer
    from whisper_sae_tpu.utils.checkpoint import import_torch_state_dict

    jparams = import_torch_state_dict(init_sd)
    jparams["b_pre"] = jnp.zeros((d,), jnp.float32)
    model = TopKSAE(input_dim=d, hidden_dim=h, k=args.k, params=jparams)
    cfg = TrainingConfig(
        batch_size=args.batch_size, learning_rate=args.lr, epochs=args.epochs,
        warmup_steps=100, use_amp=args.amp,
    )
    with tempfile.TemporaryDirectory() as td:
        trainer = SAETrainer(model, cfg, run_dir=Path(td))
        trainer.train(ActivationLoader(tokens, args.batch_size, seed=0), epochs=args.epochs)

    model.eval()
    out = model(jnp.asarray(tokens))
    tpu_mse = float(out.reconstruction_loss)
    tpu_l0 = float(out.l0)

    ratio = tpu_mse / ref_mse if ref_mse > 0 else float("inf")
    result = {
        "reference": {"mse": round(ref_mse, 6), "l0": round(ref_l0, 3)},
        "tpu": {"mse": round(tpu_mse, 6), "l0": round(tpu_l0, 3)},
        "mse_ratio": round(ratio, 4),
        "pass": bool(0.95 <= ratio <= 1.05 and abs(tpu_l0 - ref_l0) < 0.5),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
