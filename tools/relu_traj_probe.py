#!/usr/bin/env python3
"""Short-horizon ReLU-SAE trajectory probe vs the reference torch oracle.

The full-scale relu-sae quality gate failed (mse_ratio 1.135 in BOTH f32
and amp — quality_gate_relu_sae.json).  Precision-consistent deviation is
either a real semantic/numeric difference in the training contract or a
family-specific chaos floor.  This probe is the missing sharp instrument:
it replays the EXACT gate contract (reference ReLUSAE imported from
/root/reference, AdamW wd=0, global-norm clip 1.0, post-step decoder
renorm, warmup->cosine scheduler, same init, same numpy-rng-0 batch
order) at a small scale on CPU and compares the PER-STEP loss trajectory
plus final params between:

  torch oracle (tools/quality_gate.py:_torch_contract_loop semantics)
  ours, per-step path          (SAETrainer.train_step)
  ours, fused epoch path       (SAETrainer.train_epoch_fused(perm=...))
  -- the path the gate actually uses

If the traces agree to f32 associativity for a few hundred steps, the
contract is semantically identical and the 1.135 gate ratio is chaos;
if they diverge immediately or systematically, the step printout
localizes the bug.

    PALLAS_AXON_POOL_IPS= python tools/relu_traj_probe.py --steps 256
"""

from __future__ import annotations

import os

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ["JAX_PLATFORMS"] = "cpu"

import argparse
import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "src"))
sys.path.insert(0, "/root/reference/src")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--d", type=int, default=32)
    parser.add_argument("--expansion", type=int, default=8)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--steps", type=int, default=128,
                        help="steps per epoch (tokens = steps*batch)")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--warmup-steps", type=int, default=100)
    parser.add_argument("--scale", type=float, default=1.0,
                        help="input scale (gate activations are ~1e-1;"
                        " scale<1 reproduces the tiny-mse regime)")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from whisper_sae.sae.model import ReLUSAE as RefReLUSAE

    from whisper_sae_tpu.config import TrainingConfig
    from whisper_sae_tpu.models.sae import ReLUSAE
    from whisper_sae_tpu.training.trainer import SAETrainer
    from whisper_sae_tpu.utils.checkpoint import import_torch_state_dict

    d, h = args.d, args.d * args.expansion
    n = args.steps * args.batch_size
    total_steps = args.epochs * args.steps

    data_rng = np.random.default_rng(7)
    data = (args.scale * data_rng.standard_normal((n, d))).astype(np.float32)

    torch.manual_seed(0)
    ref = RefReLUSAE(input_dim=d, hidden_dim=h)
    init_sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}

    # ---- torch oracle: the gate's contract loop, recording per-step loss
    from torch.optim.lr_scheduler import CosineAnnealingLR, LinearLR, SequentialLR

    opt = torch.optim.AdamW(ref.parameters(), lr=args.lr, weight_decay=0.0)
    warmup = min(args.warmup_steps, total_steps // 10)
    sched = SequentialLR(
        opt,
        schedulers=[
            LinearLR(opt, start_factor=0.01, end_factor=1.0, total_iters=warmup),
            CosineAnnealingLR(opt, T_max=total_steps - warmup, eta_min=args.lr * 0.1),
        ],
        milestones=[warmup],
    )
    rng = np.random.default_rng(0)
    torch_losses, torch_lrs = [], []
    perms = []
    for ep in range(args.epochs):
        perm = rng.permutation(n)
        perms.append(perm)
        for s in range(0, n, args.batch_size):
            out = ref(torch.from_numpy(data[perm[s : s + args.batch_size]]))
            opt.zero_grad()
            out.loss.backward()
            torch.nn.utils.clip_grad_norm_(list(ref.parameters()), 1.0)
            torch_lrs.append(opt.param_groups[0]["lr"])
            opt.step()
            sched.step()
            with torch.no_grad():
                ref.normalize_decoder_weights()
            torch_losses.append(float(out.loss.detach()))

    def eval_mse(model_fn):
        return float(model_fn(data))

    ref.eval()
    with torch.no_grad():
        ref_mse = float(ref(torch.from_numpy(data)).reconstruction_loss)

    # ---- ours: two paths, fresh model each
    def run_ours(path: str):
        jp = import_torch_state_dict(init_sd)
        model = ReLUSAE(input_dim=d, hidden_dim=h, params=jp)
        cfg = TrainingConfig(
            batch_size=args.batch_size, learning_rate=args.lr,
            epochs=args.epochs, warmup_steps=args.warmup_steps, use_amp=False,
        )
        with tempfile.TemporaryDirectory() as td:
            tr = SAETrainer(model, cfg, run_dir=Path(td))
            tr.setup_scheduler(total_steps)
            losses, lrs = [], []
            for ep in range(args.epochs):
                if path == "step":
                    perm = perms[ep]
                    for s in range(0, n, args.batch_size):
                        lrs.append(tr.learning_rate_at(tr.global_step))
                        m = tr.train_step(data[perm[s : s + args.batch_size]])
                        losses.append(m.loss)
                else:
                    start = tr.global_step
                    ms = tr.train_epoch_fused(data, perm=perms[ep])
                    lrs.extend(
                        float(x) for x in tr.learning_rates_at(start, len(ms))
                    )
                    losses.extend(m.loss for m in ms)
        out = model(jnp.asarray(data))
        return losses, lrs, float(out.reconstruction_loss), model.params

    report = {"torch": {"final_mse": ref_mse}}
    tl = np.asarray(torch_losses)
    for path in ("step", "fused"):
        losses, lrs, mse, params = run_ours(path)
        ol = np.asarray(losses)
        rel = np.abs(ol - tl) / np.maximum(np.abs(tl), 1e-12)
        lr_rel = np.abs(np.asarray(lrs) - np.asarray(torch_lrs)) / np.maximum(
            np.asarray(torch_lrs), 1e-30
        )
        # first step where the per-step loss deviates >1e-3 relative
        bad = np.nonzero(rel > 1e-3)[0]
        report[path] = {
            "final_mse": mse,
            "mse_ratio": mse / ref_mse,
            "loss_rel_max": float(rel.max()),
            "loss_rel_at_step10": float(rel[:10].max()),
            "loss_rel_at_step50": float(rel[:50].max()) if len(rel) >= 50 else None,
            "first_step_rel_gt_1e-3": int(bad[0]) if len(bad) else None,
            "lr_rel_max": float(lr_rel.max()),
        }
        # param agreement
        wd = np.asarray(params["w_dec"])
        ref_wd = ref.decoder.weight.detach().numpy().T
        report[path]["w_dec_max_abs_diff"] = float(np.abs(wd - ref_wd).max())
        we = np.asarray(params["w_enc"])
        ref_we = ref.encoder.weight.detach().numpy().T
        report[path]["w_enc_max_abs_diff"] = float(np.abs(we - ref_we).max())

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
