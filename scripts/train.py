#!/usr/bin/env python3
"""Main training script for Whisper SAE on TPU.

Flag-for-flag parity with the reference CLI
(/root/reference/scripts/train.py:40-81):

    python scripts/train.py                          # default config
    python scripts/train.py --config configs/tiny_default.yaml
    python scripts/train.py --layer encoder:0        # single layer
    python scripts/train.py --no-wandb
    python scripts/train.py --extract-only
    python scripts/train.py --device cpu --seed 123
"""

from __future__ import annotations

import argparse
import os
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))
# persistent XLA compile cache (first-run compiles take minutes on the
# single-core TPU-VM host)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Train Sparse Autoencoders on Whisper activations (TPU-native)",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog=__doc__,
    )
    parser.add_argument("--config", type=Path, default=Path("configs/tiny_default.yaml"),
                        help="Path to configuration YAML file")
    parser.add_argument("--layer", type=str, default=None,
                        help="Train single layer (format: encoder:0 or decoder:2)")
    parser.add_argument("--no-wandb", action="store_true", help="Disable W&B logging")
    parser.add_argument("--extract-only", action="store_true",
                        help="Extract features only, don't train SAEs")
    parser.add_argument("--device", type=str, default=None,
                        help="Backend to use (tpu, cpu). Auto-detected if not specified.")
    parser.add_argument("--seed", type=int, default=None,
                        help="Random seed (overrides config)")
    parser.add_argument("--resume", type=Path, default=None,
                        help="Resume training from a checkpoint file (the reference "
                             "has no resume flag; this is a TPU-build addition)")
    parser.add_argument("--random-whisper", action="store_true",
                        help="Use randomly initialized Whisper weights (offline mode)")
    parser.add_argument("--profile", type=Path, default=None,
                        help="Capture a jax.profiler trace into this directory")
    return parser.parse_args()


def configure_backend(device_arg: str | None) -> None:
    """Select the JAX backend before anything initializes it."""
    if device_arg:
        mapping = {"tpu": "axon,tpu", "cpu": "cpu"}
        os.environ["JAX_PLATFORMS"] = mapping.get(device_arg, device_arg)


def parse_layer_arg(layer_arg: str) -> tuple[str, int]:
    """'encoder:0' -> ('encoder', 0) (reference train.py:106-115)."""
    parts = layer_arg.split(":")
    if len(parts) != 2:
        raise ValueError(f"Invalid layer format: {layer_arg}. Use encoder:N or decoder:N")
    component = parts[0]
    if component not in ("encoder", "decoder"):
        raise ValueError(f"Invalid component: {component}. Use encoder or decoder")
    return component, int(parts[1])


def main() -> None:
    args = parse_args()
    configure_backend(args.device)

    import jax
    import numpy as np
    from rich.console import Console
    from rich.panel import Panel

    from whisper_sae_tpu.config import ExperimentConfig
    from whisper_sae_tpu.data.feature_cache import FeatureCache, extract_and_cache_features
    from whisper_sae_tpu.data.librispeech import (
        AudioBatchLoader,
        LibriSpeechDataset,
        LibriSpeechFeaturesOnly,
        SyntheticSpeechDataset,
    )
    from whisper_sae_tpu.models.sae import create_sae
    from whisper_sae_tpu.models.whisper import arch_for, init_whisper, load_pretrained
    from whisper_sae_tpu.parallel.mesh import mesh_from_config
    from whisper_sae_tpu.training.trainer import SAETrainer

    console = Console()
    console.print(Panel.fit(
        "[bold cyan]Whisper SAE Training (TPU)[/bold cyan]\n"
        "Train Sparse Autoencoders on Whisper activations",
        border_style="cyan",
    ))

    if args.config.exists():
        config = ExperimentConfig.from_yaml(args.config)
        console.print(f"Loaded config from {args.config}")
    else:
        config = ExperimentConfig()
        console.print("Using default configuration")

    if args.seed is not None:
        config.training.seed = args.seed
    if args.no_wandb:
        config.wandb.enabled = False

    random.seed(config.training.seed)
    np.random.seed(config.training.seed)

    devices = jax.devices()
    console.print(f"Using backend: {devices[0].platform} ({len(devices)} device(s))")
    try:
        mesh = mesh_from_config(config.mesh, devices)
        console.print(f"Mesh: data={mesh.shape['data']} model={mesh.shape['model']}")
    except Exception as e:
        console.print(f"[yellow]No mesh ({e}); running single-device[/yellow]")
        mesh = None

    console.print(Panel.fit(
        f"Model: {config.whisper.model_name}\n"
        f"Encoder layers: {config.encoder_layers}\n"
        f"Decoder layers: {config.decoder_layers}\n"
        f"SAE expansion: {config.sae.expansion_factor}x, k={config.sae.k}\n"
        f"Batch size: {config.training.batch_size}\n"
        f"Epochs: {config.training.epochs}\n"
        f"W&B: {'enabled' if config.wandb.enabled else 'disabled'}",
        title="Configuration", border_style="blue",
    ))

    # -- feature cache ----------------------------------------------------
    cache_dir = Path(config.data.cache_dir) / "features"
    feature_cache = FeatureCache(
        cache_dir=cache_dir, whisper_config=config.whisper, data_config=config.data
    )

    encoder_layers = list(config.encoder_layers)
    decoder_layers = list(config.decoder_layers)
    if args.layer:
        component, layer_idx = parse_layer_arg(args.layer)
        encoder_layers = [layer_idx] if component == "encoder" else []
        decoder_layers = [layer_idx] if component == "decoder" else []

    need_extraction = any(
        not feature_cache.has_cache("encoder", l) for l in encoder_layers
    ) or any(not feature_cache.has_cache("decoder", l) for l in decoder_layers)

    if need_extraction or args.extract_only:
        console.print("\n[bold]Loading Whisper model...[/bold]")
        arch = arch_for(config.whisper.model_name)
        if args.random_whisper:
            params = init_whisper(jax.random.PRNGKey(config.training.seed), arch)
            console.print("[yellow]Using RANDOM Whisper weights (--random-whisper)[/yellow]")
        else:
            try:
                params, arch = load_pretrained(config.whisper.model_name)
                console.print(f"Loaded {config.whisper.model_name}")
            except Exception as e:
                console.print(
                    f"[yellow]Pretrained load failed ({type(e).__name__}); "
                    "falling back to random weights. Pass --random-whisper to "
                    "silence this warning.[/yellow]"
                )
                params = init_whisper(jax.random.PRNGKey(config.training.seed), arch)

        console.print("\n[bold]Extracting features...[/bold]")
        if config.data.dataset_name == "synthetic":
            dataset = SyntheticSpeechDataset(
                num_samples=config.data.max_samples, seed=config.training.seed,
                n_mels=arch.n_mels,  # 128 for large-v3
            )
        else:
            dataset = LibriSpeechDataset(config.data, n_mels=arch.n_mels)
        # the reference extracts at batch 16 (reference scripts/train.py:313);
        # on TPU larger batches feed the MXU better — measured 797 -> 1100
        # clips/s going 16 -> 64 on one v5e (same outputs, shape-only change)
        loader = AudioBatchLoader(LibriSpeechFeaturesOnly(dataset), batch_size=64)
        import jax.numpy as jnp

        extract_and_cache_features(
            params, arch, loader, feature_cache,
            encoder_layers=encoder_layers, decoder_layers=decoder_layers,
            max_samples=config.data.max_samples,
            compute_dtype=jnp.bfloat16 if config.training.use_amp else None,
            # multi-chip capture: batch sharded over ``data`` (the model
            # axis is unused by the batch-parallel forward)
            mesh=mesh,
        )
        console.print("[green]Feature extraction complete[/green]")

    if args.extract_only:
        console.print("\n[yellow]Extract-only mode, skipping training[/yellow]")
        return

    # -- per-layer training ------------------------------------------------
    def train_layer(component: str, layer_idx: int) -> None:
        console.print(
            f"\n[bold blue]Training SAE for {component} layer {layer_idx}[/bold blue]"
        )
        if not feature_cache.has_cache(component, layer_idx):
            console.print(
                f"[red]No cached features found for {component} layer {layer_idx}[/red]"
            )
            console.print("Run with --extract-only first to extract features")
            return

        metadata = feature_cache.load_metadata(component, layer_idx)
        console.print(f"Cached {metadata.num_tokens:,} tokens, dim={metadata.hidden_dim}")

        sae = create_sae(config.sae, input_dim=metadata.hidden_dim, seed=config.training.seed)
        console.print(f"Created SAE: {metadata.hidden_dim} -> {sae.hidden_dim} (k={config.sae.k})")

        dataloader = feature_cache.get_dataloader(
            component=component, layer_idx=layer_idx,
            batch_size=config.training.batch_size, shuffle=True,
            seed=config.training.seed,
        )

        run_name = f"{config.experiment_name}_{component}_layer{layer_idx}"
        run_dir = Path(config.output_dir) / run_name
        run_dir.mkdir(parents=True, exist_ok=True)

        trainer = SAETrainer(model=sae, config=config.training, run_dir=run_dir, mesh=mesh)
        if config.sae.dead_feature_resample:
            # a bounded random subsample, so out-of-core caches don't get
            # pulled into RAM just for resampling
            if hasattr(dataloader, "reader"):
                idx = np.random.default_rng(config.training.seed).permutation(
                    metadata.num_tokens
                )[: 8 * trainer.resample_batch_size]
                trainer.set_resample_dataset(dataloader.reader.gather(np.sort(idx)))
            else:
                trainer.set_resample_dataset(dataloader.data)
        if args.resume is not None:
            trainer.load_checkpoint(args.resume)
            console.print(f"Resumed from {args.resume} (step {trainer.global_step})")

        if config.wandb.enabled:
            try:
                import wandb

                trainer.wandb_run = wandb.init(
                    project=config.wandb.project,
                    entity=config.wandb.entity,
                    name=run_name,
                    tags=config.wandb.tags + [component, f"layer{layer_idx}"],
                    config={
                        "whisper": config.whisper.model_dump(),
                        "sae": config.sae.model_dump(),
                        "training": config.training.model_dump(),
                        "component": component,
                        "layer_idx": layer_idx,
                    },
                )
            except Exception as e:
                console.print(f"[yellow]W&B initialization failed: {e}[/yellow]")
                console.print("Continuing without W&B logging...")

        console.print(f"Training for {config.training.epochs} epochs...")
        from whisper_sae_tpu.utils.profiling import trace

        with trace(args.profile):
            trainer.train(dataloader, epochs=config.training.epochs)
        trainer.save_final()
        console.print(f"[green]Saved model to {run_dir / 'sae_final.npz'}[/green]")
        trainer.save_metrics()
        console.print(f"[green]Saved metrics to {run_dir / 'metrics.json'}[/green]")
        if trainer.wandb_run is not None:
            trainer.wandb_run.finish()

    for layer_idx in encoder_layers:
        train_layer("encoder", layer_idx)
    for layer_idx in decoder_layers:
        train_layer("decoder", layer_idx)

    console.print("\n[bold green]Training complete![/bold green]")


if __name__ == "__main__":
    main()
