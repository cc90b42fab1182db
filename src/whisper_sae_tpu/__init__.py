"""whisper_sae_tpu — TPU-native sparse-autoencoder framework for Whisper.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
omarkhursheed/whisper-sae: log-mel frontend, Whisper forward with
functional activation capture, sharded feature cache, TopK/ReLU SAEs,
transcoders, crosscoders, a data-parallel trainer, and the analysis layer
(top-activation tracking, feature reports, audio clip extraction).
"""

__version__ = "0.1.0"

from .config import (
    DataConfig,
    ExperimentConfig,
    LayerConfig,
    MeshConfig,
    SAEConfig,
    TrainingConfig,
    WandbConfig,
    WhisperConfig,
)

__all__ = [
    "DataConfig",
    "ExperimentConfig",
    "LayerConfig",
    "MeshConfig",
    "SAEConfig",
    "TrainingConfig",
    "WandbConfig",
    "WhisperConfig",
    "__version__",
]
