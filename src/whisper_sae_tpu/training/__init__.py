"""Training: jitted trainers, schedules, fused epochs."""

from .coder_trainers import CrosscoderTrainer, TranscoderTrainer
from .schedule import constant_schedule, warmup_cosine_schedule
from .trainer import SAETrainer, TrainingMetrics

__all__ = [
    "CrosscoderTrainer",
    "SAETrainer",
    "TrainingMetrics",
    "TranscoderTrainer",
    "constant_schedule",
    "warmup_cosine_schedule",
]
