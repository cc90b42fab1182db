"""Compute ops: exact threshold-mask top-k (XLA + Pallas kernels)."""

from .topk import topk_mask_dense, topk_threshold

__all__ = ["topk_mask_dense", "topk_threshold"]
