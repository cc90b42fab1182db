"""Decoder analysis tools (cross-attention alignment probes).

The reference declares this package empty; see cross_attention.py.
"""

from .cross_attention import attention_entropy, cross_attention_maps, top_attended_frames

__all__ = ["attention_entropy", "cross_attention_maps", "top_attended_frames"]
