"""Decoder analysis tools (cross-attention alignment probes, logit lens).

The reference declares this package empty; see cross_attention.py and
logit_lens.py.
"""

from .cross_attention import attention_entropy, cross_attention_maps, top_attended_frames
from .logit_lens import lens_agreement, logit_lens

__all__ = [
    "attention_entropy",
    "cross_attention_maps",
    "lens_agreement",
    "logit_lens",
    "top_attended_frames",
]
