"""Logit lens over the Whisper decoder stack.

Projects every decoder layer's hidden state through the final layer norm
and the tied token embedding (models/whisper.py:decoder_logits) to see
how the next-token prediction forms layer by layer — the standard
transformer-interp probe.  The last layer's lens equals the model's
actual logits exactly (same LN, same projection), which the tests pin.

The reference ships decoder_analysis/ empty; this extends the package's
analysis surface alongside the cross-attention probes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.whisper import (
    WhisperArch,
    _layer_norm,
    decoder_forward,
    decoder_logits,
    encoder_forward,
)


def logit_lens(
    params: dict,
    mel: jax.Array,
    arch: WhisperArch,
    token_ids: jax.Array | None = None,
    top: int = 5,
    position: int = -1,
) -> dict[str, jax.Array]:
    """Per-layer next-token predictions at one decoder position.

    Args:
        params / mel / arch: as :func:`extract_activations`.
        token_ids: [B, T_dec] decoder prompt (default: one BOS token).
        top: how many candidate tokens to return per layer.
        position: which decoder position to read (default: last).

    Returns dict with
        "token_ids":  [L_dec, B, top] int32 — top tokens per layer,
        "probs":      [L_dec, B, top] f32 — their softmax probabilities,
        "logits_last": [B, V] f32 — the true final-layer logits (equal to
                       the lens at the last layer; pinned by tests).
    """
    enc_hidden, _ = encoder_forward(params, mel, arch)
    b = mel.shape[0]
    if token_ids is None:
        token_ids = jnp.full((b, 1), arch.decoder_start_token_id, jnp.int32)
    _, layer_outs = decoder_forward(params, token_ids, enc_hidden, arch)
    # [L, B, D] hidden at the probed position, final-LN'd then projected
    # through the tied embedding — exactly the model's own head
    g = params["decoder"]["ln_f_g"]
    bb = params["decoder"]["ln_f_b"]
    pos_hidden = layer_outs[:, :, position, :]
    lensed = _layer_norm(pos_hidden.astype(jnp.float32), g.astype(jnp.float32),
                         bb.astype(jnp.float32))
    logits = decoder_logits(params, lensed)  # [L, B, V]
    probs = jax.nn.softmax(logits, axis=-1)
    top_p, top_ids = jax.lax.top_k(probs, top)  # analysis path: sort is fine
    return {
        "token_ids": top_ids.astype(jnp.int32),
        "probs": top_p,
        "logits_last": logits[-1],
    }


def lens_agreement(result: dict[str, jax.Array]) -> jax.Array:
    """[L_dec] fraction of batch items whose per-layer top-1 token already
    matches the final layer's top-1 — how early the prediction settles."""
    ids = result["token_ids"][:, :, 0]  # [L, B]
    return jnp.mean((ids == ids[-1][None, :]).astype(jnp.float32), axis=1)
