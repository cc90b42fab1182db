"""Decoder analysis: cross-attention probes.

The reference ships this package empty
(/root/reference/src/whisper_sae/decoder_analysis/__init__.py, 0 LoC).
Here it provides the first useful tool: per-layer, per-head
decoder->encoder cross-attention maps, which encoder frames (and hence
audio timestamps) the decoder reads from — the alignment signal used to
interpret decoder SAE features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.whisper import WhisperArch, _layer_norm, encoder_forward


def cross_attention_maps(
    params: dict,
    mel: jax.Array,
    arch: WhisperArch,
    token_ids: jax.Array | None = None,
) -> jax.Array:
    """Cross-attention probabilities for every decoder layer and head.

    Returns [L_dec, B, heads, T_dec, T_enc].  Runs an analysis-path
    decoder pass (python loop over layers; not the training hot path).
    """
    enc_hidden, _ = encoder_forward(params, mel, arch)
    dec = params["decoder"]
    b = mel.shape[0]
    if token_ids is None:
        token_ids = jnp.full((b, 1), arch.decoder_start_token_id, jnp.int32)
    t = token_ids.shape[1]
    x = dec["tok"][token_ids] + dec["pos"][:t]

    nh = arch.num_heads
    hd = arch.head_dim
    maps = []
    n_layers = jax.tree_util.tree_leaves(dec["layers"])[0].shape[0]
    for i in range(n_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i], dec["layers"])
        # self-attention block (causal)
        h = _layer_norm(x, lp["ln1_g"], lp["ln1_b"])
        x = x + _self_attn(h, lp["attn"], nh, hd, causal=True)
        # cross-attention block, capturing probabilities
        h = _layer_norm(x, lp["ln_x_g"], lp["ln_x_b"])
        attn_out, probs = _attn_with_probs(h, enc_hidden, lp["xattn"], nh, hd)
        maps.append(probs)
        x = x + attn_out
        # mlp
        h = _layer_norm(x, lp["ln2_g"], lp["ln2_b"])
        x = x + jax.nn.gelu(h @ lp["mlp"]["w1"] + lp["mlp"]["b1"], approximate=False) @ lp["mlp"]["w2"] + lp["mlp"]["b2"]
    return jnp.stack(maps)


def _split_heads(y, nh, hd):
    b, t, _ = y.shape
    return y.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)


def _self_attn(x, p, nh, hd, causal):
    q = _split_heads((x @ p["wq"] + p["bq"]) * hd**-0.5, nh, hd)
    k = _split_heads(x @ p["wk"], nh, hd)
    v = _split_heads(x @ p["wv"] + p["bv"], nh, hd)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if causal:
        t = x.shape[1]
        s = jnp.where(jnp.tril(jnp.ones((t, t), bool)), s, jnp.finfo(jnp.float32).min)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", a, v)
    b, _, t, _ = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd) @ p["wo"] + p["bo"]


def _attn_with_probs(x_q, x_kv, p, nh, hd):
    q = _split_heads((x_q @ p["wq"] + p["bq"]) * hd**-0.5, nh, hd)
    k = _split_heads(x_kv @ p["wk"], nh, hd)
    v = _split_heads(x_kv @ p["wv"] + p["bv"], nh, hd)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    b, _, t, _ = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd) @ p["wo"] + p["bo"]
    return out, probs


def top_attended_frames(maps: jax.Array, k: int = 5) -> jax.Array:
    """Top-k encoder frames by head-averaged attention for each decoder
    layer/position: [L, B, T_dec, k] frame indices."""
    avg = jnp.mean(maps, axis=2)  # [L, B, T_dec, T_enc]
    return jax.lax.top_k(avg, k)[1]


def attention_entropy(maps: jax.Array) -> jax.Array:
    """Per-layer/head attention entropy [L, B, heads, T_dec] — low entropy
    means sharply localized alignment."""
    p = jnp.clip(maps, 1e-10, 1.0)
    return -jnp.sum(p * jnp.log(p), axis=-1)
