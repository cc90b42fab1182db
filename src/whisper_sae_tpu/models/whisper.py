"""Whisper encoder/decoder forward in JAX with functional activation capture.

Replaces the reference's hook-based extraction
(/root/reference/src/whisper_sae/sae/hooks.py:40-230) with a pure
function: the forward *returns* per-layer activations instead of
mutating a cache via forward hooks with per-layer ``.cpu()`` round-trips.
Layers run under ``lax.scan`` over stacked weights, so the whole
capture is one XLA program and the per-layer outputs come back as a
single stacked ``[L, B, T, D]`` array resident in HBM.

Architecture facts pinned to HF ``transformers`` WhisperModel semantics
(the parity oracle in tests/test_whisper.py mirrors reference
tests/test_hooks.py:312-358):
- conv stem: Conv1d(n_mels->D, k=3, pad 1) GELU, Conv1d(D->D, k=3,
  stride 2, pad 1) GELU; sinusoidal encoder positions added to all
  ``max_source_positions`` frames;
- pre-LN transformer blocks; attention q/v/out have bias, k does not;
  q scaled by head_dim**-0.5; exact (erf) GELU; LN eps 1e-5;
- decoder: learned positional embeddings, causal self-attention +
  cross-attention, final layer_norm on both stacks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

LN_EPS = 1e-5


@dataclass(frozen=True)
class WhisperArch:
    """Static architecture hyperparameters."""

    d_model: int = 384
    encoder_layers: int = 4
    decoder_layers: int = 4
    num_heads: int = 6
    ffn_dim: int = 1536
    n_mels: int = 80
    max_source_positions: int = 1500
    max_target_positions: int = 448
    vocab_size: int = 51865
    decoder_start_token_id: int = 50258
    eos_token_id: int = 50257

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


_ARCHS = {
    "openai/whisper-tiny": WhisperArch(384, 4, 4, 6, 1536),
    "openai/whisper-base": WhisperArch(512, 6, 6, 8, 2048),
    "openai/whisper-small": WhisperArch(768, 12, 12, 12, 3072),
    "openai/whisper-medium": WhisperArch(1024, 24, 24, 16, 4096),
    "openai/whisper-large": WhisperArch(1280, 32, 32, 20, 5120),
    "openai/whisper-large-v2": WhisperArch(1280, 32, 32, 20, 5120),
    "openai/whisper-large-v3": WhisperArch(
        1280, 32, 32, 20, 5120, n_mels=128, vocab_size=51866
    ),
}


def arch_for(model_name: str) -> WhisperArch:
    return _ARCHS[model_name]


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _layer_norm(x: jax.Array, g: jax.Array, b: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + LN_EPS) * g + b).astype(x.dtype)


def _use_fused_encoder(t: int, arch: WhisperArch) -> bool:
    """Fused encoder layer blocks (ops/pallas_encoder.py) engage for
    bf16 fast-extraction on TPU; the f32 parity mode and CPU tests keep
    the composed XLA path."""
    from ..ops import pallas_encoder

    t_pad = -(-t // 128) * 128
    return pallas_encoder.supported(t_pad, arch.d_model, arch.num_heads)


def _use_flash_attention(tq: int, tk: int, dtype) -> bool:
    """Flash attention pays off for long self-attention (the encoder's
    1500-frame sequence, where materializing [B, H, T, T] scores is the
    memory bottleneck); tiny decoder sequences stay on the XLA path.
    Restricted to bf16 compute: the kernel's internal rounding (~1e-3
    relative) is inside bf16 noise but would break the f32 parity mode's
    2e-4 budget against HF Whisper."""
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return (
        platform not in ("cpu",)
        and dtype == jnp.bfloat16
        and tq == tk
        and tq >= 256
    )


def _flash_self_attention(q, k, v) -> jax.Array:
    """Pallas TPU flash attention over [B, h, T, hd], padding T up to a
    block multiple with segment-id masking (encoder T=1500 -> 1536)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, t, hd = q.shape
    block = 512
    t_pad = -(-t // block) * block
    pad = t_pad - t
    if pad:
        padding = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
        ids = jnp.concatenate(
            [jnp.zeros((b, t), jnp.int32), jnp.ones((b, pad), jnp.int32)], axis=1
        )
        segment_ids = fa.SegmentIds(q=ids, kv=ids)
    else:
        segment_ids = None
    sizes = fa.BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block, block_k_dkv=block,
        block_q_dkv=block, block_k_major_dq=block, block_k_dq=block,
        block_q_dq=block,
    )
    out = fa.flash_attention(
        q, k, v, segment_ids=segment_ids, causal=False, sm_scale=1.0,
        block_sizes=sizes,
    )
    return out[:, :, :t, :]


def _attention(
    x_q: jax.Array,
    x_kv: jax.Array,
    p: dict[str, jax.Array],
    num_heads: int,
    causal: bool,
) -> jax.Array:
    b, tq, d = x_q.shape
    tk = x_kv.shape[1]
    hd = d // num_heads
    scale = hd**-0.5

    q = (x_q @ p["wq"] + p["bq"]) * scale

    if not causal and tq * num_heads * 2 <= d and tk >= 8 * tq:
        # Few-query cross-attention — the BOS capture pass (reference
        # hooks.py:184-195 only ever decodes one BOS token).  Projecting
        # the tk-frame memory through Wk/Wv costs O(tk*d^2) FLOPs plus
        # two [B, tk, d] HBM round-trips per layer, all to answer tq << hd
        # queries.  Reassociate exactly:
        #   scores_h = q_h (enc Wk_h)^T = (q_h Wk_h^T) enc^T
        #   attn_h (enc Wv_h + bv_h) = (attn_h enc) Wv_h + bv_h
        # (the key has no bias, matching HF; the value bias folds out
        # because softmax rows sum to 1) — O(tk*d*heads) with no K/V
        # materialization.  Same algebra, so the f32 parity mode keeps
        # its budget; dtype handling mirrors the composed path (scores
        # and softmax in f32, everything else in the input dtype).
        q4 = q.reshape(b, tq, num_heads, hd)
        wk4 = p["wk"].reshape(d, num_heads, hd)
        u = jnp.einsum("bqhe,dhe->bqhd", q4, wk4)
        scores = jnp.einsum(
            "bqhd,bkd->bhqk", u, x_kv, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(scores, axis=-1).astype(x_kv.dtype)
        c = jnp.einsum("bhqk,bkd->bqhd", attn, x_kv)
        wv4 = p["wv"].reshape(d, num_heads, hd)
        out = jnp.einsum("bqhd,dhe->bqhe", c, wv4).reshape(b, tq, d) + p["bv"]
        return out @ p["wo"] + p["bo"]

    k = x_kv @ p["wk"]
    v = x_kv @ p["wv"] + p["bv"]

    q = q.reshape(b, tq, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, tk, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, tk, num_heads, hd).transpose(0, 2, 1, 3)

    if not causal and _use_flash_attention(tq, tk, q.dtype):
        out = _flash_self_attention(q, k, v)
    else:
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        if causal:
            mask = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
            scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
    return out @ p["wo"] + p["bo"]


def _mlp(x: jax.Array, p: dict[str, jax.Array]) -> jax.Array:
    h = jax.nn.gelu(x @ p["w1"] + p["b1"], approximate=False)
    return h @ p["w2"] + p["b2"]


def _encoder_layer(
    x: jax.Array, lp: dict, num_heads: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (layer output, mlp input, mlp output).

    The MLP pair is the transcoder's training data: mlp_in is exactly
    what fc1 consumes (post-LN2), mlp_out is fc2's output pre-residual.
    Callers that only want the layer output drop the pair (XLA dead-code
    eliminates the stacking)."""
    x = x + _attention(
        _layer_norm(x, lp["ln1_g"], lp["ln1_b"]),
        _layer_norm(x, lp["ln1_g"], lp["ln1_b"]),
        lp["attn"],
        num_heads,
        causal=False,
    )
    mlp_in = _layer_norm(x, lp["ln2_g"], lp["ln2_b"])
    mlp_out = _mlp(mlp_in, lp["mlp"])
    return x + mlp_out, mlp_in, mlp_out


def _decoder_layer(
    x: jax.Array, enc: jax.Array, lp: dict, num_heads: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (layer output, mlp input, mlp output) — see _encoder_layer."""
    h = _layer_norm(x, lp["ln1_g"], lp["ln1_b"])
    x = x + _attention(h, h, lp["attn"], num_heads, causal=True)
    h = _layer_norm(x, lp["ln_x_g"], lp["ln_x_b"])
    x = x + _attention(h, enc, lp["xattn"], num_heads, causal=False)
    mlp_in = _layer_norm(x, lp["ln2_g"], lp["ln2_b"])
    mlp_out = _mlp(mlp_in, lp["mlp"])
    return x + mlp_out, mlp_in, mlp_out


# ---------------------------------------------------------------------------
# forward passes with capture
# ---------------------------------------------------------------------------


def _fused_encoder_layers(x, enc, arch: WhisperArch, with_mlp: bool,
                          t_real: int | None = None,
                          final_ln: tuple | None = None,
                          capture_dtype=jnp.bfloat16):
    """Run the encoder stack through the fused Pallas layer blocks
    (ops/pallas_encoder.py): the sequence is padded ONCE to a lane-tile
    multiple, every layer runs as two kernels (LN+attention+residual,
    LN+MLP+residual) with all intermediates VMEM-resident, and the pad
    rows are sliced off at the end.  ``t_real`` marks the valid prefix
    when ``x`` arrives pre-padded (from the fused conv stem).  bf16-mode
    only; numerics match the composed path to bf16 rounding.

    ``final_ln=(ln_f_g, ln_f_b)`` makes the captured layer outputs come
    back already final-LN'd at ``capture_dtype`` (applied in-kernel on
    the bf16-rounded layer output — byte-identical to LN-ing the stacked
    raw captures afterwards, ops/pallas_encoder.py:fused_mlp_block),
    skipping the extraction pipeline's whole-[L, B, T, D] LN HBM
    round-trip.  The carry/last-hidden ``x`` stays raw either way."""
    from ..ops import pallas_encoder

    b, t_in, d = x.shape
    t = t_in if t_real is None else t_real
    t_pad = -(-t // 128) * 128 if t_real is None else t_in
    if t_pad != t_in:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t_in), (0, 0)))

    # at medium/large d the full attention kernel's spilled live set
    # exceeds VMEM (measured 171 MB at d=1280) and the block dispatches
    # to the query-row-tiled kernel; if no variant fits, the sublayer
    # falls back to the composed XLA attention (flash) on the unpadded
    # rows while the MLP kernels (which still fit) keep the stack fused
    fused_attn = pallas_encoder.attention_block_available(
        t_pad, d, arch.num_heads
    )

    def body(h, lp):
        if fused_attn:
            h = pallas_encoder.fused_attention_block(
                h, lp["ln1_g"], lp["ln1_b"], lp["attn"],
                n_heads=arch.num_heads, t_real=t,
            )
        else:
            hr = h[:, :t]
            hn = _layer_norm(hr, lp["ln1_g"], lp["ln1_b"])
            hr = hr + _attention(hn, hn, lp["attn"], arch.num_heads, causal=False)
            h = jnp.pad(hr, ((0, 0), (0, t_pad - t), (0, 0)))
        flat = h.reshape(b * t_pad, d)
        outs = pallas_encoder.fused_mlp_block(
            flat, lp["ln2_g"], lp["ln2_b"], lp["mlp"], capture=with_mlp,
            final_ln=final_ln, capture_dtype=capture_dtype,
        )
        if not (with_mlp or final_ln is not None):
            outs = (outs,)
        out = outs[0].reshape(b, t_pad, d)
        cap = outs[1].reshape(b, t_pad, d) if final_ln is not None else out
        stacked = (cap,)
        if with_mlp:
            mlp_in, mlp_out = outs[-2], outs[-1]
            stacked += (
                mlp_in.reshape(b, t_pad, d),
                mlp_out.reshape(b, t_pad, d),
            )
        return out, stacked

    x, captured = jax.lax.scan(body, x, enc["layers"])
    x = x[:, :t]
    layer_outputs = captured[0][:, :, :t]
    if with_mlp:
        return x, layer_outputs, (captured[1][:, :, :t], captured[2][:, :, :t])
    return x, layer_outputs, None


def encoder_forward(
    params: dict, mel: jax.Array, arch: WhisperArch, with_mlp: bool = False,
    use_fused: bool = True, capture_final_ln: bool = False,
    capture_dtype=None,
):
    """Encoder forward.

    Args:
        params: whisper params (see ``init_whisper`` / ``from_hf_torch``).
        mel: [B, n_mels, T_mel] log-mel features (T_mel = 2 * source pos).
        with_mlp: also return per-layer (mlp_in, mlp_out) pairs — the
            transcoder's training data (post-LN2 fc1 input, pre-residual
            fc2 output).  When False the pairs are dead code and XLA
            eliminates them (the fused TPU path skips computing them).
        use_fused: allow the fused Pallas encoder blocks in bf16 on TPU.
            Mesh-sharded extraction passes False — GSPMD treats a
            pallas_call as opaque (replicates instead of partitioning
            over the batch), so the sharded path keeps the composed XLA
            stack that partitions cleanly.
        capture_final_ln: return ``layer_outputs`` with the encoder's
            final layer_norm already applied at ``capture_dtype`` (the
            aiOla capture trick, reference hooks.py:87-92).  On the
            fused path the LN runs in-kernel while the layer output is
            still in VMEM (byte-identical to LN-ing the stacked
            ``capture_dtype`` captures afterwards); the composed path
            applies the same cast-then-LN in XLA.  MLP pairs stay raw.
        capture_dtype: dtype of the returned captures when
            ``capture_final_ln`` (default: the compute dtype).

    Returns:
        (last_hidden [B, T, D] — after the final layer_norm,
         layer_outputs [L, B, T, D] — each layer's output: pre-final-LN
         (exactly what the reference's forward hooks capture) by
         default, post-final-LN when ``capture_final_ln``
         [, (mlp_ins, mlp_outs) each [L, B, T, D] when ``with_mlp``]).
    """
    enc = params["encoder"]
    t_out = mel.shape[2] // 2
    x = None
    if use_fused and mel.dtype == jnp.bfloat16 and _use_fused_encoder(t_out, arch):
        from ..ops import pallas_encoder

        if pallas_encoder.stem_supported(mel.shape[1], mel.shape[2], arch.d_model):
            # fused conv stem emits the pre-padded, pos-added sequence
            t_pad = -(-t_out // 128) * 128
            x = pallas_encoder.fused_conv_stem(mel, enc, t_pad)
    if x is None:
        dn = ("NCH", "OIH", "NCH")
        x = jax.lax.conv_general_dilated(
            mel, enc["conv1_w"], (1,), [(1, 1)], dimension_numbers=dn
        ) + enc["conv1_b"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        x = jax.lax.conv_general_dilated(
            x, enc["conv2_w"], (2,), [(1, 1)], dimension_numbers=dn
        ) + enc["conv2_b"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        x = x.transpose(0, 2, 1)  # [B, T, D]
        x = x + enc["pos"][: x.shape[1]]
        t_out = x.shape[1]
        stem_fused = False
    else:
        stem_fused = True

    cap_dt = capture_dtype if capture_dtype is not None else x.dtype
    if use_fused and x.dtype == jnp.bfloat16 and _use_fused_encoder(t_out, arch):
        final_ln = (
            (enc["ln_f_g"].astype(jnp.float32), enc["ln_f_b"].astype(jnp.float32))
            if capture_final_ln
            else None
        )
        x, layer_outputs, mlp_pair = _fused_encoder_layers(
            x, enc, arch, with_mlp, t_real=t_out if stem_fused else None,
            final_ln=final_ln, capture_dtype=cap_dt,
        )
        if capture_final_ln and cap_dt == x.dtype:
            # the last layer's LN'd capture IS the final hidden state
            # (same bf16-rounded input, same f32 LN) — skip re-LN-ing x
            last = layer_outputs[-1]
        else:
            last = _layer_norm(x, enc["ln_f_g"], enc["ln_f_b"])
        if with_mlp:
            return last, layer_outputs, mlp_pair
        return last, layer_outputs

    def body(h, lp):
        h, mlp_in, mlp_out = _encoder_layer(h, lp, arch.num_heads)
        return h, (h, mlp_in, mlp_out)

    x, (layer_outputs, mlp_ins, mlp_outs) = jax.lax.scan(body, x, enc["layers"])
    last = _layer_norm(x, enc["ln_f_g"], enc["ln_f_b"])
    if capture_final_ln:
        # same cast-then-LN order as the fused path / the pre-fold
        # extraction pipeline (capture cast to its dtype, then LN with
        # f32 internals)
        layer_outputs = _layer_norm(
            layer_outputs.astype(cap_dt),
            enc["ln_f_g"].astype(jnp.float32),
            enc["ln_f_b"].astype(jnp.float32),
        )
    if with_mlp:
        return last, layer_outputs, (mlp_ins, mlp_outs)
    return last, layer_outputs


def decoder_forward(
    params: dict,
    token_ids: jax.Array,
    enc_hidden: jax.Array,
    arch: WhisperArch,
    with_mlp: bool = False,
):
    """Decoder forward over ``token_ids`` [B, T_dec] (full-sequence; no KV
    cache — analysis-scale decoding re-runs the stack, see greedy_decode).

    Returns (last_hidden after final LN, per-layer outputs [L, B, T_dec, D]
    [, (mlp_ins, mlp_outs) when ``with_mlp`` — see encoder_forward]).
    """
    dec = params["decoder"]
    t = token_ids.shape[1]
    x = dec["tok"][token_ids] + dec["pos"][:t]
    # cross-attention K/V must match the decoder's compute dtype, or the
    # residual add promotes the scan carry (bf16 params + f32 enc_hidden
    # would flip the carry to f32 mid-layer and fail the scan)
    enc_hidden = enc_hidden.astype(x.dtype)

    def body(h, lp):
        h, mlp_in, mlp_out = _decoder_layer(h, enc_hidden, lp, arch.num_heads)
        return h, (h, mlp_in, mlp_out)

    x, (layer_outputs, mlp_ins, mlp_outs) = jax.lax.scan(body, x, dec["layers"])
    last = _layer_norm(x, dec["ln_f_g"], dec["ln_f_b"])
    if with_mlp:
        return last, layer_outputs, (mlp_ins, mlp_outs)
    return last, layer_outputs


@partial(
    jax.jit,
    static_argnames=(
        "arch", "apply_layer_norm", "with_decoder", "compute_dtype",
        "with_mlp", "capture_dtype", "use_fused_encoder",
    ),
)
def extract_activations(
    params: dict,
    mel: jax.Array,
    arch: WhisperArch,
    apply_layer_norm: bool = True,
    with_decoder: bool = True,
    compute_dtype=None,
    with_mlp: bool = False,
    capture_dtype=None,
    use_fused_encoder: bool = True,
) -> dict[str, jax.Array]:
    """Functional replacement for the reference's hook pipeline
    (hooks.py:146-210): run the encoder, then the decoder on a single
    BOS token, and return every layer's output.

    ``compute_dtype=jnp.bfloat16`` runs the transformer blocks in bf16 on
    the MXU (layer norms and softmax stay f32 internally) — ~3x faster
    extraction.  ``capture_dtype`` sets the dtype of the returned capture
    arrays (default f32).  Passing ``jnp.bfloat16`` in bf16-compute mode
    yields bit-identical bytes to casting the f32 returns afterwards
    (layer norms still reduce in f32 internally) while skipping the
    [L, B, T, D] f32 round-trip through HBM — the fast extraction
    pipeline's default.  The all-defaults path is full f32, the
    parity-oracle mode.

    Returns dict with:
        "encoder": [L_enc, B, T, D] per-layer outputs (final-LN applied
                   when ``apply_layer_norm`` — the aiOla trick,
                   hooks.py:87-92);
        "decoder": [L_dec, B, 1, D] (present when ``with_decoder``);
        "encoder_last": [B, T, D] final encoder hidden states;
        "{encoder,decoder}_mlp_{in,out}": [L, B, T, D] MLP input/output
                   pairs (present when ``with_mlp``) — transcoder
                   training data, returned RAW (no final-LN: they are
                   exactly what fc1 consumes / fc2 produces).
    """
    out_dt = jnp.float32 if capture_dtype is None else capture_dtype
    if compute_dtype is not None:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if a.dtype == jnp.float32
            else a,
            params,
        )
        mel = mel.astype(compute_dtype)
    # capture_final_ln pushes the final-LN of the captures into the
    # fused MLP kernels (in-VMEM, byte-identical to LN-ing the stacked
    # captures here — _layer_norm reduces in f32 internally and returns
    # its input dtype, so a bf16 capture_dtype sees the same f32 LN
    # values rounded once); the composed path applies the identical
    # cast-then-LN inside encoder_forward
    fwd_kw = dict(
        use_fused=use_fused_encoder,
        capture_final_ln=apply_layer_norm,
        capture_dtype=out_dt,
    )
    if with_mlp:
        enc_last, enc_layers, (enc_min, enc_mout) = encoder_forward(
            params, mel, arch, with_mlp=True, **fwd_kw
        )
    else:
        enc_last, enc_layers = encoder_forward(params, mel, arch, **fwd_kw)
        enc_min = enc_mout = None
    enc_last = enc_last.astype(jnp.float32)
    enc_layers = enc_layers.astype(out_dt)
    out = {"encoder": enc_layers, "encoder_last": enc_last}
    if with_mlp:
        out["encoder_mlp_in"] = enc_min.astype(out_dt)
        out["encoder_mlp_out"] = enc_mout.astype(out_dt)
    if with_decoder:
        bos = jnp.full((mel.shape[0], 1), arch.decoder_start_token_id, jnp.int32)
        enc_for_dec = (
            enc_last.astype(compute_dtype) if compute_dtype is not None else enc_last
        )
        _, dec_layers, (dec_min, dec_mout) = decoder_forward(
            params, bos, enc_for_dec, arch, with_mlp=True
        )
        dec_layers = dec_layers.astype(out_dt)
        if apply_layer_norm:
            g, b = params["decoder"]["ln_f_g"], params["decoder"]["ln_f_b"]
            dec_layers = _layer_norm(dec_layers, g.astype(jnp.float32),
                                     b.astype(jnp.float32))
        out["decoder"] = dec_layers
        if with_mlp:
            out["decoder_mlp_in"] = dec_min.astype(out_dt)
            out["decoder_mlp_out"] = dec_mout.astype(out_dt)
    return out


def flatten_activations(acts: jax.Array, component: str = "encoder") -> jax.Array:
    """[B, S, H] -> [B*S, H] row-major (reference hooks.py:213-230).

    ``component`` is accepted for call-site parity with the reference
    (which takes it positionally); the reshape is identical for both.
    """
    return acts.reshape(-1, acts.shape[-1])


def decoder_logits(params: dict, hidden: jax.Array) -> jax.Array:
    """LM logits from decoder hidden states (Whisper ties the output
    projection to the token embedding)."""
    return jnp.dot(hidden, params["decoder"]["tok"].T, preferred_element_type=jnp.float32)


def _forced_buffer(forced_ids, max_len: int) -> jnp.ndarray:
    """[max_len] int32: forced token id at positions 1..len(forced_ids),
    -1 (= unforced) elsewhere.  Mirrors HF generate's
    ``forced_decoder_ids`` (language/task/notimestamps prompt)."""
    buf = np.full((max_len,), -1, np.int32)
    if forced_ids:
        ids = list(forced_ids)[: max_len - 1]
        buf[1 : 1 + len(ids)] = ids
    return jnp.asarray(buf)


@partial(jax.jit, static_argnames=("arch", "max_len", "forced_ids"))
def greedy_decode_cached(
    params: dict,
    mel: jax.Array,
    arch: WhisperArch,
    max_len: int = 32,
    encoder_hidden: jax.Array | None = None,
    forced_ids: tuple[int, ...] | None = None,
) -> jax.Array:
    """KV-cached greedy decoding: one incremental decoder step per token.

    Cross-attention K/V are computed once from the encoder states; the
    self-attention cache is a fixed [L, B, max_len, D] buffer updated by
    ``dynamic_update_slice`` inside a ``fori_loop`` (static shapes, no
    recompute of earlier positions — unlike :func:`greedy_decode`, which
    re-runs the full stack per step).  Produces identical tokens.

    Sequences freeze to ``arch.eos_token_id`` once they emit it (so no
    post-EOS garbage reaches ``batch_decode``); ``forced_ids`` pins the
    decoder prompt positions 1..len(forced_ids) like HF generate's
    forced_decoder_ids.
    """
    if encoder_hidden is None:
        encoder_hidden, _ = encoder_forward(params, mel, arch)
    dec = params["decoder"]
    b = encoder_hidden.shape[0]
    d = arch.d_model
    nh = arch.num_heads
    hd = arch.head_dim
    n_layers = arch.decoder_layers

    # cross-attention K/V once per layer: [L, B, T_enc, D]
    def xkv(lp):
        return (
            encoder_hidden @ lp["xattn"]["wk"],
            encoder_hidden @ lp["xattn"]["wv"] + lp["xattn"]["bv"],
        )

    xk, xv = jax.vmap(xkv)(dec["layers"])

    tokens = jnp.full((b, max_len), arch.decoder_start_token_id, jnp.int32)
    cache_k = jnp.zeros((n_layers, b, max_len, d), encoder_hidden.dtype)
    cache_v = jnp.zeros((n_layers, b, max_len, d), encoder_hidden.dtype)
    finished = jnp.zeros((b,), jnp.bool_)
    forced_buf = _forced_buffer(forced_ids, max_len)
    eos = jnp.int32(arch.eos_token_id)

    def split(y):  # [B, 1, D] -> [B, nh, 1, hd]
        return y.reshape(b, 1, nh, hd).transpose(0, 2, 1, 3)

    def merge(y):  # [B, nh, 1, hd] -> [B, 1, D]
        return y.transpose(0, 2, 1, 3).reshape(b, 1, d)

    def step(t, state):
        tokens, cache_k, cache_v, finished = state
        x = dec["tok"][tokens[:, t]][:, None, :] + dec["pos"][t]

        def layer(carry, scanned):
            (h,) = carry
            lp, ck, cv, kx, vx = scanned
            # self-attention with cache
            hn = _layer_norm(h, lp["ln1_g"], lp["ln1_b"])
            q = split((hn @ lp["attn"]["wq"] + lp["attn"]["bq"]) * hd**-0.5)
            k_new = hn @ lp["attn"]["wk"]
            v_new = hn @ lp["attn"]["wv"] + lp["attn"]["bv"]
            ck = jax.lax.dynamic_update_slice(ck, k_new, (0, t, 0))
            cv = jax.lax.dynamic_update_slice(cv, v_new, (0, t, 0))
            ks = ck.reshape(b, max_len, nh, hd).transpose(0, 2, 1, 3)
            vs = cv.reshape(b, max_len, nh, hd).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, ks, preferred_element_type=jnp.float32)
            valid = (jnp.arange(max_len) <= t)[None, None, None, :]
            s = jnp.where(valid, s, jnp.finfo(jnp.float32).min)
            a = jax.nn.softmax(s, axis=-1).astype(vs.dtype)
            h = h + merge(jnp.einsum("bhqk,bhkd->bhqd", a, vs)) @ lp["attn"]["wo"] + lp["attn"]["bo"]
            # cross-attention against precomputed encoder K/V
            hn = _layer_norm(h, lp["ln_x_g"], lp["ln_x_b"])
            q = split((hn @ lp["xattn"]["wq"] + lp["xattn"]["bq"]) * hd**-0.5)
            kx_h = kx.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
            vx_h = vx.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, kx_h, preferred_element_type=jnp.float32)
            a = jax.nn.softmax(s, axis=-1).astype(vx_h.dtype)
            h = h + merge(jnp.einsum("bhqk,bhkd->bhqd", a, vx_h)) @ lp["xattn"]["wo"] + lp["xattn"]["bo"]
            # mlp
            h = h + _mlp(_layer_norm(h, lp["ln2_g"], lp["ln2_b"]), lp["mlp"])
            return (h,), (ck, cv)

        (x,), (cache_k, cache_v) = jax.lax.scan(
            layer, (x,), (dec["layers"], cache_k, cache_v, xk, xv)
        )
        x = _layer_norm(x, dec["ln_f_g"], dec["ln_f_b"])
        logits = decoder_logits(params, x[:, 0, :])
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(forced_buf[t + 1] >= 0, forced_buf[t + 1], nxt)
        nxt = jnp.where(finished, eos, nxt)
        finished = finished | (nxt == eos)
        tokens = jax.lax.cond(
            t + 1 < max_len,
            lambda tk: tk.at[:, t + 1].set(nxt),
            lambda tk: tk,
            tokens,
        )
        return tokens, cache_k, cache_v, finished

    tokens, _, _, _ = jax.lax.fori_loop(
        0, max_len - 1, step, (tokens, cache_k, cache_v, finished)
    )
    return tokens


@partial(jax.jit, static_argnames=("arch", "max_len", "forced_ids"))
def greedy_decode(
    params: dict,
    mel: jax.Array,
    arch: WhisperArch,
    max_len: int = 32,
    encoder_hidden: jax.Array | None = None,
    forced_ids: tuple[int, ...] | None = None,
) -> jax.Array:
    """Greedy token decoding (no KV cache — O(L) full decoder passes on a
    fixed-length buffer, fine for analysis-scale use; the reference never
    decodes at all, its decoder only ever sees one BOS token).

    Returns [B, max_len] token ids starting with the BOS token.  Same
    EOS-freeze and forced-prompt semantics as :func:`greedy_decode_cached`.
    """
    if encoder_hidden is None:
        encoder_hidden, _ = encoder_forward(params, mel, arch)
    b = encoder_hidden.shape[0]
    tokens = jnp.full((b, max_len), arch.decoder_start_token_id, jnp.int32)
    finished = jnp.zeros((b,), jnp.bool_)
    forced_buf = _forced_buffer(forced_ids, max_len)
    eos = jnp.int32(arch.eos_token_id)

    def step(t, state):
        tokens, finished = state
        hidden, _ = decoder_forward(params, tokens, encoder_hidden, arch)
        logits = decoder_logits(params, hidden[:, t, :])
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(forced_buf[t + 1] >= 0, forced_buf[t + 1], nxt)
        nxt = jnp.where(finished, eos, nxt)
        finished = finished | (nxt == eos)
        return tokens.at[:, t + 1].set(nxt), finished

    tokens, _ = jax.lax.fori_loop(0, max_len - 1, step, (tokens, finished))
    return tokens


# ---------------------------------------------------------------------------
# params: random init & HF import
# ---------------------------------------------------------------------------


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal encoder positions."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def init_whisper(key: jax.Array, arch: WhisperArch) -> dict:
    """Random init (for tests; real runs import HF weights)."""
    d, f = arch.d_model, arch.ffn_dim
    n_keys = 8 + 10 * (arch.encoder_layers + arch.decoder_layers)
    keys = iter(jax.random.split(key, n_keys))

    def lin(k, i, o):
        return jax.random.normal(k, (i, o), jnp.float32) * (0.02)

    def attn_p():
        return {
            "wq": lin(next(keys), d, d),
            "bq": jnp.zeros((d,)),
            "wk": lin(next(keys), d, d),
            "wv": lin(next(keys), d, d),
            "bv": jnp.zeros((d,)),
            "wo": lin(next(keys), d, d),
            "bo": jnp.zeros((d,)),
        }

    def enc_layer():
        return {
            "attn": attn_p(),
            "ln1_g": jnp.ones((d,)),
            "ln1_b": jnp.zeros((d,)),
            "mlp": {
                "w1": lin(next(keys), d, f),
                "b1": jnp.zeros((f,)),
                "w2": lin(next(keys), f, d),
                "b2": jnp.zeros((d,)),
            },
            "ln2_g": jnp.ones((d,)),
            "ln2_b": jnp.zeros((d,)),
        }

    def dec_layer():
        lp = enc_layer()
        lp["xattn"] = attn_p()
        lp["ln_x_g"] = jnp.ones((d,))
        lp["ln_x_b"] = jnp.zeros((d,))
        return lp

    def stack(layers):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)

    return {
        "encoder": {
            "conv1_w": jax.random.normal(next(keys), (d, arch.n_mels, 3)) * 0.02,
            "conv1_b": jnp.zeros((d,)),
            "conv2_w": jax.random.normal(next(keys), (d, d, 3)) * 0.02,
            "conv2_b": jnp.zeros((d,)),
            "pos": jnp.asarray(_sinusoids(arch.max_source_positions, d)),
            "layers": stack([enc_layer() for _ in range(arch.encoder_layers)]),
            "ln_f_g": jnp.ones((d,)),
            "ln_f_b": jnp.zeros((d,)),
        },
        "decoder": {
            "tok": jax.random.normal(next(keys), (arch.vocab_size, d)) * 0.02,
            "pos": jax.random.normal(next(keys), (arch.max_target_positions, d)) * 0.02,
            "layers": stack([dec_layer() for _ in range(arch.decoder_layers)]),
            "ln_f_g": jnp.ones((d,)),
            "ln_f_b": jnp.zeros((d,)),
        },
    }


def from_hf_torch(model) -> tuple[dict, WhisperArch]:
    """Import weights from a ``transformers`` WhisperForConditionalGeneration
    / WhisperModel instance (torch, CPU).  Linear weights are transposed to
    the x @ W layout."""
    cfg = model.config
    arch = WhisperArch(
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        num_heads=cfg.encoder_attention_heads,
        ffn_dim=cfg.encoder_ffn_dim,
        n_mels=cfg.num_mel_bins,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        vocab_size=cfg.vocab_size,
        decoder_start_token_id=cfg.decoder_start_token_id,
        eos_token_id=cfg.eos_token_id,
    )
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    prefix = "model." if any(k.startswith("model.") for k in sd) else ""

    def g(name):
        return jnp.asarray(sd[prefix + name])

    def attn_p(base):
        return {
            "wq": g(f"{base}.q_proj.weight").T,
            "bq": g(f"{base}.q_proj.bias"),
            "wk": g(f"{base}.k_proj.weight").T,
            "wv": g(f"{base}.v_proj.weight").T,
            "bv": g(f"{base}.v_proj.bias"),
            "wo": g(f"{base}.out_proj.weight").T,
            "bo": g(f"{base}.out_proj.bias"),
        }

    def enc_layer(i):
        base = f"encoder.layers.{i}"
        return {
            "attn": attn_p(f"{base}.self_attn"),
            "ln1_g": g(f"{base}.self_attn_layer_norm.weight"),
            "ln1_b": g(f"{base}.self_attn_layer_norm.bias"),
            "mlp": {
                "w1": g(f"{base}.fc1.weight").T,
                "b1": g(f"{base}.fc1.bias"),
                "w2": g(f"{base}.fc2.weight").T,
                "b2": g(f"{base}.fc2.bias"),
            },
            "ln2_g": g(f"{base}.final_layer_norm.weight"),
            "ln2_b": g(f"{base}.final_layer_norm.bias"),
        }

    def dec_layer(i):
        base = f"decoder.layers.{i}"
        return {
            "attn": attn_p(f"{base}.self_attn"),
            "xattn": attn_p(f"{base}.encoder_attn"),
            "ln1_g": g(f"{base}.self_attn_layer_norm.weight"),
            "ln1_b": g(f"{base}.self_attn_layer_norm.bias"),
            "ln_x_g": g(f"{base}.encoder_attn_layer_norm.weight"),
            "ln_x_b": g(f"{base}.encoder_attn_layer_norm.bias"),
            "mlp": {
                "w1": g(f"{base}.fc1.weight").T,
                "b1": g(f"{base}.fc1.bias"),
                "w2": g(f"{base}.fc2.weight").T,
                "b2": g(f"{base}.fc2.bias"),
            },
            "ln2_g": g(f"{base}.final_layer_norm.weight"),
            "ln2_b": g(f"{base}.final_layer_norm.bias"),
        }

    def stack(layers):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)

    params = {
        "encoder": {
            "conv1_w": g("encoder.conv1.weight"),
            "conv1_b": g("encoder.conv1.bias"),
            "conv2_w": g("encoder.conv2.weight"),
            "conv2_b": g("encoder.conv2.bias"),
            "pos": g("encoder.embed_positions.weight"),
            "layers": stack([enc_layer(i) for i in range(arch.encoder_layers)]),
            "ln_f_g": g("encoder.layer_norm.weight"),
            "ln_f_b": g("encoder.layer_norm.bias"),
        },
        "decoder": {
            "tok": g("decoder.embed_tokens.weight"),
            "pos": g("decoder.embed_positions.weight"),
            "layers": stack([dec_layer(i) for i in range(arch.decoder_layers)]),
            "ln_f_g": g("decoder.layer_norm.weight"),
            "ln_f_b": g("decoder.layer_norm.bias"),
        },
    }
    return params, arch


def transcribe(
    params: dict,
    arch: WhisperArch,
    audio,
    tokenizer=None,
    max_len: int = 224,
    forced_ids: tuple[int, ...] | None = None,
):
    """Audio -> token ids (and text when a tokenizer is given).

    End-to-end ASR helper: JAX log-mel frontend -> encoder -> KV-cached
    greedy decode.  ``tokenizer`` is any object with ``batch_decode``
    (e.g. HF WhisperTokenizer); without one, raw token ids are returned.
    (The reference never decodes at all — its decoder only ever sees a
    BOS token, hooks.py:184-195.)

    Decoding freezes to EOS per sequence; pass ``forced_ids`` (e.g. the
    language/task/notimestamps ids from
    ``tokenizer.get_decoder_prompt_ids``) to match standard Whisper
    inference prompting.
    """
    from ..data.mel import log_mel_spectrogram

    mel = log_mel_spectrogram(audio, n_mels=arch.n_mels)
    if forced_ids is None and tokenizer is not None:
        get_prompt = getattr(tokenizer, "get_decoder_prompt_ids", None)
        if get_prompt is not None:
            # [(position, token_id), ...] -> position-ordered ids
            forced_ids = tuple(tok for _, tok in sorted(get_prompt()))
    tokens = greedy_decode_cached(
        params, mel, arch, max_len=max_len, forced_ids=forced_ids
    )
    if tokenizer is None:
        return tokens
    return tokenizer.batch_decode(np.asarray(tokens), skip_special_tokens=True)


def load_pretrained(model_name: str):
    """Load HF pretrained weights (requires network or local HF cache).

    Raises a clear error offline; tests use ``init_whisper`` +
    ``from_hf_torch`` on randomly initialized torch models instead.
    """
    try:
        from transformers import WhisperForConditionalGeneration
    except ImportError as e:  # pragma: no cover
        raise ImportError("transformers is required to import HF weights") from e
    model = WhisperForConditionalGeneration.from_pretrained(model_name)
    return from_hf_torch(model)
