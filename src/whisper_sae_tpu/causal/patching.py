"""Causal interventions: activation patching through the Whisper forward.

The reference declares this package but never implements it
(/root/reference/src/whisper_sae/causal/__init__.py is a one-line
docstring; README.md:94 lists activation patching as planned).  The
functional JAX forward makes it straightforward here: an intervention is
just a function applied to one layer's output inside the (jitted,
scanned) encoder pass — no hooks, no module surgery.

Provided interventions:
- arbitrary ``patch_fn`` on any encoder layer's output;
- SAE substitution (replace a layer's activations with their SAE
  reconstruction — the standard causal validation of SAE quality),
  handling final-LN-space SAEs by inverting the layer norm with the
  original activations' statistics;
- SAE feature ablation (zero selected latents before reconstructing).

Effect metrics: greedy-decode token agreement and mean KL of the LM
logits under the patch.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..models.whisper import (
    LN_EPS,
    WhisperArch,
    _encoder_layer,
    _layer_norm,
    decoder_forward,
    decoder_logits,
    encoder_forward,
    greedy_decode_cached,
)


def encoder_forward_patched(
    params: dict,
    mel: jax.Array,
    arch: WhisperArch,
    layer_idx: int,
    patch_fn: Callable[[jax.Array], jax.Array],
) -> tuple[jax.Array, jax.Array]:
    """Encoder forward with ``patch_fn`` applied to layer ``layer_idx``'s
    output (shape-preserving [B, T, D] -> [B, T, D]).

    Returns (last_hidden after final LN, per-layer outputs [L, B, T, D]
    downstream of the patch).
    """
    enc = params["encoder"]
    dn = ("NCH", "OIH", "NCH")
    x = jax.lax.conv_general_dilated(
        mel, enc["conv1_w"], (1,), [(1, 1)], dimension_numbers=dn
    ) + enc["conv1_b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2_w"], (2,), [(1, 1)], dimension_numbers=dn
    ) + enc["conv2_b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = x.transpose(0, 2, 1)
    x = x + enc["pos"][: x.shape[1]]

    def body(carry, scanned):
        h, = carry
        lp, i = scanned
        h, _, _ = _encoder_layer(h, lp, arch.num_heads)
        h = jax.lax.cond(i == layer_idx, patch_fn, lambda a: a, h)
        return (h,), h

    idxs = jnp.arange(arch.encoder_layers)
    (x,), layer_outputs = jax.lax.scan(body, (x,), (enc["layers"], idxs))
    last = _layer_norm(x, enc["ln_f_g"], enc["ln_f_b"])
    return last, layer_outputs


def decoder_forward_patched(
    params: dict,
    token_ids: jax.Array,
    enc_hidden: jax.Array,
    arch: WhisperArch,
    layer_idx: int,
    patch_fn: Callable[[jax.Array], jax.Array],
) -> tuple[jax.Array, jax.Array]:
    """Decoder forward with ``patch_fn`` applied to decoder layer
    ``layer_idx``'s output (for decoder-side SAE validation)."""
    from ..models.whisper import _decoder_layer

    dec = params["decoder"]
    t = token_ids.shape[1]
    x = dec["tok"][token_ids] + dec["pos"][:t]

    def body(carry, scanned):
        (h,) = carry
        lp, i = scanned
        h, _, _ = _decoder_layer(h, enc_hidden, lp, arch.num_heads)
        h = jax.lax.cond(i == layer_idx, patch_fn, lambda a: a, h)
        return (h,), h

    idxs = jnp.arange(arch.decoder_layers)
    (x,), layer_outputs = jax.lax.scan(body, (x,), (dec["layers"], idxs))
    last = _layer_norm(x, dec["ln_f_g"], dec["ln_f_b"])
    return last, layer_outputs


def _pure_reconstruct(sae, x: jax.Array) -> jax.Array:
    """SAE reconstruction WITHOUT the stateful facade __call__.

    The patch functions run inside traced forwards (lax.cond branches);
    calling a training-mode ``TopKSAE`` facade there would assign traced
    dead-feature counters into ``sae.state``, leaving leaked tracers that
    poison later resampling/checkpointing.  Known facades are routed
    through the pure functional forwards on ``sae.params``; stateless
    duck-typed callables fall back to ``sae(x)``.
    """
    from ..models.sae import relu_sae_apply, topk_sae_apply

    params = getattr(sae, "params", None)
    if params is not None and hasattr(sae, "k"):
        out, _ = topk_sae_apply(params, x, sae.k)
        return out.reconstructed
    if params is not None and hasattr(sae, "sparsity_weight"):
        out, _ = relu_sae_apply(params, x, sae.sparsity_weight)
        return out.reconstructed
    return sae(x).reconstructed


def sae_reconstruction_patch(
    sae,
    whisper_params: dict,
    apply_layer_norm: bool = True,
    component: str = "encoder",
) -> Callable[[jax.Array], jax.Array]:
    """Patch a layer's output with its SAE reconstruction.

    When the SAE was trained on final-LN-applied activations (the aiOla
    trick, reference hooks.py:87-92), the reconstruction lives in LN
    space; it is mapped back with the inverse affine using the original
    activations' per-token mean/variance.  ``component`` selects whose
    final layer norm defines that space (encoder or decoder SAEs).
    """
    g = whisper_params[component]["ln_f_g"]
    b = whisper_params[component]["ln_f_b"]

    def patch(h: jax.Array) -> jax.Array:
        shape = h.shape
        flat = h.reshape(-1, shape[-1])
        if apply_layer_norm:
            mean = jnp.mean(flat, axis=-1, keepdims=True)
            var = jnp.var(flat, axis=-1, keepdims=True)
            x_ln = (flat - mean) * jax.lax.rsqrt(var + LN_EPS) * g + b
            recon_ln = _pure_reconstruct(sae, x_ln)
            recon = (recon_ln - b) / g * jnp.sqrt(var + LN_EPS) + mean
        else:
            recon = _pure_reconstruct(sae, flat)
        return recon.reshape(shape)

    return patch


def feature_ablation_patch(
    sae,
    feature_idxs,
    whisper_params: dict,
    apply_layer_norm: bool = True,
    component: str = "encoder",
) -> Callable[[jax.Array], jax.Array]:
    """Replace a layer's output with the SAE reconstruction computed with
    the given latent features zeroed (causal feature ablation)."""
    g = whisper_params[component]["ln_f_g"]
    b = whisper_params[component]["ln_f_b"]
    feature_idxs = jnp.asarray(feature_idxs)

    def patch(h: jax.Array) -> jax.Array:
        shape = h.shape
        flat = h.reshape(-1, shape[-1])
        if apply_layer_norm:
            mean = jnp.mean(flat, axis=-1, keepdims=True)
            var = jnp.var(flat, axis=-1, keepdims=True)
            x = (flat - mean) * jax.lax.rsqrt(var + LN_EPS) * g + b
        else:
            x = flat
        hidden = sae.encode(x)
        hidden = hidden.at[:, feature_idxs].set(0.0)
        recon = sae.decode(hidden)
        if apply_layer_norm:
            recon = (recon - b) / g * jnp.sqrt(var + LN_EPS) + mean
        return recon.reshape(shape)

    return patch


def feature_steering_patch(
    sae,
    feature_idxs,
    whisper_params: dict,
    scale: float | None = None,
    set_value: float | None = None,
    apply_layer_norm: bool = True,
    component: str = "encoder",
) -> Callable[[jax.Array], jax.Array]:
    """Steer selected SAE latent features and substitute the resulting
    reconstruction for the layer's output.

    Generalizes :func:`feature_ablation_patch` from zeroing to arbitrary
    interventions: ``scale`` multiplies the selected features' activations
    (``scale=0`` reproduces ablation; ``scale>1`` amplifies a feature's
    causal contribution), ``set_value`` clamps them to a constant (the
    classic "activation steering" probe — drive a feature regardless of
    the input).  Exactly one of the two must be given.  The reference
    ships no steering tooling (its causal/ package is an empty
    ``__init__``); this extends the same intervention surface its
    analysis pipeline would need.
    """
    if (scale is None) == (set_value is None):
        raise ValueError("give exactly one of scale= or set_value=")
    g = whisper_params[component]["ln_f_g"]
    b = whisper_params[component]["ln_f_b"]
    feature_idxs = jnp.asarray(feature_idxs)

    def patch(h: jax.Array) -> jax.Array:
        shape = h.shape
        flat = h.reshape(-1, shape[-1])
        if apply_layer_norm:
            mean = jnp.mean(flat, axis=-1, keepdims=True)
            var = jnp.var(flat, axis=-1, keepdims=True)
            x = (flat - mean) * jax.lax.rsqrt(var + LN_EPS) * g + b
        else:
            x = flat
        hidden = sae.encode(x)
        if scale is not None:
            hidden = hidden.at[:, feature_idxs].multiply(scale)
        else:
            hidden = hidden.at[:, feature_idxs].set(set_value)
        recon = sae.decode(hidden)
        if apply_layer_norm:
            recon = (recon - b) / g * jnp.sqrt(var + LN_EPS) + mean
        return recon.reshape(shape)

    return patch


# ---------------------------------------------------------------------------
# effect metrics
# ---------------------------------------------------------------------------


def patched_logits(
    params: dict, mel: jax.Array, arch: WhisperArch, layer_idx: int, patch_fn
) -> jax.Array:
    """LM logits for the BOS step under a patched encoder."""
    enc_last, _ = encoder_forward_patched(params, mel, arch, layer_idx, patch_fn)
    bos = jnp.full((mel.shape[0], 1), arch.decoder_start_token_id, jnp.int32)
    hidden, _ = decoder_forward(params, bos, enc_last, arch)
    return decoder_logits(params, hidden[:, 0, :])


def patched_logits_decoder(
    params: dict,
    mel: jax.Array,
    arch: WhisperArch,
    layer_idx: int,
    patch_fn,
    encoder_hidden: jax.Array | None = None,
) -> jax.Array:
    """LM logits for the BOS step with ``patch_fn`` applied to decoder
    layer ``layer_idx`` (the encoder runs clean — decoder-side SAEs
    intervene on the decoder residual stream only)."""
    if encoder_hidden is None:
        encoder_hidden, _ = encoder_forward(params, mel, arch)
    bos = jnp.full((mel.shape[0], 1), arch.decoder_start_token_id, jnp.int32)
    hidden, _ = decoder_forward_patched(
        params, bos, encoder_hidden, arch, layer_idx, patch_fn
    )
    return decoder_logits(params, hidden[:, 0, :])


def greedy_decode_patched_decoder(
    params: dict,
    mel: jax.Array,
    arch: WhisperArch,
    layer_idx: int,
    patch_fn,
    max_len: int = 16,
    encoder_hidden: jax.Array | None = None,
) -> jax.Array:
    """Greedy decode with ``patch_fn`` live on decoder layer ``layer_idx``
    at every generation step (no KV cache — the patch sees the full
    prefix each step, mirroring models/whisper.py:greedy_decode's
    fixed-shape O(L) loop; analysis-scale only)."""
    if encoder_hidden is None:
        encoder_hidden, _ = encoder_forward(params, mel, arch)
    b = encoder_hidden.shape[0]
    tokens = jnp.full((b, max_len), arch.decoder_start_token_id, jnp.int32)
    finished = jnp.zeros((b,), jnp.bool_)
    eos = jnp.int32(arch.eos_token_id)

    def step(t, state):
        tokens, finished = state
        hidden, _ = decoder_forward_patched(
            params, tokens, encoder_hidden, arch, layer_idx, patch_fn
        )
        logits = decoder_logits(params, hidden[:, t, :])
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, eos, nxt)
        finished = finished | (nxt == eos)
        return tokens.at[:, t + 1].set(nxt), finished

    tokens, _ = jax.lax.fori_loop(0, max_len - 1, step, (tokens, finished))
    return tokens


def logit_kl(clean_logits: jax.Array, patched: jax.Array) -> jax.Array:
    """Mean KL(clean || patched) over the batch."""
    p = jax.nn.log_softmax(clean_logits, axis=-1)
    q = jax.nn.log_softmax(patched, axis=-1)
    return jnp.mean(jnp.sum(jnp.exp(p) * (p - q), axis=-1))


def token_agreement(tokens_a: jax.Array, tokens_b: jax.Array) -> jax.Array:
    """Fraction of greedy-decoded tokens that agree."""
    return jnp.mean((tokens_a == tokens_b).astype(jnp.float32))


def substitution_effect(
    params: dict,
    mel: jax.Array,
    arch: WhisperArch,
    sae,
    layer_idx: int,
    apply_layer_norm: bool = True,
    max_len: int = 16,
    component: str = "encoder",
) -> dict[str, float]:
    """End-to-end causal validation of an SAE: substitute the layer's
    activations with the SAE reconstruction and measure the downstream
    effect on logits and greedy decodes.

    ``component`` selects where the intervention lands: ``encoder``
    patches encoder layer ``layer_idx`` (the patched last hidden state
    then feeds a clean cached decode); ``decoder`` patches decoder layer
    ``layer_idx`` live at every generation step of an uncached decode
    (the encoder runs clean)."""
    patch = sae_reconstruction_patch(
        sae, params, apply_layer_norm, component=component
    )
    clean_tokens = greedy_decode_cached(params, mel, arch, max_len=max_len)
    if component == "decoder":
        enc_last, _ = encoder_forward(params, mel, arch)
        clean = patched_logits_decoder(
            params, mel, arch, layer_idx, lambda h: h, encoder_hidden=enc_last
        )
        subbed = patched_logits_decoder(
            params, mel, arch, layer_idx, patch, encoder_hidden=enc_last
        )
        patched_tokens = greedy_decode_patched_decoder(
            params, mel, arch, layer_idx, patch,
            max_len=max_len, encoder_hidden=enc_last,
        )
    else:
        clean = patched_logits(params, mel, arch, layer_idx, lambda h: h)
        subbed = patched_logits(params, mel, arch, layer_idx, patch)
        enc_last, _ = encoder_forward_patched(params, mel, arch, layer_idx, patch)
        patched_tokens = greedy_decode_cached(
            params, mel, arch, max_len=max_len, encoder_hidden=enc_last
        )
    return {
        "logit_kl": float(logit_kl(clean, subbed)),
        "token_agreement": float(token_agreement(clean_tokens, patched_tokens)),
    }


def feature_ablation_sweep(
    params: dict,
    mel: jax.Array,
    arch: WhisperArch,
    sae,
    layer_idx: int,
    feature_indices,
    apply_layer_norm: bool = True,
    component: str = "encoder",
) -> list[dict[str, float]]:
    """Causal importance ranking: ablate each feature in turn (zero its
    latent inside the SAE substitution) and measure the marginal logit-KL
    beyond the substitution's own reconstruction error.

    Returns one record per feature, sorted by ``marginal_logit_kl``
    descending: features whose removal moves the downstream logits most
    are the causally load-bearing ones — the quantitative follow-up to
    the report's activation ranking (which is correlational only).
    """
    if component == "decoder":
        enc_last, _ = encoder_forward(params, mel, arch)
        logits_fn = partial(
            patched_logits_decoder, encoder_hidden=enc_last
        )
    else:
        logits_fn = patched_logits
    clean = logits_fn(params, mel, arch, layer_idx, lambda h: h)
    base_patch = sae_reconstruction_patch(
        sae, params, apply_layer_norm, component=component
    )
    base = logits_fn(params, mel, arch, layer_idx, base_patch)
    base_kl = float(logit_kl(clean, base))

    out = []
    for fi in feature_indices:
        patch = feature_ablation_patch(
            sae, [int(fi)], params, apply_layer_norm, component=component
        )
        abl = logits_fn(params, mel, arch, layer_idx, patch)
        kl = float(logit_kl(clean, abl))
        out.append({
            "feature_idx": int(fi),
            "logit_kl": kl,
            "marginal_logit_kl": kl - base_kl,
        })
    out.sort(key=lambda r: r["marginal_logit_kl"], reverse=True)
    return out
