"""Whisper log-mel frontend in JAX.

Numerically matches HF ``WhisperFeatureExtractor`` (the reference calls it
on host per sample, librispeech.py:133-137): hann(400) STFT with hop 160,
center/reflect padding, power spectrogram, slaney mel filterbank, log10
clamp at 1e-10, dynamic-range floor at (max - 8), then (x + 4) / 4.
The last STFT frame is dropped, giving [80, 3000] for 30 s @ 16 kHz.

The whole pipeline is jittable and batched — on TPU the mel frontend runs
fused with the Whisper encoder forward instead of per-sample on host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
CHUNK_LENGTH_S = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_LENGTH_S  # 480_000


def _hertz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    freq = np.asarray(freq, np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    log_region = freq >= min_log_hertz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hertz) / min_log_hertz) * logstep,
        mels,
    )
    return mels


def _mel_to_hertz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    log_region = mels >= min_log_mel
    freq = np.where(
        log_region, 1000.0 * np.exp(logstep * (np.maximum(mels, min_log_mel) - min_log_mel)), freq
    )
    return freq


def mel_filter_bank(
    num_frequency_bins: int = N_FFT // 2 + 1,
    num_mel_filters: int = N_MELS,
    min_frequency: float = 0.0,
    max_frequency: float = 8000.0,
    sampling_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank
    [num_frequency_bins, num_mel_filters] (matches
    transformers.audio_utils.mel_filter_bank with slaney/slaney)."""
    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)
    mel_min = _hertz_to_mel_slaney(np.array(min_frequency))
    mel_max = _hertz_to_mel_slaney(np.array(max_frequency))
    mel_points = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = _mel_to_hertz_slaney(mel_points)

    # triangular filters
    fdiff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    # slaney energy normalization
    enorm = 2.0 / (filter_freqs[2:] - filter_freqs[:-2])
    fb *= enorm[None, :]
    return fb.astype(np.float32)


_MEL_FB: dict[int, np.ndarray] = {}


def _get_mel_fb(n_mels: int = N_MELS) -> np.ndarray:
    fb = _MEL_FB.get(n_mels)
    if fb is None:
        fb = _MEL_FB[n_mels] = mel_filter_bank(num_mel_filters=n_mels)
    return fb


@partial(jax.jit, static_argnames=("n_frames",))
def _log_mel_impl(audio: jax.Array, mel_fb: jax.Array, n_frames: int) -> jax.Array:
    # center=True reflect padding
    pad = N_FFT // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    # frame: [B, n_frames, N_FFT]
    starts = jnp.arange(n_frames) * HOP_LENGTH
    idx = starts[:, None] + jnp.arange(N_FFT)[None, :]
    frames = x[:, idx]
    window = jnp.asarray(np.hanning(N_FFT + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(frames * window, n=N_FFT, axis=-1)
    power = jnp.square(jnp.abs(spec)).astype(jnp.float32)  # [B, T, 201]
    mel = jnp.einsum("btf,fm->bmt", power, mel_fb)  # [B, 80, T]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # HF computes the dynamic-range floor over the *truncated* [.., :-1]
    # spectrogram, then scales.
    log_spec = log_spec[..., :-1]
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    log_spec = jnp.maximum(log_spec, floor)
    return (log_spec + 4.0) / 4.0


def log_mel_spectrogram(
    audio, pad_to_chunk: bool = True, n_mels: int = N_MELS
) -> jax.Array:
    """Compute Whisper log-mel features.

    Args:
        audio: [n] or [B, n] waveform at 16 kHz, float32 in [-1, 1].
        pad_to_chunk: zero-pad / truncate to 30 s (the reference's
            WhisperProcessor behavior, giving [B, n_mels, 3000]).
        n_mels: mel bin count — 80 for every model through large-v2,
            128 for large-v3 (matches HF
            ``WhisperFeatureExtractor(feature_size=n_mels)``).

    Returns:
        [B, n_mels, T] log-mel features (T = 3000 when padded).
    """
    audio = jnp.atleast_2d(jnp.asarray(audio, jnp.float32))
    if pad_to_chunk:
        n = audio.shape[1]
        if n < N_SAMPLES:
            audio = jnp.pad(audio, ((0, 0), (0, N_SAMPLES - n)))
        else:
            audio = audio[:, :N_SAMPLES]
    n_frames = audio.shape[1] // HOP_LENGTH + 1
    return _log_mel_impl(audio, jnp.asarray(_get_mel_fb(n_mels)), n_frames)
