"""Log-mel spectrogram — the Whisper audio frontend.

Reference: log_mel_spectrogram (/root/reference/examples/whisper/
whisper.cpp:3038-3133) + worker (:2970-3035): periodic Hann window, 400-pt
FFT / 160 hop, power spectrum x mel filterbank, log10 clamp at 1e-10,
dynamic-range clamp to (max - 8), then (x + 4) / 4. Audio is padded with 30 s
of zeros at the end and 200-sample reflection on both sides, and the last
frame is dropped (torch.stft compatibility).

The reference runs this on host std::threads with a hand-rolled radix-2 FFT;
the TPU-native version frames + rfft + filterbank matmul in one jitted XLA
computation (the matmul rides the MXU), so the frontend can fuse straight
into the encoder's conv stack on device.

Filterbank: models ship their own filters in the checkpoint (whisper.cpp
:1375-1377); `mel_filterbank` regenerates the identical Slaney-style bank
(openai/whisper audio.py uses librosa.filters.mel(16000, 400, 80)) for
filter-less use and tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_MEL = 80
CHUNK_LENGTH = 30                      # seconds
N_SAMPLES = SAMPLE_RATE * CHUNK_LENGTH


def _hz_to_mel(f):
    # Slaney scale (librosa default, htk=False)
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        log_branch = min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_branch, mels)


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(n_mel: int = N_MEL, n_fft: int = N_FFT,
                   sr: int = SAMPLE_RATE) -> np.ndarray:
    """(n_mel, n_fft//2 + 1) Slaney-normalized triangular filter bank —
    identical to librosa.filters.mel(sr, n_fft, n_mels) used by openai
    whisper to produce the filters stored in ggml checkpoints."""
    fmax = sr / 2.0
    fft_freqs = np.linspace(0, fmax, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(fmax), n_mel + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:n_mel + 2] - hz_pts[:n_mel])
    return (weights * enorm[:, None]).astype(np.float32)


@partial(jax.jit, static_argnames=("n_fft", "hop", "pad_to_chunk"))
def _log_mel(samples, filters, *, n_fft: int, hop: int, pad_to_chunk: bool):
    half = n_fft // 2
    # reflective pad half on both sides; 30s zero pad at the end
    left = samples[1:half + 1][::-1]
    tail = jnp.zeros(N_SAMPLES if pad_to_chunk else 0, samples.dtype)
    right = jnp.zeros(half, samples.dtype)
    x = jnp.concatenate([left, samples, tail, right])
    n_frames = (x.shape[0] - n_fft) // hop      # drops last frame, :3078
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[idx]                              # (T, n_fft)
    window = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(n_fft) / n_fft))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)
    mel = power @ filters.T                      # (T, n_mel) — MXU
    logmel = jnp.log10(jnp.maximum(mel, 1e-10))
    logmel = jnp.maximum(logmel, logmel.max() - 8.0)
    return ((logmel + 4.0) / 4.0).T              # (n_mel, T)


def log_mel_spectrogram(samples: np.ndarray, filters: np.ndarray | None = None,
                        *, n_fft: int = N_FFT, hop: int = HOP_LENGTH,
                        pad_to_chunk: bool = True) -> jax.Array:
    """samples: float32 mono 16 kHz -> (n_mel, T) normalized log-mel.
    With pad_to_chunk (reference behavior) T covers the full padded length;
    slice [:, :3000] for one 30 s encoder window."""
    if filters is None:
        filters = mel_filterbank(n_fft=n_fft)
    return _log_mel(jnp.asarray(samples), jnp.asarray(filters),
                    n_fft=n_fft, hop=hop, pad_to_chunk=pad_to_chunk)
