"""Mel-spectrogram frontends, batched and jit-compiled.

Three distinct feature extractors exist in the reference stack, each with its
own filterbank convention; all are replicated here bit-carefully because they
feed pretrained models:

1. `matcha_mel`: 24 kHz 80-mel training/acoustic features
   (third_party/Matcha-TTS/matcha/utils/audio.py:45-80; librosa slaney
   filters, reflect pre-pad, center=False, log(clamp 1e-5)).
2. `whisper_logmel`: 16 kHz 128-mel input of the S3 speech tokenizer
   (tools/extract_speech_token.py:38; whisper.log_mel_spectrogram —
   power spectrum, slaney filters, log10 with max-8 floor, (x+4)/4).
3. `kaldi_fbank`: 16 kHz 80-mel input of the CAM++ speaker encoder
   (tools/extract_embedding.py:30-35; Kaldi povey window, HTK mel scale,
   snip_edges, dither=0).

All functions take (B, T) float32 waveforms in [-1, 1] and are pure —
wrap in jax.jit at the call site (shapes are bucketed by the data plane).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stft import _dft_bases, frame_signal, hann_window, povey_window, stft


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3.0)
    log_region = f >= 1000.0
    mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0), mel)
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3.0)
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
    return f


@functools.lru_cache(maxsize=None)
def mel_filterbank_slaney(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """librosa.filters.mel equivalent (htk=False, norm='slaney').

    Returns (n_mels, n_fft//2 + 1) float32.
    """
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _hz_to_mel_htk(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank_kaldi(
    sr: int,
    padded_window_size: int,
    n_mels: int,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi-style mel banks (torchaudio.compliance.kaldi.get_mel_banks).

    Returns (n_mels, padded_window_size//2) — note Kaldi excludes the nyquist
    bin; callers zero-pad or slice the power spectrum accordingly.
    """
    if high_freq <= 0.0:
        high_freq = sr / 2.0 + high_freq
    num_fft_bins = padded_window_size // 2
    fft_bin_width = sr / padded_window_size
    mel_low = _hz_to_mel_htk(low_freq)
    mel_high = _hz_to_mel_htk(high_freq)
    mel_delta = (mel_high - mel_low) / (n_mels + 1)
    bins = np.arange(n_mels)[:, None]
    left_mel = mel_low + bins * mel_delta
    center_mel = left_mel + mel_delta
    right_mel = center_mel + mel_delta
    mel = _hz_to_mel_htk(fft_bin_width * np.arange(num_fft_bins))[None, :]
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    weights = np.maximum(0.0, np.minimum(up_slope, down_slope))
    return weights.astype(np.float32)


def matcha_mel(
    y: jnp.ndarray,
    n_fft: int = 1920,
    num_mels: int = 80,
    sampling_rate: int = 24000,
    hop_size: int = 480,
    win_size: int = 1920,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jnp.ndarray:
    """24 kHz training mel. y: (B, T) -> (B, num_mels, T//hop_size).

    Matches matcha.utils.audio.mel_spectrogram(center=False): reflect
    pre-pad of (n_fft - hop)/2 per side, magnitude sqrt(re^2+im^2+1e-9),
    slaney mel, log(clamp(x, 1e-5)).
    """
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    real, imag = stft(y, n_fft, hop_size, jnp.asarray(hann_window(win_size)), center=False)
    spec = jnp.sqrt(real * real + imag * imag + 1e-9)
    fb = jnp.asarray(mel_filterbank_slaney(sampling_rate, n_fft, num_mels, fmin, fmax))
    mel = jnp.einsum("mk,bkf->bmf", fb, spec, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


def whisper_logmel(
    y: jnp.ndarray,
    n_mels: int = 128,
    n_fft: int = 400,
    hop: int = 160,
    sampling_rate: int = 16000,
) -> jnp.ndarray:
    """Whisper log-mel for the S3 tokenizer. y: (B, T) -> (B, n_mels, T//hop).

    Matches whisper.audio.log_mel_spectrogram: center=True reflect pad,
    power spectrum with the last frame dropped, slaney mel, log10 clamp 1e-10,
    per-utterance (max - 8) floor, (x + 4) / 4. The max-floor is computed per
    batch row (each row is one utterance), matching the reference's
    one-utterance-at-a-time call.
    """
    real, imag = stft(y, n_fft, hop, jnp.asarray(hann_window(n_fft)), center=True)
    power = (real * real + imag * imag)[..., :-1]  # drop last frame like whisper
    fb = jnp.asarray(mel_filterbank_slaney(sampling_rate, n_fft, n_mels))
    mel = jnp.einsum("mk,bkf->bmf", fb, power, precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    log_spec = jnp.maximum(log_spec, floor)
    return (log_spec + 4.0) / 4.0


def kaldi_fbank(
    y: jnp.ndarray,
    num_mel_bins: int = 80,
    sampling_rate: int = 16000,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    low_freq: float = 20.0,
    subtract_mean: bool = False,
) -> jnp.ndarray:
    """Kaldi fbank (dither=0) for CAM++. y: (B, T) int16-scaled or [-1,1] floats.

    Matches torchaudio.compliance.kaldi.fbank defaults: snip_edges=True,
    remove_dc_offset, preemphasis 0.97 (first sample duplicated), povey
    window, zero-pad to next pow2 FFT, power spectrum, HTK mel, log(max(eps)).
    Kaldi operates on int16-range floats; the reference feeds [-1, 1] audio
    (extract_embedding.py:29-35) and Kaldi's log makes the scale a constant
    offset, which campplus's mean-subtraction removes.

    Returns (B, frames, num_mel_bins).
    """
    win = int(sampling_rate * frame_length_ms / 1000.0)  # 400
    hop = int(sampling_rate * frame_shift_ms / 1000.0)  # 160
    padded = 1 << (win - 1).bit_length()  # 512

    frames = frame_signal(y, win, hop)  # (B, F, win)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)  # remove_dc_offset
    first = frames[..., :1]
    shifted = jnp.concatenate([first, frames[..., :-1]], axis=-1)
    frames = frames - preemphasis * shifted
    frames = frames * jnp.asarray(povey_window(win))[None, None, :]
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, padded - win)))

    cos_b, sin_b = _dft_bases(padded)
    hi = jax.lax.Precision.HIGHEST
    real = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(cos_b), precision=hi)
    imag = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(sin_b), precision=hi)
    power = real * real + imag * imag  # (B, F, padded//2+1)

    fb = jnp.asarray(mel_filterbank_kaldi(sampling_rate, padded, num_mel_bins, low_freq))
    mel = jnp.einsum("mk,bfk->bfm", fb, power[..., :-1], precision=jax.lax.Precision.HIGHEST)  # kaldi drops nyquist
    eps = float(np.finfo(np.float32).eps)
    out = jnp.log(jnp.maximum(mel, eps))
    if subtract_mean:
        out = out - jnp.mean(out, axis=1, keepdims=True)
    return out
