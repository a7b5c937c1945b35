"""Accuracy validation of the NACF f0 estimator (data/f0.py) that stands in
for the reference's pyworld harvest/dio/stonemask chain
(cosyvoice/dataset/processor.py:184-206).

pyworld (C++ binary dep) is not installable here, so ground truth comes
from synthetic signals with KNOWN pitch — constant tones, harmonic-rich
tones, vibrato, glides, and unvoiced noise. Tolerances are recorded
assertions: voiced-frame MAE < 3 Hz, no octave errors (> 25% relative), and
correct voiced/unvoiced segmentation — the properties GAN training targets
and the f0 L1 loss (train/gan.py) actually depend on."""

import numpy as np
import pytest

from fangyan_tts_tpu.data.f0 import estimate_f0

SR, HOP = 24000, 480


def _tone(f0_curve: np.ndarray, sr: int = SR, harmonics=(1.0, 0.5, 0.25)) -> np.ndarray:
    phase = 2 * np.pi * np.cumsum(f0_curve) / sr
    sig = sum(a * np.sin((i + 1) * phase) for i, a in enumerate(harmonics))
    return (sig / np.abs(sig).max() * 0.5).astype(np.float32)


def _voiced_err(f0, truth):
    v = f0 > 0
    assert v.mean() > 0.8, f"voiced recall too low: {v.mean()}"
    return np.abs(f0[v] - truth[v]), f0[v], truth[v]


@pytest.mark.parametrize("hz", [80.0, 120.0, 220.0, 400.0])
def test_constant_pitch_accuracy(hz):
    n = SR  # 1 s
    truth = np.full(n, hz)
    f0 = estimate_f0(_tone(truth), SR, HOP)
    t = np.full_like(f0, hz)
    err, fv, tv = _voiced_err(f0, t)
    assert err.mean() < 3.0, f"MAE {err.mean():.2f} Hz at {hz} Hz"
    # no octave errors
    assert (np.abs(fv / tv - 1.0) < 0.25).all()


def test_vibrato_tracking():
    n = 2 * SR
    t = np.arange(n) / SR
    truth = 150.0 + 15.0 * np.sin(2 * np.pi * 5.0 * t)  # 5 Hz vibrato
    f0 = estimate_f0(_tone(truth), SR, HOP)
    # the NACF analysis window starts at i*hop; compare against the truth at
    # the window CENTER (frame_len/2 = sr/60 samples in)
    center = SR // 60
    idx = np.minimum(np.arange(len(f0)) * HOP + center, n - 1)
    truth_frames = truth[idx]
    err, fv, tv = _voiced_err(f0, truth_frames)
    assert err.mean() < 5.0
    # the estimate must actually follow the modulation, not flatline
    assert np.corrcoef(fv, tv)[0, 1] > 0.9


def test_glide_tracking():
    n = 2 * SR
    truth = np.linspace(100.0, 300.0, n)
    f0 = estimate_f0(_tone(truth), SR, HOP)
    truth_frames = truth[: len(f0) * HOP : HOP][: len(f0)]
    err, fv, tv = _voiced_err(f0, truth_frames)
    assert err.mean() < 8.0
    assert (np.abs(fv / tv - 1.0) < 0.25).all()


def test_unvoiced_is_zero():
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal(SR) * 0.1).astype(np.float32)
    f0 = estimate_f0(noise, SR, HOP)
    assert (f0 > 0).mean() < 0.3, "noise should be mostly unvoiced"
    silence = np.zeros(SR, np.float32)
    assert (estimate_f0(silence, SR, HOP) == 0).all()


def test_voiced_unvoiced_segmentation():
    truth = np.full(SR, 180.0)
    voiced = _tone(truth)
    silence = np.zeros(SR // 2, np.float32)
    sig = np.concatenate([silence, voiced, silence])
    f0 = estimate_f0(sig, SR, HOP)
    n_sil = len(silence) // HOP
    assert (f0[: n_sil - 1] == 0).all()
    mid = f0[n_sil + 2 : n_sil + len(voiced) // HOP - 2]
    assert (mid > 0).mean() > 0.9
    assert np.abs(mid[mid > 0] - 180.0).mean() < 3.0


def test_22050_rate_for_v1_targets():
    """The v1 GAN recipe runs at 22.05 kHz / hop 256."""
    truth = np.full(22050, 140.0)
    f0 = estimate_f0(_tone(truth, sr=22050), 22050, 256)
    t = np.full_like(f0, 140.0)
    err, fv, tv = _voiced_err(f0, t)
    assert err.mean() < 3.0
