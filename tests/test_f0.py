"""Accuracy validation of the NACF f0 estimator (data/f0.py) that stands in
for the reference's pyworld harvest/dio/stonemask chain
(cosyvoice/dataset/processor.py:184-206).

pyworld (C++ binary dep) is not installable here and the environment ships
no recorded speech, so ground truth comes from synthetic signals with KNOWN
pitch in two tiers:
- simple tones (constant/vibrato/glide/unvoiced) for basic tracking, and
- SPEECH-LIKE fixtures: glottal-pulse excitation (1/n harmonic rolloff)
  through time-varying formant resonators, with declining pitch contours,
  cycle jitter, syllabic amplitude modulation, aspiration noise, and
  interleaved unvoiced fricative segments — including the octave-error-prone
  low-pitch (<90 Hz) register the verdict flagged.
Tolerances are recorded assertions: voiced-frame MAE < 3 Hz, octave-error
rate (>25% relative) < 1%, and correct voiced/unvoiced segmentation — the
properties GAN training f0 L1 targets (train/gan.py) actually depend on."""

import numpy as np
import pytest
from scipy.signal import lfilter

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
    # the 3-period (50 ms) YIN analysis window looks ahead ~2.5 hop frames,
    # so the last ~2 silence frames may legitimately see the voiced onset
    assert (f0[: n_sil - 2] == 0).all()
    mid = f0[n_sil + 2 : n_sil + len(voiced) // HOP - 2]
    assert (mid > 0).mean() > 0.9
    assert np.abs(mid[mid > 0] - 180.0).mean() < 3.0


# ---------------------------------------------------------------------------
# speech-like fixtures: glottal source + formants + jitter + aspiration
# ---------------------------------------------------------------------------


def _formant_filter(sig: np.ndarray, formants, bandwidths, sr: int) -> np.ndarray:
    """Cascade of 2nd-order resonators (the source-filter vocal tract model)."""
    out = sig
    for fc, bw in zip(formants, bandwidths):
        r = np.exp(-np.pi * bw / sr)
        theta = 2 * np.pi * fc / sr
        a = [1.0, -2 * r * np.cos(theta), r * r]
        out = lfilter([1.0 - r], a, out)
    return out


def _speech_like(contour: np.ndarray, sr: int = SR, seed: int = 0,
                 formants=(600.0, 1200.0, 2500.0), jitter: float = 0.01) -> np.ndarray:
    """Speech-like voiced signal with KNOWN per-sample f0 `contour`:
    glottal-pulse-train excitation (impulses at pitch periods with cycle
    jitter -> full 1/n harmonic series), formant filtering, 4 Hz syllabic
    amplitude modulation, and -26 dB aspiration noise."""
    rng = np.random.default_rng(seed)
    n = len(contour)
    # pitch-period impulse train with per-cycle jitter
    exc = np.zeros(n)
    pos = 0.0
    while pos < n:
        i = int(pos)
        exc[i] = 1.0
        period = sr / contour[min(i, n - 1)]
        pos += period * (1.0 + jitter * rng.standard_normal())
    # glottal pulse shaping: integrate-and-leak softens the impulses
    exc = lfilter([1.0], [1.0, -0.96], exc)
    voiced = _formant_filter(exc, formants, (90.0, 110.0, 170.0), sr)
    t = np.arange(n) / sr
    am = 0.65 + 0.35 * np.sin(2 * np.pi * 4.0 * t)  # syllabic modulation
    sig = voiced * am
    sig = sig / np.abs(sig).max()
    sig += 0.05 * rng.standard_normal(n)  # aspiration
    return (0.5 * sig / np.abs(sig).max()).astype(np.float32)


def _contour_frames(contour: np.ndarray, n_frames: int, sr: int) -> np.ndarray:
    center = sr // 60  # NACF window center (see vibrato test)
    idx = np.minimum(np.arange(n_frames) * HOP + center, len(contour) - 1)
    return contour[idx]


def _report(name, f0, truth):
    v = f0 > 0
    err = np.abs(f0[v] - truth[v])
    octave = np.abs(f0[v] / truth[v] - 1.0) > 0.25
    return v.mean(), err.mean(), octave.mean()


@pytest.mark.parametrize(
    "name,lo,hi,formants,seed",
    [
        ("male_declination", 120.0, 90.0, (600.0, 1200.0, 2500.0), 1),
        ("female_declination", 230.0, 180.0, (800.0, 1700.0, 2900.0), 2),
        ("low_register", 85.0, 62.0, (500.0, 1000.0, 2300.0), 3),  # octave-prone
    ],
)
def test_speech_like_contours(name, lo, hi, formants, seed):
    """Declining-pitch speech-like fixtures: voiced MAE < 3 Hz and octave
    error rate < 1% (the recorded tolerance the GAN f0 loss relies on)."""
    n = 2 * SR
    t = np.arange(n) / SR
    contour = lo + (hi - lo) * (t / t[-1]) + 2.0 * np.sin(2 * np.pi * 2.7 * t)
    sig = _speech_like(contour, SR, seed=seed, formants=formants)
    f0 = estimate_f0(sig, SR, HOP)
    truth = _contour_frames(contour, len(f0), SR)
    voicing, mae, octave_rate = _report(name, f0, truth)
    assert voicing > 0.8, f"{name}: voiced recall {voicing:.2f}"
    assert mae < 3.0, f"{name}: voiced MAE {mae:.2f} Hz"
    assert octave_rate < 0.01, f"{name}: octave-error rate {octave_rate:.3f}"


def test_speech_like_with_unvoiced_segments():
    """Voiced vowels interleaved with fricative noise bursts: segmentation
    must keep fricatives mostly unvoiced and vowels accurate."""
    rng = np.random.default_rng(4)
    seg_v = int(0.6 * SR)
    seg_u = int(0.2 * SR)
    t = np.arange(seg_v) / SR
    c1 = 140.0 - 20.0 * (t / t[-1])
    c2 = 180.0 - 30.0 * (t / t[-1])
    v1 = _speech_like(c1, SR, seed=5)
    v2 = _speech_like(c2, SR, seed=6, formants=(700.0, 1500.0, 2600.0))
    # fricative: high-passed noise (no periodicity)
    fric = lfilter([1, -1], [1], rng.standard_normal(seg_u))
    fric = (0.2 * fric / np.abs(fric).max()).astype(np.float32)
    sig = np.concatenate([v1, fric, v2]).astype(np.float32)
    f0 = estimate_f0(sig, SR, HOP)
    nv, nu = seg_v // HOP, seg_u // HOP
    # fricative region mostly unvoiced (allow edge frames whose window
    # overlaps the neighboring vowels)
    mid_fric = f0[nv + 2 : nv + nu - 2]
    assert (mid_fric == 0).mean() > 0.7, f"fricative voiced: {(mid_fric > 0).mean():.2f}"
    # vowel regions accurate
    truth = np.concatenate([c1, np.zeros(seg_u), c2])
    tf = _contour_frames(truth, len(f0), SR)
    for sl in (slice(1, nv - 1), slice(nv + nu + 1, 2 * nv + nu - 2)):
        seg_f0, seg_t = f0[sl], tf[sl]
        m = (seg_f0 > 0) & (seg_t > 0)
        assert m.mean() > 0.75
        assert np.abs(seg_f0[m] - seg_t[m]).mean() < 4.0


def test_low_pitch_no_octave_doubling_22050():
    """v1-rate (22.05 kHz hop 256) low-pitch male voice — the subharmonic
    correction must not halve/double in the creaky 65-80 Hz register."""
    sr, hop = 22050, 256
    n = 2 * sr
    t = np.arange(n) / sr
    contour = 78.0 - 12.0 * (t / t[-1])
    sig = _speech_like(contour, sr, seed=7, formants=(520.0, 1100.0, 2200.0))
    f0 = estimate_f0(sig, sr, hop)
    center = sr // 60
    idx = np.minimum(np.arange(len(f0)) * hop + center, n - 1)
    truth = contour[idx]
    v = f0 > 0
    assert v.mean() > 0.8
    octave = np.abs(f0[v] / truth[v] - 1.0) > 0.25
    assert octave.mean() < 0.01, f"octave-error rate {octave.mean():.3f}"
    assert np.abs(f0[v] - truth[v]).mean() < 3.0


def test_22050_rate_for_v1_targets():
    """The v1 GAN recipe runs at 22.05 kHz / hop 256."""
    truth = np.full(22050, 140.0)
    f0 = estimate_f0(_tone(truth, sr=22050), 22050, 256)
    t = np.full_like(f0, 140.0)
    err, fv, tv = _voiced_err(f0, t)
    assert err.mean() < 3.0
