"""Lightweight F0 (pitch) estimator for GAN training targets.

Replaces the reference's pyworld harvest->dio->stonemask chain
(cosyvoice/dataset/processor.py:184-206) — pyworld is a C++ binary dep not
present here. This is a normalized-autocorrelation (YIN-style) tracker:
frame-wise NACF peak in the 60-500 Hz band with a voicing threshold,
interpolated to the mel frame grid like the reference does.
"""

from __future__ import annotations

import numpy as np


def estimate_f0(
    speech: np.ndarray,
    sample_rate: int = 24000,
    hop_size: int = 480,
    f0_min: float = 60.0,
    f0_max: float = 500.0,
    voicing_threshold: float = 0.3,
) -> np.ndarray:
    """speech: (T,) float32 -> f0 per hop frame (T//hop,); 0 where unvoiced."""
    frame_len = int(sample_rate // f0_min * 2)  # long enough for 2 periods
    n_frames = len(speech) // hop_size
    lag_min = int(sample_rate / f0_max)
    lag_max = int(sample_rate / f0_min)
    f0 = np.zeros(n_frames, np.float32)
    pad = np.pad(speech.astype(np.float64), (0, frame_len))
    for i in range(n_frames):
        fr = pad[i * hop_size : i * hop_size + frame_len]
        fr = fr - fr.mean()
        energy = np.dot(fr, fr)
        if energy < 1e-8:
            continue
        # normalized autocorrelation via FFT
        spec = np.fft.rfft(fr, n=2 * frame_len)
        ac = np.fft.irfft(spec * np.conj(spec))[:frame_len]
        nacf = ac / (ac[0] + 1e-12)
        seg = nacf[lag_min:lag_max]
        if seg.size == 0:
            continue
        k = int(np.argmax(seg)) + lag_min
        if nacf[k] > voicing_threshold:
            # subharmonic (octave-down) correction: if half the period also
            # scores nearly as high, the peak at k is the 2nd/3rd multiple of
            # the true period — prefer the smallest strong multiple (the
            # stonemask-style refinement pyworld applies)
            for div in (4, 3, 2):
                kd = k // div
                if kd >= lag_min and nacf[kd] > 0.85 * nacf[k] and nacf[kd] > voicing_threshold:
                    k = kd
                    break
            # parabolic interpolation around the peak (sub-sample lag)
            kf = float(k)
            if 1 <= k < frame_len - 1:
                a, b, c = nacf[k - 1], nacf[k], nacf[k + 1]
                denom = a - 2 * b + c
                shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
                kf = k + float(np.clip(shift, -1, 1))
            f0[i] = sample_rate / kf
    return _median_smooth_voiced(f0)


def _median_smooth_voiced(f0: np.ndarray, width: int = 5) -> np.ndarray:
    """5-frame median filter over voiced frames only: removes isolated
    octave/tracking outliers without smearing voiced/unvoiced boundaries
    (pyworld's harvest produces comparably smooth contours)."""
    out = f0.copy()
    half = width // 2
    n = len(f0)
    for i in range(n):
        if f0[i] == 0:
            continue
        lo, hi = max(0, i - half), min(n, i + half + 1)
        win = f0[lo:hi]
        win = win[win > 0]
        if win.size:
            out[i] = np.median(win)
    return out
