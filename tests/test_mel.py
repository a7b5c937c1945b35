"""Mel frontend invariants + available oracles.

librosa/torchaudio/whisper are not installed in this image, so filterbank
construction is validated against their published formulas and invariants;
torch.stft covers the spectrogram math (tests/test_stft.py)."""

import jax.numpy as jnp
import numpy as np

from fangyan_tts_tpu.ops import mel as jmel


def test_slaney_filterbank_shape_and_partition():
    fb = jmel.mel_filterbank_slaney(24000, 1920, 80)
    assert fb.shape == (80, 961)
    # each filter is a single triangle: nonneg, unimodal, compact support
    assert (fb >= 0).all()
    for m in range(80):
        nz = np.nonzero(fb[m])[0]
        assert nz.size > 0
        assert np.all(np.diff(nz) == 1), "filter support must be contiguous"
    # slaney norm: peak amplitude = 2 / bandwidth — filters shrink with freq
    peaks = fb.max(axis=1)
    assert peaks[0] > peaks[-1]


def test_slaney_break_frequency():
    # below 1 kHz the slaney mel scale is linear: mel = f * 3 / 200
    assert np.isclose(jmel._hz_to_mel_slaney(1000.0), 15.0)
    assert np.isclose(jmel._hz_to_mel_slaney(500.0), 7.5)
    # roundtrip
    f = np.array([0.0, 440.0, 1000.0, 4000.0, 11025.0])
    np.testing.assert_allclose(jmel._mel_to_hz_slaney(jmel._hz_to_mel_slaney(f)), f, rtol=1e-9)


def test_kaldi_filterbank_matches_htk_centers():
    fb = jmel.mel_filterbank_kaldi(16000, 512, 80, low_freq=20.0)
    assert fb.shape == (80, 256)
    # filter peaks should be 1.0 where a bin lands exactly on the center,
    # and every filter's max is <= 1 and > 0
    assert (fb.max(axis=1) > 0).all()
    assert fb.max() <= 1.0 + 1e-6


def test_matcha_mel_shape_and_range(rng):
    y = rng.standard_normal((2, 24000)).astype(np.float32) * 0.1
    m = jmel.matcha_mel(jnp.asarray(y))
    assert m.shape == (2, 80, 50)  # 24000 / 480
    assert np.isfinite(np.asarray(m)).all()
    assert np.asarray(m).min() >= np.log(1e-5) - 1e-5


def test_whisper_logmel_shape_and_normalization(rng):
    y = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1
    m = jmel.whisper_logmel(jnp.asarray(y))
    assert m.shape == (1, 128, 100)
    m = np.asarray(m)
    # (x+4)/4 normalization with max-8 floor => range within [max-2, max]
    assert m.max() - m.min() <= 2.0 + 1e-6


def test_kaldi_fbank_shape_snip_edges(rng):
    y = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1
    f = jmel.kaldi_fbank(jnp.asarray(y))
    # snip_edges: 1 + (16000 - 400)//160 = 98 frames
    assert f.shape == (1, 98, 80)
    assert np.isfinite(np.asarray(f)).all()


def test_kaldi_fbank_scale_invariance_after_mean_sub(rng):
    """Kaldi log-mel of c*x differs from x by a constant; mean-sub removes it
    (this is why feeding [-1,1] audio instead of int16 floats is benign for
    campplus, see extract_embedding.py:29-35)."""
    y = rng.standard_normal((1, 8000)).astype(np.float32) * 0.05
    a = jmel.kaldi_fbank(jnp.asarray(y), subtract_mean=True)
    b = jmel.kaldi_fbank(jnp.asarray(y * 32768.0), subtract_mean=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
