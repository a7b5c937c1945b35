"""Data-plane CLI tests: kaldi IO, stats_duration, prepare_training_data."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from fangyan_tts_tpu.data import audio as jaudio
from fangyan_tts_tpu.data import kaldi_io


@pytest.fixture
def mini_dataset(tmp_path, rng):
    """Two dialect dirs with 3 wavs each, Kaldi files."""
    for dialect, spk in (("hunan", "S001"), ("henan", "S002")):
        d = tmp_path / dialect
        (d / "wavs").mkdir(parents=True)
        wav_scp, text, utt2spk = {}, {}, {}
        for i in range(3):
            utt = f"{dialect}_{spk}_{i:03d}"
            wav = d / "wavs" / f"{utt}.wav"
            dur_samples = 16000 + i * 8000  # 1.0s, 1.5s, 2.0s
            jaudio.write_wav(wav, rng.standard_normal(dur_samples) * 0.1, 16000)
            wav_scp[utt] = str(wav)
            text[utt] = f"测试文本{i}"
            utt2spk[utt] = spk
        kaldi_io.write_kaldi_dir(d, wav_scp, text, utt2spk)
    return tmp_path


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    jaudio.write_wav(tmp_path / "a.wav", x, 16000)
    y, sr = jaudio.read_wav(tmp_path / "a.wav")
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1.0 / 32767)


def test_resample_preserves_tone(rng):
    """440 Hz sine resampled 16k->24k keeps its frequency and amplitude."""
    t = np.arange(16000) / 16000.0
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = jaudio.resample_poly(x, 16000, 24000)
    assert abs(len(y) - 24000) <= 1
    # dominant DFT bin should be 440 Hz
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(len(y) - 2000)))
    peak_hz = np.argmax(spec) * 24000.0 / (len(y) - 2000)
    assert abs(peak_hz - 440.0) < 2.0
    assert 0.9 < np.abs(y[2000:-2000]).max() < 1.1


def test_kaldi_io_roundtrip(tmp_path):
    utt2spk = {"u1": "s1", "u2": "s1", "u3": "s2"}
    kaldi_io.write_kaldi_dir(tmp_path, {"u1": "/a.wav", "u2": "/b.wav", "u3": "/c.wav"},
                             {"u1": "你好 世界", "u2": "b", "u3": "c"}, utt2spk)
    assert kaldi_io.read_scp(tmp_path / "text")["u1"] == "你好 世界"
    s2u = kaldi_io.read_spk2utt(tmp_path / "spk2utt")
    assert s2u == {"s1": ["u1", "u2"], "s2": ["u3"]}
    v = kaldi_io.validate_dir(tmp_path)
    assert v["valid"] and v["line_counts"]["text"] == 3


def _run_cli(mod, *args):
    return subprocess.run(
        [sys.executable, "-m", mod, *args],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu"},
    )


def test_stats_duration_json(mini_dataset):
    r = _run_cli("fangyan_tts_tpu.cli.stats_duration", "--dataset-dir", str(mini_dataset), "--json")
    assert r.returncode == 0, r.stderr
    data = json.loads(r.stdout)
    assert data["summary"]["total_files"] == 6
    assert abs(data["summary"]["total_duration_seconds"] - 9.0) < 0.1
    names = {d["name"] for d in data["dialects"]}
    assert names == {"hunan", "henan"}


def test_prepare_training_data_instruct_combine_validate(mini_dataset):
    r = _run_cli(
        "fangyan_tts_tpu.cli.prepare_training_data",
        "--mode", "all", "--dataset-dir", str(mini_dataset), "--no-convert",
    )
    assert r.returncode == 0, r.stderr
    # instruct generated with the dialect template
    ins = kaldi_io.read_scp(mini_dataset / "hunan" / "instruct")
    assert all(v == "请用湖南话说。<|endofprompt|>" for v in ins.values())
    # combined dir merged both dialects
    combined = mini_dataset / "combined"
    assert (combined / "wav.scp").exists()
    assert len(kaldi_io.read_scp(combined / "text")) == 6
    s2u = kaldi_io.read_spk2utt(combined / "spk2utt")
    assert set(s2u) == {"S001", "S002"}
    v = kaldi_io.validate_dir(combined)
    assert v["valid"]


def test_prepare_training_data_instruct_skip_existing(mini_dataset):
    d = mini_dataset / "hunan"
    (d / "instruct").write_text("custom line\n", encoding="utf-8")
    r = _run_cli("fangyan_tts_tpu.cli.prepare_training_data", "--mode", "instruct",
                 "--dataset-dir", str(mini_dataset))
    assert r.returncode == 0
    assert (d / "instruct").read_text(encoding="utf-8") == "custom line\n"
