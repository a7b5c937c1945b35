"""prepare_model_dir orchestration (converter functions themselves are
covered by the parity/convert tests)."""

import json

import numpy as np

from fangyan_tts_tpu.cli.prepare_model_dir import detect_version, prepare_model_dir


def test_detect_version(tmp_path):
    assert detect_version(tmp_path) == 3
    (tmp_path / "cosyvoice2.yaml").write_text("llm: {}\n")
    assert detect_version(tmp_path) == 2
    (tmp_path / "config.json").write_text(json.dumps({"version": 1}))
    assert detect_version(tmp_path) == 1


def test_prepare_skips_existing_and_writes_config(tmp_path):
    from fangyan_tts_tpu.train.checkpoint import save_params

    save_params(tmp_path / "llm.msgpack", {"w": np.zeros(2, np.float32)})
    (tmp_path / "llm.pt").write_bytes(b"not-read-because-msgpack-exists")
    (tmp_path / "cosyvoice3.yaml").write_text("sample_rate: 24000\n")
    report = prepare_model_dir(str(tmp_path))
    assert report["version"] == 3
    assert "llm.msgpack (exists)" in report["skipped"]
    assert "config.json" in report["converted"]
    cfg = json.loads((tmp_path / "config.json").read_text())
    assert cfg["version"] == 3 and cfg["sample_rate"] == 24000
