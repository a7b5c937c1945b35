"""Trained-model quality run (tools/train_tiny_eval.py): train the tiny LLM
on a deterministic synthetic text→speech-token mapping with the real train
step, then score the TRAINED model — token-level CER through the real decode
path (the CER stand-in while no ASR model exists in this image) and CAM++
speaker similarity through cli/evaluate.run_eval over really-synthesized
wavs. The committed artifacts under docs/eval_trained_tiny/ were produced by
the same tool (reference protocol: CosyVoice/README.md:64-82 Seed-TTS-eval;
GRPO CER reward examples/grpo/cosyvoice2/reward_tts.py)."""

import json
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_committed_artifacts_are_from_a_trained_model():
    """The committed eval artifacts exist, carry the harness schema, and
    record a trained (not random) model: near-zero token CER on the learnt
    mapping, finite SS over synthesized audio."""
    d = REPO / "docs" / "eval_trained_tiny"
    rows = [json.loads(x) for x in (d / "results.jsonl").read_text(encoding="utf-8").splitlines()]
    summary = json.loads((d / "summary.json").read_text())
    report = json.loads((d / "token_eval.json").read_text())
    assert summary["n"] == len(rows) == 5
    assert all(-1.0 <= r["ss"] <= 1.0 for r in rows)
    assert report["train"]["final_acc"] > 0.97
    assert report["token_eval"]["token_cer"] < 0.05  # the mapping was learnt
    assert np.isfinite(summary["ss"])


@pytest.mark.slow
def test_train_then_eval_end_to_end(tmp_path, monkeypatch):
    """Re-run the whole loop at reduced size: real train step to the
    accuracy target, greedy decode reproduces the mapping, run_eval scores
    the synthesized wavs."""
    pytest.importorskip("torch")
    import sys

    sys.path.insert(0, str(REPO / "tools")) if str(REPO / "tools") not in sys.path else None
    import train_tiny_eval as T

    monkeypatch.setattr(T, "N_TRAIN", 20)
    monkeypatch.setattr(T, "N_EVAL", 3)
    monkeypatch.setattr(T, "MAX_STEPS", 2000)
    out = tmp_path / "eval_out"
    model_dir = tmp_path / "model"
    report = T.run(out, model_dir)
    assert report["train"]["final_acc"] > 0.99, report["train"]
    assert report["token_eval"]["token_cer"] < 0.05, report["token_eval"]
    assert report["harness_summary"]["n"] == 3
    assert (out / "results.jsonl").exists() and (out / "summary.json").exists()
    for i in range(3):
        assert (out / f"e{i}.wav").stat().st_size > 44
