"""Full-size conversion + parity (the driver's mel target at the driver's
scale): reference-format random checkpoints at FULL dims (llm.pt 0.5B,
flow.pt DiT 1024x22, hift.pt base-512) through cli/prepare_model_dir, then
the torch oracle chain vs the converted JAX chain on CPU for one utterance.

The reference self-tests these modules at full scale
(/root/reference/CosyVoice/cosyvoice/flow/flow.py:406-433,
hifigan/generator.py:729-746); conversion bugs (22-layer stacking,
weight-norm folding at 1024-dim) only surface at real shapes. The committed
PARITY.json artifact is produced by `python tools/parity_fullsize.py`,
which drives these same functions."""

import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parent.parent
if str(REPO / "tools") not in sys.path:
    sys.path.insert(0, str(REPO / "tools"))

import parity_fullsize as P  # noqa: E402


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fullsize")
    P.build_reference_model_dir(d)
    from fangyan_tts_tpu.cli.prepare_model_dir import prepare_model_dir

    report = prepare_model_dir(str(d))
    assert {"llm.msgpack", "flow.msgpack", "hift.msgpack"} <= set(report["converted"])
    return d


@pytest.mark.slow
def test_llm_0p5b_logits_parity(model_dir):
    m = P.parity_llm(model_dir)
    assert m["llm_logits_rel_diff"] < P.THRESHOLDS["llm_logits_rel_diff"], m
    assert m["llm_argmax_match"] == 1.0, m


@pytest.mark.slow
def test_flow_dit_1024x22_mel_parity(model_dir):
    m = P.parity_flow(model_dir)
    # the driver's parity target: mel-spectral distance < 1e-3 at full scale
    assert m["flow_mel_max_abs_diff_offline"] < 1e-3, m
    assert m["flow_mel_max_abs_diff_stream_final"] < 1e-3, m


@pytest.mark.slow
def test_hift_base512_waveform_parity(model_dir):
    m = P.parity_hift(model_dir)
    assert m["hift_f0_max_abs_diff"] < P.THRESHOLDS["hift_f0_max_abs_diff"], m
    assert m["hift_wav_max_abs_diff"] < P.THRESHOLDS["hift_wav_max_abs_diff"], m
    assert m["hift_full_inference_finite"] and m["hift_full_inference_in_range"], m
