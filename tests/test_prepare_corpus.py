"""Pipelined stages-1+2+3 (data/extract.py prepare_corpus) must produce
artifacts identical to the sequential extract_all + make_parquet_list path
(the reference's stage-by-stage run.sh contract), and the new duration
metadata columns must let the LLM pipeline read shards without touching
audio bytes."""

import os
import shutil
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from fangyan_tts_tpu.data import kaldi_io
from fangyan_tts_tpu.data.audio import write_wav
from fangyan_tts_tpu.data.extract import extract_all, prepare_corpus
from fangyan_tts_tpu.data.parquet import make_parquet_list


def _emb_fn(f, fl):
    return jnp.mean(f, axis=1) @ jnp.ones((80, 192))


def _tok_fn(m, ml):
    return jnp.argmax(m, axis=1).astype(jnp.int32)[:, :50], jnp.minimum(ml // 4, 50)


@pytest.fixture(scope="module")
def corpus_pair(tmp_path_factory):
    root = tmp_path_factory.mktemp("prep")
    rng = np.random.default_rng(0)
    seq = root / "seq"
    (seq / "wavs").mkdir(parents=True)
    wav_scp, text, utt2spk, instruct = {}, {}, {}, {}
    for i in range(10):
        u = f"u{i:03d}"
        wav = seq / "wavs" / f"{u}.wav"
        write_wav(wav, (rng.standard_normal(16000 + i * 1600) * 0.1).astype(np.float32), 16000)
        wav_scp[u] = str(wav)
        text[u] = f"句子{i}"
        utt2spk[u] = f"s{i // 5}"  # speaker-major order (kaldi convention)
        instruct[u] = "请说。<|endofprompt|>"
    kaldi_io.write_kaldi_dir(seq, wav_scp, text, utt2spk, instruct)
    pipe = root / "pipe"
    shutil.copytree(seq, pipe)
    scp = (pipe / "wav.scp").read_text().replace("/seq/", "/pipe/")
    (pipe / "wav.scp").write_text(scp)
    return seq, pipe


def test_prepare_corpus_matches_sequential(corpus_pair):
    torch = pytest.importorskip("torch")
    seq, pipe = corpus_pair
    extract_all(seq, _emb_fn, _tok_fn, batch_size=4)
    make_parquet_list(seq, seq / "pq", num_utts_per_parquet=4, instruct=True)
    prepare_corpus(pipe, pipe / "pq", _emb_fn, _tok_fn, batch_size=4,
                   num_utts_per_parquet=4, instruct=True)

    for fname in ("utt2embedding.pt", "spk2embedding.pt", "utt2speech_token.pt"):
        a = torch.load(seq / fname, weights_only=False)
        b = torch.load(pipe / fname, weights_only=False)
        assert set(a) == set(b), fname
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), atol=1e-5,
                                       err_msg=f"{fname}:{k}")

    import pyarrow.parquet as pq

    la = (seq / "pq" / "data.list").read_text().splitlines()
    lb = (pipe / "pq" / "data.list").read_text().splitlines()
    assert len(la) == len(lb) == 3
    for fa, fb in zip(la, lb):
        ta, tb = pq.read_table(fa), pq.read_table(fb)
        assert ta.schema.names == tb.schema.names
        assert {"sample_rate", "num_samples"} <= set(ta.schema.names)
        for col in ta.schema.names:
            if col == "wav":  # absolute paths differ between the two dirs
                continue
            va, vb = ta[col].to_pylist(), tb[col].to_pylist()
            same = va == vb or all(np.allclose(x, y) for x, y in zip(va, vb))
            assert same, col
    # every sidecar index the sequential path writes exists in the pipelined
    for name in ("utt2data.list", "spk2data.list"):
        assert (pipe / "pq" / name).read_text().count("\n") == 3


def test_prepare_corpus_fused_apply_matches(corpus_pair, tmp_path):
    """The single-program fused_apply path (features + both models in one
    device call, bench.py data-prep mode) must produce the same .pt maps as
    the 4-call path."""
    torch = pytest.importorskip("torch")
    seq, pipe = corpus_pair
    from fangyan_tts_tpu.data.extract import _embed_features, _token_features

    fused_dir = tmp_path / "fused"
    shutil.copytree(seq, fused_dir, ignore=shutil.ignore_patterns("*.pt", "pq"))
    scp = (fused_dir / "wav.scp").read_text().replace(
        str(seq / "wavs"), str(fused_dir / "wavs"))
    (fused_dir / "wav.scp").write_text(scp)

    def fused(pad_d, lens_d):
        feats, fl = _embed_features(pad_d, lens_d)
        mel, ml = _token_features(pad_d, lens_d)
        return _emb_fn(feats, fl), *_tok_fn(mel, ml)

    prepare_corpus(fused_dir, fused_dir / "pq", _emb_fn, _tok_fn, batch_size=4,
                   num_utts_per_parquet=4, instruct=True, fused_apply=fused)
    for fname in ("utt2embedding.pt", "spk2embedding.pt", "utt2speech_token.pt"):
        a = torch.load(seq / fname, weights_only=False)
        b = torch.load(fused_dir / fname, weights_only=False)
        assert set(a) == set(b), fname
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), atol=1e-5,
                                       err_msg=f"{fname}:{k}")


def test_llm_pipeline_reads_pruned(corpus_pair):
    """mode='llm' shard reads drop audio_data via the metadata columns; all
    rows survive the (header-free) duration gate."""
    pytest.importorskip("torch")
    seq, pipe = corpus_pair
    if not (pipe / "pq" / "data.list").exists():
        pytest.skip("equivalence test runs first")
    from fangyan_tts_tpu.config import LLMConfig, QwenConfig
    from fangyan_tts_tpu.data.dataset import build_pipeline, parquet_opener

    rows = list(parquet_opener((pipe / "pq" / "data.list").read_text().splitlines(),
                               drop_audio=True))
    assert len(rows) == 10 and all("audio_data" not in r for r in rows)
    assert all(int(r["sample_rate"]) == 16000 and int(r["num_samples"]) > 0 for r in rows)

    cfgl = LLMConfig(llm_input_size=32, llm_output_size=32, speech_token_size=700,
                     extra_tokens=8,
                     qwen=QwenConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                                     num_attention_heads=2, num_key_value_heads=1, head_dim=16,
                                     vocab_size=300))

    class Tok:
        def encode(self, s, **kw):
            return list(s.encode())

    batches = list(build_pipeline(str(pipe / "pq" / "data.list"), Tok(), None, mode="llm",
                                  llm_cfg=cfgl, max_frames_in_batch=300))
    assert sum(b["src"].shape[0] for b in batches) == 10
