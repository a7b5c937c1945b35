"""End-to-end training input pipeline: kaldi dir -> .pt artifacts ->
parquet shards -> processor chain -> padded device batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fangyan_tts_tpu.config import LLMConfig, QwenConfig
from fangyan_tts_tpu.data import audio as jaudio
from fangyan_tts_tpu.data import kaldi_io
from fangyan_tts_tpu.data.dataset import build_pipeline, shard_list
from fangyan_tts_tpu.data.parquet import make_parquet_list
from fangyan_tts_tpu.ops.mel import matcha_mel
from fangyan_tts_tpu.tokenizer import ByteFallbackTokenizer

LLM_CFG = LLMConfig(speech_token_size=50, extra_tokens=8,
                    qwen=QwenConfig(vocab_size=400, hidden_size=64))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    src = tmp_path_factory.mktemp("corpus")
    (src / "wavs").mkdir()
    wav_scp, text, utt2spk, instruct = {}, {}, {}, {}
    utt2emb, utt2tok = {}, {}
    for i in range(12):
        utt = f"u{i:03d}"
        dur = 24000 + i * 2400  # 1.0-2.1 s at 24k
        wav = src / "wavs" / f"{utt}.wav"
        jaudio.write_wav(wav, rng.standard_normal(dur) * 0.1, 24000)
        wav_scp[utt] = str(wav)
        text[utt] = f"测试句子{i}"
        utt2spk[utt] = f"s{i % 2}"
        instruct[utt] = "请用湖南话说。<|endofprompt|>"
        utt2emb[utt] = torch.from_numpy(rng.standard_normal(192).astype(np.float32))
        n_tok = dur // 480 // 2
        utt2tok[utt] = torch.from_numpy(rng.integers(0, 50, (n_tok,)).astype(np.int32))
    kaldi_io.write_kaldi_dir(src, wav_scp, text, utt2spk, instruct)
    spk2emb = {"s0": utt2emb["u000"], "s1": utt2emb["u001"]}
    torch.save(utt2emb, src / "utt2embedding.pt")
    torch.save(spk2emb, src / "spk2embedding.pt")
    torch.save(utt2tok, src / "utt2speech_token.pt")
    des = tmp_path_factory.mktemp("parquet")
    shards = make_parquet_list(src, des, num_utts_per_parquet=5, instruct=True)
    assert len(shards) == 3
    return des


def test_llm_pipeline(corpus):
    tok = ByteFallbackTokenizer()
    mel_fn = jax.jit(lambda a: matcha_mel(jnp.asarray(a)))
    batches = list(build_pipeline(str(corpus / "data.list"), tok, mel_fn, mode="llm",
                                  llm_cfg=LLM_CFG, max_frames_in_batch=300))
    assert batches, "pipeline yielded no batches"
    total = sum(b["src"].shape[0] for b in batches)
    assert total == 12
    for b in batches:
        assert b["src"].shape == b["ids"].shape == b["targets"].shape
        assert (b["lengths"] <= b["ids"].shape[1]).all()
        assert b["ids"].shape[1] % 64 == 0  # bucketed padding
        # every row ends with eos target at position length-1
        for i, l in enumerate(b["lengths"]):
            assert b["targets"][i, l - 1] in (LLM_CFG.eos, LLM_CFG.fill)


def test_llm_pipeline_stacked_for_accum(corpus):
    """cli/train's accum path: real pipeline batches stack into (accum, B, L)
    microbatch stacks a scan-accum train step consumes directly."""
    from fangyan_tts_tpu.data.dataset import stack_microbatches

    tok = ByteFallbackTokenizer()
    mel_fn = jax.jit(lambda a: matcha_mel(jnp.asarray(a)))
    it = build_pipeline(str(corpus / "data.list"), tok, mel_fn, mode="llm",
                        llm_cfg=LLM_CFG, max_frames_in_batch=300)
    stacks = list(stack_microbatches(it, accum=2))
    assert stacks, "no stacked batches"
    for s in stacks:
        assert s["src"].ndim == 3 and s["src"].shape[0] == 2
        assert s["lengths"].shape[0] == 2
        # pad rows (if any) are loss-inert
        for m in range(2):
            for i in range(s["src"].shape[1]):
                if s["lengths"][m, i] == 0:
                    assert (s["targets"][m, i] == -1).all()


def test_flow_pipeline(corpus):
    tok = ByteFallbackTokenizer()
    mel_fn = jax.jit(lambda a: matcha_mel(jnp.asarray(a)))
    batches = list(build_pipeline(str(corpus / "data.list"), tok, mel_fn, mode="flow",
                                  max_frames_in_batch=300))
    assert batches
    for b in batches:
        assert b["feat"].shape[2] == 80
        assert (b["feat_len"] == b["token_len"] * 2).all()
        assert b["embedding"].shape[1] == 192
        # embeddings normalized
        np.testing.assert_allclose(np.linalg.norm(b["embedding"], axis=1), 1.0, atol=1e-4)


def test_shard_list_even_by_construction():
    items = list(range(10))
    shards = [shard_list(items, h, 3, epoch=1) for h in range(3)]
    assert all(len(s) == 3 for s in shards)  # even, drops ragged tail
    assert len({x for s in shards for x in s}) == 9  # disjoint
