"""Recipe-chain integration: executes `bash examples/dialect/run.sh 0 7` as
one unit against a tiny synthetic kaldi corpus and a tiny converted
PRETRAIN_DIR, asserting every stage's file artifact — the inter-stage
contracts the reference recipe exercises daily
(examples/dialect/cosyvoice3/run.sh:13-196):

  stage 0: instruct presence check
  stage 1: utt2embedding.pt / spk2embedding.pt (campplus)
  stage 2: utt2speech_token.pt (S3 v3)
  stage 3: parquet shards + data.list + train/cv split
  stage 5: epoch checkpoints + val-loss sidecars
  stage 6: val-best averaged llm.msgpack
  stage 7: exported StableHLO programs

then drives cli/compare_inference on the chain's own outputs (pretrained vs
the freshly trained LLM) and asserts the comparison wavs.

Runs each CLI as a real subprocess through the actual bash script (CPU via
PALLAS_AXON_POOL_IPS="" so the axon sitecustomize stays inert)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from fangyan_tts_tpu.config import (
    CosyVoiceConfig, DiTConfig, FlowConfig, HiFTConfig, LLMConfig, QwenConfig, _to_jsonable,
)
from fangyan_tts_tpu.data import kaldi_io
from fangyan_tts_tpu.data.audio import write_wav
from fangyan_tts_tpu.models.campplus import CAMPPlus
from fangyan_tts_tpu.models.s3tokenizer import S3TokenizerV3
from fangyan_tts_tpu.train.checkpoint import save_params
from fangyan_tts_tpu.utils.init import fast_init

REPO = Path(__file__).resolve().parent.parent

# tiny model dims, REAL token vocabs (stage 2's full-size S3 emits codes in
# [0, 6561), so speech_token_size must be the real 6561)
TINY = CosyVoiceConfig(
    llm=LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=6561, extra_tokens=8,
                  qwen=QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                                  num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=300)),
    flow=FlowConfig(vocab_size=6561, n_timesteps=2,
                    dit=DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, static_chunk_size=10)),
    hift=HiFTConfig(base_channels=64, f0_cond_channels=32),
    chunk_size=5,
)

N_UTT = 12
MAX_EPOCH = 5  # stage 6 averages --num 5 val-best checkpoints


@pytest.fixture(scope="module")
def chain_dirs(tmp_path_factory):
    """dataset/combined corpus + tiny PRETRAIN_DIR (full-size random
    campplus/s3 so the stage-1/2 CLIs' default module dims match)."""
    pytest.importorskip("torch")
    root = tmp_path_factory.mktemp("recipe")
    data_dir = root / "dataset" / "combined"
    (data_dir / "wavs").mkdir(parents=True)
    rng = np.random.default_rng(11)
    wav_scp, text, utt2spk, instruct = {}, {}, {}, {}
    for i in range(N_UTT):
        utt = f"u{i:03d}"
        dur = int(24000 * (1.5 + 0.1 * i))  # 1.5-2.6 s (filter min is 1.0 s)
        wav = data_dir / "wavs" / f"{utt}.wav"
        write_wav(wav, (rng.standard_normal(dur) * 0.1).astype(np.float32), 24000)
        wav_scp[utt] = str(wav)
        text[utt] = f"今天天气真不错第{i}句。"
        utt2spk[utt] = f"s{i % 2}"
        instruct[utt] = "请用湖南话说。<|endofprompt|>"
    kaldi_io.write_kaldi_dir(data_dir, wav_scp, text, utt2spk, instruct)

    pretrain = root / "pretrained"
    pretrain.mkdir()
    (pretrain / "config.json").write_text(json.dumps(_to_jsonable(TINY)))
    from fangyan_tts_tpu.infer.tts import CosyVoice3TTS

    tts = CosyVoice3TTS.random_init(TINY, dtype=jnp.float32)
    save_params(pretrain / "llm.msgpack", tts.llm_params)
    save_params(pretrain / "flow.msgpack", tts.flow_params)
    save_params(pretrain / "hift.msgpack", tts.hift_params)
    # full-size frontends: stage-1/2 CLIs instantiate CAMPPlus()/S3TokenizerV3()
    # at reference dims, so the msgpacks must be reference-shaped
    save_params(pretrain / "campplus.msgpack", fast_init(CAMPPlus(), 5, jnp.zeros((1, 98, 80))))
    save_params(pretrain / "s3tokenizer.msgpack",
                fast_init(S3TokenizerV3(), 6, jnp.zeros((1, 128, 100)), jnp.asarray([100])))
    prompt = root / "prompt.wav"
    write_wav(prompt, (rng.standard_normal(24000 * 2) * 0.1).astype(np.float32), 24000)
    return root, data_dir, pretrain, prompt


def _sub_env(root: Path, data_dir: Path, pretrain: Path) -> dict:
    env = dict(os.environ)
    env.update(
        # keep the axon sitecustomize inert in subprocesses -> plain CPU jax
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        FANGYAN_JAX_CACHE_DIR=str(REPO / ".jax_cache_cpu"),
        DATA_DIR=str(data_dir),
        EXP_DIR=str(root / "exp" / "llm"),
        PRETRAIN_DIR=str(pretrain),
        CONFIG=str(pretrain / "config.json"),
        MAX_EPOCH=str(MAX_EPOCH),
        MAX_FRAMES="400",
        NUM_UTTS_PER_PARQUET="5",  # 12 utts -> 3 shards -> real train/cv split
        PY=sys.executable,
    )
    return env


@pytest.mark.slow
def test_recipe_chain_stages_0_to_7(chain_dirs):
    root, data_dir, pretrain, prompt = chain_dirs
    torch = pytest.importorskip("torch")
    env = _sub_env(root, data_dir, pretrain)
    exp_dir = Path(env["EXP_DIR"])

    r = subprocess.run(
        ["bash", "examples/dialect/run.sh", "0", "7"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    assert r.returncode == 0, f"run.sh failed:\nSTDOUT:\n{r.stdout[-4000:]}\nSTDERR:\n{r.stderr[-4000:]}"

    # stage 1: embeddings for every utt + per-spk means
    utt2emb = torch.load(data_dir / "utt2embedding.pt", weights_only=False)
    spk2emb = torch.load(data_dir / "spk2embedding.pt", weights_only=False)
    assert set(utt2emb) == {f"u{i:03d}" for i in range(N_UTT)}
    assert set(spk2emb) == {"s0", "s1"}
    assert np.asarray(utt2emb["u000"]).shape == (192,)

    # stage 2: speech tokens in the real FSQ id space
    utt2tok = torch.load(data_dir / "utt2speech_token.pt", weights_only=False)
    assert set(utt2tok) == set(utt2emb)
    toks = np.concatenate([np.asarray(v).ravel() for v in utt2tok.values()])
    assert toks.min() >= 0 and toks.max() < 6561

    # stage 3: shards + split (3 shards -> 2 train, 1 cv)
    parquet = data_dir / "parquet"
    shards = (parquet / "data.list").read_text().splitlines()
    assert len(shards) == 3 and all(Path(s).exists() for s in shards)
    train_list = (parquet / "train.data.list").read_text().splitlines()
    cv_list = (parquet / "cv.data.list").read_text().splitlines()
    assert len(train_list) == 2 and len(cv_list) == 1
    assert set(train_list) | set(cv_list) == set(shards)

    # stage 5: epoch checkpoints + sidecars with CV loss (val-best input)
    ckpts = sorted(exp_dir.glob("epoch_*_whole.msgpack"))
    assert len(ckpts) == MAX_EPOCH, [p.name for p in exp_dir.iterdir()]
    for ck in ckpts:
        side = json.loads(Path(str(ck) + ".json").read_text())
        assert np.isfinite(side["cv_loss"]), side

    # stage 6: averaged model loads into the tiny LLM param tree
    from fangyan_tts_tpu.train.checkpoint import load_params

    avg = load_params(exp_dir / "llm.msgpack")
    assert avg["llm_decoder"]["kernel"].shape == (64, 6561 + 8)

    # stage 7: exported StableHLO programs
    export_dir = exp_dir / "export"
    names = {p.name for p in export_dir.glob("*.stablehlo")}
    assert {"flow_prepare.stablehlo", "flow_solve.stablehlo", "vocoder.stablehlo"} <= names
    assert all((export_dir / n).stat().st_size > 0 for n in names)


@pytest.mark.slow
def test_recipe_chain_compare_inference(chain_dirs):
    """Post-chain: compare_inference on the chain's own fine-tuned LLM
    (reference top-level compare_inference.py flags/layout)."""
    root, data_dir, pretrain, prompt = chain_dirs
    env = _sub_env(root, data_dir, pretrain)
    finetuned = Path(env["EXP_DIR"]) / "llm.msgpack"
    if not finetuned.exists():
        pytest.skip("chain test did not produce llm.msgpack (runs first)")
    out_dir = root / "comparison"
    r = subprocess.run(
        [sys.executable, "-m", "fangyan_tts_tpu.cli.compare_inference",
         "--pretrained_dir", str(pretrain), "--finetuned_llm", str(finetuned),
         "--prompt_wav", str(prompt), "--output_dir", str(out_dir),
         "--dialects", "hunan", "--num_texts", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, f"compare_inference failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    for name in ("hunan_1_original.wav", "hunan_1_finetuned.wav"):
        wav = out_dir / name
        assert wav.exists() and wav.stat().st_size > 44, name
