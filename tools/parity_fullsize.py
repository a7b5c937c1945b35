"""Full-size conversion + parity artifact (the driver's mel-parity target at
the driver's scale).

Builds reference-format random checkpoints at FULL dims — llm.pt (0.5B
CosyVoice3LM over Qwen2: hidden 896 / 24 layers / vocab 151936), flow.pt
(CausalMaskedDiffWithDiT, DiT 1024x22), hift.pt (CausalHiFTGenerator base 512)
— in the exact reference state-dict layout (the same modules the reference
instantiates from examples/dialect/cosyvoice3/conf/cosyvoice3.yaml:23-101,
saved the way cosyvoice/utils/train_utils.py:195-214 saves), runs
cli/prepare_model_dir on the directory, then compares the torch oracle chain
against the converted JAX chain on CPU for one utterance:

  llm:  teacher-forced logits over a [sos, text, task, speech] sequence
        (llm.py:628-712 embedding layout) + per-position argmax identity
  flow: full inference() mel, offline and streaming-chunk modes
        (flow.py:358-433) — the mel-spectral-distance < 1e-3 target
  hift: causal f0 predictor + full decode with a shared source signal
        (generator.py:572-746; NSF noise buffers deliberately differ, see
        models/hift.py docstring, so the deterministic decode stack is the
        waveform-parity surface)

Run:  python tools/parity_fullsize.py [--dir DIR] [--keep]
      writes PARITY.json at the repo root.
The slow test tests/test_fullsize_parity.py drives the same functions.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
for p in (str(REPO), str(REPO / "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

# full-scale utterance (dims are full-size; sequence lengths kept short so the
# single-CPU-core oracle chain stays in slow-test budget)
TEXT_LEN = 12
SPEECH_LEN = 24
FLOW_TOK = 30
FLOW_PROMPT_TOK = 6
HIFT_MEL_FRAMES = 60
SEED = 2026


def _seed_params(module, seed: int, scale: float) -> None:
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)


def build_llm_pt(d: Path) -> None:
    """Reference CosyVoice3LM @ 0.5B (llm.py:628-668, Qwen2Encoder
    llm.py:230-233 around transformers Qwen2ForCausalLM)."""
    import torch
    import transformers

    from oracles import ref_loader

    llm_mod = ref_loader.load("cosyvoice.llm.llm")
    qcfg = transformers.Qwen2Config(
        hidden_size=896, intermediate_size=4864, num_hidden_layers=24,
        num_attention_heads=14, num_key_value_heads=2, vocab_size=151936,
        rope_theta=1000000.0, tie_word_embeddings=True,
        attn_implementation="eager",
    )
    enc = llm_mod.Qwen2Encoder.__new__(llm_mod.Qwen2Encoder)
    torch.nn.Module.__init__(enc)
    enc.model = transformers.Qwen2ForCausalLM(qcfg)
    m = llm_mod.CosyVoice3LM(
        llm_input_size=896, llm_output_size=896, speech_token_size=6561,
        llm=enc, sampling=None, length_normalized_loss=True, lsm_weight=0.0,
    ).eval()
    _seed_params(m, SEED, 0.02)
    sd = m.state_dict()
    sd["epoch"] = 1
    sd["step"] = 1000  # training-meta keys filter_training_meta must drop
    torch.save(sd, d / "llm.pt")


def build_flow_pt(d: Path) -> None:
    """Reference CausalMaskedDiffWithDiT @ DiT 1024x22 (cosyvoice3.yaml:38-76)."""
    import torch
    from types import SimpleNamespace

    from oracles import ref_loader

    flow_mod = ref_loader.load("cosyvoice.flow.flow")
    dit_mod = ref_loader.load("cosyvoice.flow.DiT.dit")
    fm = ref_loader.load("cosyvoice.flow.flow_matching")
    ue = ref_loader.load("cosyvoice.transformer.upsample_encoder")

    est = dit_mod.DiT(dim=1024, depth=22, heads=16, dim_head=64, dropout=0.0,
                      ff_mult=2, mel_dim=80, mu_dim=80, spk_dim=80,
                      out_channels=80, static_chunk_size=50,
                      num_decoding_left_chunks=-1)
    cfm_params = SimpleNamespace(sigma_min=1e-6, solver="euler", t_scheduler="cosine",
                                 training_cfg_rate=0.2, inference_cfg_rate=0.7)
    decoder = fm.CausalConditionalCFM(in_channels=240, cfm_params=cfm_params,
                                      n_spks=1, spk_emb_dim=80, estimator=est)
    pre = ue.PreLookaheadLayer(in_channels=80, channels=1024, pre_lookahead_len=3)
    m = flow_mod.CausalMaskedDiffWithDiT(
        input_size=80, output_size=80, spk_embed_dim=192, vocab_size=6561,
        input_frame_rate=25, token_mel_ratio=2, pre_lookahead_len=3,
        pre_lookahead_layer=pre, decoder=decoder,
    ).eval()
    _seed_params(m, SEED + 1, 0.02)
    torch.save(m.state_dict(), d / "flow.pt")


def build_hift_pt(d: Path) -> None:
    """Reference CausalHiFTGenerator @ base 512 (cosyvoice3.yaml:78-101)."""
    import torch

    from oracles import ref_loader

    gen_mod = ref_loader.load("cosyvoice.hifigan.generator")
    f0_mod = ref_loader.load("cosyvoice.hifigan.f0_predictor")
    f0p = f0_mod.CausalConvRNNF0Predictor(num_class=1, in_channels=80, cond_channels=512)
    m = gen_mod.CausalHiFTGenerator(
        in_channels=80, base_channels=512, nb_harmonics=8, sampling_rate=24000,
        nsf_alpha=0.1, nsf_sigma=0.003, nsf_voiced_threshold=10,
        upsample_rates=[8, 5, 3], upsample_kernel_sizes=[16, 11, 7],
        istft_params={"n_fft": 16, "hop_len": 4},
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        source_resblock_kernel_sizes=[7, 7, 11],
        source_resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        lrelu_slope=0.1, audio_limit=0.99, conv_pre_look_right=4,
        f0_predictor=f0p,
    ).eval()
    _seed_params(m, SEED + 2, 0.05)
    torch.save(m.state_dict(), d / "hift.pt")


def build_reference_model_dir(d: Path) -> None:
    d.mkdir(parents=True, exist_ok=True)
    build_llm_pt(d)
    build_flow_pt(d)
    build_hift_pt(d)


def _load_msgpack(path: Path):
    from fangyan_tts_tpu.train.checkpoint import load_params

    return load_params(path)


def parity_llm(d: Path) -> dict:
    """Teacher-forced 0.5B logits: torch CosyVoice3LM embedding layout +
    Qwen2Encoder forward (llm.py:678-712) vs our embed_plan + Qwen2Model."""
    import torch

    import jax.numpy as jnp

    from fangyan_tts_tpu.config import LLMConfig
    from fangyan_tts_tpu.models import qwen2 as q
    from fangyan_tts_tpu.models.llm import CosyVoice3LM

    from oracles import ref_loader
    import transformers

    llm_mod = ref_loader.load("cosyvoice.llm.llm")
    sd = torch.load(d / "llm.pt", map_location="cpu", weights_only=False)
    sd = {k: v for k, v in sd.items() if k not in ("epoch", "step")}

    qcfg = transformers.Qwen2Config(
        hidden_size=896, intermediate_size=4864, num_hidden_layers=24,
        num_attention_heads=14, num_key_value_heads=2, vocab_size=151936,
        rope_theta=1000000.0, tie_word_embeddings=True,
        attn_implementation="eager",
    )
    enc = llm_mod.Qwen2Encoder.__new__(llm_mod.Qwen2Encoder)
    torch.nn.Module.__init__(enc)
    enc.model = transformers.Qwen2ForCausalLM(qcfg)
    ref = llm_mod.CosyVoice3LM(
        llm_input_size=896, llm_output_size=896, speech_token_size=6561,
        llm=enc, sampling=None,
    ).eval()
    ref.load_state_dict(sd)

    rng = np.random.default_rng(SEED)
    text = rng.integers(0, 151936, (1, TEXT_LEN)).astype(np.int64)
    speech = rng.integers(0, 6561, (1, SPEECH_LEN)).astype(np.int64)
    t_total = 1 + TEXT_LEN + 1 + SPEECH_LEN

    with torch.no_grad():
        sos_emb = ref.speech_embedding.weight[ref.sos].reshape(1, 1, -1)
        task_emb = ref.speech_embedding.weight[ref.task_id].reshape(1, 1, -1)
        lm_input = torch.cat(
            [sos_emb, ref.llm.model.model.embed_tokens(torch.from_numpy(text)),
             task_emb, ref.speech_embedding(torch.from_numpy(speech))], dim=1)
        hidden, _ = ref.llm(lm_input, torch.tensor([t_total]))
        ref_logits = ref.llm_decoder(hidden).numpy()[0]

    cfg = LLMConfig()
    params = _load_msgpack(d / "llm.msgpack")
    model = CosyVoice3LM(cfg)
    src = np.concatenate([[1], np.zeros(TEXT_LEN, np.int32), [1], np.ones(SPEECH_LEN, np.int32)])[None]
    ids = np.concatenate([[cfg.sos], text[0], [cfg.task_id], speech[0]])[None]
    bound = model.bind({"params": params})
    x = bound.embed_plan(jnp.asarray(src, jnp.int32), jnp.asarray(ids, jnp.int32))
    positions = jnp.broadcast_to(jnp.arange(t_total, dtype=jnp.int32), (1, t_total))
    bias = q.prefill_attn_bias(t_total, jnp.asarray([t_total], jnp.int32))
    h, _ = bound.llm(x, positions, bias)
    got_logits = np.asarray(bound.llm_decoder(h))[0]

    scale = float(np.abs(ref_logits).max())
    diff = float(np.abs(got_logits - ref_logits).max())
    argmax_match = float((got_logits.argmax(-1) == ref_logits.argmax(-1)).mean())
    return {"llm_logits_max_abs_diff": diff, "llm_logits_max_abs": scale,
            "llm_logits_rel_diff": diff / max(scale, 1e-9),
            "llm_argmax_match": argmax_match, "llm_seq_len": t_total}


def parity_flow(d: Path) -> dict:
    """Full flow.inference() at DiT 1024x22 (flow.py:358-433) in offline and
    streaming-chunk modes — asserts the driver's mel target at real scale."""
    import torch
    from types import SimpleNamespace

    import jax.numpy as jnp

    from fangyan_tts_tpu.config import FlowConfig
    from fangyan_tts_tpu.models.convert import flow_params_from_reference  # noqa: F401 (layout doc)
    from fangyan_tts_tpu.models.flow import CausalMaskedDiffWithDiT, flow_inference

    from oracles import ref_loader

    flow_mod = ref_loader.load("cosyvoice.flow.flow")
    dit_mod = ref_loader.load("cosyvoice.flow.DiT.dit")
    fm = ref_loader.load("cosyvoice.flow.flow_matching")
    ue = ref_loader.load("cosyvoice.transformer.upsample_encoder")

    est = dit_mod.DiT(dim=1024, depth=22, heads=16, dim_head=64, dropout=0.0,
                      ff_mult=2, mel_dim=80, mu_dim=80, spk_dim=80,
                      out_channels=80, static_chunk_size=50,
                      num_decoding_left_chunks=-1)
    cfm_params = SimpleNamespace(sigma_min=1e-6, solver="euler", t_scheduler="cosine",
                                 training_cfg_rate=0.2, inference_cfg_rate=0.7)
    decoder = fm.CausalConditionalCFM(in_channels=240, cfm_params=cfm_params,
                                      n_spks=1, spk_emb_dim=80, estimator=est)
    pre = ue.PreLookaheadLayer(in_channels=80, channels=1024, pre_lookahead_len=3)
    ref = flow_mod.CausalMaskedDiffWithDiT(
        input_size=80, output_size=80, spk_embed_dim=192, vocab_size=6561,
        input_frame_rate=25, token_mel_ratio=2, pre_lookahead_len=3,
        pre_lookahead_layer=pre, decoder=decoder,
    ).eval()
    sd = torch.load(d / "flow.pt", map_location="cpu", weights_only=False)
    ref.load_state_dict(sd)

    rng = np.random.default_rng(SEED + 1)
    token = rng.integers(0, 6561, (1, FLOW_TOK)).astype(np.int64)
    prompt_token = rng.integers(0, 6561, (1, FLOW_PROMPT_TOK)).astype(np.int64)
    prompt_feat = (rng.standard_normal((1, FLOW_PROMPT_TOK * 2, 80)) * 0.5).astype(np.float32)
    embedding = rng.standard_normal((1, 192)).astype(np.float32)

    cfg = FlowConfig()
    jx = CausalMaskedDiffWithDiT(cfg)
    params = _load_msgpack(d / "flow.msgpack")
    full_token = np.concatenate([prompt_token, token], axis=1)

    out = {}
    for mode, (streaming, finalize) in (("offline", (False, True)),
                                        ("stream_final", (True, True))):
        with torch.no_grad():
            ref_mel, _ = ref.inference(
                torch.from_numpy(token), torch.tensor([FLOW_TOK]),
                torch.from_numpy(prompt_token), torch.tensor([FLOW_PROMPT_TOK]),
                torch.from_numpy(prompt_feat), torch.tensor([FLOW_PROMPT_TOK * 2]),
                torch.from_numpy(embedding), streaming=streaming, finalize=finalize,
            )
        ref_mel = ref_mel.numpy()
        mel = flow_inference(
            jx, params, jnp.asarray(full_token, jnp.int32),
            jnp.asarray([FLOW_PROMPT_TOK + FLOW_TOK], jnp.int32),
            jnp.asarray(prompt_feat), jnp.asarray([FLOW_PROMPT_TOK * 2], jnp.int32),
            jnp.asarray(embedding), streaming=streaming, finalize=finalize,
        )
        got = np.asarray(mel)[:, FLOW_PROMPT_TOK * 2:, :].transpose(0, 2, 1)
        assert got.shape == ref_mel.shape, (got.shape, ref_mel.shape)
        out[f"flow_mel_max_abs_diff_{mode}"] = float(np.abs(got - ref_mel).max())
        out[f"flow_mel_rms_{mode}"] = float(np.sqrt((ref_mel ** 2).mean()))
    out["flow_gen_frames"] = FLOW_TOK * 2
    return out


def parity_hift(d: Path) -> dict:
    """CausalHiFTGenerator base-512: f0 predictor (finalize + streaming) and
    the full decode stack with a shared source (generator.py:572-746). The
    NSF noise buffers are deliberately different deterministic constants
    (models/hift.py), so decode-with-shared-source is the waveform-parity
    surface; the full inference path is smoke-checked for range/finiteness."""
    import torch

    import jax.numpy as jnp

    from fangyan_tts_tpu.config import HiFTConfig
    from fangyan_tts_tpu.models.hift import CausalHiFT

    from oracles import ref_loader

    gen_mod = ref_loader.load("cosyvoice.hifigan.generator")
    f0_mod = ref_loader.load("cosyvoice.hifigan.f0_predictor")
    f0p = f0_mod.CausalConvRNNF0Predictor(num_class=1, in_channels=80, cond_channels=512)
    ref = gen_mod.CausalHiFTGenerator(
        in_channels=80, base_channels=512, nb_harmonics=8, sampling_rate=24000,
        nsf_alpha=0.1, nsf_sigma=0.003, nsf_voiced_threshold=10,
        upsample_rates=[8, 5, 3], upsample_kernel_sizes=[16, 11, 7],
        istft_params={"n_fft": 16, "hop_len": 4},
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        source_resblock_kernel_sizes=[7, 7, 11],
        source_resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        lrelu_slope=0.1, audio_limit=0.99, conv_pre_look_right=4,
        f0_predictor=f0p,
    ).eval()
    sd = torch.load(d / "hift.pt", map_location="cpu", weights_only=False)
    ref.load_state_dict(sd)

    cfg = HiFTConfig()
    jx = CausalHiFT(cfg)
    params = _load_msgpack(d / "hift.msgpack")

    rng = np.random.default_rng(SEED + 2)
    mel = (rng.standard_normal((1, 80, HIFT_MEL_FRAMES)) * 0.5).astype(np.float32)
    src = (rng.standard_normal((1, 1, HIFT_MEL_FRAMES * 480)) * 0.05).astype(np.float32)
    mel_j = jnp.asarray(mel.transpose(0, 2, 1))

    with torch.no_grad():
        ref_f0 = ref.f0_predictor(torch.from_numpy(mel), finalize=True).numpy()
        ref_wav = ref.decode(torch.from_numpy(mel), torch.from_numpy(src), finalize=True).numpy()

    got_f0 = np.asarray(jx.apply({"params": params}, mel_j, method=lambda m, x: m.f0_predictor(x)))
    got_wav = np.asarray(jx.apply(
        {"params": params}, mel_j, jnp.asarray(src.transpose(0, 2, 1)), True,
        method=lambda m, x, s, fin: m.decode(x, s, finalize=fin)))
    assert got_wav.shape == ref_wav.shape, (got_wav.shape, ref_wav.shape)

    # full inference smoke (different NSF noise by design — range/finiteness);
    # CausalHiFT.__call__ returns (wav, source)
    full = np.asarray(jx.apply({"params": params}, mel_j, method=lambda m, x: m(x)[0]))
    return {
        "hift_f0_max_abs_diff": float(np.abs(got_f0 - ref_f0).max()),
        "hift_wav_max_abs_diff": float(np.abs(got_wav - ref_wav).max()),
        "hift_wav_rms": float(np.sqrt((ref_wav ** 2).mean())),
        "hift_full_inference_finite": bool(np.isfinite(full).all()),
        "hift_full_inference_in_range": bool((np.abs(full) <= 0.99 + 1e-6).all()),
        "hift_samples": HIFT_MEL_FRAMES * 480,
    }


def run_parity(d: Path) -> dict:
    """Convert the dir (cli/prepare_model_dir) and run all three chains."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from fangyan_tts_tpu.cli.prepare_model_dir import prepare_model_dir

    t0 = time.time()
    report = prepare_model_dir(str(d))
    metrics: dict = {
        "dims": {"llm": "0.5B (896h/24L/151936v)", "dit": "1024x22", "hift": "base512"},
        "convert_s": round(time.time() - t0, 1),
        "converted": report["converted"],
    }
    for fn in (parity_llm, parity_flow, parity_hift):
        t0 = time.time()
        got = fn(d)
        metrics.update(got)
        metrics[f"{fn.__name__}_s"] = round(time.time() - t0, 1)
        print(f"[parity] {fn.__name__} ({metrics[f'{fn.__name__}_s']}s): "
              + json.dumps(got, default=str), flush=True)
    return metrics


THRESHOLDS = {
    "llm_logits_rel_diff": 2e-4,
    "llm_argmax_match": 1.0,
    "flow_mel_max_abs_diff_offline": 1e-3,
    "flow_mel_max_abs_diff_stream_final": 1e-3,
    "hift_f0_max_abs_diff": 1e-4,
    "hift_wav_max_abs_diff": 1e-3,
}


def check(metrics: dict) -> list[str]:
    fails = []
    for k, thr in THRESHOLDS.items():
        v = metrics[k]
        ok = v >= thr if k == "llm_argmax_match" else v < thr
        if not ok:
            fails.append(f"{k}={v} vs {'>=' if k == 'llm_argmax_match' else '<'} {thr}")
    return fails


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dir", default=None, help="model dir (default: temp)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    d = Path(args.dir) if args.dir else Path(tempfile.mkdtemp(prefix="parity_full_"))
    if not (d / "llm.pt").exists():
        print(f"[parity] building full-size reference checkpoints in {d} ...", flush=True)
        t0 = time.time()
        build_reference_model_dir(d)
        print(f"[parity] built in {time.time() - t0:.0f}s", flush=True)
    metrics = run_parity(d)
    fails = check(metrics)
    out = {"metrics": metrics, "thresholds": THRESHOLDS, "pass": not fails, "fails": fails,
           "seed": SEED, "date": time.strftime("%Y-%m-%d")}
    (REPO / "PARITY.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    if not args.keep and not args.dir:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
    return 0 if not fails else 1


if __name__ == "__main__":
    sys.exit(main())
