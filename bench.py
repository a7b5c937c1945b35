"""Benchmark: CosyVoice3-0.5B end-to-end synthesis RTF on one TPU chip.

Prints JSON metric lines (driver contract: {"metric", "value", "unit",
"vs_baseline"}); the HEADLINE synthesis-RTF line is printed LAST:

1. data_prep_stages0_4_utt_per_s_per_chip — end-to-end data prep: stage 0
   (kaldi prep + validate) -> 1 (campplus embeddings) -> 2 (S3 speech
   tokens) -> 3 (parquet shards + data.list) -> 4 (train-ready check: the
   training pipeline yields a collated LLM batch). Baseline: driver target
   >500 utt/s on v5e-8 => 62.5 utt/s/chip (BASELINE.md; reference pipeline
   examples/dialect/cosyvoice3/run.sh:13-196).
2. streaming_first_chunk_ms — solo streaming first-chunk latency c=1
   (LLM first hop + KV-cached flow prefill + vocoder first window).
   Baseline: reference Triton streaming c=1 avg 220.43 ms
   (runtime/triton_trtllm/README.md:95-97).
3. streaming_async_c{4,8,12,16}_rtf + streaming_max_underrun_free_c — N
   asynchronous client threads, each running its own incremental LLM decode
   and feeding the StreamScheduler (dynamic batching window); carries p99
   inter-chunk gap + underrun count (playback-starvation UX) per load
   point, and the measured underrun-free concurrency ceiling of the chip.
   Baseline: reference Triton streaming c=4 RTF 0.0733
   (runtime/triton_trtllm/README.md:101; no higher-c rows published).
4. llm_train_tokens_per_s_per_chip — full-size stage-5 fine-tune step
   (0.5B bf16 compute / fp32 adam, 2048-token batch, accum 2) timed on the
   chip, + flow step ms and achieved MFU (docs/train_perf.md roofline).
   The reference publishes no train throughput; vs_baseline = MFU / 30%.
5. cosyvoice3_synthesis_rtf_per_chip — single-utterance chained synthesis
   (llm -> flow -> hift device-resident). Baseline: reference offline c=1
   RTF 0.0891 (README.md:107-109); driver target RTF < 0.1/chip.
   Includes init_s / compile_s plus persistent-compilation-cache
   hit/miss counts so cold-start cost is driver-visible and auditable
   (utils/compile_cache.py).

Every metric line is re-emitted in one compact block immediately before the
headline (which prints absolutely last), so a tail-truncated driver artifact
still contains all of them.

Benches the real pipeline object (infer/tts.py CosyVoice3TTS, bf16 compute,
weight-only int8 LLM kernels, fp32 f0 path) with full-size architecture and
random weights: LLM AR decode (single scan over a ring KV cache, 192-step
bucket) -> flow CFM 10-step scan with CFG-batched DiT (22x1024) -> causal
HiFT. The headline number times the device-chained pipeline (tokens/mel
stay on device; one final audio fetch), which is how the serving runtime
drives it; per-stage timings sync via np.asarray (block_until_ready returns
early on the axon backend).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


_EMITTED: list = []  # every metric line, re-emitted in one compact block at
# the end so a truncated artifact tail (the driver keeps ~2000 chars) always
# contains ALL metrics, not just whichever printed last


def emit(metric: str, value: float, unit: str, vs_baseline: float, **extra) -> None:
    line = json.dumps({"metric": metric, "value": value, "unit": unit,
                       "vs_baseline": vs_baseline, **extra})
    _EMITTED.append(line)
    print(line, flush=True)


def _write_wav(path, audio: np.ndarray, sr: int = 16000) -> None:
    import wave

    pcm = np.clip(audio * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def bench_data_prep(rng) -> None:
    """Stages 0-4 on a synthesized in-repo corpus, timed end-to-end."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from fangyan_tts_tpu.data.extract import extract_all, prepare_corpus
    from fangyan_tts_tpu.data.parquet import make_parquet_list
    from fangyan_tts_tpu.models.campplus import CAMPPlus
    from fangyan_tts_tpu.models.s3tokenizer import S3TokenizerV3
    from fangyan_tts_tpu.utils.init import fast_init

    n_utts, sr = 128, 16000
    # mixed 5-30 s utterances (short-weighted like real speech corpora; mean
    # ~13 s — the old corpus was uniform 5 s, understating per-utt audio)
    dur_cycle = (5, 6, 8, 10, 12, 15, 20, 30)
    # corpus lives on tmpfs when available: the shared host's buffered disk
    # writes throttle to ~67 MB/s, which is a host artifact, not pipeline
    # throughput (real v5e pods stage corpora on local NVMe / ramdisk)
    root = tempfile.mkdtemp(prefix="bench_dataprep_",
                            dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    raw = os.path.join(root, "raw")
    os.makedirs(raw)
    # corpus synthesis = the API/TPU generation phase, NOT stages 0-4: write
    # the wavs before the timer (run.sh stage 0 starts from existing audio)
    texts = {}
    mp3_utts = []
    ffmpeg = shutil.which("ffmpeg")
    total_audio_s = 0.0
    for i in range(n_utts):
        dur_s = dur_cycle[i % len(dur_cycle)]
        total_audio_s += dur_s
        t = np.arange(int(sr * dur_s)) / sr
        f0 = 80.0 + 10.0 * (i % 12)
        audio = 0.3 * np.sin(2 * np.pi * f0 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t))
        audio += 0.02 * rng.standard_normal(len(t))
        wav = os.path.join(raw, f"utt{i:04d}.wav")
        _write_wav(wav, audio.astype(np.float32), sr)
        # MP3 leg for 1 in 8 utts (run.sh stage-0 convert semantics,
        # prepare_training_data.py MP3->WAV); needs ffmpeg — absent from
        # this image, so it only exercises on ffmpeg-bearing hosts
        if ffmpeg and i % 8 == 0:
            import subprocess

            mp3 = wav[:-4] + ".mp3"
            subprocess.run([ffmpeg, "-loglevel", "error", "-y", "-i", wav, mp3], check=True)
            os.remove(wav)
            mp3_utts.append(f"utt{i:04d}")
        texts[f"utt{i:04d}"] = f"这是第{i}句合成测试文本。"
    if not ffmpeg:
        log("data prep: no ffmpeg in image -> MP3 leg skipped (wav-only corpus)")

    # models: random init, full-size architecture (same compute as converted
    # weights); bf16 params
    camp, s3 = CAMPPlus(), S3TokenizerV3()
    bf = lambda t_: jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16) if x.ndim >= 2 else jnp.asarray(x), t_)
    cp = bf(fast_init(camp, 10, jnp.zeros((1, 98, 80))))
    sp = bf(fast_init(s3, 11, jnp.zeros((1, 128, 100)), jnp.asarray([100])))

    @jax.jit
    def emb_fn(p, fbank):
        return camp.apply({"params": p}, fbank.astype(jnp.bfloat16)).astype(jnp.float32)

    @jax.jit
    def tok_fn(p, mel, mel_len):
        return s3.apply({"params": p}, mel.astype(jnp.bfloat16), mel_len)

    # ONE program per batch: features + both models fused (params as args,
    # never closed over). Per-batch device traffic drops from 6 RPCs (2
    # puts + 4 program calls) to 3 — on the tunneled backend the dispatch
    # round-trips were a measurable slice of the stage-1..3 wall.
    from fangyan_tts_tpu.data.extract import _embed_features, _token_features

    @jax.jit
    def fused_fn(cp_, sp_, pad, lens):
        feats, frame_len = _embed_features(pad, lens)
        mel, mel_len = _token_features(pad, lens)
        emb = camp.apply({"params": cp_}, feats.astype(jnp.bfloat16)).astype(jnp.float32)
        codes, clen = s3.apply({"params": sp_}, mel.astype(jnp.bfloat16), mel_len)
        return emb, codes, clen

    fused_apply = lambda pad_d, lens_d: fused_fn(cp, sp, pad_d, lens_d)  # noqa: E731
    if os.environ.get("FANGYAN_BENCH_NO_FUSED"):
        fused_apply = None  # A/B triage lever: fall back to the 4-call path

    def warm(data_dir):
        extract_all(data_dir, lambda f, fl: emb_fn(cp, f),
                    lambda m, ml: tok_fn(sp, m, ml), batch_size=64)

    def kaldi_prep(data_dir):
        """Stage 0: kaldi files + instruct + validation (run.sh:13-21,
        prepare_training_data.py --mode validate semantics). MP3 sources are
        decoded to WAV here — the reference's convert_audio_files step."""
        os.makedirs(data_dir, exist_ok=True)
        utts = sorted(texts)
        wav_paths = {u: os.path.join(raw, u + ".wav") for u in utts}
        for u in mp3_utts:
            import subprocess

            out = os.path.join(data_dir, u + ".wav")
            subprocess.run([ffmpeg, "-loglevel", "error", "-y", "-i",
                            os.path.join(raw, u + ".mp3"), out], check=True)
            wav_paths[u] = out
        with open(os.path.join(data_dir, "wav.scp"), "w") as fw, \
             open(os.path.join(data_dir, "text"), "w") as ft, \
             open(os.path.join(data_dir, "utt2spk"), "w") as fu, \
             open(os.path.join(data_dir, "instruct"), "w") as fi:
            for u in utts:
                spk = f"spk{int(u[3:]) // (len(texts) // 8)}"
                fw.write(f"{u} {wav_paths[u]}\n")
                ft.write(f"{u} {texts[u]}\n")
                fu.write(f"{u} {spk}\n")
                fi.write(f"{u} 请用普通话说。<|endofprompt|>\n")
        spk2utt = {}
        for u in utts:
            spk2utt.setdefault(f"spk{int(u[3:]) // (len(texts) // 8)}", []).append(u)
        with open(os.path.join(data_dir, "spk2utt"), "w") as f:
            for s, us in sorted(spk2utt.items()):
                f.write(f"{s} {' '.join(us)}\n")
        # validation: required files exist with matching line counts
        counts = {}
        for name in ("wav.scp", "text", "utt2spk", "instruct"):
            with open(os.path.join(data_dir, name)) as f:
                counts[name] = sum(1 for _ in f)
        assert len(set(counts.values())) == 1, f"kaldi line counts differ: {counts}"

    # stage 4 tokenizer: the REAL v1 tiktoken tokenizer when its rank file
    # is present (the reference ships it in-tree,
    # cosyvoice/tokenizer/assets/multilingual_zh_ja_yue_char_del.tiktoken);
    # byte stand-in otherwise so the stage still runs on asset-less hosts
    _v1_vocab = "/root/reference/CosyVoice/cosyvoice/tokenizer/assets/multilingual_zh_ja_yue_char_del.tiktoken"
    if os.path.exists(_v1_vocab):
        from fangyan_tts_tpu.tokenizer.tokenizer import get_tokenizer

        stage4_tok = get_tokenizer(vocab_path=_v1_vocab)
        tok_name = "v1-tiktoken"
    else:
        class _Tok:
            def encode(self, s, **kw):
                return list(s.encode("utf-8"))

        stage4_tok = _Tok()
        tok_name = "byte-standin"

    def train_ready_check(list_path) -> int:
        """Stage 4: the training pipeline must yield a collated LLM batch
        from the packed shards (data/dataset.py build_pipeline)."""
        from fangyan_tts_tpu.config import CosyVoiceConfig
        from fangyan_tts_tpu.data.dataset import build_pipeline

        cfg = CosyVoiceConfig()
        it = build_pipeline(str(list_path), stage4_tok, mel_fn=None, mode="llm",
                            llm_cfg=cfg.llm, shuffle_size=64, sort_size=32)
        batch = next(iter(it))
        assert "ids" in batch and batch["ids"].ndim == 2
        return int(batch["ids"].shape[0])

    # warm the whole pipeline on a throwaway dir: extraction programs plus
    # the stage-3/4 one-time costs (scipy/pandas/pyarrow imports, codec
    # init). Compile/import time is the persistent-cache story, measured
    # separately; steady-state throughput is what the >500 utt/s target
    # describes.
    wdir = os.path.join(root, "warm")
    kaldi_prep(wdir)
    wpq = os.path.join(root, "warm_parquet")
    prepare_corpus(wdir, wpq, lambda f, fl: emb_fn(cp, f),
                   lambda m, ml: tok_fn(sp, m, ml), batch_size=64,
                   num_utts_per_parquet=64, instruct=True, fused_apply=fused_apply)
    train_ready_check(os.path.join(wpq, "data.list"))
    assert warm and extract_all and make_parquet_list  # per-stage CLIs' fns stay importable

    # best-of-2 full passes (fresh dirs each): the target is steady-state
    # throughput; a one-shot 2.5 s measurement on the shared single-core
    # host picks up scheduler noise from the jax client threads
    best = None
    for rep in range(2):
        data_dir = os.path.join(root, f"data{rep}")
        pq_dir = os.path.join(root, f"parquet{rep}")
        t0 = time.time()
        kaldi_prep(data_dir)                                               # stage 0
        t1 = time.time()
        # stages 1+2+3 pipelined: ONE corpus pass; extraction feeds both
        # device programs while completed shards pack on a host IO thread
        # (extract.prepare_corpus; the per-stage CLIs remain for run.sh
        # parity). The tunnel upload is the binding resource.
        prepare_corpus(data_dir, pq_dir, lambda f, fl: emb_fn(cp, f),
                       lambda m, ml: tok_fn(sp, m, ml), batch_size=64,
                       num_utts_per_parquet=64, instruct=True, fused_apply=fused_apply)
        t4 = time.time()
        bs = train_ready_check(os.path.join(pq_dir, "data.list"))          # stage 4
        t5 = time.time()
        if best is None or t5 - t0 < best[0]:
            best = (t5 - t0, t1 - t0, t4 - t1, t5 - t4, bs)
    total, s0, s123, s4, bs = best
    ups = n_utts / total
    log(
        f"data prep stages 0-4: {n_utts} utts (mixed {dur_cycle[0]}-{dur_cycle[-1]}s, "
        f"{total_audio_s / n_utts:.1f}s mean, {len(mp3_utts)} mp3, {tok_name}) in {total:.2f}s -> "
        f"{ups:.0f} utt/s/chip = {total_audio_s / total:.0f} s-audio/s (stage0 {s0:.2f} "
        f"extract+pack(1-3 pipelined) {s123:.2f} train-ready {s4:.2f}, llm batch bs={bs})"
    )
    emit("data_prep_stages0_4_utt_per_s_per_chip", round(ups, 1), "utt/s", round(ups / 62.5, 3),
         mean_utt_s=round(total_audio_s / n_utts, 1), audio_s_per_s=round(total_audio_s / total, 0),
         tokenizer=tok_name, n_mp3=len(mp3_utts))
    shutil.rmtree(root, ignore_errors=True)


def bench_train(rng) -> None:
    """Full-size stage-5 fine-tune step timing on the real chip.

    One LLM (CosyVoice3-0.5B, bf16 compute / fp32 params+adam, ~2048-token
    dynamic batch, accum 2 — the reference recipe's max_frames_in_batch~2000
    with accum_grad 2, examples/dialect/cosyvoice3/conf + utils/executor.py:
    37-86) and one flow (DiT-1024x22) step. The reference publishes no train
    throughput, so vs_baseline is achieved-MFU / 30% (the round target);
    docs/train_perf.md has the roofline. Runs BEFORE serving init and frees
    its buffers so the ~10 GB train state never coexists with the serving
    models."""
    import jax
    import jax.numpy as jnp

    from fangyan_tts_tpu.config import CosyVoiceConfig
    from fangyan_tts_tpu.models.flow import CausalMaskedDiffWithDiT
    from fangyan_tts_tpu.models.llm import CosyVoice3LM
    from fangyan_tts_tpu.train import trainer
    from fangyan_tts_tpu.train.scheduler import build_optimizer
    from fangyan_tts_tpu.utils.init import fast_init

    import dataclasses

    cfg = CosyVoiceConfig()
    # remat='full' recomputes the block body in bwd instead of saving
    # activations — measured FASTER even at the recipe batch (111 vs 117 ms:
    # the saves were HBM-bound) and it unlocks 8x larger batches on 16G HBM
    # (docs/train_perf.md sweep; grads bit-verified vs no-remat in
    # tests/test_train.py::test_remat_grads_match_no_remat).
    lcfg = dataclasses.replace(cfg.llm, qwen=dataclasses.replace(cfg.llm.qwen, remat="full"))
    model = CosyVoice3LM(lcfg, dtype=jnp.bfloat16)

    def mk_batch(b, t):
        return {
            "src": jnp.asarray(rng.integers(0, 2, (b, t)).astype(np.int32)),
            "ids": jnp.asarray(rng.integers(0, cfg.llm.speech_token_size, (b, t)).astype(np.int32)),
            "lengths": jnp.full((b,), t, jnp.int32),
            "targets": jnp.asarray(rng.integers(0, cfg.llm.speech_token_size, (b, t)).astype(np.int32)),
        }

    def _free(*trees):
        for tr in trees:
            jax.tree.map(lambda x: x.delete() if hasattr(x, "delete") else None, tr)

    b, t = 8, 256  # 2048 tokens/batch: the reference recipe's
    # max_frames_in_batch~2000 (examples/dialect/cosyvoice3/conf)
    batch = mk_batch(b, t)
    params = fast_init(model, 0, batch["src"], batch["ids"], batch["lengths"], batch["targets"])
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    peak_flops = 197e12  # v5e bf16

    def time_step(b, t, n_calls=4, accum=2):
        # accum microbatches are scanned INSIDE the step (one adam apply
        # per step; trainer.py) — step time covers accum*b*t tokens.
        # MultiSteps' step-per-microbatch path measured 111 ms for the same
        # 2048-token microbatch: 62 ms of it was the every-call optimizer
        # select (docs/train_perf.md).
        tx = build_optimizer(optim="adam", lr=1e-5, scheduler="constantlr", grad_clip=5.0)
        state = trainer.init_state(params, tx)
        step = trainer.make_llm_train_step(model, tx, accum=accum)
        bt = jax.tree.map(lambda *xs: jnp.stack(xs), *[mk_batch(b, t) for _ in range(accum)])
        try:
            t0 = time.time()
            state, metrics = step(state, bt, jax.random.PRNGKey(1))
            loss0 = float(np.asarray(metrics["loss"]))
            compile_s = time.time() - t0
            t0 = time.time()
            for i in range(n_calls):
                state, metrics = step(state, bt, jax.random.PRNGKey(2 + i))
            loss1 = float(np.asarray(metrics["loss"]))
            dt = time.time() - t0
            assert np.isfinite(loss0) and np.isfinite(loss1)
            step_ms = dt / n_calls * 1000.0
            tok_s = accum * b * t * n_calls / dt
            mfu = 6.0 * n_params * tok_s / peak_flops
            log(
                f"llm train step (0.5B, accum {accum} x bs{b}x{t} in-scan, remat): {step_ms:.0f} ms/step -> "
                f"{tok_s:.0f} tok/s/chip, MFU {mfu:.1%} (compile {compile_s:.1f}s, "
                f"loss {loss0:.3f}->{loss1:.3f}, {n_params / 1e6:.0f}M params)"
            )
            return step_ms, tok_s, mfu
        finally:
            _free(state, bt)

    step_ms, tok_s, mfu = time_step(b, t)  # reference-recipe batch
    # max-throughput config: same model/optimizer, 16k-token batch (remat
    # makes it fit); the recipe point is optimizer/overhead-bound, this one
    # is MXU-bound (docs/train_perf.md roofline)
    max_step_ms, max_tok_s, max_mfu = time_step(64, 256, n_calls=3)
    _free(batch)
    del params

    # flow (DiT 1024x22 CFM) step at ~the same mel budget
    flow = CausalMaskedDiffWithDiT(cfg.flow)
    fb, lt = 4, 100  # 4 x 200 mel frames
    fbatch = {
        "token": jnp.asarray(rng.integers(0, cfg.flow.vocab_size, (fb, lt)).astype(np.int32)),
        "token_len": jnp.full((fb,), lt, jnp.int32),
        "feat": jnp.asarray(rng.standard_normal((fb, lt * 2, 80)).astype(np.float32)),
        "feat_len": jnp.full((fb,), lt * 2, jnp.int32),
        "embedding": jnp.asarray(rng.standard_normal((fb, 192)).astype(np.float32)),
    }
    fparams = fast_init(flow, 1, fbatch["token"], fbatch["token_len"], fbatch["feat"],
                        fbatch["feat_len"], fbatch["embedding"], jax.random.PRNGKey(2))
    ftx = build_optimizer(optim="adam", lr=1e-4, scheduler="constantlr", grad_clip=5.0)
    fstate = trainer.init_state(fparams, ftx)
    fstep = trainer.make_flow_train_step(flow, ftx)
    t0 = time.time()
    fstate, fm = fstep(fstate, fbatch, jax.random.PRNGKey(3))
    floss = float(np.asarray(fm["loss"]))
    fcompile_s = time.time() - t0
    t0 = time.time()
    for i in range(2):
        fstate, fm = fstep(fstate, fbatch, jax.random.PRNGKey(4 + i))
    np.asarray(fm["loss"])
    flow_step_ms = (time.time() - t0) / 2 * 1000.0
    assert np.isfinite(floss)
    log(f"flow train step (DiT, bs{fb}x{lt * 2} mel): {flow_step_ms:.0f} ms/step "
        f"(compile {fcompile_s:.1f}s)")
    _free(fstate, fbatch)
    del fstate, fparams

    # hifigan GAN alternating disc/gen step at full size (train/gan.py; the
    # reference's stage-5 GAN loop, cosyvoice/utils/executor.py:88-144).
    # Batch = 16 x 52-frame crops (the recipe's truncate_length 24960
    # samples ~= 1.04 s at hop 480).
    try:
        import optax

        from fangyan_tts_tpu.models.discriminators import MultipleDiscriminator
        from fangyan_tts_tpu.models.hift import CausalHiFT
        from fangyan_tts_tpu.train.gan import init_gan_state, make_hifigan_steps

        hift = CausalHiFT(cfg.hift)
        disc = MultipleDiscriminator()
        gb, gl = 16, 52
        gbatch = {
            "speech": jnp.asarray(rng.standard_normal((gb, gl * 480)).astype(np.float32) * 0.1),
            "speech_feat": jnp.asarray(rng.standard_normal((gb, gl, 80)).astype(np.float32) * 0.3),
            "pitch_feat": jnp.asarray(np.abs(rng.standard_normal((gb, gl)).astype(np.float32)) * 100),
        }
        gen_params = fast_init(hift, 2, gbatch["speech_feat"])
        disc_params = fast_init(disc, 3, gbatch["speech"][:1], gbatch["speech"][:1])
        gen_tx, disc_tx = optax.adam(2e-4), optax.adam(2e-4)
        gstate = init_gan_state(gen_params, disc_params, gen_tx, disc_tx)
        gen_step, disc_step = make_hifigan_steps(hift, disc, gen_tx, disc_tx)
        t0 = time.time()
        gstate, dm = disc_step(gstate, gbatch)
        np.asarray(dm["loss"])
        gstate, gm = gen_step(gstate, gbatch)
        np.asarray(gm["loss"])
        gan_compile_s = time.time() - t0
        disc_ms = gen_ms = 1e9
        for _ in range(3):  # alternating pairs, best-of (executor.py order)
            t0 = time.time()
            gstate, dm = disc_step(gstate, gbatch)
            np.asarray(dm["loss"])
            disc_ms = min(disc_ms, (time.time() - t0) * 1e3)
            t0 = time.time()
            gstate, gm = gen_step(gstate, gbatch)
            np.asarray(gm["loss"])
            gen_ms = min(gen_ms, (time.time() - t0) * 1e3)
        assert np.isfinite(float(np.asarray(gm["loss"])))
        gan_ms = disc_ms + gen_ms
        crops_s = gb / (gan_ms / 1e3)
        log(f"hifigan GAN step (full-size gen+MPD/MRD disc, bs{gb}x{gl * 480} samples): "
            f"{gan_ms:.0f} ms/pair (disc {disc_ms:.0f} + gen {gen_ms:.0f}) -> "
            f"{crops_s:.0f} crops/s/chip (compile {gan_compile_s:.1f}s)")
        emit("hifigan_gan_step_ms", round(gan_ms, 1), "ms", 1.0,
             disc_ms=round(disc_ms, 1), gen_ms=round(gen_ms, 1),
             crops_per_s=round(crops_s, 1), batch=f"{gb}x{gl * 480}")
        _free(gstate, gbatch)
        del gstate, gen_params, disc_params
    except Exception as e:  # noqa: BLE001
        log(f"gan step bench skipped: {e!r}")

    emit("llm_train_tokens_per_s_per_chip", round(tok_s, 0), "tok/s",
         round(mfu / 0.30, 3), step_ms=round(step_ms, 1), mfu=round(mfu, 3),
         flow_step_ms=round(flow_step_ms, 1))
    emit("llm_train_max_tokens_per_s_per_chip", round(max_tok_s, 0), "tok/s",
         round(max_mfu / 0.30, 3), step_ms=round(max_step_ms, 1),
         mfu=round(max_mfu, 3), batch_tokens=2 * 64 * 256)


def bench_first_chunk(tts, rng) -> None:
    """Solo streaming first-chunk latency, c=1: time from tts(stream=True)
    to the first audio chunk (LLM decodes the first hop+lookahead tokens,
    KV-cached flow prefill, vocoder first window). Baseline: reference
    Triton streaming c=1 avg first-chunk 220.43 ms
    (runtime/triton_trtllm/README.md:95-97)."""
    text = rng.integers(0, 50000, (10,)).astype(np.int32)
    emb = rng.standard_normal(192).astype(np.float32)

    def first_chunk_ms():
        t0 = time.time()
        g = tts.tts(text=text, flow_embedding=emb, stream=True,
                    min_token_text_ratio=20.0, max_token_text_ratio=20.0)
        next(g)
        dt = (time.time() - t0) * 1000.0
        for _ in g:  # drain so scheduler slots/sessions release cleanly
            pass
        return dt

    first_chunk_ms()  # warm the solo streaming program set
    first_chunk_ms()
    ms = min(first_chunk_ms() for _ in range(3))
    log(f"streaming first chunk c=1: {ms:.0f} ms (reference 220.43 ms)")
    emit("streaming_first_chunk_ms", round(ms, 1), "ms", round(220.43 / ms, 3))


def bench_solo_streaming(tts, rng) -> None:
    """Solo (c=1) streaming end-to-end RTF: tts(stream=True) over a 320-token
    (12.8 s) utterance — LLM chunked decode pipelined one chunk ahead of
    KV-cached flow + windowed vocoder hops (_TokenPrefetcher overlap).
    Baseline: reference streaming c=1 RTF 0.1237
    (runtime/triton_trtllm/README.md:95-97)."""
    text = rng.integers(0, 50000, (16,)).astype(np.int32)
    emb = rng.standard_normal(192).astype(np.float32)

    def run_once():
        tts.stream_stats = {}  # per-hop budget: decode-wait/t2w/fetch/finalize
        t0 = time.time()
        n = 0
        for ch in tts.tts(text=text, flow_embedding=emb, stream=True,
                          min_token_text_ratio=20.0, max_token_text_ratio=20.0):
            n += len(ch["tts_speech"])
        st, tts.stream_stats = tts.stream_stats, None
        return time.time() - t0, n / tts.cfg.sample_rate, st

    run_once()  # warm the 320-token streaming ladder
    wall, audio, st = min((run_once() for _ in range(3)), key=lambda r: r[0])
    rtf = wall / audio
    # budget extras from the SAME run as the reported wall: where each hop
    # spends its time (driver-vs-local gap attribution, mean/max per stage)
    budget = {}
    for k in ("decode_wait_ms", "t2w_dispatch_ms", "fetch_ms", "finalize_ms"):
        v = st.get(k, [])
        if v:
            budget[k.replace("_ms", "_mean_ms")] = round(float(np.mean(v)), 2)
            budget[k.replace("_ms", "_max_ms")] = round(float(np.max(v)), 2)
    n_hops = len(st.get("t2w_dispatch_ms", []))
    log(f"solo streaming e2e: {wall:.2f}s wall for {audio:.1f}s audio -> RTF {rtf:.4f} "
        f"(reference c=1 0.1237; {n_hops} hops, budget {budget})")
    emit("streaming_solo_rtf", round(rtf, 4), "rtf", round(0.1237 / rtf, 3),
         n_hops=n_hops, **budget)


def bench_async_streaming(tts, rng, n_clients: int = 4) -> None:
    """N asynchronous client threads -> LLMScheduler continuous batching
    (shared decode chunks) + StreamScheduler dynamic batching (shared
    token2wav hops). Deterministic 200 tokens each via min=max ratio —
    the reference's async-client Triton c=4 configuration with TRT-LLM
    inflight batching (README.md:95-124). Besides aggregate RTF, records
    per-chunk arrival gaps per client: p99 gap and underrun count (gap
    longer than one hop of audio = playback starvation), the streaming-UX
    axis the reference's latency tables track (README.md:95-101)."""
    import threading

    from fangyan_tts_tpu.infer.batch_stream import StreamScheduler
    from fangyan_tts_tpu.infer.llm_batch import LLMScheduler

    text_len, ratio = 10, 20.0  # 200 tokens = 8 s audio each
    sched = StreamScheduler(tts, width=n_clients)
    lsched = LLMScheduler(tts, width=n_clients)
    texts = [rng.integers(0, 50000, (text_len,)).astype(np.int32) for _ in range(n_clients)]
    embs = [rng.standard_normal(192).astype(np.float32) for _ in range(n_clients)]
    audio_out = [0] * n_clients
    arrivals: list = [[] for _ in range(n_clients)]  # per client: chunk times
    errs: list = []

    def client(i):
        try:
            # llm open first: the N opens land inside one prefill arrival
            # window, so the sessions share a batched prefill and stay
            # chunk-aligned (t2w open serializes on slot reset — after)
            lh = lsched.open(texts[i], min_token_text_ratio=ratio, max_token_text_ratio=ratio)
            h = sched.open(np.zeros(0, np.int32), np.zeros((0, 80), np.float32), embs[i])
            chunks = []
            for arr in lsched.stream(lh):
                for c in sched.feed(h, arr):
                    chunks.append(c)
                    arrivals[i].append(time.time())
            chunks.append(sched.close(h))
            arrivals[i].append(time.time())
            audio_out[i] = sum(len(c) for c in chunks)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def run_once():
        for a in arrivals:
            a.clear()
        ts = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
        t0 = time.time()
        [t.start() for t in ts]
        [t.join() for t in ts]
        return time.time() - t0

    def _transient(e) -> bool:
        # the tunneled backend occasionally drops a remote_compile response
        # mid-read; the program is pure, so a retry is safe and usually hits
        # the persistent compilation cache
        s = repr(e)
        return "remote_compile" in s or "INTERNAL" in s or "UNAVAILABLE" in s

    def _underruns_of(arr) -> int:
        hop_s_ = tts.cfg.chunk_size / tts.cfg.token_frame_rate
        return sum(b - a > hop_s_ for ts_ in arr for a, b in zip(ts_, ts_[1:]))

    # Warm until a pass with ZERO underruns: which programs a pass touches
    # depends on thread interleaving (young buckets, cohort splits), so a
    # "clean" warm pass can still leave programs for the measured run to
    # compile mid-hop (observed: c=12 first-ever pass p99 10.9 s). An
    # underrun during warm means a compile happened — keep warming.
    warmed = 0
    for attempt in range(6):
        run_once()
        if not errs:
            u = _underruns_of(arrivals)
            if u == 0:
                warmed += 1
                if warmed >= 2:  # 2 underrun-free passes: program set settled
                    break
            else:
                log(f"async c{n_clients} warm attempt {attempt + 1}: {u} underruns "
                    f"(programs still compiling), continuing to warm")
            continue
        if not all(_transient(e) for e in errs):
            break
        log(f"async c{n_clients} warm attempt {attempt + 1} hit transient error, retrying: {errs[0]!r}")
        errs.clear()
        time.sleep(2.0)
    if errs:
        log(f"async c{n_clients} skipped: {errs[0]!r}")
        return None
    # best-of-2 on wall (thread-scheduling noise); gaps come from the SAME
    # run that produced the reported wall time
    wall, best_arr = None, None
    for _ in range(2):
        w = run_once()
        if errs:
            log(f"async c{n_clients} skipped: {errs[0]!r}")
            return None
        if wall is None or w < wall:
            wall, best_arr = w, [list(a) for a in arrivals]
    # playback UX: inter-chunk arrival gaps; a gap longer than one hop of
    # audio (chunk_size tokens / token_frame_rate) means a real-time player
    # that started at the first chunk would starve
    hop_s = tts.cfg.chunk_size / tts.cfg.token_frame_rate
    gaps = [b - a for ts_ in best_arr for a, b in zip(ts_, ts_[1:])]
    gaps_ms = sorted(g * 1000.0 for g in gaps)
    p99_ms = gaps_ms[min(len(gaps_ms) - 1, int(0.99 * len(gaps_ms)))] if gaps_ms else 0.0
    max_ms = gaps_ms[-1] if gaps_ms else 0.0
    underruns = sum(g > hop_s for g in gaps)
    audio_s = sum(audio_out) / tts.cfg.sample_rate
    rtf = wall / audio_s
    s = sched.stats
    ls = lsched.stats
    log(
        f"async streaming c={n_clients}: {wall:.2f}s wall for {audio_s:.1f}s audio -> aggregate RTF "
        f"{rtf:.4f} (token2wav batching {s['rows']}/{s['steps']} = {s['rows'] / max(s['steps'], 1):.2f}, "
        f"llm batching {ls['rows']}/{ls['steps']} = {ls['rows'] / max(ls['steps'], 1):.2f}; "
        f"{len(gaps)} gaps p99 {p99_ms:.0f} ms max {max_ms:.0f} ms, "
        f"underruns(>{hop_s:.1f}s) {underruns})"
    )
    # reference anchor is its c=4 streaming table (0.0733); it publishes no
    # c>4 rows — higher-c lines reuse the c=4 anchor for scale
    emit(f"streaming_async_c{n_clients}_rtf", round(rtf, 4), "rtf", round(0.0733 / rtf, 3),
         p99_gap_ms=round(p99_ms, 1), max_gap_ms=round(max_ms, 1), underruns=underruns)
    return {"c": n_clients, "rtf": round(rtf, 4), "p99_gap_ms": round(p99_ms, 1),
            "max_gap_ms": round(max_ms, 1), "underruns": underruns}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fangyan_tts_tpu.config import CosyVoiceConfig
    from fangyan_tts_tpu.data.lm_plan import build_prompt_plan, pad_plans_left
    from fangyan_tts_tpu.infer.tts import CosyVoice3TTS
    from fangyan_tts_tpu.models.llm import generate_speech_tokens
    from fangyan_tts_tpu.utils.compile_cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    n_entries = sum(len(files) for _, _, files in os.walk(cache_dir)) if cache_dir else 0
    log(f"compilation cache: {cache_dir} ({n_entries} entries)")

    cfg = CosyVoiceConfig()
    rng = np.random.default_rng(0)
    log(f"device: {jax.devices()[0]}")

    # ---- full-size train-step timing (before serving init: the ~10 GB
    # fp32 train state must not coexist with the serving models)
    try:
        bench_train(rng)
    except Exception as e:  # noqa: BLE001
        log(f"train bench skipped: {e!r}")

    t0 = time.time()
    tts = CosyVoice3TTS.random_init(cfg, dtype=jnp.bfloat16)
    tts.quantize_llm()  # weight-only int8 serving mode (ops/quant.py)
    init_s = time.time() - t0
    log(f"init (fast_init all 3 models, int8 llm): {init_s:.1f}s")

    # ---- workload: one utterance, 150 speech tokens = 6s of audio @25Hz
    n_tokens = 150
    text_len = 30
    audio_seconds = n_tokens / cfg.token_frame_rate
    text = rng.integers(0, 50000, (text_len,)).astype(np.int32)

    # ---- stage 1: LLM AR decode (fixed-length workload: min=max=150)
    plan = build_prompt_plan(cfg.llm, text.tolist(), [])
    batch = pad_plans_left([plan], length=32)
    args = (
        jnp.asarray(batch["src"]), jnp.asarray(batch["ids"]), jnp.asarray(batch["lengths"]),
        jnp.asarray([n_tokens], jnp.int32), jnp.asarray([n_tokens], jnp.int32),
    )

    def run_llm(k):
        return generate_speech_tokens(tts.llm, tts.llm_params, *args, key=k, max_new_tokens=192, cache_len=256)

    t0 = time.time()
    r = run_llm(jax.random.PRNGKey(0))
    np.asarray(r.tokens)
    llm_compile_s = time.time() - t0
    log(f"llm compile+first: {llm_compile_s:.1f}s")
    llm_s = 1e9  # best-of-3: single-sample step timing jitters ~5% on axon
    for _ in range(3):
        t0 = time.time()
        r = run_llm(jax.random.PRNGKey(1))
        np.asarray(r.tokens)
        llm_s = min(llm_s, time.time() - t0)
    log(f"llm decode: {llm_s:.3f}s ({n_tokens / llm_s:.0f} tok/s; early-exit "
        f"while_loop runs exactly {n_tokens} steps of the 192 bucket)")
    emit("llm_decode_tok_per_s_int8", round(n_tokens / llm_s, 0), "tok/s",
         round((n_tokens / llm_s) / 761.0, 3), steps_per_s=round(n_tokens / llm_s, 0))

    tokens = np.asarray(r.tokens)[0, :n_tokens]
    prompt_tokens = np.zeros(0, np.int32)
    prompt_feat = np.zeros((0, 80), np.float32)
    emb = rng.standard_normal(192).astype(np.float32)

    # ---- stage 2: flow (token2mel)
    t0 = time.time()
    mel = tts.token2mel(tokens, prompt_tokens, prompt_feat, emb)
    flow_compile_s = time.time() - t0
    log(f"flow compile+first: {flow_compile_s:.1f}s")
    t0 = time.time()
    mel = tts.token2mel(tokens, prompt_tokens, prompt_feat, emb)
    flow_s = time.time() - t0
    log(f"flow: {flow_s:.3f}s for mel {mel.shape}")

    # ---- stage 3: vocoder
    t0 = time.time()
    audio = tts.vocode(mel)
    hift_compile_s = time.time() - t0
    log(f"hift compile+first: {hift_compile_s:.1f}s")
    t0 = time.time()
    audio = tts.vocode(mel)
    hift_s = time.time() - t0
    log(f"hift: {hift_s:.3f}s for audio {audio.shape}")

    # ---- diagnostics: batched extraction throughput (stage 1+2 targets)
    try:
        from fangyan_tts_tpu.models.campplus import CAMPPlus
        from fangyan_tts_tpu.models.s3tokenizer import S3TokenizerV3
        from fangyan_tts_tpu.ops.mel import kaldi_fbank, whisper_logmel
        from fangyan_tts_tpu.utils.init import fast_init

        camp, s3 = CAMPPlus(), S3TokenizerV3()
        bf = lambda t: jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16) if x.ndim >= 2 else jnp.asarray(x), t)
        cp = bf(fast_init(camp, 10, jnp.zeros((1, 98, 80))))
        sp = bf(fast_init(s3, 11, jnp.zeros((1, 128, 100)), jnp.asarray([100])))
        wav10 = jnp.asarray(rng.standard_normal((32, 160000)).astype(np.float32) * 0.1)

        @jax.jit
        def emb_fn(p, a):
            f = kaldi_fbank(a)
            f = f - jnp.mean(f, axis=1, keepdims=True)
            return camp.apply({"params": p}, f.astype(jnp.bfloat16))

        @jax.jit
        def tok_fn(p, a):
            m = whisper_logmel(a)
            return s3.apply({"params": p}, m.astype(jnp.bfloat16), jnp.full((a.shape[0],), m.shape[2], jnp.int32))

        np.asarray(emb_fn(cp, wav10).astype(jnp.float32))
        t0 = time.time(); np.asarray(emb_fn(cp, wav10).astype(jnp.float32)); d1 = time.time() - t0
        np.asarray(tok_fn(sp, wav10)[0])
        t0 = time.time(); np.asarray(tok_fn(sp, wav10)[0]); d2 = time.time() - t0
        log(f"extraction: campplus {32/d1:.0f} utt/s, s3 {32/d2:.0f} utt/s, stage1+2 {32/(d1+d2):.0f} utt/s/chip (10s utts)")
    except Exception as e:  # noqa: BLE001
        log(f"extraction diag skipped: {e}")

    # ---- data prep stages 0-4 end-to-end (driver target #1)
    try:
        bench_data_prep(rng)
    except Exception as e:  # noqa: BLE001
        log(f"data prep bench skipped: {e!r}")

    # ---- diagnostics: batched offline throughput (reference best: TRT-LLM
    # bs16 + DiT token2wav, offline RTF 0.0292 on L20, README.DIT.md)
    try:
        texts16 = [rng.integers(0, 50000, (30,)).astype(np.int32) for _ in range(16)]
        tts.batch_synthesize(texts16, emb, min_token_text_ratio=5.0, max_token_text_ratio=5.0)
        t0 = time.time()
        outs16 = tts.batch_synthesize(texts16, emb, min_token_text_ratio=5.0, max_token_text_ratio=5.0)
        dt16 = time.time() - t0
        a16 = sum(len(o) for o in outs16) / cfg.sample_rate
        log(f"batched offline bs16: {dt16:.2f}s for {a16:.1f}s audio -> RTF {dt16 / a16:.4f}")
    except Exception as e:  # noqa: BLE001
        log(f"bs16 diag skipped: {e}")

    # ---- solo streaming first-chunk latency (reference c=1: 220.43 ms)
    try:
        bench_first_chunk(tts, rng)
    except Exception as e:  # noqa: BLE001
        log(f"first chunk bench skipped: {e!r}")

    # ---- solo streaming end-to-end RTF (reference c=1: 0.1243)
    try:
        bench_solo_streaming(tts, rng)
    except Exception as e:  # noqa: BLE001
        log(f"solo streaming bench skipped: {e!r}")

    # ---- chained end-to-end (the HEADLINE measurement): llm -> flow ->
    # hift all device-resident, one final audio fetch (how a serving
    # process runs it; per-stage timings above each pay an extra host-sync
    # roundtrip). Measured BEFORE the high-concurrency load points: the
    # c=12/16 stress runs fragment HBM / leave wide scheduler state and
    # were observed to inflate a downstream headline 4x. The metric line
    # still prints absolutely last.
    def run_e2e(k):
        r = generate_speech_tokens(
            tts.llm, tts.llm_params, *args, key=k, max_new_tokens=192, cache_len=256
        )
        mel_d = tts.token2mel(r.tokens[0, :n_tokens], prompt_tokens, prompt_feat, emb, device_out=True)
        return tts.vocode(mel_d)

    run_e2e(jax.random.PRNGKey(2))  # warm the chained program set
    e2e_best = 1e9
    for i in range(3):  # best-of-3: single-utterance timing jitters on axon
        t0 = time.time()
        audio = run_e2e(jax.random.PRNGKey(3 + i))
        e2e_best = min(e2e_best, time.time() - t0)
    rtf = e2e_best / audio_seconds
    baseline_rtf = 0.0891
    compile_s = llm_compile_s + flow_compile_s + hift_compile_s
    log(
        f"total={e2e_best:.3f}s (chained) audio={audio_seconds:.1f}s rtf={rtf:.4f} "
        f"(stage-timed: llm {llm_s:.2f} flow {flow_s:.2f} hift {hift_s:.2f}; "
        f"init {init_s:.1f}s compile {compile_s:.1f}s)"
    )

    # ---- async concurrent streaming curve: c=4 (reference Triton row RTF
    # 0.0733), then c=8/12/16 load points — the serving-capacity ceiling a
    # deployment needs (max underrun-free concurrency per chip; the
    # reference's concurrency tables stop at c=4,
    # runtime/triton_trtllm/README.md:95-124)
    curve = []
    for c in (4, 8, 12, 16):
        try:
            res = bench_async_streaming(tts, rng, n_clients=c)
        except Exception as e:  # noqa: BLE001
            log(f"async c{c} bench skipped: {e!r}")
            res = None
        if res is None:
            break  # a failed load point caps the measured ceiling
        curve.append(res)
        if res["underruns"] > 0:
            break  # past the underrun-free ceiling: higher c only burns time
    if curve:
        free = [r["c"] for r in curve if r["underruns"] == 0]
        max_c = max(free) if free else 0
        log("async concurrency curve: " + "; ".join(
            f"c={r['c']} rtf={r['rtf']} p99={r['p99_gap_ms']}ms u={r['underruns']}" for r in curve))
        emit("streaming_max_underrun_free_c", max_c, "clients", round(max_c / 4.0, 2),
             curve=[[r["c"], r["rtf"], r["p99_gap_ms"], r["underruns"]] for r in curve])

    # ---- final block: re-emit EVERY metric line back-to-back, headline
    # LAST, so a tail-truncated artifact always carries all of them
    from fangyan_tts_tpu.utils.compile_cache import cache_stats

    for line in list(_EMITTED):
        print(line, flush=True)
    emit(
        "cosyvoice3_synthesis_rtf_per_chip", round(rtf, 4), "rtf", round(baseline_rtf / rtf, 3),
        init_s=round(init_s, 1), compile_s=round(compile_s, 1),
        llm_compile_s=round(llm_compile_s, 1), **cache_stats(),
    )


if __name__ == "__main__":
    main()
