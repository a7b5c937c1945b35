"""Batched TPU feature extraction: speaker embeddings (stage 1) and speech
tokens (stage 2).

Replaces tools/extract_embedding.py and tools/extract_speech_token.py, whose
throughput is limited by one-utterance-at-a-time ONNX sessions behind a GPU
semaphore (extract_embedding.py:97, extract_speech_token.py:80-94). Here
utterances are bucketed by length, padded, and swept through one jitted
program per bucket — hundreds of utterances per device call.

Outputs keep the reference's artifact formats: utt2embedding.pt /
spk2embedding.pt / utt2speech_token.pt (torch.save dicts), so downstream
parquet packing and training recipes are drop-in compatible.
"""

from __future__ import annotations

import time
from collections import defaultdict
from pathlib import Path
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import kaldi_fbank, whisper_logmel
from .audio import load_audio
from .kaldi_io import read_scp

_BUCKETS_SEC = (1, 2, 3, 4, 5, 6, 8, 10, 15, 20, 30)


def _bucket_len(n: int, sr: int) -> int:
    for b in _BUCKETS_SEC:
        if n <= b * sr:
            return b * sr
    return _BUCKETS_SEC[-1] * sr


def _batched_buckets(utts: list[tuple[str, np.ndarray]], sr: int, batch_size: int):
    """Group (utt, audio) by padded bucket length, yield padded batches."""
    buckets: dict[int, list[tuple[str, np.ndarray]]] = defaultdict(list)
    for utt, audio in utts:
        audio = audio[: _BUCKETS_SEC[-1] * sr]  # 30 s guard (extract_speech_token.py:36)
        buckets[_bucket_len(len(audio), sr)].append((utt, audio))
    for blen, items in sorted(buckets.items()):
        for i in range(0, len(items), batch_size):
            chunk = items[i : i + batch_size]
            # int16 on the wire: wavs are 16-bit on disk, so the round trip
            # is lossless and HALVES the host->device bytes (the tunneled
            # single-chip setup moves ~37 MB/s — upload dominates the warm
            # extraction loop). The fused programs convert on device.
            pad = np.zeros((len(chunk), blen), np.int16)
            lens = np.zeros((len(chunk),), np.int32)
            names = []
            for j, (utt, audio) in enumerate(chunk):
                pad[j, : len(audio)] = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
                lens[j] = len(audio)
                names.append(utt)
            yield names, pad, lens


def load_utts(wav_scp: dict[str, str], target_sr: int = 16000, progress: bool = True) -> list[tuple[str, np.ndarray]]:
    """Corpus loader. WAV files go through the native multithreaded C++
    loader (csrc/audio_io.cpp, 8 decode threads) in bounded-memory chunks;
    anything else (or a file the native parser rejects) falls back to the
    python/ffmpeg path."""
    from . import native

    items = list(wav_scp.items())
    out: list[tuple[str, np.ndarray]] = []
    t0 = time.time()

    def _fallback(utt: str, path: str) -> None:
        try:
            audio, _ = load_audio(path, target_sr=target_sr)
            out.append((utt, audio))
        except Exception as e:  # noqa: BLE001
            print(f"  ⚠️ failed to load {utt}: {e}")

    wavs = [(u, p) for u, p in items if p.lower().endswith(".wav")]
    rest = [(u, p) for u, p in items if not p.lower().endswith(".wav")]

    def _tick() -> None:
        if progress and len(out) and len(out) % 500 == 0:
            print(f"  loaded {len(out)}/{len(items)} ({len(out) / (time.time() - t0):.1f}/s)")

    if wavs and native.available():
        # NOTE: the native parser silently caps at max_samples; downstream
        # extraction truncates at 30 s anyway (_batched_buckets), but warn so
        # a capped file is never a mystery.
        max_samples = 31 * 48000  # 30 s guard + headroom at up to 48 kHz sources
        chunk_rows = 32  # bounds the staging buffer to ~190 MB
        for i in range(0, len(wavs), chunk_rows):
            chunk = wavs[i : i + chunk_rows]
            audio, lengths, rates = native.load_wav_batch([p for _, p in chunk], max_samples)
            for j, (utt, path) in enumerate(chunk):
                n, sr = int(lengths[j]), int(rates[j])
                if n <= 0:  # non-PCM/exotic wav: python/ffmpeg fallback
                    _fallback(utt, path)
                    continue
                if n == max_samples:
                    print(f"  ⚠️ {utt} capped at {max_samples / sr:.0f}s by the native loader")
                # copy: audio[j, :n] is a VIEW keeping the whole 190 MB
                # staging buffer alive for as long as the row is referenced
                a = audio[j, :n].copy()
                if sr != target_sr:
                    a = native.resample_native(a, sr, target_sr)
                out.append((utt, a))
                _tick()
    else:
        for utt, path in wavs:
            _fallback(utt, path)
            _tick()
    for utt, path in rest:
        _fallback(utt, path)
        _tick()
    return out


# Feature DSP as ONE jitted program per bucket shape; the model apply_fn is
# a second chained device call (features stay on device). Eager per-op
# dispatch over the axon tunnel costs ~ms per op — this was the pipeline
# bottleneck. The model must NOT be traced into the feature program: apply_fn
# closes over its params, and tracing a closure bakes the weights into the
# HLO as constants (hundreds of MB -> multi-minute remote compiles).


@jax.jit
def _embed_features(pad, lens):
    feats = kaldi_fbank(pad.astype(jnp.float32) / 32768.0)  # (B, F, 80); int16 wire format
    frame_len = jnp.maximum((lens - 400) // 160 + 1, 1)
    # masked mean-subtraction over valid frames (extract_embedding.py:33)
    mask = (jnp.arange(feats.shape[1])[None, :] < frame_len[:, None])[..., None]
    mean = jnp.sum(feats * mask, axis=1, keepdims=True) / jnp.maximum(frame_len, 1)[:, None, None]
    return (feats - mean) * mask, frame_len


@jax.jit
def _token_features(pad, lens):
    return whisper_logmel(pad.astype(jnp.float32) / 32768.0), lens // 160


def extract_embeddings(
    data_dir: str | Path,
    apply_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    batch_size: int = 64,
) -> dict[str, np.ndarray]:
    """Stage 1: wav.scp -> utt2embedding.pt + spk2embedding.pt.

    apply_fn(fbank (B,T,80), frame_len (B,)) -> (B, 192) — a jitted closure
    over CAMPPlus params (see infer/frontend.py:make_campplus_fn).
    """
    data_dir = Path(data_dir)
    wav_scp = read_scp(data_dir / "wav.scp")
    utt2spk = read_scp(data_dir / "utt2spk")
    utts = load_utts(wav_scp)

    utt2emb: dict[str, np.ndarray] = {}
    for names, pad, lens in _batched_buckets(utts, 16000, batch_size):
        feats, frame_len = _embed_features(jnp.asarray(pad), jnp.asarray(lens))
        embs = np.asarray(apply_fn(feats, frame_len))
        for utt, e in zip(names, embs):
            utt2emb[utt] = e.astype(np.float32)

    spk_lists: dict[str, list[np.ndarray]] = defaultdict(list)
    for utt, emb in utt2emb.items():
        spk_lists[utt2spk.get(utt, "unk")].append(emb)
    spk2emb = {spk: np.mean(np.stack(v), axis=0) for spk, v in spk_lists.items()}

    _torch_save({k: _to_torch(v) for k, v in utt2emb.items()}, data_dir / "utt2embedding.pt")
    _torch_save({k: _to_torch(v) for k, v in spk2emb.items()}, data_dir / "spk2embedding.pt")
    return utt2emb


def extract_speech_tokens(
    data_dir: str | Path,
    apply_fn: Callable[[jnp.ndarray, jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]],
    batch_size: int = 32,
) -> dict[str, np.ndarray]:
    """Stage 2: wav.scp -> utt2speech_token.pt.

    apply_fn(mel (B,128,T), mel_len (B,)) -> (codes (B,T'), code_len (B,)) —
    a jitted closure over S3TokenizerV3 params."""
    data_dir = Path(data_dir)
    wav_scp = read_scp(data_dir / "wav.scp")
    utts = load_utts(wav_scp)

    utt2tok: dict[str, np.ndarray] = {}
    for names, pad, lens in _batched_buckets(utts, 16000, batch_size):
        mel, mel_len = _token_features(jnp.asarray(pad), jnp.asarray(lens))
        codes, code_len = apply_fn(mel, mel_len)
        codes = np.asarray(codes)
        code_len = np.asarray(code_len)
        for i, utt in enumerate(names):
            utt2tok[utt] = codes[i, : code_len[i]].astype(np.int32)

    _torch_save({k: _to_torch(v) for k, v in utt2tok.items()}, data_dir / "utt2speech_token.pt")
    return utt2tok


def extract_all(
    data_dir: str | Path,
    emb_apply: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    tok_apply: Callable[[jnp.ndarray, jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]],
    batch_size: int = 64,
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Stages 1+2 in ONE pass: the corpus is loaded once and each padded
    batch is uploaded once, feeding both the campplus and S3 programs
    (the separate CLIs each re-load and re-upload the corpus — fine for
    flag-compat, wasteful for the fused pipeline). Writes the same
    utt2embedding.pt / spk2embedding.pt / utt2speech_token.pt artifacts."""
    data_dir = Path(data_dir)
    wav_scp = read_scp(data_dir / "wav.scp")
    utt2spk = read_scp(data_dir / "utt2spk")
    utts = load_utts(wav_scp)

    utt2emb: dict[str, np.ndarray] = {}
    utt2tok: dict[str, np.ndarray] = {}

    # Pipelined: enqueue upload + all four programs for up to MAX_INFLIGHT
    # batches before fetching results, so the host->device transfer of batch
    # i+1 overlaps batch i's compute and the per-batch fetch syncs (~26 ms
    # each on the tunneled single-chip setup) collapse into the drain. The
    # window bounds device memory to a few padded audio batches.
    MAX_INFLIGHT = 4
    inflight: list[tuple[list[str], object, object, object]] = []

    def _drain_one() -> None:
        names, embs_d, codes_d, clen_d = inflight.pop(0)
        embs = np.asarray(embs_d)
        codes, code_len = np.asarray(codes_d), np.asarray(clen_d)
        for i, utt in enumerate(names):
            utt2emb[utt] = embs[i].astype(np.float32)
            utt2tok[utt] = codes[i, : code_len[i]].astype(np.int32)

    for names, pad, lens in _batched_buckets(utts, 16000, batch_size):
        pad_d, lens_d = jax.device_put(pad), jax.device_put(lens)
        feats, frame_len = _embed_features(pad_d, lens_d)
        mel, mel_len = _token_features(pad_d, lens_d)
        embs_d = emb_apply(feats, frame_len)
        codes_d, clen_d = tok_apply(mel, mel_len)
        inflight.append((names, embs_d, codes_d, clen_d))
        if len(inflight) >= MAX_INFLIGHT:
            _drain_one()
    while inflight:
        _drain_one()

    spk_lists: dict[str, list[np.ndarray]] = defaultdict(list)
    for utt, emb in utt2emb.items():
        spk_lists[utt2spk.get(utt, "unk")].append(emb)
    spk2emb = {spk: np.mean(np.stack(v), axis=0) for spk, v in spk_lists.items()}

    _torch_save({k: _to_torch(v) for k, v in utt2emb.items()}, data_dir / "utt2embedding.pt")
    _torch_save({k: _to_torch(v) for k, v in spk2emb.items()}, data_dir / "spk2embedding.pt")
    _torch_save({k: _to_torch(v) for k, v in utt2tok.items()}, data_dir / "utt2speech_token.pt")
    return utt2emb, utt2tok


def _to_torch(arr: np.ndarray):
    try:
        import torch

        return torch.from_numpy(np.ascontiguousarray(arr))
    except ImportError:
        return arr


def _torch_save(obj, path) -> None:
    try:
        import torch

        torch.save(obj, str(path))
    except ImportError:
        np.save(str(path) + ".npy", obj, allow_pickle=True)


def prepare_corpus(
    data_dir: str | Path,
    des_dir: str | Path,
    emb_apply: Callable,
    tok_apply: Callable,
    batch_size: int = 64,
    num_utts_per_parquet: int = 1000,
    instruct: bool = False,
    fused_apply: Callable | None = None,
) -> list[str]:
    """Stages 1+2+3 as ONE pipelined pass.

    On the tunneled single-chip setup the corpus upload (~37 MB/s H2D) is
    the binding resource of data prep; everything else must ride under it.
    This fuses extract_all's pipelined device loop with stage-3 shard
    packing: a parquet shard is packed as soon as every utterance it
    contains is extracted AND every speaker appearing in it has its mean
    embedding complete (kaldi convention orders utterances speaker-major,
    so early shards complete while later buckets are still uploading).
    Packing runs COOPERATIVELY on the main thread between batch drains —
    device dispatch is asynchronous, so up to MAX_INFLIGHT uploaded batches
    keep the chip busy while pyarrow writes (pyarrow from a side thread
    inside a jax process segfaulted in libarrow — measured, not
    hypothetical). Artifacts are byte-compatible with running extract_all
    then parquet.make_parquet_list sequentially: the same .pt maps, shards,
    json sidecars and data.list files (reference pipeline:
    examples/dialect/cosyvoice3/run.sh:23-88).
    """
    import os

    from .parquet import make_lists, pack_shard

    data_dir, des = Path(data_dir), Path(des_dir)
    des.mkdir(parents=True, exist_ok=True)
    wav_scp = read_scp(data_dir / "wav.scp")
    utt2spk = read_scp(data_dir / "utt2spk")
    maps: dict = {
        "utt2wav": dict(wav_scp),
        "utt2text": read_scp(data_dir / "text"),
        "utt2spk": dict(utt2spk),
        "utt2embedding": {},
        "spk2embedding": {},
        "utt2speech_token": {},
    }
    if instruct:
        maps["utt2instruct"] = read_scp(data_dir / "instruct")

    utt_order = list(wav_scp.keys())
    shards = [utt_order[j : j + num_utts_per_parquet]
              for j in range(0, len(utt_order), num_utts_per_parquet)]
    spk_pending: dict[str, int] = defaultdict(int)
    spk_sum: dict[str, np.ndarray] = {}
    spk_n: dict[str, int] = defaultdict(int)
    for u in utt_order:
        spk_pending[utt2spk.get(u, "unk")] += 1
    shard_utts_left = [set(s) for s in shards]
    shard_spks_left = [{utt2spk.get(u, "unk") for u in s} for s in shards]
    next_shard = 0
    files: list[tuple[str, str, str]] = []

    def _pack_ready() -> None:
        nonlocal next_shard
        while (next_shard < len(shards)
               and not shard_utts_left[next_shard]
               and not shard_spks_left[next_shard]):
            i = next_shard
            pf = os.path.join(des, f"parquet_{i:09d}.tar")
            uf = os.path.join(des, f"utt2parquet_{i:09d}.json")
            sf = os.path.join(des, f"spk2parquet_{i:09d}.json")
            files.append((pf, uf, sf))
            pack_shard(shards[i], maps, pf, uf, sf, instruct=instruct)
            next_shard += 1

    def _utt_done(utt: str, emb: np.ndarray, toks: np.ndarray) -> None:
        maps["utt2embedding"][utt] = emb
        maps["utt2speech_token"][utt] = toks
        spk = utt2spk.get(utt, "unk")
        spk_sum[spk] = emb + spk_sum.get(spk, 0.0)
        spk_n[spk] += 1
        spk_pending[spk] -= 1
        if spk_pending[spk] == 0:
            maps["spk2embedding"][spk] = (spk_sum[spk] / spk_n[spk]).astype(np.float32)
            for left in shard_spks_left:
                left.discard(spk)
        for left in shard_utts_left:
            if utt in left:
                left.discard(utt)
                break

    # NOTE an uploader-thread + header-planned lazy-decode variant was
    # built and A/B-measured 1.8x SLOWER than this eager inflight loop on
    # the tunneled backend (33.9 vs 62.4 utt/s, same session): dispatching
    # jax calls from a secondary thread loses to the async-dispatch overlap
    # the plain loop already gets. Keep the loop single-threaded.
    utts = load_utts(wav_scp)
    MAX_INFLIGHT = 4
    inflight: list[tuple[list[str], object, object, object]] = []

    def _drain_one() -> None:
        names, embs_d, codes_d, clen_d = inflight.pop(0)
        embs = np.asarray(embs_d)
        codes, code_len = np.asarray(codes_d), np.asarray(clen_d)
        for i, utt in enumerate(names):
            _utt_done(utt, embs[i].astype(np.float32), codes[i, : code_len[i]].astype(np.int32))

    for names, pad, lens in _batched_buckets(utts, 16000, batch_size):
        pad_d, lens_d = jax.device_put(pad), jax.device_put(lens)
        if fused_apply is not None:
            # ONE device call per batch (features + both models fused by
            # the caller): 6 RPCs/batch -> 3 on the tunneled backend
            embs_d, codes_d, clen_d = fused_apply(pad_d, lens_d)
        else:
            feats, frame_len = _embed_features(pad_d, lens_d)
            mel, mel_len = _token_features(pad_d, lens_d)
            embs_d = emb_apply(feats, frame_len)
            codes_d, clen_d = tok_apply(mel, mel_len)
        inflight.append((names, embs_d, codes_d, clen_d))
        if len(inflight) >= MAX_INFLIGHT:
            _drain_one()
            _pack_ready()  # shard IO rides between drains, device stays fed
    while inflight:
        _drain_one()
    _pack_ready()

    _torch_save({k: _to_torch(v) for k, v in maps["utt2embedding"].items()},
                data_dir / "utt2embedding.pt")
    _torch_save({k: _to_torch(v) for k, v in maps["spk2embedding"].items()},
                data_dir / "spk2embedding.pt")
    _torch_save({k: _to_torch(v) for k, v in maps["utt2speech_token"].items()},
                data_dir / "utt2speech_token.pt")
    return make_lists(des, files)
