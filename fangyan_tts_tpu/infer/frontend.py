"""Feature + prompt frontend: the CosyVoiceFrontEnd equivalent.

Behavioral reference: cosyvoice/cli/frontend.py:30-224. The two ONNX
sessions (campplus, speech_tokenizer_v3) become jitted JAX closures; the
24 kHz mel feat_extractor is ops.mel.matcha_mel; spk2info management
(add_zero_shot_spk / save_spkinfo) keeps the reference's dict layout so
saved speaker files interoperate.

All extractors bucket-pad inputs so repeated prompt lengths reuse one XLA
program per bucket.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CosyVoiceConfig
from ..data.audio import load_audio
from ..ops.mel import kaldi_fbank, matcha_mel, whisper_logmel
from .textnorm import text_normalize as _text_normalize

_PROMPT_BUCKETS_SEC = (3, 5, 10, 15, 30)


def _pad_bucket(audio: np.ndarray, sr: int) -> tuple[np.ndarray, int]:
    n = len(audio)
    for b in _PROMPT_BUCKETS_SEC:
        if n <= b * sr:
            out = np.zeros((b * sr,), np.float32)
            out[:n] = audio
            return out, n
    return audio[: _PROMPT_BUCKETS_SEC[-1] * sr], _PROMPT_BUCKETS_SEC[-1] * sr


class Frontend:
    def __init__(
        self,
        tokenizer,
        cfg: CosyVoiceConfig,
        campplus_fn: Callable | None = None,  # (fbank (1,T,80)) -> (1,192)
        s3_fn: Callable | None = None,  # (mel (1,128,T), len (1,)) -> (codes, code_len)
        spk2info: str | Path = "",
        allowed_special: str = "all",
    ):
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.campplus_fn = campplus_fn
        self.s3_fn = s3_fn
        self.allowed_special = allowed_special
        self.spk2info: dict[str, dict] = {}
        self._spk2info_path = str(spk2info)
        if spk2info and os.path.exists(spk2info):
            import torch

            raw = torch.load(spk2info, map_location="cpu", weights_only=False)
            self.spk2info = {k: {kk: np.asarray(vv) for kk, vv in v.items()} for k, v in raw.items()}

    # ---- primitives ---------------------------------------------------------

    def extract_text_token(self, text):
        """str -> token ids; a text GENERATOR (LLM-agent bistream input,
        frontend.py:79-93) maps to a generator of per-piece token arrays,
        which the model's bistream path consumes incrementally."""
        if hasattr(text, "__next__"):
            return (np.asarray(self.tokenizer.encode(piece, allowed_special=self.allowed_special), np.int32)
                    for piece in text)
        return np.asarray(self.tokenizer.encode(text, allowed_special=self.allowed_special), np.int32)

    def extract_speech_token(self, wav_16k: np.ndarray) -> np.ndarray:
        """25 Hz prompt speech tokens (frontend.py:95-106)."""
        assert len(wav_16k) / 16000 <= 30, "do not support extract speech token for audio longer than 30s"
        if self.s3_fn is None:
            raise RuntimeError("no S3 tokenizer loaded")
        padded, n = _pad_bucket(wav_16k, 16000)
        mel = whisper_logmel(jnp.asarray(padded)[None])
        codes, code_len = self.s3_fn(mel, jnp.asarray([n // 160], jnp.int32))
        return np.asarray(codes)[0, : int(code_len[0])].astype(np.int32)

    def extract_spk_embedding(self, wav_16k: np.ndarray) -> np.ndarray:
        """192-d x-vector (frontend.py:108-118)."""
        if self.campplus_fn is None:
            raise RuntimeError("no CAM++ model loaded")
        padded, n = _pad_bucket(wav_16k, 16000)
        feat = kaldi_fbank(jnp.asarray(padded)[None])
        frames = max((n - 400) // 160 + 1, 1)
        mask = (jnp.arange(feat.shape[1]) < frames)[None, :, None]
        mean = jnp.sum(feat * mask, axis=1, keepdims=True) / frames
        feat = (feat - mean) * mask
        return np.asarray(self.campplus_fn(feat))[0]

    def extract_speech_feat(self, wav: np.ndarray) -> np.ndarray:
        """(T, 80) mel at the model's sample rate (frontend.py:120-125);
        the mel parameters come from cfg.mel (24 kHz/480 for v2/v3,
        22.05 kHz/256 for v1)."""
        m = self.cfg.mel
        n = len(wav) // m.hop_size * m.hop_size
        mel = matcha_mel(
            jnp.asarray(wav[:n])[None], n_fft=m.n_fft, num_mels=m.num_mels,
            sampling_rate=m.sampling_rate, hop_size=m.hop_size, win_size=m.win_size,
            fmin=m.fmin, fmax=m.fmax,
        )
        return np.asarray(mel)[0].T  # (T, 80)

    def text_normalize(self, text, split: bool = True, text_frontend: bool = True):
        if hasattr(text, "__next__"):  # bistream generator input: pass through
            return [text] if split else text
        return _text_normalize(
            text,
            lambda t: self.tokenizer.encode(t, allowed_special=self.allowed_special),
            split=split,
            use_frontend=text_frontend,
        )

    # ---- per-mode prompt builders (frontend.py:160-224) ---------------------

    def _prompt_features(self, prompt_wav: str | np.ndarray) -> dict:
        sr = self.cfg.sample_rate
        if isinstance(prompt_wav, (str, Path)):
            wav16, _ = load_audio(prompt_wav, target_sr=16000)
            wav_sr, _ = load_audio(prompt_wav, target_sr=sr)
        else:
            from ..data.audio import resample_poly

            wav16 = prompt_wav
            wav_sr = resample_poly(prompt_wav, 16000, sr)
        feat = self.extract_speech_feat(wav_sr)
        tokens = self.extract_speech_token(wav16)
        if sr == 24000:
            # v2/v3 only: force feat/token 2:1 alignment (frontend.py:174-178)
            token_len = min(feat.shape[0] // 2, len(tokens))
            feat, tokens = feat[: 2 * token_len], tokens[:token_len]
        return {
            "speech_feat": feat,
            "speech_token": tokens,
            "embedding": self.extract_spk_embedding(wav16),
        }

    def frontend_zero_shot(self, tts_text, prompt_text, prompt_wav, zero_shot_spk_id="") -> dict:
        out: dict[str, Any] = {"text": self.extract_text_token(tts_text)}
        if zero_shot_spk_id == "":
            pf = self._prompt_features(prompt_wav)
            out.update(
                prompt_text=self.extract_text_token(prompt_text),
                llm_prompt_speech_token=pf["speech_token"],
                flow_prompt_speech_token=pf["speech_token"],
                prompt_speech_feat=pf["speech_feat"],
                llm_embedding=pf["embedding"],
                flow_embedding=pf["embedding"],
            )
        else:
            out.update(self.spk2info[zero_shot_spk_id])
        return out

    def frontend_cross_lingual(self, tts_text, prompt_wav, zero_shot_spk_id="") -> dict:
        out = self.frontend_zero_shot(tts_text, "", prompt_wav, zero_shot_spk_id)
        out.pop("prompt_text", None)
        out.pop("llm_prompt_speech_token", None)
        return out

    def frontend_instruct2(self, tts_text, instruct_text, prompt_wav, zero_shot_spk_id="") -> dict:
        out = self.frontend_zero_shot(tts_text, instruct_text, prompt_wav, zero_shot_spk_id)
        out.pop("llm_prompt_speech_token", None)  # frontend.py:209-213
        return out

    def frontend_sft(self, tts_text, spk_id) -> dict:
        info = self.spk2info[spk_id]
        return {
            "text": self.extract_text_token(tts_text),
            "llm_embedding": info["embedding"],
            "flow_embedding": info["embedding"],
        }

    def frontend_instruct(self, tts_text, spk_id, instruct_text) -> dict:
        out = self.frontend_sft(tts_text, spk_id)
        del out["llm_embedding"]  # information leakage (frontend.py:200-207)
        out["prompt_text"] = self.extract_text_token(instruct_text + "<endofprompt>")
        return out

    def frontend_vc(self, source_speech_16k, prompt_wav) -> dict:
        pf = self._prompt_features(prompt_wav)
        return {
            "source_speech_token": self.extract_speech_token(source_speech_16k),
            "flow_prompt_speech_token": pf["speech_token"],
            "prompt_speech_feat": pf["speech_feat"],
            "flow_embedding": pf["embedding"],
        }

    # ---- spk2info management (cli/cosyvoice.py:55-76) -----------------------

    def add_zero_shot_spk(self, prompt_text, prompt_wav, zero_shot_spk_id) -> bool:
        pf = self._prompt_features(prompt_wav)
        self.spk2info[zero_shot_spk_id] = {
            "prompt_text": self.extract_text_token(prompt_text),
            "llm_prompt_speech_token": pf["speech_token"],
            "flow_prompt_speech_token": pf["speech_token"],
            "prompt_speech_feat": pf["speech_feat"],
            "llm_embedding": pf["embedding"],
            "flow_embedding": pf["embedding"],
        }
        return True

    def save_spkinfo(self, path: str | Path | None = None) -> None:
        import torch

        path = str(path or self._spk2info_path or "spk2info.pt")
        torch.save(
            {k: {kk: torch.from_numpy(np.array(vv, copy=True)) for kk, vv in v.items()} for k, v in self.spk2info.items()},
            path,
        )


def _bf16(params):
    """Compute-dtype cast (fp32 matmuls are ~1000x slower on v5e)."""
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16) if hasattr(x, "ndim") and x.ndim >= 2 else jnp.asarray(x), params)


def make_campplus_fn(params) -> Callable:
    from ..models.campplus import CAMPPlus

    model = CAMPPlus()
    params = _bf16(params)

    # params as jit argument (closures bake weights into the HLO as constants)
    @jax.jit
    def fn(p, fbank):
        return model.apply({"params": p}, fbank.astype(jnp.bfloat16)).astype(jnp.float32)

    return lambda fbank: fn(params, fbank)


def make_s3_fn(params) -> Callable:
    from ..models.s3tokenizer import S3TokenizerV3

    model = S3TokenizerV3()
    params = _bf16(params)

    @jax.jit
    def fn(p, mel, mel_len):
        return model.apply({"params": p}, mel.astype(jnp.bfloat16), mel_len)

    return lambda mel, mel_len: fn(params, mel, mel_len)
