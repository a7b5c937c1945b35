"""Public model API — the cli/cosyvoice.py equivalent.

Behavioral reference: cosyvoice/cli/cosyvoice.py:27-240 (CosyVoice /
CosyVoice2 / CosyVoice3 / AutoModel): yaml+checkpoint load, frontend+model
build, spk2info management, and the inference_{sft,zero_shot,cross_lingual,
instruct,instruct2,vc} generators with per-yield RTF logging.

Model directory layout for this framework:
    config.json                 (CosyVoiceConfig overrides; optional)
    llm.msgpack / flow.msgpack / hift.msgpack     (converted params)
    campplus.msgpack / s3tokenizer.msgpack        (optional frontends)
    tokenizer/                  (HF tokenizer files; optional)
    spk2info.pt                 (optional saved speakers)
Reference torch checkpoints (llm.pt/flow.pt/hift.pt) are auto-converted on
first load if the msgpacks are absent (models/convert.py).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .config import CosyVoiceConfig, config_from_dict
from .infer.frontend import Frontend, make_campplus_fn, make_s3_fn
from .infer.tts import CosyVoice3TTS
from .tokenizer import get_qwen_tokenizer
from .train.checkpoint import load_params, save_params


def _maybe_convert(model_dir: Path, name: str, convert_fn) -> Path | None:
    msg = model_dir / f"{name}.msgpack"
    if msg.exists():
        return msg
    pt = model_dir / f"{name}.pt"
    if pt.exists():
        import torch

        from .models.convert import filter_training_meta

        sd = filter_training_meta(torch.load(pt, map_location="cpu", weights_only=False))
        save_params(msg, convert_fn(sd))
        logging.info("converted %s -> %s", pt, msg)
        return msg
    return None


def _deep_merge(base: dict, extra: dict) -> dict:
    """Recursive config overlay: a partial nested section in config.json
    (e.g. {"llm": {"llm_input_size": 1024}}) merges INTO the family preset's
    section instead of replacing it (which silently reverted omitted keys to
    CosyVoice3 defaults)."""
    out = dict(base)
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


class CosyVoice3:
    """Flagship model family (cli/cosyvoice.py:191-228)."""

    sample_rate = 24000

    def __init__(
        self,
        model_dir: str,
        fp16: bool = True,
        load_frontend_models: bool = True,
        quant_int8: bool = False,
    ):
        from .models.convert import flow_params_from_reference, hift_params_from_reference, llm_params_from_reference
        from .utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()  # cold-start: reuse compiled programs across processes
        self.model_dir = Path(model_dir)
        cfg = CosyVoiceConfig()
        cfg_path = self.model_dir / "config.json"
        if cfg_path.exists():
            cfg = config_from_dict(json.loads(cfg_path.read_text()))
        self.cfg = cfg

        dtype = jnp.bfloat16 if fp16 else jnp.float32
        paths = {
            "llm": _maybe_convert(self.model_dir, "llm", llm_params_from_reference),
            "flow": _maybe_convert(self.model_dir, "flow", flow_params_from_reference),
            "hift": _maybe_convert(self.model_dir, "hift", hift_params_from_reference),
        }
        missing = [k for k, v in paths.items() if v is None]
        if missing:
            raise FileNotFoundError(f"missing checkpoints in {model_dir}: {missing}")
        from .models.convert import fuse_qwen_split_params

        llm_p = fuse_qwen_split_params(load_params(paths["llm"]))
        flow_p = load_params(paths["flow"])
        hift_p = load_params(paths["hift"])
        import jax

        llm_p = jax.tree.map(lambda x: jnp.asarray(x, dtype) if np.ndim(x) >= 2 else jnp.asarray(x), llm_p)
        self.model = CosyVoice3TTS(cfg, llm_p, flow_p, hift_p, dtype=dtype)
        if quant_int8:
            # weight-only int8 LLM decode (ops/quant.py) — the TPU analogue
            # of the reference TRT-LLM runtime's int8 serving mode
            self.model.quantize_llm()

        tok_dir = self.model_dir / "tokenizer"
        tokenizer = get_qwen_tokenizer(str(tok_dir) if tok_dir.exists() else None, True, "cosyvoice3")
        self._build_frontend(tokenizer, load_frontend_models)

    def _build_frontend(self, tokenizer, load_frontend_models: bool) -> None:
        """Shared campplus/S3 frontend-model loading for all families."""
        campplus_fn = s3_fn = None
        if load_frontend_models:
            cp = self.model_dir / "campplus.msgpack"
            s3 = self.model_dir / "s3tokenizer.msgpack"
            if cp.exists():
                campplus_fn = make_campplus_fn(load_params(cp))
            if s3.exists():
                s3_fn = make_s3_fn(load_params(s3))
        self.frontend = Frontend(tokenizer, self.cfg, campplus_fn, s3_fn, spk2info=self.model_dir / "spk2info.pt")

    # -- speaker management (cli/cosyvoice.py:55-76)
    def add_zero_shot_spk(self, prompt_text: str, prompt_wav, zero_shot_spk_id: str) -> bool:
        assert zero_shot_spk_id != "", "do not use empty zero_shot_spk_id"
        return self.frontend.add_zero_shot_spk(prompt_text, prompt_wav, zero_shot_spk_id)

    def save_spkinfo(self):
        self.frontend.save_spkinfo(self.model_dir / "spk2info.pt")

    def list_available_spks(self) -> list[str]:
        return list(self.frontend.spk2info.keys())

    # -- inference generators (cli/cosyvoice.py:78-189)
    def _run(self, model_input: dict, stream: bool, speed: float, text_label: str):
        start = time.time()
        for out in self.model.tts(stream=stream, speed=speed, **model_input):
            speech_len = len(out["tts_speech"]) / self.sample_rate
            rtf = (time.time() - start) / max(speech_len, 1e-9)
            logging.info("yield speech len %.2f, rtf %.3f (%s)", speech_len, rtf, text_label)
            yield out
            start = time.time()

    def inference_zero_shot(self, tts_text, prompt_text, prompt_wav, zero_shot_spk_id="", stream=False, speed=1.0, text_frontend=True):
        prompt_text_norm = self.frontend.text_normalize(prompt_text, split=False, text_frontend=text_frontend)
        for seg in self.frontend.text_normalize(tts_text, split=True, text_frontend=text_frontend):
            if not hasattr(seg, "__next__") and len(seg) < 0.5 * len(prompt_text_norm):
                logging.warning("synthesis text %s too short than prompt text %s, this may lead to bad performance", seg, prompt_text_norm)
            mi = self.frontend.frontend_zero_shot(seg, prompt_text_norm, prompt_wav, zero_shot_spk_id)
            yield from self._run(mi, stream, speed, "<bistream>" if hasattr(seg, "__next__") else seg)

    def inference_cross_lingual(self, tts_text, prompt_wav, zero_shot_spk_id="", stream=False, speed=1.0, text_frontend=True):
        for seg in self.frontend.text_normalize(tts_text, split=True, text_frontend=text_frontend):
            mi = self.frontend.frontend_cross_lingual(seg, prompt_wav, zero_shot_spk_id)
            yield from self._run(mi, stream, speed, seg)

    def inference_instruct2(self, tts_text, instruct_text, prompt_wav, zero_shot_spk_id="", stream=False, speed=1.0, text_frontend=True):
        assert "<|endofprompt|>" in instruct_text, "v3 instruct should contain <|endofprompt|>"
        for seg in self.frontend.text_normalize(tts_text, split=True, text_frontend=text_frontend):
            mi = self.frontend.frontend_instruct2(seg, instruct_text, prompt_wav, zero_shot_spk_id)
            yield from self._run(mi, stream, speed, seg)

    def inference_sft(self, tts_text, spk_id, stream=False, speed=1.0, text_frontend=True):
        for seg in self.frontend.text_normalize(tts_text, split=True, text_frontend=text_frontend):
            mi = self.frontend.frontend_sft(seg, spk_id)
            yield from self._run(mi, stream, speed, seg)

    def inference_instruct(self, tts_text, spk_id, instruct_text, stream=False, speed=1.0, text_frontend=True):
        """v1-only natural-language instruct mode (cli/cosyvoice.py:119-139:
        the reference asserts the model is CosyVoice v1)."""
        raise NotImplementedError(
            "inference_instruct is only implemented for CosyVoice (v1); use inference_instruct2"
        )

    def inference_vc(self, source_wav, prompt_wav, stream=False, speed=1.0):
        from .data.audio import load_audio

        src16, _ = load_audio(source_wav, target_sr=16000) if isinstance(source_wav, (str, Path)) else (source_wav, 16000)
        mi = self.frontend.frontend_vc(src16, prompt_wav)
        mi["source_speech_token"] = np.asarray(mi.pop("source_speech_token"), np.int32)
        yield from self._run(mi, stream, speed, "vc")


class CosyVoice2(CosyVoice3):
    """CosyVoice2 (cli/cosyvoice.py:143-189): Qwen2LM with the 2-row
    sos/task table, CausalMaskedDiffWithXvec (UpsampleConformer + causal
    U-Net CFM) and the non-causal 24 kHz HiFT with mel/source/speech
    streaming caches."""

    sample_rate = 24000

    def __init__(self, model_dir: str, fp16: bool = True, load_frontend_models: bool = True, **_):
        from .config import cosyvoice2_config
        from .infer.tts_v12 import CosyVoice2TTS
        from .models.convert import (
            flow_v2_params_from_reference,
            hift_nc_params_from_reference,
            llm_v2_params_from_reference,
        )
        from .models.flow_xvec import CausalMaskedDiffWithXvec
        from .utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        self.model_dir = Path(model_dir)
        from .config import _to_jsonable

        extra: dict = {}
        cfg_path = self.model_dir / "config.json"
        if cfg_path.exists():
            extra = json.loads(cfg_path.read_text())
        # overlay on the v2 preset so omitted sections keep v2 (not v3) defaults
        cfg = config_from_dict({**_deep_merge(_to_jsonable(cosyvoice2_config()), extra), "version": 2})
        self.cfg = cfg
        dtype = jnp.bfloat16 if fp16 else jnp.float32

        paths = {
            "llm": _maybe_convert(self.model_dir, "llm", llm_v2_params_from_reference),
            "flow": _maybe_convert(self.model_dir, "flow", flow_v2_params_from_reference),
            "hift": _maybe_convert(self.model_dir, "hift", hift_nc_params_from_reference),
        }
        missing = [k for k, v in paths.items() if v is None]
        if missing:
            raise FileNotFoundError(f"missing checkpoints in {model_dir}: {missing}")
        from .models.convert import fuse_qwen_split_params

        llm_p = fuse_qwen_split_params(load_params(paths["llm"]))
        import jax

        llm_p = jax.tree.map(lambda x: jnp.asarray(x, dtype) if np.ndim(x) >= 2 else jnp.asarray(x), llm_p)
        # optional module-size overrides (tiny models / non-default layouts):
        # config.json {"xvec_flow": {<CausalMaskedDiffWithXvec kwargs>}}
        flow_kw = {k: tuple(v) if isinstance(v, list) else v for k, v in extra.get("xvec_flow", {}).items()}
        flow = CausalMaskedDiffWithXvec(vocab_size=cfg.llm.speech_token_size, **flow_kw)
        self.model = CosyVoice2TTS(
            cfg.llm, llm_p, flow, load_params(paths["flow"]), cfg.hift, load_params(paths["hift"]), dtype=dtype
        )
        self._init_frontend(load_frontend_models)

    def _init_frontend(self, load_frontend_models: bool):
        tok_dir = self.model_dir / "CosyVoice-BlankEN"
        if not tok_dir.exists():
            tok_dir = self.model_dir / "tokenizer"
        tokenizer = get_qwen_tokenizer(str(tok_dir) if tok_dir.exists() else None, True, "cosyvoice2")
        self._build_frontend(tokenizer, load_frontend_models)


class CosyVoice(CosyVoice3):
    """CosyVoice1 (cli/cosyvoice.py:27-141): TransformerLM + conformer flow
    with the InterpolateRegulator + non-causal 22.05 kHz HiFT; streaming via
    mel-overlap fades and the z/mu flow cache."""

    sample_rate = 22050

    def __init__(self, model_dir: str, fp16: bool = False, load_frontend_models: bool = True, **_):
        from .config import cosyvoice1_config
        from .infer.tts_v12 import CosyVoiceV1TTS
        from .models.convert import (
            flow_v1_params_from_reference,
            hift_nc_params_from_reference,
            llm_v1_params_from_reference,
        )
        from .models.flow_xvec import MaskedDiffWithXvec
        from .models.llm_v1 import TransformerLM
        from .utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        self.model_dir = Path(model_dir)
        from .config import _to_jsonable

        extra: dict = {}
        cfg_path = self.model_dir / "config.json"
        if cfg_path.exists():
            extra = json.loads(cfg_path.read_text())
        # overlay on the v1 preset so omitted sections keep v1 (not v3) defaults
        cfg = config_from_dict({**_deep_merge(_to_jsonable(cosyvoice1_config()), extra), "version": 1})
        self.cfg = cfg
        paths = {
            "llm": _maybe_convert(self.model_dir, "llm", llm_v1_params_from_reference),
            "flow": _maybe_convert(self.model_dir, "flow", flow_v1_params_from_reference),
            "hift": _maybe_convert(
                self.model_dir, "hift",
                lambda sd: hift_nc_params_from_reference(sd, upsample_rates=(8, 8)),
            ),
        }
        missing = [k for k, v in paths.items() if v is None]
        if missing:
            raise FileNotFoundError(f"missing checkpoints in {model_dir}: {missing}")
        # optional module-size overrides: config.json {"llm_v1": {...},
        # "xvec_flow": {...}} (tiny models / non-default layouts)
        llm_kw = extra.get("llm_v1", {})
        flow_kw = {k: tuple(v) if isinstance(v, list) else v for k, v in extra.get("xvec_flow", {}).items()}
        llm = TransformerLM(speech_token_size=cfg.llm.speech_token_size, **llm_kw)
        flow = MaskedDiffWithXvec(vocab_size=cfg.llm.speech_token_size, **flow_kw)
        # v1 stays fp32: the legacy stack is small and the reference serves
        # it fp32 (cli/cosyvoice.py:39 warns fp16 off for v1)
        if fp16:
            logging.warning("CosyVoice (v1) ignores fp16=True and runs fp32, matching the reference")
        self.model = CosyVoiceV1TTS(
            llm, load_params(paths["llm"]), flow, load_params(paths["flow"]),
            cfg.hift, load_params(paths["hift"]),
        )
        vocab = self.model_dir / "multilingual_zh_ja_yue_char_del.tiktoken"
        from .tokenizer import get_tokenizer

        tokenizer = get_tokenizer(multilingual=True, vocab_path=str(vocab) if vocab.exists() else None)
        self._build_frontend(tokenizer, load_frontend_models)

    def inference_instruct2(self, *a, **k):
        raise NotImplementedError("inference_instruct2 requires CosyVoice2/3")

    def inference_instruct(self, tts_text, spk_id, instruct_text, stream=False, speed=1.0, text_frontend=True):
        """spk_id + NL instruct (cli/cosyvoice.py:119-139): frontend_sft minus
        llm_embedding, instruct tokens as prompt_text."""
        instruct_norm = self.frontend.text_normalize(instruct_text, split=False, text_frontend=text_frontend)
        for seg in self.frontend.text_normalize(tts_text, split=True, text_frontend=text_frontend):
            mi = self.frontend.frontend_instruct(seg, spk_id, instruct_norm)
            yield from self._run(mi, stream, speed, seg)


def AutoModel(model_dir: str, **kwargs):
    """Dispatch by files present (cli/cosyvoice.py:230-240)."""
    d = Path(model_dir)
    if (d / "config.json").exists():
        version = json.loads((d / "config.json").read_text()).get("version", 3)
    elif (d / "cosyvoice3.yaml").exists():
        version = 3
    elif (d / "cosyvoice2.yaml").exists():
        version = 2
    elif (d / "cosyvoice.yaml").exists():
        version = 1
    else:
        version = 3
    cls = {1: CosyVoice, 2: CosyVoice2, 3: CosyVoice3}[version]
    return cls(model_dir, **kwargs)
