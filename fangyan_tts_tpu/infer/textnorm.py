"""Text normalization + paragraph splitting.

Behavioral reference: cosyvoice/utils/frontend_utils.py:21-136 and the
wetext/ttsfrd fallback chain in cli/frontend.py:56-75. This build ships a
self-contained normalizer: the reference's external ttsfrd binary / wetext
WFSTs are replaced by built-in Chinese/English number reading and symbol
cleanup (the subset exercised by the dialect/emotion pipelines); `<|...|>`
markup always bypasses normalization, matching frontend.py:131-134.
"""

from __future__ import annotations

import re
from typing import Callable

import regex

_CHINESE_CHAR = re.compile(r"[一-鿿]")

_DIGITS_ZH = "零一二三四五六七八九"
_UNITS_ZH = ["", "十", "百", "千"]
_GROUPS_ZH = ["", "万", "亿", "万亿"]

_ONES_EN = "zero one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen".split()
_TENS_EN = "zero ten twenty thirty forty fifty sixty seventy eighty ninety".split()


def contains_chinese(text: str) -> bool:
    return bool(_CHINESE_CHAR.search(text))


def replace_corner_mark(text: str) -> str:
    return text.replace("²", "平方").replace("³", "立方")


def remove_bracket(text: str) -> str:
    for ch in ("（", "）", "【", "】", "`"):
        text = text.replace(ch, "")
    return text.replace("——", " ")


def replace_blank(text: str) -> str:
    """Drop spaces unless both neighbors are non-space ascii
    (frontend_utils.py:119-130)."""
    out = []
    for i, c in enumerate(text):
        if c == " ":
            prev_ok = i > 0 and text[i - 1].isascii() and text[i - 1] != " "
            next_ok = i + 1 < len(text) and text[i + 1].isascii() and text[i + 1] != " "
            if prev_ok and next_ok:
                out.append(c)
        else:
            out.append(c)
    return "".join(out)


def is_only_punctuation(text: str) -> bool:
    return bool(regex.fullmatch(r"^[\p{P}\p{S}]*$", text))


def number_to_words_en(num_str: str) -> str:
    """Integer -> English words (replaces the inflect dependency)."""
    n = int(num_str)
    if n == 0:
        return "zero"
    parts = []

    def three(x: int) -> str:
        s = []
        if x >= 100:
            s.append(_ONES_EN[x // 100] + " hundred")
            x %= 100
        if x >= 20:
            t = _TENS_EN[x // 10]
            if x % 10:
                t += "-" + _ONES_EN[x % 10]
            s.append(t)
        elif x > 0:
            s.append(_ONES_EN[x])
        return " ".join(s)

    scales = ["", " thousand", " million", " billion", " trillion"]
    chunks = []
    while n:
        chunks.append(n % 1000)
        n //= 1000
    for i in range(len(chunks) - 1, -1, -1):
        if chunks[i]:
            parts.append(three(chunks[i]) + scales[i])
    return " ".join(parts)


def number_to_words_zh(num_str: str) -> str:
    """Integer -> Chinese reading (wetext-subset replacement)."""
    n = int(num_str)
    if n == 0:
        return "零"
    out = []
    group_idx = 0
    while n > 0:
        g = n % 10000
        n //= 10000
        if g:
            s = _group_zh(g)
            out.append(s + _GROUPS_ZH[group_idx])
        elif out and not out[-1].startswith("零"):
            out.append("零")
        group_idx += 1
    text = "".join(reversed(out))
    text = re.sub("零+", "零", text).strip("零")
    # 一十X -> 十X
    if text.startswith("一十"):
        text = text[1:]
    return text or "零"


def _group_zh(g: int) -> str:
    s = []
    digits = [(g // 1000) % 10, (g // 100) % 10, (g // 10) % 10, g % 10]
    started = False
    for d, u in zip(digits, ["千", "百", "十", ""]):
        if d:
            s.append(_DIGITS_ZH[d] + u)
            started = True
        elif started:
            s.append("零")
    return re.sub("零+", "零", "".join(s)).rstrip("零")


def spell_out_number(text: str, lang: str = "en") -> str:
    """Replace digit runs with words (frontend_utils.py:42-58 analogue;
    zh mode also reads decimals/percent)."""
    fn = number_to_words_zh if lang == "zh" else number_to_words_en

    def repl(m: re.Match) -> str:
        s = m.group(0)
        if "." in s:
            int_part, frac = s.split(".", 1)
            if lang == "zh":
                return fn(int_part or "0") + "点" + "".join(_DIGITS_ZH[int(c)] for c in frac)
            return fn(int_part or "0") + " point " + " ".join(_ONES_EN[int(c)] for c in frac)
        return fn(s)

    return re.sub(r"\d+(?:\.\d+)?", repl, text)


def split_paragraph(
    text: str,
    tokenize: Callable[[str], list],
    lang: str = "zh",
    token_max_n: int = 80,
    token_min_n: int = 60,
    merge_len: int = 20,
    comma_split: bool = False,
) -> list[str]:
    """Sentence splitting with token-count-aware merging
    (frontend_utils.py:65-116)."""

    def utt_length(t: str) -> int:
        return len(t) if lang == "zh" else len(tokenize(t))

    if lang == "zh":
        pounc = ["。", "？", "！", "；", "：", "、", ".", "?", "!", ";"]
    else:
        pounc = [".", "?", "!", ";", ":"]
    if comma_split:
        pounc.extend(["，", ","])

    if not text:
        return []
    if text[-1] not in pounc:
        text += "。" if lang == "zh" else "."

    st, utts = 0, []
    for i, c in enumerate(text):
        if c in pounc:
            if len(text[st:i]) > 0:
                utts.append(text[st:i] + c)
            if i + 1 < len(text) and text[i + 1] in ['"', "”"]:
                utts[-1] = utts.pop() + text[i + 1] if utts else text[i + 1]
                st = i + 2
            else:
                st = i + 1

    final, cur = [], ""
    for utt in utts:
        if utt_length(cur + utt) > token_max_n and utt_length(cur) > token_min_n:
            final.append(cur)
            cur = ""
        cur += utt
    if cur:
        if utt_length(cur) < merge_len and final:
            final[-1] += cur
        else:
            final.append(cur)
    return final


def text_normalize(
    text: str,
    tokenize: Callable[[str], list],
    split: bool = True,
    use_frontend: bool = True,
):
    """Normalize + split (cli/frontend.py:127-158 flow)."""
    if "<|" in text and "|>" in text:
        use_frontend = False
    if not use_frontend or text == "":
        return [text] if split else text
    text = text.strip()
    if contains_chinese(text):
        text = text.replace("\n", "")
        text = replace_blank(text)
        text = replace_corner_mark(text)
        text = spell_out_number(text, "zh")
        text = text.replace(".", "。").replace(" - ", "，")
        text = remove_bracket(text)
        text = re.sub(r"[，,、]+$", "。", text)
        texts = split_paragraph(text, tokenize, "zh", token_max_n=80, token_min_n=60, merge_len=20)
    else:
        text = spell_out_number(text, "en")
        texts = split_paragraph(text, tokenize, "en", token_max_n=80, token_min_n=60, merge_len=20)
    texts = [t for t in texts if not is_only_punctuation(t)]
    return texts if split else text
