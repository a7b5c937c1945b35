"""Text normalization + paragraph splitting.

Behavioral reference: cosyvoice/utils/frontend_utils.py:21-136 and the
wetext/ttsfrd fallback chain in cli/frontend.py:56-75. This build ships a
self-contained normalizer replacing the reference's external ttsfrd binary /
wetext WFSTs with rule chains covering the wetext tagger categories: dates,
times, percentages, fractions, currency, measure units, phone numbers,
ranges, negative numbers, leading-zero codes, dial-context hotlines, and
plain integer/decimal readings — for zh and the en equivalents
(percent/currency/time/fraction). `<|...|>` markup always bypasses
normalization, matching frontend.py:131-134. Category vectors:
tests/test_textnorm_categories.py.

Deliberate pass-throughs (shapes the rule chain does NOT tag; they fall to
the generic cardinal/digit reading, same as wetext's untagged fallback):
- 1-3 digit years without a full date (202年 reads 二百零二年 — genuinely
  ambiguous with durations: 住了202年);
- hotlines WITHOUT a dial context (110 alone reads 一百一十 — only
  拨打110/热线12345 style contexts disambiguate);
- roman numerals, fraction slashes in zh running text (wetext leaves both
  to the upstream tagger too);
- erhua 儿 stays lexical (no 儿-insertion/deletion — the reference's
  ttsfrd binary did dialect-aware erhua, wetext does not).
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
    if n >= 10**15:  # beyond the scales table: read digit-by-digit
        return " ".join("zero" if c == "0" else _ONES_EN[int(c)] for c in num_str)
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
    if n >= 10**16:  # beyond 万亿: read digit-by-digit
        return _digits_zh(num_str)
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


def _digits_zh(s: str, phone: bool = False) -> str:
    """Digit-by-digit reading; phone style reads 1 as 幺 (telephony usage)."""
    table = "幺" if phone else "一"
    return "".join("零" if c == "0" else (table if c == "1" and phone else _DIGITS_ZH[int(c)]) for c in s)


def _num_zh(s: str) -> str:
    """Integer-or-decimal string -> Chinese reading."""
    if "." in s:
        i, f = s.split(".", 1)
        return number_to_words_zh(i or "0") + "点" + _digits_zh(f)
    return number_to_words_zh(s)


# zh measure units appended directly after a number (wetext measure.fst set)
_UNITS_MAP_ZH = [
    ("km/h", "千米每小时"), ("m/s", "米每秒"), ("kWh", "千瓦时"), ("kW", "千瓦"),
    ("km²", "平方千米"), ("m²", "平方米"), ("cm²", "平方厘米"), ("m³", "立方米"),
    ("mm", "毫米"), ("cm", "厘米"), ("km", "千米"), ("mg", "毫克"), ("kg", "千克"),
    ("ml", "毫升"), ("℃", "摄氏度"), ("℉", "华氏度"), ("GB", "吉字节"),
    ("MB", "兆字节"), ("KB", "千字节"), ("Hz", "赫兹"), ("h", "小时"),
    ("g", "克"), ("L", "升"), ("m", "米"), ("s", "秒"),
]

# characters after which a standalone 2 reads 两 (measure words, clock 点,
# scale words 万/亿/千/百); 月/日/号 deliberately absent (2月 = 二月)
_LIANG_FOLLOWERS = (
    "个只本条张次位名件台辆架间家场篇首座颗棵粒艘顶杯瓶碗盘块枚匹头罐桶袋箱层栋排"
    "对双份节段句行页幅卷册部集支把口亩级倍人天年周岁点分秒小站轮届门道笔锅组队幢"
    "万亿千百"
)

_CURRENCY_ZH = {"￥": "元", "¥": "元", "$": "美元", "€": "欧元", "£": "英镑"}
_CURRENCY_EN = {"$": ("dollar", "dollars"), "€": ("euro", "euros"), "£": ("pound", "pounds")}


def normalize_categories_zh(text: str) -> str:
    """wetext-category readings for zh: runs BEFORE generic number spelling
    so each tagged span becomes plain Chinese; untouched digit runs fall
    through to spell_out_number. Reference: the wetext WFST chain behind
    cli/frontend.py:63-75."""
    # phone numbers: 11-digit mobiles and area-code-hyphen landlines read
    # digit-by-digit with 幺 for 1
    text = re.sub(r"(?<!\d)(1[3-9]\d{9})(?!\d)", lambda m: _digits_zh(m.group(1), phone=True), text)
    text = re.sub(
        r"(?<!\d)(0\d{2,3})-(\d{7,8})(?!\d)",
        lambda m: _digits_zh(m.group(1), phone=True) + _digits_zh(m.group(2), phone=True),
        text,
    )
    # very long digit runs (ID / card / order numbers, >=10 digits) that are
    # not mobile numbers read digit-by-digit — reading an 18-digit ID as a
    # quintillion-scale numeral is the classic WFST-less failure mode
    text = re.sub(r"(?<!\d)(\d{10,})(?!\d)", lambda m: _digits_zh(m.group(1)), text)
    # hotlines / short service numbers right after a dial context (拨打110,
    # 客服热线12345): digit-by-digit with 幺 — as cardinals they'd read
    # 一百一十 (wetext's phone tagger covers these via context)
    text = re.sub(r"(?<=[打线])(1\d{2,4})(?!\d)",
                  lambda m: _digits_zh(m.group(1), phone=True), text)
    # year ranges BEFORE single dates: 2008-2012年 -> both years digit-wise
    # + 到 (the date rule would otherwise eat the right-hand year first)
    text = re.sub(
        r"(?<!\d)(\d{4})\s*[-~～]\s*(\d{4})(?=年)",
        lambda m: _digits_zh(m.group(1)) + "到" + _digits_zh(m.group(2)),
        text,
    )
    # dates: YYYY年M月D日 / YYYY-MM-DD / YYYY/M/D / M月D日; years read digit-wise
    def _date_cjk(m):
        out = _digits_zh(m.group(1)) + "年"
        if m.group(2):
            out += number_to_words_zh(m.group(2)) + "月"
        if m.group(3):
            out += number_to_words_zh(m.group(3)) + "日"
        return out

    text = re.sub(r"(\d{4})年(?:(\d{1,2})月)?(?:(\d{1,2})[日号])?", _date_cjk, text)
    text = re.sub(
        r"(?<!\d)(\d{4})[-/](\d{1,2})[-/](\d{1,2})(?!\d)",
        lambda m: _digits_zh(m.group(1)) + "年" + number_to_words_zh(m.group(2)) + "月"
        + number_to_words_zh(m.group(3)) + "日",
        text,
    )
    text = re.sub(
        r"(?<!\d)(\d{1,2})月(\d{1,2})[日号]",
        lambda m: number_to_words_zh(m.group(1)) + "月" + number_to_words_zh(m.group(2)) + "日",
        text,
    )
    # times: HH:MM(:SS)
    def _time(m):
        h, mi, se = m.group(1), m.group(2), m.group(3)
        out = ("两" if int(h) == 2 else number_to_words_zh(h)) + "点"
        if int(mi):
            out += ("零" if mi[0] == "0" and int(mi) else "") + number_to_words_zh(mi) + "分"
        if se is not None and int(se):
            out += number_to_words_zh(se) + "秒"
        return out

    text = re.sub(r"(?<!\d)(\d{1,2}):(\d{2})(?::(\d{2}))?(?!\d)", _time, text)
    # sports scores: what X:Y runs remain after the clock-time pass (single
    # digit minutes, or >2-digit sides like 108:102) read as X比Y
    text = re.sub(
        r"(?<!\d)(\d{1,3}):(\d{1,3})(?!\d)",
        lambda m: number_to_words_zh(m.group(1)) + "比" + number_to_words_zh(m.group(2)),
        text,
    )
    # leading-zero codes (007, 0086): a zero-led digit run is never a
    # cardinal — read digit-by-digit. Runs AFTER dates/times so 2023-08-20's
    # 08 is already consumed by the date rule.
    text = re.sub(r"(?<![\d.])(0\d+)(?![\d.])", lambda m: _digits_zh(m.group(1)), text)
    # percent ranges BEFORE single percents: 10%-20% -> 百分之十到百分之二十
    # (wetext reads both ends as percents; a bare hyphen between two
    # normalized percents would otherwise survive as punctuation)
    text = re.sub(
        r"(-?\d+(?:\.\d+)?)%\s*[-~～]\s*(-?\d+(?:\.\d+)?)%",
        lambda m: "百分之" + _num_zh(m.group(1).lstrip("-")) + "到百分之" + _num_zh(m.group(2).lstrip("-")),
        text,
    )
    # percent: X% -> 百分之X (also ±)
    text = re.sub(
        r"-?\d+(?:\.\d+)?%",
        lambda m: ("负" if m.group(0).startswith("-") else "") + "百分之" + _num_zh(m.group(0).lstrip("-")[:-1]),
        text,
    )
    # lunar-calendar day-of-month: 初5 / 初15 -> 初五 / 初十五 (wetext date.fst
    # lunar branch; the month names 正月/腊月 are already characters)
    text = re.sub(r"初(\d{1,2})(?!\d)", lambda m: "初" + number_to_words_zh(m.group(1)), text)
    # fractions: X/Y -> Y分之X
    text = re.sub(
        r"(?<![\d/])(\d{1,3})/(\d{1,3})(?![\d/])",
        lambda m: number_to_words_zh(m.group(2)) + "分之" + number_to_words_zh(m.group(1)),
        text,
    )
    # currency: ￥200 / $3.5 -> amount + unit
    def _curr(m):
        return _num_zh(m.group(2)) + _CURRENCY_ZH[m.group(1)]

    text = re.sub(r"([￥¥$€£])\s*(\d+(?:\.\d+)?)", _curr, text)
    # ranges: 3~5 / 3-5 (digit-digit) -> 三到五
    text = re.sub(
        r"(?<!\d)(\d+(?:\.\d+)?)[~～-](\d+(?:\.\d+)?)(?!\d)",
        lambda m: _num_zh(m.group(1)) + "到" + _num_zh(m.group(2)),
        text,
    )
    # measure units directly after a number (longest-first table)
    for unit, reading in _UNITS_MAP_ZH:
        text = re.sub(r"(\d(?:\.\d+)?)" + re.escape(unit) + r"(?![A-Za-z0-9²³])",
                      lambda m, r=reading: m.group(1) + r, text)
    # negative numbers: leading minus directly before a digit
    text = re.sub(r"(?<![\dA-Za-z)])-(?=\d)", "负", text)
    # leftover range tildes between already-normalized spans
    text = text.replace("~", "到").replace("～", "到")
    # 二/两 distinction (wetext char.fst): a STANDALONE digit 2 directly
    # before a measure word / 点(clock) / 万亿千百 reads 两, not 二 (2个->两个,
    # 2点->两点, 2万->两万). Multi-digit numbers keep 二 (12个->十二个),
    # calendar 月/日/号 keep 二 (2月->二月), and ordinals keep 二 (第2次->
    # 第二次, matching wetext's 第-prefixed ordinal path) — all excluded.
    text = re.sub(r"(?<![\d.第])2(?=[" + _LIANG_FOLLOWERS + r"])", "两", text)
    return text


def normalize_categories_en(text: str) -> str:
    """en equivalents: percent, currency, clock times, common fractions."""
    text = re.sub(r"(\d+(?:\.\d+)?)%", r"\1 percent", text)

    def _curr(m):
        sym, amt = m.group(1), m.group(2)
        one, many = _CURRENCY_EN[sym]
        unit = one if amt == "1" else many
        if "." in amt:
            i, f = amt.split(".", 1)
            cents = int(f.ljust(2, "0")[:2])
            out = number_to_words_en(i or "0") + " " + (one if i == "1" else many)
            if cents:
                out += " " + number_to_words_en(str(cents)) + (" cent" if cents == 1 else " cents")
            return out
        return number_to_words_en(amt) + " " + unit

    text = re.sub(r"([$€£])\s*(\d+(?:\.\d+)?)", _curr, text)

    def _time(m):
        h, mi = int(m.group(1)), m.group(2)
        out = number_to_words_en(str(h))
        if int(mi) == 0:
            out += " o'clock"
        elif int(mi) < 10:
            out += " oh " + number_to_words_en(str(int(mi)))
        else:
            out += " " + number_to_words_en(mi)
        return out

    text = re.sub(r"(?<!\d)(\d{1,2}):(\d{2})(?!\d)", _time, text)
    frac_map = {"1/2": "one half", "1/3": "one third", "2/3": "two thirds",
                "1/4": "one quarter", "3/4": "three quarters"}
    text = re.sub(
        r"(?<![\d/])(\d{1,3})/(\d{1,3})(?![\d/])",
        lambda m: frac_map.get(m.group(0), number_to_words_en(m.group(1)) + " over " + number_to_words_en(m.group(2))),
        text,
    )
    return text


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
                # closing quote rides with the sentence it ends
                # (frontend_utils.py:96-99; pop+append keeps earlier utts)
                utts.append((utts.pop() if utts else "") + text[i + 1])
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
        text = normalize_categories_zh(text)
        text = replace_corner_mark(text)
        text = spell_out_number(text, "zh")
        text = text.replace(".", "。").replace(" - ", "，")
        text = remove_bracket(text)
        text = re.sub(r"[，,、]+$", "。", text)
        texts = split_paragraph(text, tokenize, "zh", token_max_n=80, token_min_n=60, merge_len=20)
    else:
        text = normalize_categories_en(text)
        text = spell_out_number(text, "en")
        texts = split_paragraph(text, tokenize, "en", token_max_n=80, token_min_n=60, merge_len=20)
    texts = [t for t in texts if not is_only_punctuation(t)]
    return texts if split else text
