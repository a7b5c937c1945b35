"""WFST-category text normalization vectors (wetext/ttsfrd replacement).

The reference normalizes dates, times, percentages, fractions, currency,
measure units and phone numbers through wetext WFSTs / the ttsfrd binary
(cosyvoice/cli/frontend.py:56-75); infer/textnorm.py replaces them with rule
chains. Each vector is input -> expected normalized string through the full
text_normalize pipeline (split=False)."""

import pytest

from fangyan_tts_tpu.infer.textnorm import (
    normalize_categories_en,
    normalize_categories_zh,
    text_normalize,
)


def _norm(text: str) -> str:
    return text_normalize(text, tokenize=lambda t: list(t), split=False)


ZH_CASES = [
    # dates
    ("2024年8月17日，气温3.5℃。", "二零二四年八月十七日，气温三点五摄氏度。"),
    ("今天是8月5日。", "今天是八月五日。"),
    ("他出生于1998年。", "他出生于一九九八年。"),
    ("日期2024-08-17。", "日期二零二四年八月十七日。"),
    ("2024/8/7开幕。", "二零二四年八月七日开幕。"),
    ("12月31号放假。", "十二月三十一日放假。"),
    # times
    ("会议时间08:30。", "会议时间八点三十分。"),
    ("现在是14:05。", "现在是十四点零五分。"),
    ("比赛在9:00开始。", "比赛在九点开始。"),
    ("用时12:30:15。", "用时十二点三十分十五秒。"),
    # percent
    ("增长了3.5%。", "增长了百分之三点五。"),
    ("下降了-2%。", "下降了负百分之二。"),
    ("占比100%。", "占比百分之一百。"),
    ("优惠50%~70%。", "优惠百分之五十到百分之七十。"),
    # fractions
    ("完成了3/4。", "完成了四分之三。"),
    ("占比2/3。", "占比三分之二。"),
    # currency
    ("价格￥200。", "价格二百元。"),
    ("共计¥1500。", "共计一千五百元。"),
    ("价值$3.5。", "价值三点五美元。"),
    ("捐了€20。", "捐了二十欧元。"),
    ("花费£7。", "花费七英镑。"),
    # units
    ("时速120km/h。", "时速一百二十千米每小时。"),
    ("体重65kg。", "体重六十五千克。"),
    ("距离5km。", "距离五千米。"),
    ("容量100ml。", "容量一百毫升。"),
    ("气温-3℃。", "气温负三摄氏度。"),
    ("华氏98℉。", "华氏九十八华氏度。"),
    ("内存8GB。", "内存八吉字节。"),
    ("面积50m²。", "面积五十平方米。"),
    # phone numbers (幺 for 1, digit-by-digit)
    ("电话13812345678。", "电话幺三八幺二三四五六七八。"),
    ("手机号是13907211234。", "手机号是幺三九零七二幺幺二三四。"),
    ("座机010-12345678。", "座机零幺零幺二三四五六七八。"),
    # ranges
    ("需要3~5天。", "需要三到五天。"),
    ("大约2-3人。", "大约二到三人。"),
    ("涨幅10%-20%。", "涨幅百分之十到百分之二十。"),
    ("3-5万的预算。", "三到五万的预算。"),
    ("2008-2012年经济增长。", "二零零八到二零一二年经济增长。"),
    # sports scores (what X:Y runs survive the clock-time pass)
    ("比分2:1。", "比分二比一。"),
    ("大比分108:102获胜。", "大比分一百零八比一百零二获胜。"),
    # lunar-calendar days
    ("正月初5拜年。", "正月初五拜年。"),
    ("腊月初10祭灶。", "腊月初十祭灶。"),
    # long ID/card digit runs read digit-by-digit, not as a numeral
    ("卡号6222021234567890。", "卡号六二二二零二一二三四五六七八九零。"),
    ("订单号2024081712345。", "订单号二零二四零八幺七幺二三四五。".replace("幺", "一")),
    # plain numbers / decimals
    ("第3名。", "第三名。"),
    ("共有1234人。", "共有一千二百三十四人。"),
    ("一共10000个。", "一共一万个。"),
    ("约100000000元。", "约一亿元。"),
    ("圆周率约3.14。", "圆周率约三点一四。"),
    ("只剩0.5了。", "只剩零点五了。"),
    ("编号205。", "编号二百零五。"),
    ("第1001夜。", "第一千零一夜。"),
    ("110路公交。", "一百一十路公交。"),
    # 二/两 distinction (wetext char.fst): standalone 2 + measure word
    ("买了2个苹果。", "买了两个苹果。"),
    ("下午2点开会。", "下午两点开会。"),
    ("会议2:30开始。", "会议两点三十分开始。"),
    ("预算2万元。", "预算两万元。"),
    ("住了2天。", "住了两天。"),
    ("排队的有12个人。", "排队的有十二个人。"),
    ("2月2日出发。", "二月二日出发。"),
    ("得了2分。", "得了两分。"),
    # ordinals keep 二 (第-prefix excludes the 两 rule; wetext keeps 第二)
    ("第2次见面。", "第二次见面。"),
    ("他拿了第2名。", "他拿了第二名。"),
    ("请看第2页。", "请看第二页。"),
    # scale words 千/百 read 两 like 万/亿
    ("大约2千人。", "大约两千人。"),
    ("捐了2百元。", "捐了两百元。"),
    ("共12千克。", "共十二千克。"),
    # long tail: hotlines after a dial context read 幺-style digit-by-digit
    ("请拨打110。", "请拨打幺幺零。"),
    ("客服热线12345。", "客服热线幺二三四五。"),
    # leading-zero codes are never cardinals
    ("编号007。", "编号零零七。"),
    ("区号0086。", "区号零零八六。"),
    # mixed formats around them stay correct
    ("我住在中山路72号。", "我住在中山路七十二号。"),
    ("成绩是4比0。", "成绩是四比零。"),
    ("2023-08-20发布。", "二零二三年八月二十日发布。"),
    ("他住2单元402室。", "他住二单元四百零二室。"),
    ("版本v2.5上线了。", "版本v二点五上线了。"),
    # money with 万/亿 scales (the scale rides inside the amount)
    ("票房￥3.5亿。", "票房三点五亿元。"),
    ("预算$2万。", "预算两万美元。"),
    # dotted sequences: versions and IPs
    ("版本2.5.1发布。", "版本二点五点一发布。"),
    ("服务器192.168.1.1。", "服务器一百九十二点一六八点一点一。"),
    # math operators between numbers
    ("算式1+1=2。", "算式一加一等于二。"),
    ("因为3×5=15。", "因为三乘五等于十五。"),
    ("所以10÷2=5。", "所以十除以二等于五。"),
    ("误差±3℃。", "误差正负三摄氏度。"),
    # per-mille
    ("含盐量3‰。", "含盐量千分之三。"),
    # decades read digit-wise (wetext date.fst decade branch)
    ("90年代流行歌。", "九零年代流行歌。"),
    ("他是80后。", "他是八零后。"),
    ("1990年代的事。", "一九九零年代的事。"),
    # license plates: digits read 幺-style, letters kept
    ("车牌京A12345。", "车牌京A幺二三四五。"),
    ("粤B·987654被拍。", "粤B九八七六五四被拍。"),
    # time ranges
    ("营业时间8:30-17:30。", "营业时间八点三十分到十七点三十分。"),
    # ranges with a trailing unit
    ("续航400-500km。", "续航四百到五百千米。"),
    ("水温30~40℃合适。", "水温三十到四十摄氏度合适。"),
    # thousands separators
    ("人口1,234,567。", "人口一百二十三万四千五百六十七。"),
]

EN_CASES = [
    ("It rose 3.5%.", "It rose three point five percent."),
    ("He paid $200.", "He paid two hundred dollars."),
    ("Just $1.", "Just one dollar."),
    ("It costs $2.50.", "It costs two dollars fifty cents."),
    ("Donate €5.", "Donate five euros."),
    ("About £7.", "About seven pounds."),
    ("Meet at 8:30.", "Meet at eight thirty."),
    ("Meet at 9:05.", "Meet at nine oh five."),
    ("Meet at 7:00.", "Meet at seven o'clock."),
    ("Add 1/2 cup.", "Add one half cup."),
    ("About 3/4 done.", "About three quarters done."),
    ("Roughly 2/5 left.", "Roughly two over five left."),
    ("He is 42.", "He is forty-two."),
    ("It was 1234.", "It was one thousand two hundred thirty-four."),
    # ordinal suffixes
    ("He came 1st.", "He came first."),
    ("Her 23rd birthday.", "Her twenty-third birthday."),
    ("The 12th row.", "The twelfth row."),
    ("The 20th century.", "The twentieth century."),
    # thousands separators, negatives, ranges, time ranges
    ("Population 1,234,567.", "Population one million two hundred thirty-four thousand five hundred sixty-seven."),
    ("It was -5.", "It was minus five."),
    ("Read pages 3-5.", "Read pages three to five."),
    ("Open 8:30-17:30.", "Open eight thirty to seventeen thirty."),
]


@pytest.mark.parametrize("inp,want", ZH_CASES)
def test_zh_category(inp, want):
    assert _norm(inp) == want


@pytest.mark.parametrize("inp,want", EN_CASES)
def test_en_category(inp, want):
    assert _norm(inp) == want


def test_markup_bypasses_normalization():
    t = "请用四川话说。<|endofprompt|>今天3.5%。"
    assert _norm(t) == t


def test_category_fns_are_idempotent_on_plain_text():
    assert normalize_categories_zh("你好世界") == "你好世界"
    assert normalize_categories_en("hello world") == "hello world"


def test_frontend_spells_out_the_verdict_sentence():
    """The inference entry path (Frontend.text_normalize drives every
    inference_* mode) must hand the LLM the spelled-out form."""
    from fangyan_tts_tpu.config import CosyVoiceConfig
    from fangyan_tts_tpu.infer.frontend import Frontend
    from fangyan_tts_tpu.tokenizer import get_qwen_tokenizer

    fe = Frontend(get_qwen_tokenizer(None, True, "cosyvoice3"), CosyVoiceConfig(), None, None)
    segs = fe.text_normalize("2024年8月17日，气温3.5℃。", split=True)
    assert segs == ["二零二四年八月十七日，气温三点五摄氏度。"]


def test_split_paragraph_closing_quote_keeps_prior_sentence():
    """Regression: the closing-quote merge must APPEND to the popped
    sentence, not overwrite the one before it (frontend_utils.py:96-99)."""
    from fangyan_tts_tpu.infer.textnorm import split_paragraph

    got = split_paragraph(
        "你好。他说：“吃饭了。”", lambda s: list(s), "zh",
        token_max_n=5, token_min_n=2, merge_len=1,
    )
    assert "".join(got) == "你好。他说：“吃饭了。”"
    # quote text starting with punctuation+quote must not IndexError (the
    # orphan leading 。 is an empty segment and is dropped, as elsewhere)
    got2 = split_paragraph("。”好的。", lambda s: list(s), "zh",
                           token_max_n=5, token_min_n=2, merge_len=1)
    assert "".join(got2) == "”好的。"


def test_long_digit_runs_read_digit_by_digit():
    """16+ digit runs exceed the scale tables: must fall back to
    digit-by-digit reading instead of IndexError."""
    from fangyan_tts_tpu.infer.textnorm import (
        number_to_words_en, number_to_words_zh,
    )

    en = number_to_words_en("1234567890123456")
    assert en.split()[:3] == ["one", "two", "three"] and len(en.split()) == 16
    zh = number_to_words_zh("12345678901234567")
    assert len(zh) == 17 and zh.startswith("一二三")
    # boundary values still use the scale reading
    assert "trillion" in number_to_words_en(str(10**14))
    assert number_to_words_zh(str(10**15)).endswith("万亿")
