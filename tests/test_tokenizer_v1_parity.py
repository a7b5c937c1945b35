"""CosyVoice1 tiktoken tokenizer parity vs the ACTUAL reference tokenizer
loaded with the REAL vocab asset (the only model artifact the reference
ships in-tree: tokenizer/assets/multilingual_zh_ja_yue_char_del.tiktoken)."""

import sys
from pathlib import Path

import pytest

tiktoken = pytest.importorskip("tiktoken")
sys.path.insert(0, "tests") if "tests" not in sys.path else None

from fangyan_tts_tpu.tokenizer.tokenizer import get_tokenizer  # noqa: E402

VOCAB = Path("/root/reference/CosyVoice/cosyvoice/tokenizer/assets/multilingual_zh_ja_yue_char_del.tiktoken")

SAMPLES = [
    "收到好友从远方寄来的生日礼物，那份意外的惊喜让我心中充满了快乐。",
    "hello world, this is a mixed 中英文 sentence with numbers 12345.",
    "希望你以后能够做的比我还好呦。",
    "今天天气不错！？……「引号」与标点，test's edge-cases.",
]


@pytest.fixture(scope="module")
def ref_tok():
    if not VOCAB.exists():
        pytest.skip("reference vocab asset unavailable")
    import types

    if "whisper" not in sys.modules:  # openai-whisper absent: wrapper stub
        w = types.ModuleType("whisper")
        wt = types.ModuleType("whisper.tokenizer")

        class _Tok:
            def __init__(self, encoding, **kw):
                self.encoding = encoding

        wt.Tokenizer = _Tok
        w.tokenizer = wt
        sys.modules["whisper"] = w
        sys.modules["whisper.tokenizer"] = wt
    from oracles import ref_loader

    tok_mod = ref_loader.load("cosyvoice.tokenizer.tokenizer")
    return tok_mod.get_encoding("multilingual_zh_ja_yue_char_del", num_languages=100)


@pytest.fixture(scope="module")
def our_tok():
    return get_tokenizer(multilingual=True, vocab_path=str(VOCAB), num_languages=100)


@pytest.mark.parametrize("text", SAMPLES)
def test_v1_tokenizer_encodes_identically(ref_tok, our_tok, text):
    ours = our_tok.encode(text)
    theirs = ref_tok.encode(text, allowed_special="all")
    assert list(ours) == list(theirs)


def test_v1_tokenizer_specials_and_roundtrip(ref_tok, our_tok):
    text = "<|zh|><|HAPPY|>你好<|endoftext|>"
    assert list(our_tok.encode(text)) == list(ref_tok.encode(text, allowed_special="all"))
    ids = our_tok.encode(SAMPLES[0])
    assert our_tok.decode(ids) == SAMPLES[0]
