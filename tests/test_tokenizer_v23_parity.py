"""CosyVoice2/3 Qwen tokenizer parity vs the ACTUAL reference classes
(cosyvoice/tokenizer/tokenizer.py:241-313, imported via tests/oracles).

No real Qwen vocab ships in this image, so the fixture is a tiny HF fast
tokenizer with the same structural layout (an in-vocab <|endoftext|>). What
matters — and what these tests pin — is the ADDED special-token id
assignment: HF appends additional_special_tokens sequentially in list
order, so our lists must match the reference's token-for-token (notably the
interleaved-alphabetical ARPABET ordering) or every phoneme/paralinguistic
id silently shifts against converted checkpoints."""

import sys

import pytest

sys.path.insert(0, "tests") if "tests" not in sys.path else None

from fangyan_tts_tpu.tokenizer.tokenizer import (  # noqa: E402
    ByteFallbackTokenizer,
    QwenTTSTokenizer,
)

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    """Tiny offline HF fast tokenizer: word-level vocab + <|endoftext|>."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    d = tmp_path_factory.mktemp("qwen_fixture")
    words = ["<unk>", "<|endoftext|>", "hello", "world", "你", "好", "请", "说", "。", ",", "a", "b"]
    vocab = {w: i for i, w in enumerate(words)}
    t = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    t.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    t.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(
        '{"tokenizer_class": "PreTrainedTokenizerFast", "eos_token": "<|endoftext|>", "unk_token": "<unk>"}'
    )
    return str(d)


@pytest.fixture(scope="module")
def ref_mod():
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

    return ref_loader.load("cosyvoice.tokenizer.tokenizer")


@pytest.mark.parametrize("version", ["cosyvoice2", "cosyvoice3"])
def test_special_token_ids_match_reference(tok_dir, ref_mod, version):
    ours = QwenTTSTokenizer(tok_dir, True, version)
    ref_cls = ref_mod.CosyVoice3Tokenizer if version == "cosyvoice3" else ref_mod.CosyVoice2Tokenizer
    theirs = ref_cls(tok_dir, skip_special_tokens=True)

    ours_map = {t: ours.tokenizer.convert_tokens_to_ids(t)
                for t in ours.special_tokens["additional_special_tokens"]}
    ref_map = {t: theirs.tokenizer.convert_tokens_to_ids(t)
               for t in theirs.special_tokens["additional_special_tokens"]}
    assert ours_map == ref_map
    # the full added set is identical (no extra/missing specials)
    assert ours.tokenizer.get_added_vocab() == theirs.tokenizer.get_added_vocab()
    assert len(ours.tokenizer) == len(theirs.tokenizer)


@pytest.mark.parametrize(
    "text",
    [
        "<|endofprompt|>",
        "[laughter] hello [breath] world",
        "你 好 <|endofprompt|> 请 说 。",
        "[AA1] [ZH] [B] [UW2]",          # ARPABET incl. interleaved consonants
        "[zh] [iāng] [ǜ] [a]",           # pinyin tail tokens
        "<|endofsystem|> [mn]",
    ],
)
def test_encode_matches_reference_cv3(tok_dir, ref_mod, text):
    ours = QwenTTSTokenizer(tok_dir, True, "cosyvoice3")
    theirs = ref_mod.CosyVoice3Tokenizer(tok_dir, skip_special_tokens=True)
    assert list(ours.encode(text)) == list(theirs.encode(text))


def test_specials_roundtrip(tok_dir):
    tok = QwenTTSTokenizer(tok_dir, False, "cosyvoice3")
    for t in ("<|endofprompt|>", "[laughter]", "[AA1]", "[iāng]", "<|endofsystem|>"):
        ids = tok.encode(t)
        assert len(ids) == 1, f"{t} must encode to ONE special id, got {ids}"
        assert tok.decode(ids).strip() == t


def test_documented_arpabet_order(tok_dir):
    """The first phoneme block ids follow the reference's alphabetical
    interleaving: [AA] [AA0] [AA1] [AA2] [AE] ... [AY2] [B] [CH] [D] [DH]
    [EH] ... — NOT vowels-then-consonants."""
    tok = QwenTTSTokenizer(tok_dir, True, "cosyvoice3")
    base = tok.tokenizer.convert_tokens_to_ids("[AA]")
    seq = ["[AA]", "[AA0]", "[AA1]", "[AA2]", "[AE]"]
    for i, t in enumerate(seq):
        assert tok.tokenizer.convert_tokens_to_ids(t) == base + i
    ay2 = tok.tokenizer.convert_tokens_to_ids("[AY2]")
    assert tok.tokenizer.convert_tokens_to_ids("[B]") == ay2 + 1
    assert tok.tokenizer.convert_tokens_to_ids("[CH]") == ay2 + 2
    assert tok.tokenizer.convert_tokens_to_ids("[DH]") == ay2 + 4
    assert tok.tokenizer.convert_tokens_to_ids("[EH]") == ay2 + 5


def test_byte_fallback_warns_loudly():
    with pytest.warns(UserWarning, match="NOT id-compatible"):
        ByteFallbackTokenizer(version="cosyvoice3")


@pytest.mark.parametrize("version", ["cosyvoice2", "cosyvoice3"])
def test_parity_checker_on_assets(tok_dir, ref_mod, version):
    """tokenizer/parity.py: the shipped evidence tool must pass its
    self-check AND the reference byte-equality path on HF assets (here the
    tiny fixture vocab; on a real download, the actual Qwen vocab —
    prepare_model_dir runs it automatically)."""
    from fangyan_tts_tpu.tokenizer.parity import check_tokenizer_parity

    res = check_tokenizer_parity(tok_dir, version=version,
                                 reference_root="/root/reference/CosyVoice")
    assert res["self_check"] == "ok"
    assert res["reference"] == "ok"
    assert res["corpus_texts"] > (100 if version == "cosyvoice3" else 30)
    assert res["corpus_ids"] > (200 if version == "cosyvoice3" else 100)


def test_parity_checker_detects_reorder(tok_dir, monkeypatch):
    """A reordered special list must FAIL the checker (the failure mode the
    evidence exists to catch: silently shifted phoneme ids)."""
    import fangyan_tts_tpu.tokenizer.tokenizer as tmod
    from fangyan_tts_tpu.tokenizer.parity import check_tokenizer_parity

    swapped = dict(tmod.CV3_SPECIAL_TOKENS)
    toks = list(swapped["additional_special_tokens"])
    toks[3], toks[4] = toks[4], toks[3]  # swap [breath] and <strong>
    swapped["additional_special_tokens"] = toks
    monkeypatch.setattr(tmod, "CV3_SPECIAL_TOKENS", swapped)
    with pytest.raises(AssertionError):
        check_tokenizer_parity(tok_dir, version="cosyvoice3",
                               reference_root="/root/reference/CosyVoice")
