"""Shape/invariant tests for campplus, s3 tokenizer, conformer, tokenizers."""

import jax
import jax.numpy as jnp
import numpy as np

from fangyan_tts_tpu.models.campplus import CAMPPlus
from fangyan_tts_tpu.models.conformer import ConformerEncoder, UpsampleConformerEncoder, rel_shift
from fangyan_tts_tpu.models.s3tokenizer import S3TokenizerV3
from fangyan_tts_tpu.tokenizer import ByteFallbackTokenizer, CV3_SPECIAL_TOKENS
from fangyan_tts_tpu.utils.init import fast_init
import pytest


@pytest.mark.slow
def test_campplus_embedding_shape(rng):
    model = CAMPPlus(embedding_size=32, init_channels=16, growth=4, bn_size=4, block_layers=(2, 2, 2))
    fbank = jnp.asarray(rng.standard_normal((2, 98, 80)).astype(np.float32))
    params = fast_init(model, 0, fbank)
    emb = model.apply({"params": params}, fbank)
    assert emb.shape == (2, 32)
    assert np.isfinite(np.asarray(emb)).all()
    # time-length independence of output dim
    emb2 = model.apply({"params": params}, fbank[:, :60])
    assert emb2.shape == (2, 32)


def test_s3_tokenizer_codes_and_rate(rng):
    model = S3TokenizerV3(dim=64, heads=4, layers=2)
    mel = jnp.asarray(rng.standard_normal((2, 128, 200)).astype(np.float32))
    params = fast_init(model, 0, mel, jnp.asarray([200, 120]))
    codes, code_len = model.apply({"params": params}, mel, jnp.asarray([200, 120]))
    assert codes.shape[0] == 2
    assert codes.shape[1] == 50  # 100Hz -> 25Hz
    assert list(np.asarray(code_len)) == [50, 30]
    c = np.asarray(codes)
    assert (c >= 0).all() and (c < 3**8).all()


def test_rel_shift_matches_naive():
    """rel_shift converts (B,H,T,2T-1) 'all relative offsets' scores into
    (B,H,T,T): entry [t1, t2] must pick relative offset (T-1) - t1 + t2."""
    b, h, t = 1, 1, 4
    x = jnp.arange(2 * t - 1, dtype=jnp.float32)[None, None, None, :].repeat(t, axis=2)
    out = np.asarray(rel_shift(x))
    for t1 in range(t):
        for t2 in range(t):
            assert out[0, 0, t1, t2] == (t - 1) - t1 + t2


def test_conformer_padding_invariance(rng):
    """Valid-position outputs must not depend on padding content."""
    enc = ConformerEncoder(dim=32, heads=4, ffn_hidden=64, num_blocks=2, macaron=True, use_cnn=True)
    x1 = rng.standard_normal((1, 10, 32)).astype(np.float32)
    x2 = x1.copy()
    x2[0, 7:] = 99.0  # garbage in padding
    lens = jnp.asarray([7])
    params = fast_init(enc, 0, jnp.asarray(x1), lens)
    y1, _ = enc.apply({"params": params}, jnp.asarray(x1), lens)
    y2, _ = enc.apply({"params": params}, jnp.asarray(x2), lens)
    np.testing.assert_allclose(np.asarray(y1[0, :7]), np.asarray(y2[0, :7]), atol=1e-4)


def test_upsample_encoder_doubles_length(rng):
    enc = UpsampleConformerEncoder(dim=32, heads=4, ffn_hidden=64, num_blocks=1, num_up_blocks=1)
    x = jnp.asarray(rng.standard_normal((1, 8, 32)).astype(np.float32))
    params = fast_init(enc, 0, x, jnp.asarray([8]))
    y, lens = enc.apply({"params": params}, x, jnp.asarray([8]))
    assert y.shape[1] == 16 and int(lens[0]) == 16


def test_byte_tokenizer_roundtrip_and_specials():
    tok = ByteFallbackTokenizer()
    text = "你好[laughter]world<|endofprompt|>"
    ids = tok.encode(text)
    assert tok.special_to_id["<|endofprompt|>"] in ids
    assert tok.special_to_id["[laughter]"] in ids
    out = tok.decode(ids)
    assert out == "你好world"  # specials skipped by default
    tok2 = ByteFallbackTokenizer(skip_special_tokens=False)
    assert tok2.decode(tok2.encode(text)) == text


def test_cv3_special_token_set_size():
    # paralinguistic(19) + endofsystem + ARPABET(60+24=84) + pinyin(193)
    extra = CV3_SPECIAL_TOKENS["additional_special_tokens"]
    assert "<|endofsystem|>" in extra
    assert "[AA0]" in extra and "[zh]" in extra and "[ǜ]" in extra
    assert len(extra) == len(set(extra))
