"""UpsampleConformerEncoder parity vs the ACTUAL reference source
(cosyvoice/transformer/upsample_encoder.py:106-321) in the CosyVoice2 flow
configuration (linear input, espnet rel-pos attention, no macaron/cnn —
conf/cosyvoice2.yaml:48-63): offline, streaming chunk masks, padded batch,
and the pre-lookahead context path."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None

import jax.numpy as jnp  # noqa: E402

from fangyan_tts_tpu.models.conformer import UpsampleConformerEncoder  # noqa: E402
from fangyan_tts_tpu.models.convert import upsample_encoder_params_from_reference  # noqa: E402

from oracles import ref_loader  # noqa: E402

# the reference hardcodes 512-ch pre_lookahead/up_layer and 4 up_blocks
IN_DIM, DIM, HEADS, FFN, NB = 512, 512, 8, 64, 1  # up_embed requires input_size == 512 too


@pytest.fixture(scope="module")
def ref_enc():
    ue = ref_loader.load("cosyvoice.transformer.upsample_encoder")
    m = ue.UpsampleConformerEncoder(
        input_size=IN_DIM, output_size=DIM, attention_heads=HEADS, linear_units=FFN,
        num_blocks=NB, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, normalize_before=True, input_layer="linear",
        pos_enc_layer_type="rel_pos_espnet", selfattention_layer_type="rel_selfattn",
        use_cnn_module=False, macaron_style=False, static_chunk_size=5,
    ).eval()
    # reference hardcodes 4 up_blocks? introspect actual count
    g = torch.Generator().manual_seed(71)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    return m


def _convert(m):
    n_up = len(m.up_encoders)
    params = upsample_encoder_params_from_reference(
        {k: v for k, v in m.state_dict().items()}, num_blocks=len(m.encoders), num_up_blocks=n_up)
    jx = UpsampleConformerEncoder(dim=DIM, heads=HEADS, ffn_hidden=FFN,
                                  num_blocks=len(m.encoders), num_up_blocks=n_up,
                                  static_chunk_size=5)
    return jx, params


@pytest.mark.parametrize("streaming", [False, True])
def test_upsample_encoder_parity(ref_enc, rng, streaming):
    jx, params = _convert(ref_enc)
    b, t = 2, 11
    xs = rng.standard_normal((b, t, IN_DIM)).astype(np.float32)
    lens = np.asarray([t, t - 4], np.int32)
    with torch.no_grad():
        ref, _ = ref_enc(torch.from_numpy(xs), torch.from_numpy(lens).long(), streaming=streaming)
    ref = ref.numpy()

    got, out_lens = jx.apply({"params": params}, jnp.asarray(xs), jnp.asarray(lens), streaming=streaming)
    got = np.asarray(got)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(out_lens), lens * 2)
    for bi, n in enumerate(lens * 2):
        np.testing.assert_allclose(got[bi, :n], ref[bi, :n], atol=3e-5, rtol=1e-3)


def test_upsample_encoder_context_path(ref_enc, rng):
    """Streaming non-finalize: the 3 lookahead tokens ride in as context
    (upsample_encoder.py:252-256)."""
    jx, params = _convert(ref_enc)
    t, ctx_len = 8, 3
    xs = rng.standard_normal((1, t, IN_DIM)).astype(np.float32)
    ctx = rng.standard_normal((1, ctx_len, IN_DIM)).astype(np.float32)
    with torch.no_grad():
        ref, _ = ref_enc(torch.from_numpy(xs), torch.tensor([t]),
                         context=torch.from_numpy(ctx), streaming=True)
    got, _ = jx.apply({"params": params}, jnp.asarray(xs), jnp.asarray([t], jnp.int32),
                      context=jnp.asarray(ctx), streaming=True)
    np.testing.assert_allclose(np.asarray(got)[0], ref.numpy()[0], atol=3e-5, rtol=1e-3)
