"""Streaming conformer forward_chunk parity.

- vs the ACTUAL reference: wenet BaseEncoder.forward_chunk_by_chunk
  (transformer/encoder.py:183-337) with att_cache/cnn_cache, causal convs,
  espnet rel-pos — weights converted via models/convert.py.
- internal consistency: chunked decode with a full-size cache must equal
  the full forward with the streaming chunk mask.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "tests") if "tests" not in sys.path else None

import jax.numpy as jnp  # noqa: E402

from fangyan_tts_tpu.models.conformer import ConformerEncoder  # noqa: E402
from fangyan_tts_tpu.models.convert import conformer_encoder_params_from_reference  # noqa: E402

from oracles import ref_loader  # noqa: E402


def _seed_params(m, seed, scale=0.1):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    return m


@pytest.fixture(scope="module")
def ref_encoder():
    enc_mod = ref_loader.load("cosyvoice.transformer.encoder")
    enc = enc_mod.ConformerEncoder(
        input_size=24,
        output_size=32,
        attention_heads=2,
        linear_units=48,
        num_blocks=2,
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
        attention_dropout_rate=0.0,
        input_layer="linear",
        pos_enc_layer_type="rel_pos_espnet",
        normalize_before=True,
        static_chunk_size=4,
        use_cnn_module=True,
        cnn_module_kernel=5,
        causal=True,
        macaron_style=True,
    )
    return _seed_params(enc.eval(), 5)


@pytest.fixture(scope="module")
def our_encoder(ref_encoder):
    enc = ConformerEncoder(
        dim=32, heads=2, ffn_hidden=48, num_blocks=2, macaron=True,
        use_cnn=True, cnn_kernel=5, cnn_causal=True, cnn_norm="batch_norm",
    )
    params = conformer_encoder_params_from_reference(
        ref_encoder.state_dict(), num_blocks=2, macaron=True, use_cnn=True, cnn_norm="batch_norm"
    )
    return enc, params


@pytest.mark.slow
def test_forward_chunk_matches_reference(ref_encoder, our_encoder):
    """Oracle runs with an UNBOUNDED cache (num_decoding_left_chunks=-1):
    the reference's espnet-rel-pos chunk path is only well-defined there —
    with a bounded cache its position_encoding slice grows with
    offset-cache_t and forward() crashes on a shape mismatch
    (embedding.py:292-296 + attention.py:327). Our fixed-window cache with
    cache_t >= sequence length is equivalent."""
    enc, params = our_encoder
    rng = np.random.default_rng(0)
    t_total, chunk = 16, 4
    xs = rng.standard_normal((1, t_total, 24)).astype(np.float32) * 0.5

    with torch.no_grad():
        ref_ys, _ = ref_encoder.forward_chunk_by_chunk(
            torch.from_numpy(xs), decoding_chunk_size=chunk, num_decoding_left_chunks=-1
        )
    ref_ys = ref_ys.numpy()

    att_k, att_v, cnn_c = enc.init_chunk_state(1, t_total)
    outs = []
    n_valid = 0
    for i in range(0, t_total, chunk):
        ys, att_k, att_v, cnn_c = enc.apply(
            {"params": params}, jnp.asarray(xs[:, i : i + chunk]), att_k, att_v, cnn_c,
            jnp.asarray(n_valid, jnp.int32), method=ConformerEncoder.forward_chunk,
        )
        outs.append(np.asarray(ys))
        n_valid += chunk
    ours = np.concatenate(outs, axis=1)

    np.testing.assert_allclose(ours, ref_ys, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_forward_chunk_matches_full_forward(our_encoder):
    """Full-size cache (>= sequence) == full forward with the chunk-causal
    streaming mask — validates masks, rel-pos slicing and cache rolling."""
    enc, params = our_encoder
    rng = np.random.default_rng(1)
    t_total, chunk = 20, 4
    xs = rng.standard_normal((1, t_total, 24)).astype(np.float32) * 0.5

    full, _ = enc.apply(
        {"params": params}, jnp.asarray(xs), jnp.asarray([t_total]),
        streaming=True, static_chunk_size=chunk,
    )

    att_k, att_v, cnn_c = enc.init_chunk_state(1, t_total)  # full left context
    outs = []
    n_valid = 0
    for i in range(0, t_total, chunk):
        ys, att_k, att_v, cnn_c = enc.apply(
            {"params": params}, jnp.asarray(xs[:, i : i + chunk]), att_k, att_v, cnn_c,
            jnp.asarray(n_valid, jnp.int32), method=ConformerEncoder.forward_chunk,
        )
        outs.append(np.asarray(ys))
        n_valid += chunk
    ours = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(ours, np.asarray(full), atol=1e-5)
