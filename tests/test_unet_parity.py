"""U-Net CFM estimator parity vs the ACTUAL reference source
(cosyvoice/flow/decoder.py:88-494): ConditionalDecoder (v1) and
CausalConditionalDecoder (v2 streaming), offline + chunked streaming, with
a real stride-2 level (channels [256,256]-style config shrunk)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None

import jax.numpy as jnp  # noqa: E402

from fangyan_tts_tpu.models.convert import unet_estimator_params  # noqa: E402
from fangyan_tts_tpu.models.unet_decoder import ConditionalDecoder  # noqa: E402

from oracles import ref_loader  # noqa: E402

MEL, SPK = 16, 8
CHANNELS = (32, 32)
N_BLOCKS, N_MID, HEADS, HEAD_DIM = 2, 2, 2, 16
IN_CH = MEL * 3 + SPK  # x + mu + spks + cond packed


def _build_ref(causal: bool, seed: int):
    dec = ref_loader.load("cosyvoice.flow.decoder")
    cls = dec.CausalConditionalDecoder if causal else dec.ConditionalDecoder
    kw = dict(in_channels=IN_CH, out_channels=MEL, channels=CHANNELS, dropout=0.0,
              attention_head_dim=HEAD_DIM, n_blocks=N_BLOCKS, num_mid_blocks=N_MID,
              num_heads=HEADS, act_fn="gelu")
    if causal:
        kw.update(static_chunk_size=4, num_decoding_left_chunks=-1)
    m = cls(**kw).eval()
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    return m


def _jax(causal: bool):
    return ConditionalDecoder(in_channels=IN_CH, out_channels=MEL, channels=CHANNELS,
                              n_blocks=N_BLOCKS, num_mid_blocks=N_MID, num_heads=HEADS,
                              attention_head_dim=HEAD_DIM, causal=causal, static_chunk_size=4)


@pytest.mark.parametrize("causal,streaming", [(False, False), (True, False), (True, True)])
def test_unet_matches_reference(rng, causal, streaming):
    m = _build_ref(causal, seed=83 + causal)
    t_len = 12
    x = rng.standard_normal((1, MEL, t_len)).astype(np.float32)
    mu = rng.standard_normal((1, MEL, t_len)).astype(np.float32)
    cond = rng.standard_normal((1, MEL, t_len)).astype(np.float32)
    spks = rng.standard_normal((1, SPK)).astype(np.float32)
    tt = rng.random((1,)).astype(np.float32)
    mask = torch.ones(1, 1, t_len)

    with torch.no_grad():
        ref = m(torch.from_numpy(x), mask, torch.from_numpy(mu), torch.from_numpy(tt),
                spks=torch.from_numpy(spks), cond=torch.from_numpy(cond), streaming=streaming)
    ref = ref.numpy()

    params = unet_estimator_params({k: v for k, v in m.state_dict().items()},
                                   channels=CHANNELS, n_blocks=N_BLOCKS,
                                   num_mid_blocks=N_MID, causal=causal)
    got = _jax(causal).apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mu.transpose(0, 2, 1)),
        jnp.asarray(tt), jnp.asarray(spks), jnp.asarray(cond.transpose(0, 2, 1)),
        jnp.asarray([t_len], jnp.int32), streaming=streaming,
    )
    got = np.asarray(got).transpose(0, 2, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-3)
