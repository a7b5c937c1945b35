"""CausalHiFT parity vs the ACTUAL reference source
(cosyvoice/hifigan/generator.py:572-726, f0_predictor.py:62-108): the causal
f0 predictor (finalize and streaming-context paths) and the full decode
stack (causal convs, source fusion, snake resblocks, iSTFT) with a shared
controlled source signal. The NSF source noise is intentionally a different
deterministic buffer (models/hift.py docstring), so full-waveform
bit-parity is out of scope; everything deterministic is exact here."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None

import jax.numpy as jnp  # noqa: E402

from fangyan_tts_tpu.config import HiFTConfig  # noqa: E402
from fangyan_tts_tpu.models.convert import hift_params_from_reference  # noqa: E402
from fangyan_tts_tpu.models.hift import CausalHiFT  # noqa: E402

from oracles import ref_loader  # noqa: E402

CFG = HiFTConfig(base_channels=32, f0_cond_channels=16)


@pytest.fixture(scope="module")
def ref_hift():
    gen_mod = ref_loader.load("cosyvoice.hifigan.generator")
    f0_mod = ref_loader.load("cosyvoice.hifigan.f0_predictor")
    g = torch.Generator().manual_seed(53)
    f0p = f0_mod.CausalConvRNNF0Predictor(num_class=1, in_channels=80, cond_channels=CFG.f0_cond_channels)
    m = gen_mod.CausalHiFTGenerator(
        in_channels=80, base_channels=CFG.base_channels, nb_harmonics=CFG.nb_harmonics,
        sampling_rate=CFG.sampling_rate, nsf_alpha=CFG.nsf_alpha, nsf_sigma=CFG.nsf_sigma,
        nsf_voiced_threshold=CFG.nsf_voiced_threshold,
        upsample_rates=list(CFG.upsample_rates), upsample_kernel_sizes=list(CFG.upsample_kernel_sizes),
        istft_params={"n_fft": CFG.istft_n_fft, "hop_len": CFG.istft_hop_len},
        resblock_kernel_sizes=list(CFG.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in CFG.resblock_dilation_sizes],
        source_resblock_kernel_sizes=list(CFG.source_resblock_kernel_sizes),
        source_resblock_dilation_sizes=[list(d) for d in CFG.source_resblock_dilation_sizes],
        lrelu_slope=CFG.lrelu_slope, audio_limit=CFG.audio_limit,
        conv_pre_look_right=CFG.conv_pre_look_right, f0_predictor=f0p,
    ).eval()
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    return m


@pytest.fixture(scope="module")
def jx_and_params(ref_hift):
    params = hift_params_from_reference(
        {k: v for k, v in ref_hift.state_dict().items()},
        upsample_rates=CFG.upsample_rates,
    )
    return CausalHiFT(CFG), params


def test_causal_f0_predictor_parity(ref_hift, jx_and_params, rng):
    jx, params = jx_and_params
    mel = rng.standard_normal((1, 80, 20)).astype(np.float32)
    with torch.no_grad():
        ref_full = ref_hift.f0_predictor(torch.from_numpy(mel), finalize=True).numpy()
        ref_stream = ref_hift.f0_predictor(torch.from_numpy(mel), finalize=False).numpy()

    mel_j = jnp.asarray(mel.transpose(0, 2, 1))
    got_full = jx.apply({"params": params}, mel_j, method=lambda m, x: m.f0_predictor(x))
    np.testing.assert_allclose(np.asarray(got_full), ref_full, atol=1e-5, rtol=1e-4)

    got_stream = jx.apply(
        {"params": params}, mel_j,
        method=lambda m, x: m.f0_predictor(x[:, :-3], context=x[:, -3:]),
    )
    np.testing.assert_allclose(np.asarray(got_stream), ref_stream, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("finalize", [True, False])
def test_decode_parity_with_shared_source(ref_hift, jx_and_params, rng, finalize):
    jx, params = jx_and_params
    t_mel = 20
    mel = rng.standard_normal((1, 80, t_mel)).astype(np.float32) * 0.5
    s = (rng.standard_normal((1, 1, t_mel * 480)).astype(np.float32) * 0.05)
    with torch.no_grad():
        ref = ref_hift.decode(torch.from_numpy(mel), torch.from_numpy(s), finalize=finalize).numpy()

    got = jx.apply(
        {"params": params},
        jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray(s.transpose(0, 2, 1)),
        finalize, method=lambda m, x, src, fin: m.decode(x, src, finalize=fin),
    )
    got = np.asarray(got)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-3)
