"""SineGen variant parity vs the ACTUAL reference source modules
(hifigan/generator.py SineGen :125-190, SineGen2 :192-318).

Noise is suppressed (noise_std=0, all-voiced f0) so the comparison is the
deterministic sine path. The per-harmonic initial phase is random in the
reference (torch.rand at call/construction time) but provably cancels
through the linear 1/upsample downsample (output coords fall strictly
inside each frame, excluding sample 0), so all harmonics are comparable
for SineGen2; for SineGen (v1) only the fundamental (initial phase pinned
to 0 on both sides) is deterministic."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "tests") if "tests" not in sys.path else None

import jax.numpy as jnp  # noqa: E402

from fangyan_tts_tpu.config import HiFTConfig  # noqa: E402
from fangyan_tts_tpu.models.hift import SourceModule  # noqa: E402

from oracles import ref_loader  # noqa: E402


def _f0(n, sr_frames=True, seed=0):
    rng = np.random.default_rng(seed)
    return (120.0 + 80.0 * rng.random(n)).astype(np.float32)


def test_sinegen2_causal_parity():
    gen_mod = ref_loader.load("cosyvoice.hifigan.generator")
    up = 480
    ref = gen_mod.SineGen2(24000, upsample_scale=up, harmonic_num=8, sine_amp=0.1,
                           noise_std=0.0, voiced_threshold=0, causal=True).eval()
    n_frames = 40
    f0 = _f0(n_frames)
    f0_up = np.repeat(f0, up)[None, :, None]  # nearest upsample, like HiFT's f0_upsamp
    with torch.no_grad():
        ref_sines, uv, _ = ref(torch.from_numpy(f0_up))
    ref_sines = ref_sines.numpy()[0]

    cfg = HiFTConfig(nsf_sigma=0.0, nsf_voiced_threshold=0, stream_noise_seconds=1)
    m = SourceModule(cfg, variant="sinegen2_causal")
    # bypass l_linear: rebuild the sine tensor with the module's math
    import jax

    params = m.init(jax.random.PRNGKey(0), jnp.asarray(f0[None]))["params"]
    rad = m.rad_frames(jnp.asarray(f0[None]), first=True)
    phase = jnp.cumsum(rad, axis=1) * 2.0 * np.pi
    from fangyan_tts_tpu.ops.convs import upsample_nearest

    sines = np.asarray(jnp.sin(upsample_nearest(phase * up, up)))[0] * cfg.nsf_alpha
    np.testing.assert_allclose(sines, ref_sines, atol=2e-3)


def test_sinegen2_noncausal_parity_fundamental():
    gen_mod = ref_loader.load("cosyvoice.hifigan.generator")
    up = 480
    ref = gen_mod.SineGen2(24000, upsample_scale=up, harmonic_num=8, sine_amp=0.1,
                           noise_std=0.0, voiced_threshold=0, causal=False).eval()
    n_frames = 40
    f0 = _f0(n_frames, seed=1)
    f0_up = np.repeat(f0, up)[None, :, None]
    with torch.no_grad():
        ref_sines, _, _ = ref(torch.from_numpy(f0_up))
    ref_sines = ref_sines.numpy()[0]

    from fangyan_tts_tpu.ops.convs import upsample_linear

    cfg = HiFTConfig(nsf_sigma=0.0, nsf_voiced_threshold=0, stream_noise_seconds=1)
    m = SourceModule(cfg, variant="sinegen2")
    rad = m.rad_frames(jnp.asarray(f0[None]), first=True)
    phase = jnp.cumsum(rad, axis=1) * 2.0 * np.pi
    sines = np.asarray(jnp.sin(upsample_linear(phase * up, up)))[0] * cfg.nsf_alpha
    np.testing.assert_allclose(sines, ref_sines, atol=2e-3)


def test_sinegen1_parity_fundamental():
    gen_mod = ref_loader.load("cosyvoice.hifigan.generator")
    ref = gen_mod.SineGen(22050, harmonic_num=8, sine_amp=0.1, noise_std=0.0,
                          voiced_threshold=0).eval()
    up = 256
    n_frames = 30
    f0 = _f0(n_frames, seed=2)
    f0_up = np.repeat(f0, up)[None, :, None]
    with torch.no_grad():
        ref_sines, _, _ = ref(torch.from_numpy(f0_up))
    ref_fund = ref_sines.numpy()[0, :, 0]  # fundamental: initial phase 0 on both sides

    cfg = HiFTConfig(sampling_rate=22050, nsf_sigma=0.0, nsf_voiced_threshold=0,
                     upsample_rates=(8, 8), istft_n_fft=16, istft_hop_len=4,
                     stream_noise_seconds=1)
    from fangyan_tts_tpu.ops.convs import upsample_nearest

    f0_up_j = upsample_nearest(jnp.asarray(f0[None])[..., None], up)
    theta = 2.0 * np.pi * jnp.mod(jnp.cumsum(f0_up_j[..., 0] / 22050.0, axis=1), 1.0)
    ours = np.asarray(jnp.sin(theta))[0] * cfg.nsf_alpha
    np.testing.assert_allclose(ours, ref_fund, atol=2e-3)
