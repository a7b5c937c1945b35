"""S3 tokenizer parity: JAX S3TokenizerV3 + converted weights vs the torch
oracle of the public S3Tokenizer v2 design (FSMN attention + FSQ) that the
reference's speech_tokenizer ONNX artifacts implement
(tools/extract_speech_token.py:38-48). Tiny dims for speed."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from fangyan_tts_tpu.models.convert import s3_params_from_onnx, s3_params_from_torch  # noqa: E402
from fangyan_tts_tpu.models.s3tokenizer import S3TokenizerV3  # noqa: E402

from oracles.s3tokenizer_torch import S3TokenizerV2 as TorchS3  # noqa: E402

TINY = dict(n_mels=16, n_state=32, n_head=4, n_layer=2, kernel_size=7)


def _tiny_oracle(seed=11):
    gen = torch.Generator().manual_seed(seed)
    m = TorchS3(**TINY).eval()
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.2)
    return m


def _jax_model():
    return S3TokenizerV3(dim=TINY["n_state"], heads=TINY["n_head"], layers=TINY["n_layer"],
                         n_mels=TINY["n_mels"], fsmn_kernel=TINY["kernel_size"])


def test_s3_hidden_matches_torch_oracle(rng):
    m = _tiny_oracle()
    mel = rng.standard_normal((2, TINY["n_mels"], 40)).astype(np.float32)
    mel_len = np.asarray([40, 25], np.int64)
    with torch.no_grad():
        ref_h, ref_len = m.hidden(torch.from_numpy(mel), torch.from_numpy(mel_len))
        ref_codes, _ = m.quantize(torch.from_numpy(mel), torch.from_numpy(mel_len))

    params, hyper = s3_params_from_torch({k: v for k, v in m.state_dict().items()})
    assert hyper == {"dim": 32, "n_mels": 16, "layers": 2, "fsmn_kernel": 7}
    codes, code_len = _jax_model().apply(
        {"params": params}, jnp.asarray(mel), jnp.asarray(mel_len, jnp.int32))

    np.testing.assert_array_equal(np.asarray(code_len), ref_len.numpy())
    # compare codes only on valid frames
    for b in range(2):
        n = int(ref_len[b])
        np.testing.assert_array_equal(np.asarray(codes)[b, :n], ref_codes.numpy()[b, :n])


def test_s3_padding_invariance(rng):
    """Tokens for an utterance must not change when batched with longer
    padding (the masking the per-utt ORT loop never needed)."""
    m = _tiny_oracle(seed=13)
    params, _ = s3_params_from_torch({k: v for k, v in m.state_dict().items()})
    jx = _jax_model()
    mel = rng.standard_normal((1, TINY["n_mels"], 28)).astype(np.float32)
    codes_a, len_a = jx.apply({"params": params}, jnp.asarray(mel), jnp.asarray([28], jnp.int32))
    padded = np.concatenate([mel, np.zeros((1, TINY["n_mels"], 36), np.float32)], axis=2)
    codes_b, len_b = jx.apply({"params": params}, jnp.asarray(padded), jnp.asarray([28], jnp.int32))
    n = int(np.asarray(len_a)[0])
    assert int(np.asarray(len_b)[0]) == n
    np.testing.assert_array_equal(np.asarray(codes_a)[0, :n], np.asarray(codes_b)[0, :n])


def test_s3_onnx_roundtrip(tmp_path, rng):
    from fangyan_tts_tpu.data.onnx_proto import save_model

    m = _tiny_oracle(seed=17)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    path = tmp_path / "speech_tokenizer_v3.onnx"
    save_model(str(path), nodes=[("Identity", ["feats"], ["indices"], None)],
               initializers=sd, inputs=["feats", "feats_length"], outputs=["indices"])
    params, hyper = s3_params_from_onnx(str(path))
    assert hyper["layers"] == 2

    mel = rng.standard_normal((1, TINY["n_mels"], 32)).astype(np.float32)
    with torch.no_grad():
        ref_codes, ref_len = m.quantize(torch.from_numpy(mel), torch.tensor([32]))
    codes, code_len = _jax_model().apply({"params": params}, jnp.asarray(mel), jnp.asarray([32], jnp.int32))
    n = int(ref_len[0])
    np.testing.assert_array_equal(np.asarray(codes)[0, :n], ref_codes.numpy()[0, :n])


def test_s3_full_size_param_count():
    import jax

    jx = S3TokenizerV3()
    params = jax.eval_shape(
        lambda: jx.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 8)), jnp.asarray([8], jnp.int32))
    )["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # 6 x 1280-dim FSMN blocks + convs + FSQ head: ~130M params
    assert 100_000_000 < n < 160_000_000, n
