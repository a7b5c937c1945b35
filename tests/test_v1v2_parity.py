"""CosyVoice1/2 model-family parity vs the ACTUAL reference source:

- InterpolateRegulator forward + the head/mid/tail inference split
  (flow/length_regulator.py:21-70)
- MaskedDiffWithXvec.inference with the z/mu flow cache across two chunks
  (flow/flow.py:102-145 + flow_matching.py:36-71)
- TransformerLM training loss (llm/llm.py:99-147)
- Qwen2LM prefill logits (llm/llm.py:261-480) via Qwen2LMV2
- non-causal HiFTGenerator decode with a shared source, v1 (22.05 kHz) and
  v2 (24 kHz) configs (hifigan/generator.py:378-569)
"""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fangyan_tts_tpu.config import HiFTConfig  # noqa: E402
from fangyan_tts_tpu.models.convert import (  # noqa: E402
    flow_v1_params_from_reference,
    hift_nc_params_from_reference,
    llm_v1_params_from_reference,
    llm_v2_params_from_reference,
    _regulator_params,
)
from fangyan_tts_tpu.models.flow_xvec import (  # noqa: E402
    InterpolateRegulator,
    MaskedDiffWithXvec,
    xvec_flow_inference_v1,
)
from fangyan_tts_tpu.models.hift import HiFT  # noqa: E402
from fangyan_tts_tpu.models.llm_v1 import TransformerLM  # noqa: E402

from oracles import ref_loader  # noqa: E402


def _seed_params(m, seed, scale=0.1):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    return m


# ---------------------------------------------------------------- regulator


@pytest.fixture(scope="module")
def ref_regulator():
    lr = ref_loader.load("cosyvoice.flow.length_regulator")
    return _seed_params(lr.InterpolateRegulator(channels=80, sampling_ratios=[1, 1, 1, 1]).eval(), 11)


def _reg_params(ref):
    return _regulator_params({k: v for k, v in ref.state_dict().items()}, "")


def test_regulator_forward_parity(ref_regulator, rng):
    x = rng.standard_normal((1, 17, 80)).astype(np.float32)
    with torch.no_grad():
        ref, _ = ref_regulator(torch.from_numpy(x), ylens=torch.tensor([29]))
    jx = InterpolateRegulator(80)
    got = jx.apply({"params": _reg_params(ref_regulator)}, jnp.asarray(x), 29)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("tok2", [50, 30])  # >40 exercises head/mid/tail
def test_regulator_inference_parity(ref_regulator, rng, tok2):
    tok1, mel1 = 8, 13
    mel2 = int(tok2 / 50 * 22050 / 256)
    h = rng.standard_normal((1, tok1 + tok2, 80)).astype(np.float32)
    with torch.no_grad():
        ref, _ = ref_regulator.inference(
            torch.from_numpy(h[:, :tok1]), torch.from_numpy(h[:, tok1:]), mel1, mel2, 50
        )
    out_len = 128
    jx = InterpolateRegulator(80)
    got = jx.apply(
        {"params": _reg_params(ref_regulator)},
        jnp.asarray(np.pad(h, ((0, 0), (0, 4), (0, 0)))),  # padded bucket
        tok1, jnp.asarray(tok2), mel1, jnp.asarray(mel2), out_len,
        method=InterpolateRegulator.inference,
    )
    np.testing.assert_allclose(np.asarray(got)[:, : mel1 + mel2], ref.numpy(), atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------- v1 flow

V1_VOCAB, V1_IN = 60, 32


@pytest.fixture(scope="module")
def ref_v1_flow():
    enc_mod = ref_loader.load("cosyvoice.transformer.encoder")
    lr_mod = ref_loader.load("cosyvoice.flow.length_regulator")
    dec_mod = ref_loader.load("cosyvoice.flow.decoder")
    fm_mod = ref_loader.load("cosyvoice.flow.flow_matching")
    flow_mod = ref_loader.load("cosyvoice.flow.flow")

    enc = enc_mod.ConformerEncoder(
        input_size=V1_IN, output_size=V1_IN, attention_heads=2, linear_units=24,
        num_blocks=1, dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        normalize_before=True, input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
        selfattention_layer_type="rel_selfattn", use_cnn_module=False, macaron_style=False,
    )
    reg = lr_mod.InterpolateRegulator(channels=80, sampling_ratios=[1, 1, 1, 1])
    est = dec_mod.ConditionalDecoder(
        in_channels=320, out_channels=80, channels=[16, 16], dropout=0.0,
        attention_head_dim=8, n_blocks=1, num_mid_blocks=1, num_heads=2, act_fn="gelu",
    )
    cfm_params = SimpleNamespace(sigma_min=1e-6, solver="euler", t_scheduler="cosine",
                                 training_cfg_rate=0.2, inference_cfg_rate=0.7)
    cfm = fm_mod.ConditionalCFM(in_channels=240, cfm_params=cfm_params, n_spks=1, spk_emb_dim=80, estimator=est)
    flow = flow_mod.MaskedDiffWithXvec(
        input_size=V1_IN, output_size=80, spk_embed_dim=192, output_type="mel",
        vocab_size=V1_VOCAB, input_frame_rate=50, only_mask_loss=True,
        encoder=enc, length_regulator=reg, decoder=cfm,
    ).eval()
    return _seed_params(flow, 23)


def _jx_v1_flow(ref):
    params = flow_v1_params_from_reference(
        {k: v for k, v in ref.state_dict().items()}, num_blocks=1, est_levels=2, est_blocks=1, est_mid=1
    )
    jx = MaskedDiffWithXvec(
        vocab_size=V1_VOCAB, input_size=V1_IN, decoder_channels=(16, 16),
        num_mid_blocks=1, n_blocks=1, num_heads=2, attention_head_dim=8,
        enc_heads=2, enc_ffn=24, enc_blocks=1, n_timesteps=10,
    )
    return jx, params


@pytest.mark.slow
def test_v1_flow_inference_two_chunk_cache_parity(ref_v1_flow, rng, monkeypatch):
    """Two streaming chunks: the second call must splice the cached z/mu for
    the prompt + 34-frame overlap, matching the reference flow cache."""
    jx, params = _jx_v1_flow(ref_v1_flow)
    tok1, mel1 = 6, 10
    prompt_tok = rng.integers(0, V1_VOCAB, (1, tok1)).astype(np.int64)
    prompt_feat = (rng.standard_normal((1, mel1, 80)) * 0.3).astype(np.float32)
    emb = rng.standard_normal((1, 192)).astype(np.float32)

    # one deterministic noise pool shared by both sides (the reference draws
    # torch.randn_like(mu); patch it)
    noise_pool = (rng.standard_normal((1, 80, 512)) * 1.0).astype(np.float32)
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.from_numpy(noise_pool[:, :, : x.shape[2]]).clone())

    cache_t = torch.zeros(1, 80, 0, 2)
    cache_j = None
    out_len = 192
    for tok2 in (50, 44):  # chunk sizes incl. the 20-token overlap
        gen_tok = rng.integers(0, V1_VOCAB, (1, tok2)).astype(np.int64)
        mel2 = int(tok2 / 50 * 22050 / 256)
        with torch.no_grad():
            ref_mel, cache_t = ref_v1_flow.inference(
                token=torch.from_numpy(gen_tok).int(), token_len=torch.tensor([tok2], dtype=torch.int32),
                prompt_token=torch.from_numpy(prompt_tok).int(), prompt_token_len=torch.tensor([tok1], dtype=torch.int32),
                prompt_feat=torch.from_numpy(prompt_feat), prompt_feat_len=torch.tensor([mel1], dtype=torch.int32),
                embedding=torch.from_numpy(emb), flow_cache=cache_t,
            )
        full = np.zeros((1, 64), np.int32)
        full[0, :tok1] = prompt_tok[0]
        full[0, tok1 : tok1 + tok2] = gen_tok[0]
        got, cache_j = xvec_flow_inference_v1(
            jx, params, jnp.asarray(full), tok1, jnp.asarray(tok2),
            jnp.asarray(prompt_feat), jnp.asarray(emb), jnp.asarray(mel2),
            jax.random.PRNGKey(0), cache=cache_j, out_len=out_len,
            noise=jnp.asarray(noise_pool.transpose(0, 2, 1)),
        )
        got_gen = np.asarray(got)[:, mel1 : mel1 + mel2].transpose(0, 2, 1)
        np.testing.assert_allclose(got_gen, ref_mel.numpy(), atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------- v1 LM


def test_v1_transformer_lm_loss_parity(rng):
    enc_mod = ref_loader.load("cosyvoice.transformer.encoder")
    llm_mod = ref_loader.load("cosyvoice.llm.llm")
    text_enc = enc_mod.ConformerEncoder(
        input_size=16, output_size=32, attention_heads=2, linear_units=24, num_blocks=1,
        dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        normalize_before=True, input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
        selfattention_layer_type="rel_selfattn", use_cnn_module=False, macaron_style=False,
        static_chunk_size=1,
    )
    lm_enc = enc_mod.TransformerEncoder(
        input_size=32, output_size=32, attention_heads=2, linear_units=24, num_blocks=2,
        dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="linear_legacy", pos_enc_layer_type="rel_pos_espnet",
        selfattention_layer_type="rel_selfattn", static_chunk_size=1,
    )
    ref = llm_mod.TransformerLM(
        text_encoder_input_size=16, llm_input_size=32, llm_output_size=32,
        text_token_size=40, speech_token_size=50, text_encoder=text_enc, llm=lm_enc,
        sampling=None, length_normalized_loss=True, lsm_weight=0.0, spk_embed_dim=192,
    ).eval()
    _seed_params(ref, 31)

    text = rng.integers(0, 40, (2, 7)).astype(np.int64)
    tlen = np.asarray([7, 5], np.int32)
    speech = rng.integers(0, 50, (2, 11)).astype(np.int64)
    slen = np.asarray([11, 9], np.int32)
    emb = rng.standard_normal((2, 192)).astype(np.float32)
    batch = {
        "text_token": torch.from_numpy(text).int(), "text_token_len": torch.from_numpy(tlen),
        "speech_token": torch.from_numpy(speech).int(), "speech_token_len": torch.from_numpy(slen),
        "embedding": torch.from_numpy(emb),
    }
    with torch.no_grad():
        out = ref(batch, torch.device("cpu"))

    jx = TransformerLM(
        text_token_size=40, speech_token_size=50, text_encoder_input_size=16,
        llm_input_size=32, llm_output_size=32, text_enc_blocks=1, llm_blocks=2, heads=2, ffn=24,
    )
    params = llm_v1_params_from_reference(
        {k: v for k, v in ref.state_dict().items()}, text_enc_blocks=1, llm_blocks=2
    )
    loss, acc = jx.apply(
        {"params": params}, jnp.asarray(text, jnp.int32), jnp.asarray(tlen),
        jnp.asarray(speech, jnp.int32), jnp.asarray(slen), jnp.asarray(emb),
    )
    np.testing.assert_allclose(float(loss), float(out["loss"]), atol=3e-5, rtol=1e-4)


# ---------------------------------------------------------------- v2 LM


def test_v2_qwen2lm_prefill_logits_parity(rng, tmp_path):
    transformers = pytest.importorskip("transformers")
    llm_mod = ref_loader.load("cosyvoice.llm.llm")
    hf_cfg = transformers.Qwen2Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, vocab_size=120, rope_theta=10000.0, attn_implementation="eager",
    )
    torch.manual_seed(7)
    hf = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path / "qwen")

    ref = llm_mod.Qwen2LM(
        llm_input_size=64, llm_output_size=64, speech_token_size=50,
        llm=llm_mod.Qwen2Encoder(str(tmp_path / "qwen")), sampling=None,
    ).eval()
    # seed only the non-backbone modules (keep the HF backbone weights)
    g = torch.Generator().manual_seed(13)
    with torch.no_grad():
        for mod in (ref.llm_embedding, ref.speech_embedding, ref.llm_decoder):
            for p in mod.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)

    text = rng.integers(0, 120, (1, 6)).astype(np.int64)
    prompt_speech = rng.integers(0, 50, (1, 5)).astype(np.int64)

    with torch.no_grad():
        text_emb = ref.llm.model.model.embed_tokens(torch.from_numpy(text))
        sos_emb = ref.llm_embedding.weight[0].reshape(1, 1, -1)
        task_emb = ref.llm_embedding.weight[1].reshape(1, 1, -1)
        sp_emb = ref.speech_embedding(torch.from_numpy(prompt_speech))
        lm_input = torch.concat([sos_emb, text_emb, task_emb, sp_emb], dim=1)
        t = lm_input.shape[1]
        masks = torch.tril(torch.ones((1, t, t), dtype=torch.bool))
        y, _ = ref.llm.forward_one_step(lm_input, masks=masks)
        ref_logits = ref.llm_decoder(y[:, -1]).numpy()

    from fangyan_tts_tpu.config import LLMConfig, QwenConfig
    from fangyan_tts_tpu.models.llm import Qwen2LMV2
    from fangyan_tts_tpu.models import qwen2 as q

    cfg = LLMConfig(
        llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=3,
        qwen=QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
                        vocab_size=120, rope_theta=10000.0),
    )
    jx = Qwen2LMV2(cfg)
    params = llm_v2_params_from_reference({k: v for k, v in ref.state_dict().items()}, num_layers=2)

    # plan: [sos(src2,0), text(src0), task(src2,1), speech(src1)]
    src = np.asarray([[2] + [0] * 6 + [2] + [1] * 5], np.int32)
    ids = np.asarray([[0] + list(text[0]) + [1] + list(prompt_speech[0])], np.int32)
    lengths = jnp.asarray([src.shape[1]], jnp.int32)
    cache = q.init_cache(cfg.qwen, 1, 16, dtype=jnp.float32)
    bound = jx.bind({"params": params})
    last_h, _ = bound.prefill_leftpad(jnp.asarray(src), jnp.asarray(ids), lengths, cache)
    got = np.asarray(bound.llm_decoder(last_h))
    np.testing.assert_allclose(got, ref_logits, atol=3e-5, rtol=1e-4)


# ---------------------------------------------------------------- HiFT (nc)

V1_HIFT = HiFTConfig(
    base_channels=32, sampling_rate=22050, upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
    source_resblock_kernel_sizes=(7, 11), source_resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    f0_cond_channels=16,
)
V2_HIFT = HiFTConfig(base_channels=32, f0_cond_channels=16)


def _ref_nc_hift(cfg: HiFTConfig, seed: int):
    gen_mod = ref_loader.load("cosyvoice.hifigan.generator")
    f0_mod = ref_loader.load("cosyvoice.hifigan.f0_predictor")
    f0p = f0_mod.ConvRNNF0Predictor(num_class=1, in_channels=80, cond_channels=cfg.f0_cond_channels)
    m = gen_mod.HiFTGenerator(
        in_channels=80, base_channels=cfg.base_channels, nb_harmonics=cfg.nb_harmonics,
        sampling_rate=cfg.sampling_rate, nsf_alpha=cfg.nsf_alpha, nsf_sigma=cfg.nsf_sigma,
        nsf_voiced_threshold=cfg.nsf_voiced_threshold,
        upsample_rates=list(cfg.upsample_rates), upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        istft_params={"n_fft": cfg.istft_n_fft, "hop_len": cfg.istft_hop_len},
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        source_resblock_kernel_sizes=list(cfg.source_resblock_kernel_sizes),
        source_resblock_dilation_sizes=[list(d) for d in cfg.source_resblock_dilation_sizes],
        lrelu_slope=cfg.lrelu_slope, audio_limit=cfg.audio_limit, f0_predictor=f0p,
    ).eval()
    return _seed_params(m, seed)


@pytest.mark.parametrize("cfg,seed", [(V1_HIFT, 41), (V2_HIFT, 43)], ids=["v1_22k", "v2_24k"])
def test_nc_hift_decode_parity_shared_source(cfg, seed, rng):
    ref = _ref_nc_hift(cfg, seed)
    t_mel = 12
    hop = cfg.total_upsample
    mel = (rng.standard_normal((1, 80, t_mel)) * 0.5).astype(np.float32)
    s = (rng.standard_normal((1, 1, t_mel * hop)) * 0.05).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.decode(torch.from_numpy(mel), torch.from_numpy(s)).numpy()

    params = hift_nc_params_from_reference(
        {k: v for k, v in ref.state_dict().items()},
        upsample_rates=cfg.upsample_rates,
        resblock_dilations=len(cfg.resblock_dilation_sizes[0]),
    )
    jx = HiFT(cfg)
    got = jx.apply(
        {"params": params}, jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray(s.transpose(0, 2, 1)),
        method=HiFT.decode,
    )
    got = np.asarray(got)
    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    np.testing.assert_allclose(got, ref_out, atol=5e-5, rtol=1e-3)


def test_nc_hift_f0_predictor_parity(rng):
    ref = _ref_nc_hift(V2_HIFT, 47)
    mel = rng.standard_normal((1, 80, 16)).astype(np.float32)
    with torch.no_grad():
        ref_f0 = ref.f0_predictor(torch.from_numpy(mel)).numpy()
    params = hift_nc_params_from_reference(
        {k: v for k, v in ref.state_dict().items()}, upsample_rates=V2_HIFT.upsample_rates
    )
    jx = HiFT(V2_HIFT)
    got = jx.apply({"params": params}, jnp.asarray(mel.transpose(0, 2, 1)), method=lambda m, x: m.f0_predictor(x))
    np.testing.assert_allclose(np.asarray(got), ref_f0, atol=1e-5, rtol=1e-4)
