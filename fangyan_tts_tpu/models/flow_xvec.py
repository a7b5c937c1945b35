"""CosyVoice1/2 flow modules (token -> mel via conformer encoders + U-Net CFM).

Behavioral references:
- MaskedDiffWithXvec (v1): cosyvoice/flow/flow.py:24-145 — token embed ->
  ConformerEncoder -> proj 80 -> InterpolateRegulator (50 Hz -> mel rate) ->
  ConditionalCFM with U-Net estimator; 50% random prompt conditioning.
- CausalMaskedDiffWithXvec (v2): flow.py:148-275 — UpsampleConformerEncoder
  (2x token->mel) with pre-lookahead, CausalConditionalCFM.
- InterpolateRegulator: cosyvoice/flow/length_regulator.py:21-70.

The CFM Euler solve is shared with the v3 flow (models/flow.py:cfm_solve
pattern) but dispatches to the U-Net estimator.
"""

from __future__ import annotations

from dataclasses import field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import FlowConfig
from ..ops.convs import conv1d, upsample_linear
from .conformer import ConformerEncoder, UpsampleConformerEncoder
from .flow import cosine_t_span, fixed_cfm_noise
from .unet_decoder import ConditionalDecoder


class InterpolateRegulator(nn.Module):
    """length_regulator.py:21-70: linear-interp token-rate -> mel-rate +
    conv/norm stack."""

    channels: int = 80
    num_blocks: int = 4
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, target_len: int) -> jnp.ndarray:
        """x: (B, Lt, C) -> (B, target_len, C)."""
        b, l, c = x.shape
        # linear interpolation to the target grid (align_corners=True style)
        coords = jnp.linspace(0.0, l - 1, target_len)
        lo = jnp.floor(coords).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, l - 1)
        w = (coords - lo)[None, :, None]
        h = x[:, lo] * (1 - w) + x[:, hi] * w
        for i in range(self.num_blocks):
            k = self.param(f"conv_{i}_kernel", nn.initializers.lecun_normal(), (3, self.channels, self.channels))
            bb = self.param(f"conv_{i}_bias", nn.initializers.zeros, (self.channels,))
            h = conv1d(h, k.astype(h.dtype), bb.astype(h.dtype), padding=1)
            h = nn.GroupNorm(num_groups=self.groups, name=f"norm_{i}")(h)
            h = _mish(h)
        k = self.param("out_kernel", nn.initializers.lecun_normal(), (1, self.channels, self.channels))
        return conv1d(h, k.astype(h.dtype), padding=0)


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class CausalMaskedDiffWithXvec(nn.Module):
    """CosyVoice2 flow (flow.py:148-275). Hyperparameters default to
    conf/cosyvoice2.yaml:38-88."""

    vocab_size: int = 6561
    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    token_mel_ratio: int = 2
    pre_lookahead_len: int = 3
    static_chunk_size: int = 25
    n_timesteps: int = 10
    inference_cfg_rate: float = 0.7
    sigma_min: float = 1e-6
    decoder_channels: tuple = (256,)
    num_mid_blocks: int = 12
    n_blocks: int = 4
    num_heads: int = 8

    def setup(self):
        self.input_embedding = nn.Embed(self.vocab_size, self.input_size, name="input_embedding")
        self.spk_embed_affine_layer = nn.Dense(self.output_size, name="spk_embed_affine_layer")
        self.encoder = UpsampleConformerEncoder(
            dim=self.input_size, heads=8, ffn_hidden=2048, num_blocks=6, num_up_blocks=4,
            pre_lookahead_len=self.pre_lookahead_len, static_chunk_size=self.static_chunk_size,
        )
        self.encoder_proj = nn.Dense(self.output_size, name="encoder_proj")
        self.estimator = ConditionalDecoder(
            in_channels=320, out_channels=self.output_size, channels=self.decoder_channels,
            n_blocks=self.n_blocks, num_mid_blocks=self.num_mid_blocks, num_heads=self.num_heads,
            causal=True, static_chunk_size=self.static_chunk_size * self.token_mel_ratio,
        )

    def prepare_inference(self, token, token_len, prompt_feat, prompt_feat_len, embedding, finalize=True, streaming=False):
        emb = embedding / jnp.maximum(jnp.linalg.norm(embedding, axis=1, keepdims=True), 1e-12)
        spks = self.spk_embed_affine_layer(emb)
        l = token.shape[1]
        valid = jnp.arange(l)[None, :] < token_len[:, None]
        h = self.input_embedding(jnp.clip(token, 0, self.vocab_size - 1)) * valid[..., None].astype(jnp.float32)
        if finalize:
            h, out_lens = self.encoder(h, token_len, streaming=streaming)
        else:
            ctx = h[:, -self.pre_lookahead_len :]
            h, out_lens = self.encoder(h[:, : -self.pre_lookahead_len], token_len - self.pre_lookahead_len, context=ctx, streaming=streaming)
        mu = self.encoder_proj(h)
        b, l_mel, _ = mu.shape
        pf = prompt_feat.astype(mu.dtype)
        if pf.shape[1] < l_mel:
            pf = jnp.pad(pf, ((0, 0), (0, l_mel - pf.shape[1]), (0, 0)))
        else:
            pf = pf[:, :l_mel]
        pos = jnp.arange(l_mel)[None, :, None]
        conds = jnp.where(pos < prompt_feat_len[:, None, None], pf, 0.0)
        return mu, spks, conds, out_lens

    def __call__(self, token, token_len, feat, feat_len, embedding, rngs_key, streaming: bool = False):
        """Training loss (flow.py:175-230 equivalent)."""
        k_t, k_z, k_cfg, k_cond, k_condlen = jax.random.split(rngs_key, 5)
        mu, spks, _, out_lens = self.prepare_inference(
            token, token_len, feat, feat_len, embedding, finalize=True, streaming=streaming
        )
        b, l_mel, d = feat.shape
        mu = mu[:, :l_mel]
        mel_valid = jnp.arange(l_mel)[None, :] < feat_len[:, None]
        mask = mel_valid[..., None].astype(feat.dtype)

        use_cond = jax.random.bernoulli(k_cond, 0.5, (b,))
        cond_len = (jax.random.uniform(k_condlen, (b,)) * 0.3 * feat_len.astype(jnp.float32)).astype(jnp.int32)
        pos = jnp.arange(l_mel)[None, :]
        cond_mask = (pos < cond_len[:, None]) & use_cond[:, None]
        conds = feat * cond_mask[..., None].astype(feat.dtype)

        t = jax.random.uniform(k_t, (b,), feat.dtype)
        z = jax.random.normal(k_z, feat.shape, feat.dtype)
        y = (1 - (1 - self.sigma_min) * t[:, None, None]) * z + t[:, None, None] * feat
        u = feat - (1 - self.sigma_min) * z
        keep = (jax.random.uniform(k_cfg, (b,)) > 0.2).astype(feat.dtype)
        pred = self.estimator(
            y, mu * keep[:, None, None], t, spks * keep[:, None], conds * keep[:, None, None], feat_len, streaming=streaming
        )
        se = jnp.sum(((pred - u) * mask) ** 2)
        return se / (jnp.sum(mask) * d), {}


class MaskedDiffWithXvec(nn.Module):
    """CosyVoice1 flow (flow.py:24-145): token embed -> ConformerEncoder ->
    proj 80 -> InterpolateRegulator (token rate -> mel rate) -> U-Net CFM.
    Hyperparameters default to conf/cosyvoice.yaml:63-101."""

    vocab_size: int = 4096
    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    input_frame_rate: int = 50
    n_timesteps: int = 10
    inference_cfg_rate: float = 0.7
    sigma_min: float = 1e-6
    decoder_channels: tuple = (256, 256)
    num_mid_blocks: int = 12
    n_blocks: int = 4
    num_heads: int = 8
    mel_rate: float = 50.0  # 22050/256 in the v1 recipe; ratio handled by caller

    def setup(self):
        self.input_embedding = nn.Embed(self.vocab_size, self.input_size, name="input_embedding")
        self.spk_embed_affine_layer = nn.Dense(self.output_size, name="spk_embed_affine_layer")
        self.encoder = ConformerEncoder(
            dim=self.input_size, heads=8, ffn_hidden=2048, num_blocks=6, macaron=False, use_cnn=False, name="encoder",
        )
        self.encoder_proj = nn.Dense(self.output_size, name="encoder_proj")
        self.length_regulator = InterpolateRegulator(self.output_size, name="length_regulator")
        self.estimator = ConditionalDecoder(
            in_channels=320, out_channels=self.output_size, channels=self.decoder_channels,
            n_blocks=self.n_blocks, num_mid_blocks=self.num_mid_blocks, num_heads=self.num_heads,
            causal=False, name="estimator",
        )

    def prepare_inference(self, token, token_len, prompt_feat, prompt_feat_len, embedding, mel_len: int):
        """Returns (mu (B, mel_len, 80), spks, conds, lens)."""
        emb = embedding / jnp.maximum(jnp.linalg.norm(embedding, axis=1, keepdims=True), 1e-12)
        spks = self.spk_embed_affine_layer(emb)
        l = token.shape[1]
        valid = jnp.arange(l)[None, :] < token_len[:, None]
        h = self.input_embedding(jnp.clip(token, 0, self.vocab_size - 1)) * valid[..., None].astype(jnp.float32)
        h, _ = self.encoder(h, token_len)
        h = self.encoder_proj(h)
        mu = self.length_regulator(h, mel_len)
        b = mu.shape[0]
        pf = prompt_feat.astype(mu.dtype)
        if pf.shape[1] < mel_len:
            pf = jnp.pad(pf, ((0, 0), (0, mel_len - pf.shape[1]), (0, 0)))
        else:
            pf = pf[:, :mel_len]
        pos = jnp.arange(mel_len)[None, :, None]
        conds = jnp.where(pos < prompt_feat_len[:, None, None], pf, 0.0)
        lens = jnp.full((b,), mel_len, jnp.int32)
        return mu, spks, conds, lens

    def __call__(self, token, token_len, feat, feat_len, embedding, rngs_key):
        """Training CFM loss (flow.py:62-99 + flow_matching.py:155-193)."""
        k_t, k_z, k_cfg, k_cond, k_condlen = jax.random.split(rngs_key, 5)
        mel_len = feat.shape[1]
        mu, spks, _, _ = self.prepare_inference(token, token_len, feat, feat_len, embedding, mel_len)
        b, l_mel, d = feat.shape
        mask = (jnp.arange(l_mel)[None, :] < feat_len[:, None])[..., None].astype(feat.dtype)

        use_cond = jax.random.bernoulli(k_cond, 0.5, (b,))
        cond_len = (jax.random.uniform(k_condlen, (b,)) * 0.3 * feat_len.astype(jnp.float32)).astype(jnp.int32)
        pos = jnp.arange(l_mel)[None, :]
        conds = feat * ((pos < cond_len[:, None]) & use_cond[:, None])[..., None].astype(feat.dtype)

        t = jax.random.uniform(k_t, (b,), feat.dtype)
        z = jax.random.normal(k_z, feat.shape, feat.dtype)
        y = (1 - (1 - self.sigma_min) * t[:, None, None]) * z + t[:, None, None] * feat
        u = feat - (1 - self.sigma_min) * z
        keep = (jax.random.uniform(k_cfg, (b,)) > 0.2).astype(feat.dtype)
        pred = self.estimator(y, mu * keep[:, None, None], t, spks * keep[:, None], conds * keep[:, None, None], feat_len)
        se = jnp.sum(((pred - u) * mask) ** 2)
        return se / (jnp.sum(mask) * d), {}


def xvec_flow_inference(
    model: CausalMaskedDiffWithXvec,
    params,
    token, token_len, prompt_feat, prompt_feat_len, embedding,
    streaming: bool = False,
    finalize: bool = True,
    noise: jnp.ndarray | None = None,
):
    """Euler CFG solve with the U-Net estimator (flow_matching.py:196-227)."""
    mu, spks, conds, out_lens = model.apply(
        {"params": params}, token, token_len, prompt_feat, prompt_feat_len, embedding,
        finalize=finalize, streaming=streaming, method=CausalMaskedDiffWithXvec.prepare_inference,
    )
    b, l_mel, d = mu.shape
    if noise is None:
        noise = jnp.asarray(fixed_cfm_noise()[:, :l_mel, :], mu.dtype)
    z = jnp.broadcast_to(noise[:, :l_mel, :], (b, l_mel, d)).astype(mu.dtype)

    est = model.estimator if hasattr(model, "estimator") else None
    dec = ConditionalDecoder(
        in_channels=320, out_channels=model.output_size, channels=model.decoder_channels,
        n_blocks=model.n_blocks, num_mid_blocks=model.num_mid_blocks, num_heads=model.num_heads,
        causal=True, static_chunk_size=model.static_chunk_size * model.token_mel_ratio,
    )
    dparams = params["estimator"]
    rate = model.inference_cfg_rate
    t_span = jnp.asarray(cosine_t_span(model.n_timesteps), z.dtype)
    ts, dts = t_span[:-1], t_span[1:] - t_span[:-1]
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([conds, jnp.zeros_like(conds)], axis=0)
    lens2 = jnp.concatenate([out_lens, out_lens], axis=0)

    def step(x, t_dt):
        t, dt = t_dt
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * b,), t, x.dtype)
        v = dec.apply({"params": dparams}, x2, mu2, t2, spks2, cond2, lens2, streaming=streaming)
        dphi = (1.0 + rate) * v[:b] - rate * v[b:]
        return x + dt * dphi, None

    x, _ = jax.lax.scan(step, z, (ts, dts))
    return x
