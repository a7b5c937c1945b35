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


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _interp_gather(x: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of x (B, L, C) at fractional source coordinates
    src (M,) -> (B, M, C)."""
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, x.shape[1] - 1)
    w = (src - lo)[None, :, None].astype(x.dtype)
    xl = jnp.take_along_axis(x, lo[None, :, None], axis=1)
    xh = jnp.take_along_axis(x, hi[None, :, None], axis=1)
    return xl * (1 - w) + xh * w


def _interp_src(j, src_len, out_len):
    """F.interpolate(mode='linear', align_corners=False) source coordinate:
    (j + 0.5) * L/M - 0.5, clamped to [0, L-1]. Traced-length friendly."""
    sl = src_len.astype(jnp.float32) if hasattr(src_len, "dtype") else jnp.float32(src_len)
    ol = jnp.maximum(out_len, 1).astype(jnp.float32) if hasattr(out_len, "dtype") else jnp.float32(max(out_len, 1))
    return jnp.clip((j + 0.5) * (sl / ol) - 0.5, 0.0, jnp.maximum(sl - 1.0, 0.0))


class InterpolateRegulator(nn.Module):
    """length_regulator.py:21-70: linear-interp token-rate -> mel-rate +
    [Conv1d k3 + GroupNorm + Mish] x num_blocks + Conv1d k1.

    torch F.interpolate(mode='linear') defaults to align_corners=False —
    source coordinate (j+0.5)*L/M - 0.5 — which both paths replicate."""

    channels: int = 80
    num_blocks: int = 4
    groups: int = 1

    def setup(self):
        self.convs = [
            (
                self.param(f"conv_{i}_kernel", nn.initializers.lecun_normal(), (3, self.channels, self.channels)),
                self.param(f"conv_{i}_bias", nn.initializers.zeros, (self.channels,)),
                self.param(f"norm_{i}_scale", nn.initializers.ones, (self.channels,)),
                self.param(f"norm_{i}_bias", nn.initializers.zeros, (self.channels,)),
            )
            for i in range(self.num_blocks)
        ]
        self.out_kernel = self.param("out_kernel", nn.initializers.lecun_normal(), (1, self.channels, self.channels))
        self.out_bias = self.param("out_bias", nn.initializers.zeros, (self.channels,))

    def _group_norm(self, h, scale, bias, mask, eps: float = 1e-5):
        """torch GroupNorm over (C/groups, T). With `mask` (B, L, 1) the
        statistics count only valid positions, matching the reference's
        exact-length (unpadded) inference tensors."""
        b, l, c = h.shape
        g = self.groups
        hg = h.reshape(b, l, g, c // g)
        if mask is None:
            mean = hg.mean(axis=(1, 3), keepdims=True)
            var = ((hg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
        else:
            m = mask.reshape(b, l, 1, 1).astype(h.dtype)
            cnt = jnp.maximum(m.sum(axis=1, keepdims=True) * (c // g), 1.0)
            mean = (hg * m).sum(axis=(1, 3), keepdims=True) / cnt
            var = (((hg - mean) * m) ** 2).sum(axis=(1, 3), keepdims=True) / cnt
        out = (hg - mean) / jnp.sqrt(var + eps)
        return out.reshape(b, l, c) * scale.astype(h.dtype) + bias.astype(h.dtype)

    def _conv_stack(self, h: jnp.ndarray, valid_len=None) -> jnp.ndarray:
        mask = None
        if valid_len is not None:
            mask = (jnp.arange(h.shape[1])[None, :] < valid_len[:, None]).astype(h.dtype)[..., None]
        for k, bb, ns, nb in self.convs:
            if mask is not None:
                h = h * mask
            h = conv1d(h, k.astype(h.dtype), bb.astype(h.dtype), padding=1)
            h = self._group_norm(h, ns, nb, mask)
            h = _mish(h)
        if mask is not None:
            h = h * mask
        h = conv1d(h, self.out_kernel.astype(h.dtype), self.out_bias.astype(h.dtype), padding=0)
        return h * mask if mask is not None else h

    def __call__(self, x: jnp.ndarray, target_len: int) -> jnp.ndarray:
        """Training path (length_regulator.py:44-50): x (B, Lt, C) ->
        (B, target_len, C). GroupNorm runs unmasked over the padded length,
        exactly like the reference's batched forward."""
        src = _interp_src(jnp.arange(target_len, dtype=jnp.float32), x.shape[1], target_len)
        h = _interp_gather(x, src)
        return self._conv_stack(h)

    def inference(self, h, token_len1, token_len2, mel_len1: int, mel_len2, out_len: int):
        """v1 inference path (length_regulator.py:52-70): prompt tokens and
        generated tokens interpolate SEPARATELY; when the generated span
        exceeds 40 tokens its first/last 20 tokens pin to 34 mel frames each
        (34 = int(20/50*22050/256)) so chunk overlaps align frame-for-frame.

        h: (B, L_pad, C) encoded prompt ++ generated ++ pad.
        token_len1/mel_len1: static ints (fixed per stream);
        token_len2/mel_len2: traced scalars. Returns (B, out_len, C)."""
        j = jnp.arange(out_len, dtype=jnp.float32)
        tl1 = jnp.float32(token_len1)
        tl2 = token_len2.astype(jnp.float32)
        ml2 = mel_len2.astype(jnp.float32)
        # prompt region
        src1 = _interp_src(j, tl1, jnp.float32(max(mel_len1, 1)))
        # generated region
        j2 = j - mel_len1
        head = _interp_src(j2, 20.0, 34.0)
        jt = j2 - (ml2 - 34.0)
        tail = (tl2 - 20.0) + _interp_src(jt, 20.0, 34.0)
        jm = j2 - 34.0
        mid = 20.0 + jnp.clip(
            (jm + 0.5) * ((tl2 - 40.0) / jnp.maximum(ml2 - 68.0, 1.0)) - 0.5,
            0.0, jnp.maximum(tl2 - 41.0, 0.0),
        )
        split = jnp.where(j2 < 34.0, head, jnp.where(jt >= 0.0, tail, mid))
        plain = _interp_src(j2, tl2, ml2)
        src2 = tl1 + jnp.where(token_len2 > 40, split, plain)
        src = jnp.where(j < mel_len1, src1, src2)
        x = _interp_gather(h, src)
        valid = jnp.asarray([mel_len1 + mel_len2], jnp.int32) if jnp.ndim(mel_len2) == 0 else mel_len1 + mel_len2
        return self._conv_stack(x, valid_len=jnp.broadcast_to(valid, (h.shape[0],)))


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
    attention_head_dim: int = 64
    enc_heads: int = 8
    enc_ffn: int = 2048
    enc_blocks: int = 6
    enc_up_blocks: int = 4

    def setup(self):
        self.input_embedding = nn.Embed(self.vocab_size, self.input_size, name="input_embedding")
        self.spk_embed_affine_layer = nn.Dense(self.output_size, name="spk_embed_affine_layer")
        self.encoder = UpsampleConformerEncoder(
            dim=self.input_size, heads=self.enc_heads, ffn_hidden=self.enc_ffn,
            num_blocks=self.enc_blocks, num_up_blocks=self.enc_up_blocks,
            pre_lookahead_len=self.pre_lookahead_len, static_chunk_size=self.static_chunk_size,
        )
        self.encoder_proj = nn.Dense(self.output_size, name="encoder_proj")
        self.estimator = ConditionalDecoder(
            in_channels=320, out_channels=self.output_size, channels=self.decoder_channels,
            n_blocks=self.n_blocks, num_mid_blocks=self.num_mid_blocks, num_heads=self.num_heads,
            attention_head_dim=self.attention_head_dim,
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
            # streaming chunk: the last pre_lookahead_len VALID tokens are
            # context only. They stay in place (the lookahead conv reads them
            # at their true positions) and the encoder masks them out via the
            # shortened length — equivalent to the reference's trim+context
            # split (upsample_encoder.py:66-103) but indifferent to trailing
            # padding, so chunk lengths can ride shared bucketed programs.
            h, out_lens = self.encoder(h, token_len - self.pre_lookahead_len, streaming=streaming)
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
    attention_head_dim: int = 64
    enc_heads: int = 8
    enc_ffn: int = 2048
    enc_blocks: int = 6
    mel_rate: float = 50.0  # 22050/256 in the v1 recipe; ratio handled by caller

    def setup(self):
        self.input_embedding = nn.Embed(self.vocab_size, self.input_size, name="input_embedding")
        self.spk_embed_affine_layer = nn.Dense(self.output_size, name="spk_embed_affine_layer")
        self.encoder = ConformerEncoder(
            dim=self.input_size, heads=self.enc_heads, ffn_hidden=self.enc_ffn,
            num_blocks=self.enc_blocks, macaron=False, use_cnn=False, name="encoder",
        )
        self.encoder_proj = nn.Dense(self.output_size, name="encoder_proj")
        self.length_regulator = InterpolateRegulator(self.output_size, name="length_regulator")
        self.estimator = ConditionalDecoder(
            in_channels=320, out_channels=self.output_size, channels=self.decoder_channels,
            n_blocks=self.n_blocks, num_mid_blocks=self.num_mid_blocks, num_heads=self.num_heads,
            attention_head_dim=self.attention_head_dim,
            causal=False, name="estimator",
        )

    def encode_inference(self, token, token_len1: int, token_len2, prompt_feat, embedding, mel_len2, out_len: int):
        """v1 flow.inference front half (flow.py:102-131): embed the full
        prompt++generated token row, conformer-encode, project to 80, then
        the regulator's separate prompt/generated interpolation.

        token: (B, L_pad) int32 — first token_len1 (STATIC, fixed per
        stream) slots are the flow prompt tokens, the next token_len2
        (traced) the generated ones. prompt_feat: (B, mel_len1, 80)
        EXACT-length prompt mel (static). mel_len2 traced
        (= int(token_len2/frame_rate*22050/256), computed on host).
        Returns (mu (B, out_len, 80), spks (B, 80), conds (B, out_len, 80),
        lens (B,) = mel_len1 + mel_len2)."""
        emb = embedding / jnp.maximum(jnp.linalg.norm(embedding, axis=1, keepdims=True), 1e-12)
        spks = self.spk_embed_affine_layer(emb)
        b, l = token.shape
        mel_len1 = prompt_feat.shape[1]
        total_len = jnp.broadcast_to(jnp.asarray(token_len1 + token_len2, jnp.int32), (b,))
        valid = jnp.arange(l)[None, :] < total_len[:, None]
        h = self.input_embedding(jnp.clip(token, 0, self.vocab_size - 1)) * valid[..., None].astype(jnp.float32)
        h, _ = self.encoder(h, total_len)
        h = self.encoder_proj(h)
        mu = self.length_regulator.inference(h, token_len1, token_len2, mel_len1, mel_len2, out_len)
        pf = jnp.pad(prompt_feat.astype(mu.dtype), ((0, 0), (0, max(out_len - mel_len1, 0)), (0, 0)))[:, :out_len]
        pos = jnp.arange(out_len)[None, :, None]
        conds = jnp.where(pos < mel_len1, pf, 0.0)
        lens = jnp.broadcast_to(mel_len1 + jnp.asarray(mel_len2, jnp.int32), (b,))
        return mu, spks, conds, lens

    def __call__(self, token, token_len, feat, feat_len, embedding, rngs_key):
        """Training CFM loss (flow.py:62-99 + flow_matching.py:155-193)."""
        k_t, k_z, k_cfg, k_cond, k_condlen = jax.random.split(rngs_key, 5)
        mel_len = feat.shape[1]
        emb = embedding / jnp.maximum(jnp.linalg.norm(embedding, axis=1, keepdims=True), 1e-12)
        spks = self.spk_embed_affine_layer(emb)
        tvalid = jnp.arange(token.shape[1])[None, :] < token_len[:, None]
        h = self.input_embedding(jnp.clip(token, 0, self.vocab_size - 1)) * tvalid[..., None].astype(jnp.float32)
        h, _ = self.encoder(h, token_len)
        h = self.encoder_proj(h)
        mu = self.length_regulator(h, mel_len)
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

    dec = ConditionalDecoder(
        in_channels=320, out_channels=model.output_size, channels=model.decoder_channels,
        n_blocks=model.n_blocks, num_mid_blocks=model.num_mid_blocks, num_heads=model.num_heads,
        attention_head_dim=model.attention_head_dim,
        causal=True, static_chunk_size=model.static_chunk_size * model.token_mel_ratio,
    )
    return unet_cfg_solve(
        dec, params["estimator"], z, mu, spks, conds, out_lens,
        model.n_timesteps, model.inference_cfg_rate, streaming=streaming,
    )


def unet_cfg_solve(dec, dparams, z, mu, spks, conds, lens, n_timesteps, cfg_rate, streaming=False):
    """Euler solve with classifier-free guidance over a doubled batch whose
    second half has zeroed mu/spks/cond (flow_matching.py:73-147 solve_euler;
    the 2x batch replicates the reference's x_in/mu_in packing)."""
    b = z.shape[0]
    t_span = jnp.asarray(cosine_t_span(n_timesteps), z.dtype)
    ts, dts = t_span[:-1], t_span[1:] - t_span[:-1]
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([conds, jnp.zeros_like(conds)], axis=0)
    lens2 = jnp.concatenate([lens, lens], axis=0)

    def step(x, t_dt):
        t, dt = t_dt
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * b,), t, x.dtype)
        v = dec.apply({"params": dparams}, x2, mu2, t2, spks2, cond2, lens2, streaming=streaming)
        dphi = (1.0 + cfg_rate) * v[:b] - cfg_rate * v[b:]
        return x + dt * dphi, None

    x, _ = jax.lax.scan(step, z, (ts, dts))
    return x


def init_v1_flow_cache(mel_len1: int, mel_dim: int = 80, overlap: int = 34) -> jnp.ndarray:
    """Empty v1 flow cache: (1, mel_len1 + 34, 80, 2) of zeros plus a 'filled'
    flag handled by the caller (the reference starts from a 0-column cache,
    cli/model.py:186)."""
    return jnp.zeros((1, mel_len1 + overlap, mel_dim, 2), jnp.float32)


def xvec_flow_inference_v1(
    model: MaskedDiffWithXvec,
    params,
    token,  # (B, L_pad) prompt ++ generated ++ pad
    token_len1: int,  # static: flow prompt token count
    token_len2,  # traced scalar: generated token count
    prompt_feat,  # (B, mel_len1, 80) exact
    embedding,  # (B, 192)
    mel_len2,  # traced scalar: int(token_len2/frame_rate*22050/256), host-computed
    key: jax.Array,
    cache: jnp.ndarray | None = None,  # (B, mel_len1+34, 80, 2) or None (first call)
    out_len: int | None = None,  # static mel bucket >= mel_len1 + mel_len2
    noise: jnp.ndarray | None = None,  # (B, >=out_len, 80) override (parity tests)
):
    """CosyVoice1 flow inference with the z/mu flow cache
    (flow.py:102-145 + flow_matching.py:36-71 ConditionalCFM.forward).

    The cache pins the noise z and encoder output mu over [0, mel_len1) and
    the previous chunk's last 34 mel frames (== the 20-token overlap region,
    which the regulator pins to 34 frames) so consecutive chunks solve the
    ODE over identical values there — the reference's continuity mechanism.
    Returns (mel (B, out_len, 80) — caller slices [mel_len1 : mel_len1+mel_len2],
    new_cache (B, mel_len1+34, 80, 2))."""
    mel_len1 = prompt_feat.shape[1]
    if out_len is None:
        out_len = token.shape[1] * 2  # conservative; callers pass exact buckets
    mu, spks, conds, lens = model.apply(
        {"params": params}, token, token_len1, token_len2, prompt_feat, embedding, mel_len2, out_len,
        method=MaskedDiffWithXvec.encode_inference,
    )
    b = mu.shape[0]
    if noise is not None:
        z = jnp.asarray(noise[:, :out_len, :], mu.dtype)
    else:
        z = jax.random.normal(key, (b, out_len, model.output_size), mu.dtype)
    if cache is not None:
        # splice: first mel_len1+34 positions reuse the cached z/mu
        # (flow_matching.py:56-59). The +34 head aligns with the cached tail
        # because the regulator pins both 20-token overlaps to 34 frames.
        cz = cache[..., 0].astype(z.dtype)
        cm = cache[..., 1].astype(mu.dtype)
        z = jnp.concatenate([cz, z[:, mel_len1 + 34:]], axis=1)
        mu = jnp.concatenate([cm, mu[:, mel_len1 + 34:]], axis=1)
    # new cache: prompt region + the last 34 valid frames (flow_matching.py:60-62)
    total = jnp.asarray(mel_len1 + mel_len2, jnp.int32)
    z_tail = jax.lax.dynamic_slice_in_dim(z, jnp.maximum(total - 34, 0), 34, axis=1)
    mu_tail = jax.lax.dynamic_slice_in_dim(mu, jnp.maximum(total - 34, 0), 34, axis=1)
    new_cache = jnp.stack(
        [jnp.concatenate([z[:, :mel_len1], z_tail], axis=1), jnp.concatenate([mu[:, :mel_len1], mu_tail], axis=1)],
        axis=-1,
    )
    dec = ConditionalDecoder(
        in_channels=320, out_channels=model.output_size, channels=model.decoder_channels,
        n_blocks=model.n_blocks, num_mid_blocks=model.num_mid_blocks, num_heads=model.num_heads,
        attention_head_dim=model.attention_head_dim, causal=False,
    )
    mel = unet_cfg_solve(
        dec, params["estimator"], z, mu, spks, conds, lens, model.n_timesteps, model.inference_cfg_rate,
    )
    return mel, new_cache
