"""Token→mel conditional flow matching (CosyVoice3 `CausalMaskedDiffWithDiT`).

Behavioral references:
- flow module: cosyvoice/flow/flow.py:278-433
- CFM solver:  cosyvoice/flow/flow_matching.py:21-227 (CausalConditionalCFM)
- lookahead:   cosyvoice/transformer/upsample_encoder.py:66-103

TPU-first notes:
- the Euler solve is a `lax.scan` over the (static) 10 timesteps; the
  classifier-free-guidance pair is batched (2B) through one DiT call so the
  MXU sees one batch-2 matmul stream rather than two batch-1 streams.
- `repeat_interleave(token_mel_ratio)` is a reshape-broadcast, free under XLA.
- the reference's fixed seeded noise buffer (flow_matching.py:199-200,
  torch.randn under seed 0) is reproduced via `fixed_cfm_noise()` so wavs are
  bit-comparable with the PyTorch stack; it is generated once with torch on
  the host (torch-cpu is a build-time tool here, never on the TPU hot path).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import FlowConfig
from ..ops.convs import conv1d
from ..ops.masks import chunk_attn_mask, chunk_split_bias
from .dit import DiT, DiTChunk, precompute_mods


@functools.lru_cache(maxsize=1)
def fixed_cfm_noise(mel_dim: int = 80, max_len: int = 15000) -> np.ndarray:
    """The reference's deterministic streaming noise: torch.manual_seed(0);
    torch.randn([1, 80, 50*300]) (flow_matching.py:199-200). Returned
    channels-last (1, max_len, mel_dim)."""
    try:
        import torch

        g = torch.Generator().manual_seed(0)
        # replicate set_all_random_seed(0) → torch.manual_seed(0) default gen
        torch.manual_seed(0)
        noise = torch.randn([1, mel_dim, max_len])
        return noise.numpy().transpose(0, 2, 1).copy()
    except ImportError:  # torch-free deployment: fall back to jax PRNG
        key = jax.random.PRNGKey(0)
        return np.asarray(jax.random.normal(key, (1, max_len, mel_dim)))


class PreLookaheadLayer(nn.Module):
    """upsample_encoder.py:66-103: conv1 (k=pre_lookahead_len+1, right pad /
    context), leaky_relu, conv2 (k=3, left pad 2), residual."""

    in_channels: int = 80
    channels: int = 1024
    pre_lookahead_len: int = 3

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray | None = None,
        chunk_left: int = 0,
        chunk_finalize: bool = False,
    ) -> jnp.ndarray:
        """x: (B, L, C). context: optional (B, pre_lookahead_len, C) future
        tokens (streaming non-finalize step). chunk_left > 0 enables the
        KV-streaming chunk mode (see below)."""
        k1 = self.param(
            "conv1_kernel", nn.initializers.lecun_normal(), (self.pre_lookahead_len + 1, self.in_channels, self.channels)
        )
        b1 = self.param("conv1_bias", nn.initializers.zeros, (self.channels,))
        k2 = self.param("conv2_kernel", nn.initializers.lecun_normal(), (3, self.channels, self.in_channels))
        b2 = self.param("conv2_bias", nn.initializers.zeros, (self.in_channels,))

        if chunk_left:
            # streaming chunk: x = [chunk_left ctx ++ new ++ lookahead (unless
            # finalize, whose right context is the zero pad)] — outputs ONLY
            # the new positions, bit-matching the full-sequence conv there
            # (the receptive field at those positions is fully provided)
            assert chunk_left == 2, "conv2 (k=3) left context is 2 frames"
            h = conv1d(
                x, k1.astype(x.dtype), b1.astype(x.dtype),
                padding=(0, self.pre_lookahead_len if chunk_finalize else 0),
            )
            h = jax.nn.leaky_relu(h, negative_slope=0.01)
            h = conv1d(h, k2.astype(x.dtype), b2.astype(x.dtype), padding=(0, 0))
            return h + x[:, chunk_left : chunk_left + h.shape[1]]
        if context is None:
            h = conv1d(x, k1.astype(x.dtype), b1.astype(x.dtype), padding=(0, self.pre_lookahead_len))
        else:
            h = jnp.concatenate([x, context], axis=1)
            h = conv1d(h, k1.astype(x.dtype), b1.astype(x.dtype), padding=(0, self.pre_lookahead_len - context.shape[1]))
        h = jax.nn.leaky_relu(h, negative_slope=0.01)
        h = conv1d(h, k2.astype(x.dtype), b2.astype(x.dtype), padding=(2, 0))
        return h + x


def repeat_interleave_time(x: jnp.ndarray, ratio: int) -> jnp.ndarray:
    """(B, L, C) -> (B, L*ratio, C), each frame repeated `ratio` times."""
    b, l, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (b, l, ratio, c)).reshape(b, l * ratio, c)


def cosine_t_span(n_timesteps: int) -> np.ndarray:
    """1 - cos(linspace(0,1,n+1) * pi/2) (flow_matching.py:224-226)."""
    t = np.linspace(0.0, 1.0, n_timesteps + 1)
    return (1.0 - np.cos(t * 0.5 * np.pi)).astype(np.float32)


class CausalMaskedDiffWithDiT(nn.Module):
    cfg: FlowConfig

    def setup(self):
        c = self.cfg
        self.input_embedding = nn.Embed(c.vocab_size, c.input_size, name="input_embedding")
        self.spk_embed_affine_layer = nn.Dense(c.output_size, name="spk_embed_affine_layer")
        self.pre_lookahead_layer = PreLookaheadLayer(c.input_size, c.pre_lookahead_channels, c.pre_lookahead_len)
        self.estimator = DiT(c.dit, name="estimator")

    def _embed_tokens(self, token: jnp.ndarray, token_len: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """token: (B, L) -> embedded (B, L, C) zeroed at padding; returns
        (emb, valid_mask (B, L))."""
        l = token.shape[1]
        valid = (jnp.arange(l)[None, :] < token_len[:, None])
        emb = self.input_embedding(jnp.clip(token, 0, self.cfg.vocab_size - 1))
        return emb * valid[..., None].astype(emb.dtype), valid

    def prepare_inference(
        self,
        token: jnp.ndarray,  # (B, Lt) prompt+target speech tokens, concatenated
        token_len: jnp.ndarray,  # (B,)
        prompt_feat: jnp.ndarray,  # (B, Lp_mel, mel) prompt mel (Lp_mel = prompt_token_len * ratio)
        prompt_feat_len: jnp.ndarray,  # (B,)
        embedding: jnp.ndarray,  # (B, 192) speaker x-vector
        finalize: bool = True,
        padded_streaming: bool = False,
    ):
        """Token/conditioning preprocessing for inference (flow.py:358-390).
        Returns (mu (B,L,mel), spks (B,mel), conds (B,L,mel), mel_len (B,));
        the Euler solve runs in `cfm_inference` (a lax.scan that compiles the
        DiT once, not once per timestep).

        finalize=False expects each row's last pre_lookahead_len buffer
        positions to BE the lookahead context (exact streaming shapes).
        padded_streaming=True instead takes right-PADDED rows of the form
        [tokens ++ lookahead ++ zeros] with token_len covering the lookahead:
        the full-conv outputs below token_len - la are bit-identical to the
        context-split path (the conv's receptive field at those positions
        never reaches the zero padding), so rows with DIFFERENT lengths can
        share one batched program (infer/batch_stream.py young hops)."""
        c = self.cfg
        emb = embedding / jnp.maximum(jnp.linalg.norm(embedding, axis=1, keepdims=True), 1e-12)
        spks = self.spk_embed_affine_layer(emb)

        token_emb, valid = self._embed_tokens(token, token_len)
        if finalize:
            h = self.pre_lookahead_layer(token_emb)
        elif padded_streaming:
            h = self.pre_lookahead_layer(token_emb)
            valid = valid & (
                jnp.arange(token.shape[1])[None, :] < (token_len - c.pre_lookahead_len)[:, None]
            )
        else:
            h = self.pre_lookahead_layer(
                token_emb[:, : -c.pre_lookahead_len], token_emb[:, -c.pre_lookahead_len :]
            )
            valid = valid[:, : -c.pre_lookahead_len]
        h = repeat_interleave_time(h, c.token_mel_ratio)

        b, l_mel, _ = h.shape
        mel_len = jnp.sum(valid.astype(jnp.int32), axis=1) * c.token_mel_ratio

        # conds: prompt mel then zeros (flow.py:388-390)
        pf = prompt_feat.astype(h.dtype)
        if pf.shape[1] < l_mel:
            pf = jnp.pad(pf, ((0, 0), (0, l_mel - pf.shape[1]), (0, 0)))
        else:
            pf = pf[:, :l_mel]
        pos = jnp.arange(l_mel)[None, :, None]
        conds = jnp.where(pos < prompt_feat_len[:, None, None], pf, 0.0)
        return h, spks, conds, mel_len

    def prepare_chunk(
        self,
        token_ctx: jnp.ndarray,
        finalize: bool = False,
        n_valid: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """mu for ONE streaming hop's new tokens (KV-cached flow streaming).

        token_ctx: (B, 2 + n_new [+ pre_lookahead_len]) — 2 tokens of conv2
        left context, the hop's new tokens, and (unless finalize) the
        lookahead tokens. n_valid (B,) zeroes embeddings past 2 + n_valid
        (right-padded finalize rows: matches prepare_inference's padding
        mask, whose conv right context past the last real token is zeros).
        Returns mu (B, n_new * token_mel_ratio, input_size), bit-matching
        prepare_inference's rows at those positions."""
        c = self.cfg
        emb = self.input_embedding(jnp.clip(token_ctx, 0, c.vocab_size - 1))
        if n_valid is not None:
            keep = jnp.arange(token_ctx.shape[1])[None, :] < (2 + n_valid)[:, None]
            emb = emb * keep[..., None].astype(emb.dtype)
        h = self.pre_lookahead_layer(emb, chunk_left=2, chunk_finalize=finalize)
        return repeat_interleave_time(h, c.token_mel_ratio)

    def __call__(
        self,
        token: jnp.ndarray,  # (B, Lt)
        token_len: jnp.ndarray,
        feat: jnp.ndarray,  # (B, L_mel, mel) target mel
        feat_len: jnp.ndarray,
        embedding: jnp.ndarray,  # (B, 192)
        rngs_key: jax.Array,
        streaming: bool = False,
    ):
        """Training loss (flow.py:312-356 + flow_matching.py:155-193).

        Returns (loss, aux). Host-side batching decides `streaming` (the
        reference flips a coin per batch) and the prompt-conditioning mask.
        """
        c = self.cfg
        k_t, k_z, k_cfg, k_cond, k_condlen = jax.random.split(rngs_key, 5)

        emb = embedding / jnp.maximum(jnp.linalg.norm(embedding, axis=1, keepdims=True), 1e-12)
        spks = self.spk_embed_affine_layer(emb)

        token_emb, _ = self._embed_tokens(token, token_len)
        h = self.pre_lookahead_layer(token_emb)
        h = repeat_interleave_time(h, c.token_mel_ratio)

        b, l_mel, d = feat.shape
        h = h[:, :l_mel]
        mel_valid = (jnp.arange(l_mel)[None, :] < feat_len[:, None])
        mask = mel_valid[..., None].astype(feat.dtype)  # (B, L, 1)

        # random prompt conditioning: 50% of rows keep a random prefix
        use_cond = jax.random.bernoulli(k_cond, 0.5, (b,))
        cond_len = (jax.random.uniform(k_condlen, (b,)) * 0.3 * feat_len.astype(jnp.float32)).astype(jnp.int32)
        pos = jnp.arange(l_mel)[None, :]
        cond_mask = (pos < cond_len[:, None]) & use_cond[:, None]
        conds = feat * cond_mask[..., None].astype(feat.dtype)

        # CFM loss
        t = jax.random.uniform(k_t, (b, 1, 1), feat.dtype)
        z = jax.random.normal(k_z, feat.shape, feat.dtype)
        y = (1 - (1 - c.sigma_min) * t) * z + t * feat
        u = feat - (1 - c.sigma_min) * z

        # CFG dropout (flow_matching.py:185-189)
        keep = (jax.random.uniform(k_cfg, (b,)) > c.training_cfg_rate).astype(feat.dtype)
        mu = h * keep[:, None, None]
        spks_d = spks * keep[:, None]
        conds_d = conds * keep[:, None, None]

        attn_mask = chunk_attn_mask(feat_len, l_mel, c.dit.static_chunk_size if streaming else 0)
        pred = self.estimator(y, mu, t[:, 0, 0], spks_d, conds_d, attn_mask)
        se = jnp.sum(((pred - u) * mask) ** 2)
        loss = se / (jnp.sum(mask) * d)
        return loss, {"loss_cfm": loss}


def cfm_solve(
    cfg: FlowConfig,
    dit_params,
    z: jnp.ndarray,
    mu: jnp.ndarray,
    spks: jnp.ndarray,
    conds: jnp.ndarray,
    mel_len: jnp.ndarray,
    streaming: bool = False,
) -> jnp.ndarray:
    """CFG Euler solve (flow_matching.py:71-124 + 202-227) as a lax.scan.

    The DiT compiles ONCE; the 10 timesteps iterate on device. The CFG pair
    rides the batch dim (2B) so the MXU sees a single matmul stream. Calling
    DiT.apply inside the scan body is legal (apply is a pure function) —
    this lives outside the flow module deliberately.
    """
    dit = DiT(cfg.dit)
    b, l, d = z.shape
    attn_mask = chunk_attn_mask(mel_len, l, cfg.dit.static_chunk_size if streaming else 0)

    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([conds, jnp.zeros_like(conds)], axis=0)
    mask2 = jnp.concatenate([attn_mask, attn_mask], axis=0)
    rate = cfg.inference_cfg_rate

    t_span = jnp.asarray(cosine_t_span(cfg.n_timesteps), z.dtype)
    ts, dts = t_span[:-1], t_span[1:] - t_span[:-1]
    # AdaLN modulations for every (timestep, layer) in one pass — the Euler
    # scan then reads only x-dependent weights per step (dit.precompute_mods)
    all_mods = precompute_mods(
        cfg.dit, dit_params, jnp.broadcast_to(ts[:, None], (ts.shape[0], 2 * b)), z.dtype
    )

    def step(x, inp):
        t, dt, mods = inp
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * b,), t, x.dtype)
        v = dit.apply({"params": dit_params}, x2, mu2, t2, spks2, cond2, mask2, mods)
        dphi = (1.0 + rate) * v[:b] - rate * v[b:]
        return x + dt * dphi, None

    x, _ = jax.lax.scan(step, z, (ts, dts, all_mods))
    return x


def empty_kv_cache(cfg: FlowConfig, b: int, capacity: int, dtype=jnp.bfloat16) -> dict:
    """Per-Euler-step DiT KV cache for b CFG-PAIRED rows (allocate with
    b = 2 * batch). Leaves: k/v (T, depth, b, heads, capacity, dim_head) —
    HEAD-MAJOR so attention reads the cache without transposing it — plus
    the two causal-conv-position tails."""
    d = cfg.dit
    t, pad = cfg.n_timesteps, d.conv_pos_kernel - 1
    return {
        "k": jnp.zeros((t, d.depth, b, d.heads, capacity, d.dim_head), dtype),
        "v": jnp.zeros((t, d.depth, b, d.heads, capacity, d.dim_head), dtype),
        "tail1": jnp.zeros((t, b, pad, d.dim), dtype),
        "tail2": jnp.zeros((t, b, pad, d.dim), dtype),
    }


def cfm_solve_chunk(
    cfg: FlowConfig,
    dit_params,
    z: jnp.ndarray,  # (B, Lq, mel) noise for the NEW frames
    mu: jnp.ndarray,  # (B, Lq, mu_dim)
    spks: jnp.ndarray,  # (B, spk_dim)
    conds: jnp.ndarray,  # (B, Lq, mel)
    cache: dict,  # empty_kv_cache(..., 2B, C) pytree — donate for in-place
    lens: jnp.ndarray,  # (B,) frames already cached per row
    q_valid: jnp.ndarray,  # (B,) valid new frames (== Lq except finalize)
) -> tuple[jnp.ndarray, dict]:
    """ONE streaming hop of the CFG Euler solve (flow_matching.py:71-124)
    over only the NEW frames, against per-timestep KV caches.

    Exact vs the full-prefix re-solve the reference streams with
    (cli/model.py:416-441): the 50-frame chunk-causal mask plus the
    prompt_pad hop alignment (infer/stream.py) mean already-solved frames
    never see later frames, so their per-timestep K/V are final. Per-hop
    cost drops from O(prefix * timesteps) to O(chunk * timesteps) compute
    (+ cache reads). The cache is read-only inside the Euler scan; the
    hop's new K/V rows are collected across timesteps and appended with
    ONE vmapped write per hop — rewriting the stacked cache every Euler
    step was the measured bandwidth bottleneck on v5e."""
    dit = DiTChunk(cfg.dit)
    b, lq, _ = z.shape
    cap = cache["k"].shape[4]
    bias_c, bias_n = chunk_split_bias(lens, q_valid, lq, cap, cfg.dit.static_chunk_size)
    bias_c2 = jnp.concatenate([bias_c, bias_c], axis=0)
    bias_n2 = jnp.concatenate([bias_n, bias_n], axis=0)
    lens2 = jnp.concatenate([lens, lens], axis=0)
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([conds, jnp.zeros_like(conds)], axis=0)
    rate = cfg.inference_cfg_rate

    t_span = jnp.asarray(cosine_t_span(cfg.n_timesteps), z.dtype)
    ts, dts = t_span[:-1], t_span[1:] - t_span[:-1]
    # all (timestep, layer) AdaLN modulations in one pass (dit.precompute_mods)
    all_mods = precompute_mods(
        cfg.dit, dit_params, jnp.broadcast_to(ts[:, None], (ts.shape[0], 2 * b)), z.dtype
    )

    def body(x, inp):
        i, cache_t, mods = inp  # cache timestep slice arrives as scan xs (no copy)
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * b,), ts[i], x.dtype)
        v, new_ct = dit.apply(
            {"params": dit_params}, x2, mu2, t2, spks2, cond2, cache_t, lens2, bias_c2, bias_n2, mods
        )
        x = x + dts[i] * ((1.0 + rate) * v[:b] - rate * v[b:])
        return x, new_ct

    x, new = jax.lax.scan(body, z, (jnp.arange(cfg.n_timesteps), cache, all_mods))
    # new['k'/'v']: (T, depth, 2b, heads, lq, dh); tails: (T, 2b, pad, dim).
    # Append the new rows at each row's offset — one in-place write per hop.
    if b == 1:  # both CFG rows share the offset: one aliasing-friendly write
        app = lambda buf, rows: jax.lax.dynamic_update_slice(
            buf, rows.astype(buf.dtype), (0, 0, 0, 0, lens[0], 0))
        cache = {
            "k": app(cache["k"], new["k"]),
            "v": app(cache["v"], new["v"]),
            "tail1": new["tail1"].astype(cache["tail1"].dtype),
            "tail2": new["tail2"].astype(cache["tail2"].dtype),
        }
        return x, cache

    # static per-row update chain: each DUS writes one row's (T, depth, 1,
    # h, lq, dh) block at its own offset, which XLA aliases in place on the
    # donated buffer — a vmapped scatter over rows copied the ENTIRE cache
    # every hop (measured 71 ms of a 128 ms B=4 hop on v5e)
    def app(buf, rows):
        for r in range(2 * b):
            buf = jax.lax.dynamic_update_slice(
                buf, rows[:, :, r : r + 1].astype(buf.dtype),
                (0, 0, r, 0, lens2[r], 0))
        return buf

    cache = {
        "k": app(cache["k"], new["k"]),
        "v": app(cache["v"], new["v"]),
        "tail1": new["tail1"].astype(cache["tail1"].dtype),
        "tail2": new["tail2"].astype(cache["tail2"].dtype),
    }
    return x, cache


def flow_inference(
    model: CausalMaskedDiffWithDiT,
    params,
    token: jnp.ndarray,
    token_len: jnp.ndarray,
    prompt_feat: jnp.ndarray,
    prompt_feat_len: jnp.ndarray,
    embedding: jnp.ndarray,
    streaming: bool = False,
    finalize: bool = True,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full token->mel inference (flow.py:358-403). Returns (B, L_mel, mel);
    the caller slices off the prompt region [:prompt_feat_len]."""
    c = model.cfg
    mu, spks, conds, mel_len = model.apply(
        {"params": params}, token, token_len, prompt_feat, prompt_feat_len, embedding,
        finalize=finalize, method=CausalMaskedDiffWithDiT.prepare_inference,
    )
    b, l_mel, _ = mu.shape
    if noise is None:
        noise = jnp.asarray(fixed_cfm_noise()[:, :l_mel, :], mu.dtype)
    z = jnp.broadcast_to(noise[:, :l_mel, :], (b, l_mel, c.output_size)).astype(mu.dtype)
    return cfm_solve(c, params["estimator"], z, mu, spks, conds, mel_len, streaming)
