"""Import the reference PyTorch source (/root/reference/CosyVoice) as a test
oracle, shimming the packages absent from this image:

- x_transformers: RotaryEmbedding / apply_rotary_pos_emb implemented for
  real (interleaved GPT-J pairing, partial rotation of the first rot_dim
  channels) — the DiT applies these functionally, a mock won't do
- diffusers: the handful of blocks matcha's BasicTransformerBlock uses
  (GEGLU/GELU/Attention/LoRACompatibleLinear), implemented functionally so
  the U-Net decoder oracle actually runs
- torchaudio / conformer: import-time-only stubs (never called)
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

REF = "/root/reference/CosyVoice"


def _mod(name: str, package: bool = False) -> types.ModuleType:
    m = types.ModuleType(name)
    spec = importlib.machinery.ModuleSpec(name, None, is_package=package)
    m.__spec__ = spec
    if package:
        m.__path__ = []
    return m


def install() -> None:
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
        sys.path.insert(0, REF + "/third_party/Matcha-TTS")

    if "x_transformers" not in sys.modules:
        def rotate_half(x):
            x1, x2 = x[..., 0::2], x[..., 1::2]
            return torch.stack((-x2, x1), dim=-1).flatten(-2)

        def apply_rotary_pos_emb(t, freqs, scale=1):
            rot_dim, seq_len = freqs.shape[-1], t.shape[-2]
            orig_dtype = t.dtype
            freqs = freqs[-seq_len:, :]
            t_rot, t_unrot = t[..., :rot_dim], t[..., rot_dim:]
            t_rot = (t_rot * freqs.cos() * scale) + (rotate_half(t_rot) * freqs.sin() * scale)
            return torch.cat((t_rot, t_unrot), dim=-1).to(orig_dtype)

        class RotaryEmbedding(torch.nn.Module):
            def __init__(self, dim, base=10000):
                super().__init__()
                inv = 1.0 / (base ** (torch.arange(0, dim, 2).float() / dim))
                self.register_buffer("inv_freq", inv)

            def forward_from_seq_len(self, seq_len):
                t = torch.arange(seq_len).type_as(self.inv_freq)
                freqs = torch.einsum("i,j->ij", t, self.inv_freq)
                freqs = torch.stack((freqs, freqs), dim=-1).flatten(-2)
                return freqs, 1.0

        xt = _mod("x_transformers", package=True)
        xtx = _mod("x_transformers.x_transformers")
        xtx.RotaryEmbedding = RotaryEmbedding
        xtx.apply_rotary_pos_emb = apply_rotary_pos_emb
        xtx.rotate_half = rotate_half
        xt.x_transformers = xtx
        sys.modules["x_transformers"] = xt
        sys.modules["x_transformers.x_transformers"] = xtx

    if "torchaudio" not in sys.modules:
        ta = _mod("torchaudio", package=True)
        tr = _mod("torchaudio.transforms")
        comp = _mod("torchaudio.compliance", package=True)
        kaldi = _mod("torchaudio.compliance.kaldi")

        class _Unused:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                raise RuntimeError("torchaudio stub called")

        tr.MelSpectrogram = _Unused
        tr.Spectrogram = _Unused
        tr.Resample = _Unused
        ta.transforms = tr
        ta.compliance = comp
        comp.kaldi = kaldi
        ta.load = _Unused()
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tr
        sys.modules["torchaudio.compliance"] = comp
        sys.modules["torchaudio.compliance.kaldi"] = kaldi

    if "omegaconf" not in sys.modules:
        om = _mod("omegaconf")
        om.DictConfig = dict
        om.ListConfig = list
        sys.modules["omegaconf"] = om

    if "matcha.utils" not in sys.modules:
        # the real matcha.utils.__init__ pulls hydra/lightning/rich; shim the
        # package and the one submodule the model code uses (pylogger)
        import logging

        mu = _mod("matcha.utils", package=True)
        mp = _mod("matcha.utils.pylogger")
        mp.get_pylogger = lambda name=None: logging.getLogger(name or "matcha")
        mu.pylogger = mp
        sys.modules["matcha.utils"] = mu
        sys.modules["matcha.utils.pylogger"] = mp

    if "conformer" not in sys.modules:
        c = _mod("conformer")

        class ConformerBlock(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        c.ConformerBlock = ConformerBlock
        sys.modules["conformer"] = c

    if "diffusers" not in sys.modules:
        import torch.nn as nn
        import torch.nn.functional as F

        d = _mod("diffusers", package=True)
        dm = _mod("diffusers.models", package=True)
        da = _mod("diffusers.models.activations")
        datt = _mod("diffusers.models.attention")
        dap = _mod("diffusers.models.attention_processor")
        dlora = _mod("diffusers.models.lora")
        du = _mod("diffusers.utils", package=True)
        dut = _mod("diffusers.utils.torch_utils")

        def get_activation(name):
            return {"silu": nn.SiLU(), "gelu": nn.GELU(), "mish": nn.Mish(),
                    "relu": nn.ReLU(), "swish": nn.SiLU()}[name]

        class LoRACompatibleLinear(nn.Linear):
            pass

        class GELU(nn.Module):
            def __init__(self, dim_in, dim_out, approximate="none"):
                super().__init__()
                self.proj = nn.Linear(dim_in, dim_out)
                self.approximate = approximate

            def forward(self, x):
                return F.gelu(self.proj(x), approximate=self.approximate)

        class GEGLU(nn.Module):
            def __init__(self, dim_in, dim_out):
                super().__init__()
                self.proj = LoRACompatibleLinear(dim_in, dim_out * 2)

            def forward(self, x):
                h, gate = self.proj(x).chunk(2, dim=-1)
                return h * F.gelu(gate)

        class ApproximateGELU(nn.Module):
            def __init__(self, dim_in, dim_out):
                super().__init__()
                self.proj = nn.Linear(dim_in, dim_out)

            def forward(self, x):
                x = self.proj(x)
                return x * torch.sigmoid(1.702 * x)

        class AdaLayerNorm(nn.Module):
            def __init__(self, embedding_dim, num_embeddings):
                super().__init__()
                self.emb = nn.Embedding(num_embeddings, embedding_dim)
                self.silu = nn.SiLU()
                self.linear = nn.Linear(embedding_dim, embedding_dim * 2)
                self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False)

            def forward(self, x, timestep):
                emb = self.linear(self.silu(self.emb(timestep)))
                scale, shift = torch.chunk(emb, 2, dim=-1)
                return self.norm(x) * (1 + scale) + shift

        class AdaLayerNormZero(nn.Module):
            def __init__(self, embedding_dim, num_embeddings=None):
                super().__init__()
                self.silu = nn.SiLU()
                self.linear = nn.Linear(embedding_dim, 6 * embedding_dim, bias=True)
                self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False, eps=1e-6)

            def forward(self, x, emb):
                emb = self.linear(self.silu(emb))
                shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = emb.chunk(6, dim=1)
                x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
                return x, gate_msa, shift_mlp, scale_mlp, gate_mlp

        class Attention(nn.Module):
            """diffusers MHA as matcha's BasicTransformerBlock uses it:
            sdpa with a broadcastable additive/boolean attention_mask."""

            def __init__(self, query_dim, cross_attention_dim=None, heads=8, dim_head=64,
                         dropout=0.0, bias=False, upcast_attention=False, out_bias=True, **kw):
                super().__init__()
                inner = heads * dim_head
                self.heads = heads
                kv_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
                self.to_q = nn.Linear(query_dim, inner, bias=bias)
                self.to_k = nn.Linear(kv_dim, inner, bias=bias)
                self.to_v = nn.Linear(kv_dim, inner, bias=bias)
                self.to_out = nn.ModuleList([nn.Linear(inner, query_dim, bias=out_bias), nn.Dropout(dropout)])

            def forward(self, hidden_states, encoder_hidden_states=None, attention_mask=None, **kw):
                ctx = encoder_hidden_states if encoder_hidden_states is not None else hidden_states
                b = hidden_states.shape[0]
                q, k, v = self.to_q(hidden_states), self.to_k(ctx), self.to_v(ctx)
                h = self.heads
                dh = q.shape[-1] // h
                q = q.view(b, -1, h, dh).transpose(1, 2)
                k = k.view(b, -1, h, dh).transpose(1, 2)
                v = v.view(b, -1, h, dh).transpose(1, 2)
                mask = attention_mask
                if mask is not None and mask.dim() == 3:
                    mask = mask.unsqueeze(1)
                out = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)
                out = out.transpose(1, 2).reshape(b, -1, h * dh)
                return self.to_out[1](self.to_out[0](out))

        def maybe_allow_in_graph(cls):
            return cls

        da.get_activation = get_activation
        datt.GEGLU = GEGLU
        datt.GELU = GELU
        datt.ApproximateGELU = ApproximateGELU
        datt.AdaLayerNorm = AdaLayerNorm
        datt.AdaLayerNormZero = AdaLayerNormZero
        dap.Attention = Attention
        dlora.LoRACompatibleLinear = LoRACompatibleLinear
        dut.maybe_allow_in_graph = maybe_allow_in_graph
        d.models = dm
        dm.activations = da
        dm.attention = datt
        dm.attention_processor = dap
        dm.lora = dlora
        d.utils = du
        du.torch_utils = dut
        for name, m in (("diffusers", d), ("diffusers.models", dm),
                        ("diffusers.models.activations", da), ("diffusers.models.attention", datt),
                        ("diffusers.models.attention_processor", dap), ("diffusers.models.lora", dlora),
                        ("diffusers.utils", du), ("diffusers.utils.torch_utils", dut)):
            sys.modules[name] = m


def load(module_name: str):
    install()
    import importlib

    return importlib.import_module(module_name)
