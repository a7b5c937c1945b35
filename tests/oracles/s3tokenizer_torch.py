"""Torch oracle: the public FunAudioLLM S3Tokenizer v2 architecture (the
torch model the `s3tokenizer` package loads speech_tokenizer ONNX weights
into — the reference's Triton runtime imports that package,
runtime/triton_trtllm/model_repo/audio_tokenizer/1/model.py:34-58). Used
only in tests to verify models/s3tokenizer.py + the weight converter."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class MultiHeadAttention(nn.Module):
    def __init__(self, n_state, n_head):
        super().__init__()
        self.n_head = n_head
        self.query = nn.Linear(n_state, n_state)
        self.key = nn.Linear(n_state, n_state, bias=False)
        self.value = nn.Linear(n_state, n_state)
        self.out = nn.Linear(n_state, n_state)


class FSMNMultiHeadAttention(MultiHeadAttention):
    def __init__(self, n_state, n_head, kernel_size=31):
        super().__init__(n_state, n_head)
        self.fsmn_block = nn.Conv1d(n_state, n_state, kernel_size, stride=1, padding=0, groups=n_state, bias=False)
        self.left_padding = (kernel_size - 1) // 2
        self.right_padding = kernel_size - 1 - self.left_padding
        self.pad_fn = nn.ConstantPad1d((self.left_padding, self.right_padding), 0.0)

    def forward_fsmn(self, inputs, mask):
        b, t, _, _ = inputs.size()
        inputs = inputs.view(b, t, -1)
        if mask is not None:
            inputs = inputs * mask
        x = self.pad_fn(inputs.transpose(1, 2))
        x = self.fsmn_block(x).transpose(1, 2)
        x = x + inputs
        return x * mask

    def forward(self, x, mask=None, mask_pad=None):
        q = self.query(x)
        k = self.key(x)
        v = self.value(x)
        b, t, d = q.shape
        scale = (d // self.n_head) ** -0.25
        qh = (q * scale).view(b, t, self.n_head, -1).permute(0, 2, 1, 3)
        kh = (k * scale).view(b, t, self.n_head, -1).permute(0, 2, 1, 3)
        vh4 = v.view(b, t, self.n_head, -1)
        fsm_memory = self.forward_fsmn(vh4, mask_pad)
        vh = vh4.permute(0, 2, 1, 3)
        qk = qh @ kh.transpose(-1, -2)
        if mask is not None:
            qk = qk + mask
        w = F.softmax(qk.float(), dim=-1).to(q.dtype)
        wv = (w @ vh).permute(0, 2, 1, 3).flatten(start_dim=2)
        return self.out(wv + fsm_memory)


class ResidualAttentionBlock(nn.Module):
    def __init__(self, n_state, n_head, kernel_size=31):
        super().__init__()
        self.attn = FSMNMultiHeadAttention(n_state, n_head, kernel_size)
        self.attn_ln = nn.LayerNorm(n_state, eps=1e-6)
        n_mlp = n_state * 4
        self.mlp = nn.Sequential(nn.Linear(n_state, n_mlp), nn.GELU(), nn.Linear(n_mlp, n_state))
        self.mlp_ln = nn.LayerNorm(n_state)

    def forward(self, x, mask, mask_pad):
        x = x + self.attn(self.attn_ln(x), mask=mask, mask_pad=mask_pad)
        x = x + self.mlp(self.mlp_ln(x))
        return x


class AudioEncoderV2(nn.Module):
    def __init__(self, n_mels, n_state, n_head, n_layer, stride=2, kernel_size=31):
        super().__init__()
        self.stride = stride
        self.conv1 = nn.Conv1d(n_mels, n_state, 3, stride=stride, padding=1)
        self.conv2 = nn.Conv1d(n_state, n_state, 3, stride=2, padding=1)
        self.blocks = nn.ModuleList([ResidualAttentionBlock(n_state, n_head, kernel_size) for _ in range(n_layer)])

    def forward(self, x, x_len):
        # x: (B, n_mels, T)
        t = x.size(-1)
        mask = (torch.arange(t)[None, :] < x_len[:, None]).unsqueeze(1).to(x.dtype)
        x = F.gelu(self.conv1(x * mask))
        x_len = (x_len + 1) // self.stride
        mask = (torch.arange(x.size(-1))[None, :] < x_len[:, None]).unsqueeze(1).to(x.dtype)
        x = F.gelu(self.conv2(x * mask))
        x_len = (x_len + 1) // 2
        x = x.permute(0, 2, 1)
        valid = (torch.arange(x.size(1))[None, :] < x_len[:, None]).to(x.dtype)  # (B,T)
        mask_pad = valid.unsqueeze(-1)
        attn_bias = (1.0 - valid)[:, None, None, :] * -1e10  # (B,1,1,Tk)
        for block in self.blocks:
            x = block(x, attn_bias, mask_pad)
        return x, x_len


class FSQCodebook(nn.Module):
    def __init__(self, dim, level=3):
        super().__init__()
        self.project_down = nn.Linear(dim, 8)
        self.level = level

    def encode(self, x):
        b, t, _ = x.shape
        h = torch.tanh(self.project_down(x.reshape(b * t, -1)))
        h = h * 0.9990000128746033
        h = h.round() + 1
        powers = torch.pow(self.level, torch.arange(8))
        mu = torch.sum(h * powers[None, :], dim=-1)
        return mu.reshape(b, t).int()


class S3TokenizerV2(nn.Module):
    def __init__(self, n_mels=128, n_state=1280, n_head=20, n_layer=6, kernel_size=31):
        super().__init__()
        self.encoder = AudioEncoderV2(n_mels, n_state, n_head, n_layer, stride=2, kernel_size=kernel_size)
        self.quantizer = FSQCodebook(n_state)

    def quantize(self, mel, mel_len):
        hidden, code_len = self.encoder(mel, mel_len)
        return self.quantizer.encode(hidden), code_len

    def hidden(self, mel, mel_len):
        return self.encoder(mel, mel_len)
