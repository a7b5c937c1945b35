"""Torch oracle: the public 3D-Speaker CAMPPlus architecture (the model the
reference exported to campplus.onnx — cosyvoice/cli/frontend.py:45). Used
only in tests to verify models/campplus.py + the weight converter. This
reimplements the published Apache-2.0 design; the reference repo itself
ships no campplus source."""

from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F


def get_nonlinear(config_str, channels):
    seq = nn.Sequential()
    for name in config_str.split("-"):
        if name == "relu":
            seq.add_module("relu", nn.ReLU(inplace=True))
        elif name == "batchnorm":
            seq.add_module("batchnorm", nn.BatchNorm1d(channels))
        elif name == "batchnorm_":
            seq.add_module("batchnorm", nn.BatchNorm1d(channels, affine=False))
        else:
            raise ValueError(name)
    return seq


def statistics_pooling(x, dim=-1, unbiased=True):
    mean = x.mean(dim=dim)
    std = x.std(dim=dim, unbiased=unbiased)
    return torch.cat([mean, std], dim=-1)


class StatsPool(nn.Module):
    def forward(self, x):
        return statistics_pooling(x)


class TDNNLayer(nn.Module):
    def __init__(self, in_ch, out_ch, kernel, stride=1, padding=0, dilation=1, bias=False):
        super().__init__()
        if padding < 0:
            padding = (kernel - 1) // 2 * dilation
        self.linear = nn.Conv1d(in_ch, out_ch, kernel, stride=stride, padding=padding, dilation=dilation, bias=bias)
        self.nonlinear = get_nonlinear("batchnorm-relu", out_ch)

    def forward(self, x):
        return self.nonlinear(self.linear(x))


class CAMLayer(nn.Module):
    def __init__(self, bn_ch, out_ch, kernel, stride, padding, dilation, bias, reduction=2):
        super().__init__()
        self.linear_local = nn.Conv1d(bn_ch, out_ch, kernel, stride=stride, padding=padding, dilation=dilation, bias=bias)
        self.linear1 = nn.Conv1d(bn_ch, bn_ch // reduction, 1)
        self.relu = nn.ReLU(inplace=True)
        self.linear2 = nn.Conv1d(bn_ch // reduction, out_ch, 1)
        self.sigmoid = nn.Sigmoid()

    def forward(self, x):
        y = self.linear_local(x)
        context = x.mean(-1, keepdim=True) + self.seg_pooling(x)
        context = self.relu(self.linear1(context))
        m = self.sigmoid(self.linear2(context))
        return y * m

    def seg_pooling(self, x, seg_len=100):
        seg = F.avg_pool1d(x, kernel_size=seg_len, stride=seg_len, ceil_mode=True)
        shape = seg.shape
        seg = seg.unsqueeze(-1).expand(*shape, seg_len).reshape(*shape[:-1], -1)
        return seg[..., : x.shape[-1]]


class CAMDenseTDNNLayer(nn.Module):
    def __init__(self, in_ch, out_ch, bn_ch, kernel, stride=1, dilation=1, bias=False):
        super().__init__()
        padding = (kernel - 1) // 2 * dilation
        self.nonlinear1 = get_nonlinear("batchnorm-relu", in_ch)
        self.linear1 = nn.Conv1d(in_ch, bn_ch, 1, bias=False)
        self.nonlinear2 = get_nonlinear("batchnorm-relu", bn_ch)
        self.cam_layer = CAMLayer(bn_ch, out_ch, kernel, stride=stride, padding=padding, dilation=dilation, bias=bias)

    def forward(self, x):
        x = self.linear1(self.nonlinear1(x))
        return self.cam_layer(self.nonlinear2(x))


class CAMDenseTDNNBlock(nn.ModuleList):
    def __init__(self, num_layers, in_ch, out_ch, bn_ch, kernel, stride=1, dilation=1, bias=False):
        super().__init__()
        for i in range(num_layers):
            self.add_module(
                "tdnnd%d" % (i + 1),
                CAMDenseTDNNLayer(in_ch + i * out_ch, out_ch, bn_ch, kernel, stride=stride, dilation=dilation, bias=bias),
            )

    def forward(self, x):
        for layer in self:
            x = torch.cat([x, layer(x)], dim=1)
        return x


class TransitLayer(nn.Module):
    def __init__(self, in_ch, out_ch, bias=True):
        super().__init__()
        self.nonlinear = get_nonlinear("batchnorm-relu", in_ch)
        self.linear = nn.Conv1d(in_ch, out_ch, 1, bias=bias)

    def forward(self, x):
        return self.linear(self.nonlinear(x))


class DenseLayer(nn.Module):
    def __init__(self, in_ch, out_ch, bias=False, config_str="batchnorm_"):
        super().__init__()
        self.linear = nn.Conv1d(in_ch, out_ch, 1, bias=bias)
        self.nonlinear = get_nonlinear(config_str, out_ch)

    def forward(self, x):
        if len(x.shape) == 2:
            x = self.linear(x.unsqueeze(-1)).squeeze(-1)
        else:
            x = self.linear(x)
        return self.nonlinear(x)


class BasicResBlock(nn.Module):
    expansion = 1

    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, kernel_size=3, stride=(stride, 1), padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, kernel_size=3, stride=1, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.shortcut = nn.Sequential()
        if stride != 1 or in_planes != self.expansion * planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, self.expansion * planes, kernel_size=1, stride=(stride, 1), bias=False),
                nn.BatchNorm2d(self.expansion * planes),
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        out = out + self.shortcut(x)
        return F.relu(out)


class FCM(nn.Module):
    def __init__(self, num_blocks=(2, 2), m_channels=32, feat_dim=80):
        super().__init__()
        self.in_planes = m_channels
        self.conv1 = nn.Conv2d(1, m_channels, kernel_size=3, stride=1, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(m_channels)
        self.layer1 = self._make_layer(m_channels, num_blocks[0], stride=2)
        self.layer2 = self._make_layer(m_channels, num_blocks[1], stride=2)
        self.conv2 = nn.Conv2d(m_channels, m_channels, kernel_size=3, stride=(2, 1), padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(m_channels)
        self.out_channels = m_channels * (feat_dim // 8)

    def _make_layer(self, planes, num_blocks, stride):
        layers = []
        for s in [stride] + [1] * (num_blocks - 1):
            layers.append(BasicResBlock(self.in_planes, planes, s))
            self.in_planes = planes * BasicResBlock.expansion
        return nn.Sequential(*layers)

    def forward(self, x):
        x = x.unsqueeze(1)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.layer1(out)
        out = self.layer2(out)
        out = F.relu(self.bn2(self.conv2(out)))
        shape = out.shape
        return out.reshape(shape[0], shape[1] * shape[2], shape[3])


class CAMPPlus(nn.Module):
    def __init__(self, feat_dim=80, embedding_size=192, growth_rate=32, bn_size=4,
                 init_channels=128, block_layers=(12, 24, 16)):
        super().__init__()
        self.head = FCM(feat_dim=feat_dim)
        channels = self.head.out_channels
        self.xvector = nn.Sequential(
            OrderedDict([("tdnn", TDNNLayer(channels, init_channels, 5, stride=2, dilation=1, padding=-1))])
        )
        channels = init_channels
        for i, (num_layers, kernel, dilation) in enumerate(zip(block_layers, (3, 3, 3), (1, 2, 2))):
            self.xvector.add_module(
                "block%d" % (i + 1),
                CAMDenseTDNNBlock(num_layers, channels, growth_rate, bn_size * growth_rate, kernel, dilation=dilation),
            )
            channels = channels + num_layers * growth_rate
            self.xvector.add_module("transit%d" % (i + 1), TransitLayer(channels, channels // 2, bias=False))
            channels //= 2
        self.xvector.add_module("out_nonlinear", get_nonlinear("batchnorm-relu", channels))
        self.xvector.add_module("stats", StatsPool())
        self.xvector.add_module("dense", DenseLayer(channels * 2, embedding_size, config_str="batchnorm_"))

    def forward(self, x):  # (B, T, F)
        x = x.permute(0, 2, 1)
        x = self.head(x)
        return self.xvector(x)
