"""Pure-torch modulated deformable conv used ONLY to generate golden
fixtures from the reference architectures on CPU (the reference's own
DCN is a CUDA extension that cannot run here). Implements the same
semantics as edvr_tpu.ops.dcn (offset layout [dg][2K] interleaved y/x,
per-tap zero-boundary bilinear); the fixture-generation script verifies
this stub against the JAX op before trusting any golden it produces.
"""

import math

import torch
from torch import nn


def modulated_deform_conv_torch(x, offset, mask, weight, bias, stride=1,
                                padding=1, dilation=1, groups=1, dg=1):
    n, cin, h, w = x.shape
    cout, cin_g, kh, kw = weight.shape
    K = kh * kw
    oh = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    ow = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    c_per = cin // dg

    base_y = torch.arange(oh, dtype=x.dtype) * stride - padding
    base_x = torch.arange(ow, dtype=x.dtype) * stride - padding
    tap_dy = (torch.arange(kh, dtype=x.dtype) * dilation).repeat_interleave(kw)
    tap_dx = (torch.arange(kw, dtype=x.dtype) * dilation).repeat(kh)

    off = offset.view(n, dg, K, 2, oh, ow)
    cy = base_y.view(1, 1, 1, oh, 1) + tap_dy.view(1, 1, K, 1, 1) + off[:, :, :, 0]
    cx = base_x.view(1, 1, 1, 1, ow) + tap_dx.view(1, 1, K, 1, 1) + off[:, :, :, 1]

    xg = x.view(n, dg, c_per, h * w)
    y0 = cy.floor()
    x0 = cx.floor()
    fy = cy - y0
    fx = cx - x0

    def tap(yi, xi, wgt):
        valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        idx = (yi.clamp(0, h - 1) * w + xi.clamp(0, w - 1)).long()
        idxf = idx.view(n, dg, 1, K * oh * ow).expand(-1, -1, c_per, -1)
        vals = torch.gather(xg, 3, idxf).view(n, dg, c_per, K, oh, ow)
        return vals * (wgt * valid.to(x.dtype)).unsqueeze(2)

    col = (tap(y0, x0, (1 - fy) * (1 - fx)) + tap(y0, x0 + 1, (1 - fy) * fx)
           + tap(y0 + 1, x0, fy * (1 - fx)) + tap(y0 + 1, x0 + 1, fy * fx))
    col = col * mask.view(n, dg, 1, K, oh, ow)
    col = col.reshape(n, cin, K, oh, ow)

    cout_g = cout // groups
    outs = []
    for g in range(groups):
        cg = col[:, g * cin_g:(g + 1) * cin_g]  # (n, cin_g, K, oh, ow)
        wg = weight[g * cout_g:(g + 1) * cout_g].view(cout_g, cin_g, K)
        outs.append(torch.einsum('nckhw,ock->nohw', cg, wg))
    out = torch.cat(outs, dim=1)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


class ModulatedDeformConvPackStub(nn.Module):
    """Parameter-compatible stand-in for the reference's
    ModulatedDeformConvPack (deform_conv.py:345-390)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deformable_groups=1,
                 bias=True):
        super().__init__()
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.deformable_groups = deformable_groups
        self.weight = nn.Parameter(
            torch.empty(out_channels, in_channels // groups, *kernel_size))
        self.bias = nn.Parameter(torch.empty(out_channels)) if bias else None
        self.conv_offset = nn.Conv2d(
            in_channels, deformable_groups * 3 * kernel_size[0] *
            kernel_size[1], kernel_size=kernel_size, stride=stride,
            padding=padding, dilation=dilation, bias=True)
        self.init_weights()

    def init_weights(self):
        n = self.in_channels * self.kernel_size[0] * self.kernel_size[1]
        stdv = 1. / math.sqrt(n)
        self.weight.data.uniform_(-stdv, stdv)
        if self.bias is not None:
            self.bias.data.zero_()
        self.conv_offset.weight.data.zero_()
        self.conv_offset.bias.data.zero_()


def mdc_functional(x, offset, mask, weight, bias, stride, padding, dilation,
                   groups, deformable_groups):
    return modulated_deform_conv_torch(x, offset, mask, weight, bias,
                                       stride, padding, dilation, groups,
                                       deformable_groups)
