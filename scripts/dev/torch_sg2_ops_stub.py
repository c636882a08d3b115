"""Pure-torch stand-ins for the reference's fused_act / upfirdn2d CUDA
extensions, used ONLY to run the reference StyleGAN2 on CPU for golden
fixture generation. Semantics follow the extension contracts
(basicsr/models/ops/...): upfirdn = zero-insert -> pad/crop -> FIR
convolution (flipped-kernel correlation) -> stride subsample;
fused_leaky_relu = leaky_relu(x + bias, 0.2) * sqrt(2).
"""


import torch
import torch.nn.functional as F
from torch import nn


def upfirdn2d_torch(x, kernel, up=1, down=1, pad=(0, 0)):
    if len(pad) == 2:
        px0, px1, py0, py1 = pad[0], pad[1], pad[0], pad[1]
    else:
        px0, px1, py0, py1 = pad
    b, c, h, w = x.shape
    v = x.reshape(b * c, 1, h, w)
    if up > 1:
        z = torch.zeros(b * c, 1, h * up, w * up, dtype=x.dtype)
        z[:, :, ::up, ::up] = v
        v = z
    v = F.pad(v, (max(px0, 0), max(px1, 0), max(py0, 0), max(py1, 0)))
    H, W = v.shape[2], v.shape[3]
    v = v[:, :, max(-py0, 0):H - max(-py1, 0),
          max(-px0, 0):W - max(-px1, 0)]
    k = torch.flip(kernel, [0, 1]).view(1, 1, *kernel.shape).to(x.dtype)
    v = F.conv2d(v, k)
    v = v[:, :, ::down, ::down]
    return v.reshape(b, c, v.shape[2], v.shape[3])


def fused_leaky_relu(x, bias, negative_slope=0.2, scale=2**0.5):
    if bias is not None:
        x = x + bias.view(1, -1, *([1] * (x.ndim - 2)))
    return F.leaky_relu(x, negative_slope) * scale


class FusedLeakyReLU(nn.Module):

    def __init__(self, channel, negative_slope=0.2, scale=2**0.5):
        super().__init__()
        self.bias = nn.Parameter(torch.zeros(channel))
        self.negative_slope = negative_slope
        self.scale = scale

    def forward(self, x):
        return fused_leaky_relu(x, self.bias, self.negative_slope,
                                self.scale)
