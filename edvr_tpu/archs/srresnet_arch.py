"""Modified SRResNet (flax, NHWC).

Structure parity with the reference MSRResNet
(reference: basicsr/models/archs/srresnet_arch.py:7-76): conv_first ->
num_block ResidualBlockNoBN -> pixel-shuffle upsampling (x2/x3: one
stage; x4: two x2 stages) -> conv_hr/conv_last + bilinear-upsampled
global skip.
"""

from __future__ import annotations

import flax.linen as nn

from edvr_tpu.archs.arch_util import (Conv2d, ResidualBlockNoBN, lrelu,
                                      make_layer,
                                      scaled_kaiming_normal_init)
from edvr_tpu.ops.resize import interpolate, pixel_shuffle
from edvr_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register()
class MSRResNet(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 4

    @nn.compact
    def __call__(self, x):
        init01 = dict(kernel_init=scaled_kaiming_normal_init(0.1),
                      bias_init=nn.initializers.zeros)
        feat = lrelu(Conv2d(self.num_feat, 3, padding=1, name='conv_first',
                            **init01)(x))
        out = make_layer(ResidualBlockNoBN, self.num_block, name='body',
                         num_feat=self.num_feat)(feat)

        if self.upscale == 4:
            out = lrelu(pixel_shuffle(
                Conv2d(self.num_feat * 4, 3, padding=1, name='upconv1',
                       **init01)(out), 2))
            out = lrelu(pixel_shuffle(
                Conv2d(self.num_feat * 4, 3, padding=1, name='upconv2',
                       **init01)(out), 2))
        elif self.upscale in (2, 3):
            out = lrelu(pixel_shuffle(
                Conv2d(self.num_feat * self.upscale**2, 3, padding=1,
                       name='upconv1', **init01)(out), self.upscale))
        else:
            raise ValueError(f'unsupported upscale {self.upscale}')

        out = lrelu(Conv2d(self.num_feat, 3, padding=1, name='conv_hr',
                           **init01)(out))
        out = Conv2d(self.num_out_ch, 3, padding=1, name='conv_last',
                     **init01)(out)
        base = interpolate(x, scale_factor=self.upscale, mode='bilinear',
                           align_corners=False)
        return out + base
