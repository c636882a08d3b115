"""EDSR (flax, NHWC). Parity with reference
basicsr/models/archs/edsr_arch.py:8-65: mean-shift by img_range,
resblocks with pytorch-default init, Upsample, global residual."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from edvr_tpu.archs.arch_util import (Conv2d, ResidualBlockNoBN, Upsample,
                                      make_layer)
from edvr_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register()
class EDSR(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 4
    res_scale: float = 1.0
    img_range: float = 255.
    rgb_mean: tuple = (0.4488, 0.4371, 0.4040)

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, dtype=x.dtype)
        x = (x - mean) * self.img_range
        x = Conv2d(self.num_feat, 3, padding=1, name='conv_first')(x)
        res = make_layer(ResidualBlockNoBN, self.num_block, name='body',
                         num_feat=self.num_feat, res_scale=self.res_scale,
                         pytorch_init=True)(x)
        res = Conv2d(self.num_feat, 3, padding=1, name='conv_after_body')(res)
        res = res + x
        out = Upsample(self.upscale, self.num_feat, name='upsample')(res)
        out = Conv2d(self.num_out_ch, 3, padding=1, name='conv_last')(out)
        return out / self.img_range + mean
