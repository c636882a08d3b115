"""RCAN (flax, NHWC). Parity with reference
basicsr/models/archs/rcan_arch.py: channel attention via global average
pooling + squeeze/excite, RCAB blocks, residual groups, EDSR-style
mean shift."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from edvr_tpu.archs.arch_util import Conv2d, Upsample, make_layer
from edvr_tpu.utils.registry import ARCH_REGISTRY


class ChannelAttention(nn.Module):
    """(reference: rcan_arch.py:7-26)"""
    num_feat: int
    squeeze_factor: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv2d(self.num_feat // self.squeeze_factor, 1, padding=0,
                   name='attention_1')(y)
        y = nn.relu(y)
        y = Conv2d(self.num_feat, 1, padding=0, name='attention_3')(y)
        return x * nn.sigmoid(y)


class RCAB(nn.Module):
    """(reference: rcan_arch.py:29-49)"""
    num_feat: int
    squeeze_factor: int = 16
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        res = Conv2d(self.num_feat, 3, padding=1, name='rcab_0')(x)
        res = nn.relu(res)
        res = Conv2d(self.num_feat, 3, padding=1, name='rcab_2')(res)
        res = ChannelAttention(self.num_feat, self.squeeze_factor,
                               name='rcab_3')(res)
        return res * self.res_scale + x


class ResidualGroup(nn.Module):
    """(reference: rcan_arch.py:52-75)"""
    num_feat: int
    num_block: int
    squeeze_factor: int = 16
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        res = make_layer(RCAB, self.num_block, name='residual_group',
                         num_feat=self.num_feat,
                         squeeze_factor=self.squeeze_factor,
                         res_scale=self.res_scale)(x)
        res = Conv2d(self.num_feat, 3, padding=1, name='conv')(res)
        return res + x


@ARCH_REGISTRY.register()
class RCAN(nn.Module):
    """(reference: rcan_arch.py:78-141)"""
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_group: int = 10
    num_block: int = 16
    squeeze_factor: int = 16
    upscale: int = 4
    res_scale: float = 1.0
    img_range: float = 255.
    rgb_mean: tuple = (0.4488, 0.4371, 0.4040)

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, dtype=x.dtype)
        x = (x - mean) * self.img_range
        x = Conv2d(self.num_feat, 3, padding=1, name='conv_first')(x)
        res = make_layer(ResidualGroup, self.num_group, name='body',
                         num_feat=self.num_feat, num_block=self.num_block,
                         squeeze_factor=self.squeeze_factor,
                         res_scale=self.res_scale)(x)
        res = Conv2d(self.num_feat, 3, padding=1,
                     name='conv_after_body')(res)
        res = res + x
        out = Upsample(self.upscale, self.num_feat, name='upsample')(res)
        out = Conv2d(self.num_out_ch, 3, padding=1, name='conv_last')(out)
        return out / self.img_range + mean
