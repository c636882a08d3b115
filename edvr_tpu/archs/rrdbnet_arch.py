"""RRDBNet / ESRGAN generator (flax, NHWC).

Parity with reference basicsr/models/archs/rrdbnet_arch.py: dense
blocks with 0.2 residual scaling, RRDB trunk, nearest x2 upsampling
twice (x4 only).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from edvr_tpu.archs.arch_util import (Conv2d, lrelu, make_layer,
                                      scaled_kaiming_normal_init)
from edvr_tpu.ops.resize import interpolate
from edvr_tpu.utils.registry import ARCH_REGISTRY


class ResidualDenseBlock(nn.Module):
    """(reference: rrdbnet_arch.py:8-41)"""
    num_feat: int = 64
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        init01 = dict(kernel_init=scaled_kaiming_normal_init(0.1),
                      bias_init=nn.initializers.zeros)
        act = lambda v: lrelu(v, 0.2)
        x1 = act(Conv2d(self.num_grow_ch, 3, padding=1, name='conv1',
                        **init01)(x))
        x2 = act(Conv2d(self.num_grow_ch, 3, padding=1, name='conv2',
                        **init01)(jnp.concatenate([x, x1], -1)))
        x3 = act(Conv2d(self.num_grow_ch, 3, padding=1, name='conv3',
                        **init01)(jnp.concatenate([x, x1, x2], -1)))
        x4 = act(Conv2d(self.num_grow_ch, 3, padding=1, name='conv4',
                        **init01)(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = Conv2d(self.num_feat, 3, padding=1, name='conv5',
                    **init01)(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """Residual in Residual Dense Block (reference: rrdbnet_arch.py:44-65)"""
    num_feat: int
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 name='rdb1')(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 name='rdb2')(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 name='rdb3')(out)
        return out * 0.2 + x


@ARCH_REGISTRY.register()
class RRDBNet(nn.Module):
    """(reference: rrdbnet_arch.py:68-113; x4 only)"""
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        act = lambda v: lrelu(v, 0.2)
        feat = Conv2d(self.num_feat, 3, padding=1, name='conv_first')(x)
        body = make_layer(RRDB, self.num_block, name='body',
                          num_feat=self.num_feat,
                          num_grow_ch=self.num_grow_ch)(feat)
        body = Conv2d(self.num_feat, 3, padding=1, name='conv_body')(body)
        feat = feat + body
        feat = act(Conv2d(self.num_feat, 3, padding=1, name='conv_up1')(
            interpolate(feat, scale_factor=2, mode='nearest')))
        feat = act(Conv2d(self.num_feat, 3, padding=1, name='conv_up2')(
            interpolate(feat, scale_factor=2, mode='nearest')))
        out = act(Conv2d(self.num_feat, 3, padding=1, name='conv_hr')(feat))
        out = Conv2d(self.num_out_ch, 3, padding=1, name='conv_last')(out)
        return out
