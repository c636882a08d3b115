"""VGG-style 128x128 discriminator for SRGAN/ESRGAN (flax, NHWC)
(reference: basicsr/models/archs/discriminator_arch.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from edvr_tpu.archs.arch_util import (Conv2d, lrelu, torch_bias_init_for,
                                      torch_conv_kernel_init)
from edvr_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register()
class VGGStyleDiscriminator128(nn.Module):
    num_in_ch: int = 3
    num_feat: int = 64
    train: bool = False

    @nn.compact
    def __call__(self, x):
        assert x.shape[1] == 128 and x.shape[2] == 128, (
            f'Input spatial size must be 128x128, but received {x.shape}.')
        nf = self.num_feat

        def bn(name):
            return nn.BatchNorm(use_running_average=not self.train,
                                momentum=0.9, epsilon=1e-5, name=name)

        act = lambda v: lrelu(v, 0.2)
        feat = act(Conv2d(nf, 3, padding=1, name='conv0_0')(x))
        feat = act(bn('bn0_1')(Conv2d(nf, 4, stride=2, padding=1,
                                      use_bias=False,
                                      name='conv0_1')(feat)))
        spec = [(nf * 2, 'conv1_0', 'bn1_0', 'conv1_1', 'bn1_1'),
                (nf * 4, 'conv2_0', 'bn2_0', 'conv2_1', 'bn2_1'),
                (nf * 8, 'conv3_0', 'bn3_0', 'conv3_1', 'bn3_1'),
                (nf * 8, 'conv4_0', 'bn4_0', 'conv4_1', 'bn4_1')]
        for ch, c0, b0, c1, b1 in spec:
            feat = act(bn(b0)(Conv2d(ch, 3, padding=1, use_bias=False,
                                     name=c0)(feat)))
            feat = act(bn(b1)(Conv2d(ch, 4, stride=2, padding=1,
                                     use_bias=False, name=c1)(feat)))

        # flatten in torch NCHW order for linear-weight compatibility
        b = feat.shape[0]
        feat = feat.transpose(0, 3, 1, 2).reshape(b, -1)
        fan_in = feat.shape[-1]
        feat = act(nn.Dense(100, kernel_init=torch_conv_kernel_init,
                            bias_init=torch_bias_init_for(fan_in),
                            name='linear1')(feat))
        out = nn.Dense(1, kernel_init=torch_conv_kernel_init,
                       bias_init=torch_bias_init_for(100),
                       name='linear2')(feat)
        return out
