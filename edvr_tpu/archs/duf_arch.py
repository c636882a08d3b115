"""DUF: dynamic upsampling filters video SR (flax, NDHWC).

Parity with reference basicsr/models/archs/duf_arch.py: 3D-conv dense
blocks, temporal reduction, per-pixel predicted 5x5 x r^2 softmax
filters applied to the center frame, residual + pixel shuffle.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from edvr_tpu.archs.arch_util import (torch_bias_init_for,
                                      torch_conv_kernel_init)
from edvr_tpu.ops.resize import pixel_shuffle
from edvr_tpu.utils.registry import ARCH_REGISTRY


def _conv3d_kernel_init(key, shape, dtype=jnp.float32):
    import math
    from jax import random
    fan_in = int(shape[0] * shape[1] * shape[2] * shape[3])
    bound = 1.0 / math.sqrt(fan_in)
    return random.uniform(key, shape, dtype, -bound, bound)


class Conv3d(nn.Module):
    """torch-style Conv3d on (n, t, h, w, c)."""
    features: int
    kernel_size: tuple
    padding: tuple

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kt, kh, kw = self.kernel_size
        fan_in = cin * kt * kh * kw
        return nn.Conv(self.features, self.kernel_size,
                       padding=tuple((p, p) for p in self.padding),
                       kernel_init=_conv3d_kernel_init,
                       bias_init=torch_bias_init_for(fan_in),
                       name='conv')(x)


class _BNReluConvBlock(nn.Module):
    """Sequential(BN, ReLU, Conv1x1x1, BN, ReLU, Conv3x3x3)
    (reference: duf_arch.py:33-49 and :140-158)."""
    mid_ch: int
    out_ch: int
    eps: float
    last_padding: tuple = (1, 1, 1)
    train: bool = False

    @nn.compact
    def __call__(self, x):
        bn = lambda i: nn.BatchNorm(use_running_average=not self.train,
                                    epsilon=self.eps, name=f'seq_{i}')
        x = nn.relu(bn(0)(x))
        x = Conv3d(self.mid_ch, (1, 1, 1), (0, 0, 0), name='seq_2')(x)
        x = nn.relu(bn(3)(x))
        x = Conv3d(self.out_ch, (3, 3, 3), self.last_padding,
                   name='seq_5')(x)
        return x


class DenseBlocksTemporalReduce(nn.Module):
    """(reference: duf_arch.py:7-106); each block shrinks t by 2."""
    num_feat: int = 64
    num_grow_ch: int = 32
    adapt_official_weights: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x):
        eps = 1e-3 if self.adapt_official_weights else 1e-5
        for i, name in enumerate(('temporal_reduce1', 'temporal_reduce2',
                                  'temporal_reduce3')):
            cin = x.shape[-1]
            y = _BNReluConvBlock(cin, self.num_grow_ch, eps,
                                 last_padding=(0, 1, 1), train=self.train,
                                 name=name)(x)
            x = jnp.concatenate([x[:, 1:-1], y], axis=-1)
        return x


class DenseBlocks(nn.Module):
    """(reference: duf_arch.py:109-172)"""
    num_block: int
    num_feat: int = 64
    num_grow_ch: int = 16
    adapt_official_weights: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x):
        eps = 1e-3 if self.adapt_official_weights else 1e-5
        for i in range(self.num_block):
            cin = x.shape[-1]
            y = _BNReluConvBlock(cin, self.num_grow_ch, eps,
                                 train=self.train,
                                 name=f'dense_blocks_{i}')(x)
            x = jnp.concatenate([x, y], axis=-1)
        return x


def dynamic_upsampling_filter(x, filters, filter_size=(5, 5)):
    """Apply per-pixel dynamic filters to a 3-channel image
    (reference: duf_arch.py:175-231).

    Args:
        x: (n, h, w, 3).
        filters: (n, h, w, filter_prod, up^2), softmax-normalized over
            filter_prod.

    Returns:
        (n, h, w, 3*up^2) with channel order c*up^2 + u (matching the
        reference's NCHW view for the subsequent pixel shuffle).
    """
    n, h, w, c = x.shape
    kh, kw = filter_size
    pad_h, pad_w = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    patches = [
        xp[:, i:i + h, j:j + w, :] for i in range(kh) for j in range(kw)
    ]
    expanded = jnp.stack(patches, axis=3)  # (n, h, w, kh*kw, c)
    out = jnp.einsum('nhwpc,nhwpu->nhwcu', expanded, filters,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    up2 = filters.shape[-1]
    return out.reshape(n, h, w, c * up2)


@ARCH_REGISTRY.register()
class DUF(nn.Module):
    """(reference: duf_arch.py:234-359). Input (b, 7, h, w, 3);
    output (b, h*scale, w*scale, 3)."""
    scale: int = 4
    num_layer: int = 52
    adapt_official_weights: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x):
        eps = 1e-3 if self.adapt_official_weights else 1e-5
        b, t, h, w, c = x.shape
        x_center = x[:, t // 2]

        if self.num_layer == 16:
            num_block, num_grow_ch = 3, 32
        elif self.num_layer == 28:
            num_block, num_grow_ch = 9, 16
        elif self.num_layer == 52:
            num_block, num_grow_ch = 21, 16
        else:
            raise ValueError('Only supported (16, 28, 52) layers, '
                             f'but got {self.num_layer}.')

        xf = Conv3d(64, (1, 3, 3), (0, 1, 1), name='conv3d1')(x)
        xf = DenseBlocks(num_block=num_block, num_feat=64,
                         num_grow_ch=num_grow_ch,
                         adapt_official_weights=self.adapt_official_weights,
                         train=self.train, name='dense_block1')(xf)
        xf = DenseBlocksTemporalReduce(
            64 + num_grow_ch * num_block, num_grow_ch,
            adapt_official_weights=self.adapt_official_weights,
            train=self.train, name='dense_block2')(xf)
        xf = nn.relu(nn.BatchNorm(use_running_average=not self.train,
                                  epsilon=eps, name='bn3d2')(xf))
        xf = nn.relu(Conv3d(256, (1, 3, 3), (0, 1, 1), name='conv3d2')(xf))

        res = Conv3d(3 * self.scale**2, (1, 1, 1), (0, 0, 0),
                     name='conv3d_r2')(
            nn.relu(Conv3d(256, (1, 1, 1), (0, 0, 0),
                           name='conv3d_r1')(xf)))

        filt = Conv3d(25 * self.scale**2, (1, 1, 1), (0, 0, 0),
                      name='conv3d_f2')(
            nn.relu(Conv3d(512, (1, 1, 1), (0, 0, 0),
                           name='conv3d_f1')(xf)))
        # (b, 1, h, w, 25*up^2) -> softmax over the 25 taps
        filt = filt[:, 0].reshape(b, h, w, 25, self.scale**2)
        filt = nn.softmax(filt, axis=3)

        out = dynamic_upsampling_filter(x_center, filt, (5, 5))
        out = out + res[:, 0]
        return pixel_shuffle(out, self.scale)
