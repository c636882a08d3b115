"""DFDNet building blocks (flax, NHWC)
(reference: basicsr/models/archs/dfdnet_util.py).

Spectral-normalized convs appear here as plain convs: DFDNet is
inference-only and the norm is folded into the weights at checkpoint
conversion (see edvr_tpu/convert/torch_import.py fold_spectral_norm).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from edvr_tpu.archs.arch_util import Conv2d, lrelu


def blur(x: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 binomial blur (reference: dfdnet_util.py:8-62)."""
    import jax.lax as lax
    k = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32)
    k = k / k.sum()
    c = x.shape[-1]
    kernel = jnp.asarray(np.tile(k[:, :, None, None], (1, 1, 1, c)),
                         x.dtype)
    return lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)), feature_group_count=c,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def calc_mean_std(feat: jnp.ndarray, eps: float = 1e-5):
    """Per-sample/channel spatial mean and std (unbiased variance like
    torch) (reference: dfdnet_util.py:65-79)."""
    n, h, w, c = feat.shape
    flat = feat.reshape(n, h * w, c)
    mean = flat.mean(axis=1)[:, None, None, :]
    var = flat.var(axis=1, ddof=1) + eps
    std = jnp.sqrt(var)[:, None, None, :]
    return mean, std


def adaptive_instance_normalization(content_feat, style_feat):
    """AdaIN (reference: dfdnet_util.py:82-96)."""
    style_mean, style_std = calc_mean_std(style_feat)
    content_mean, content_std = calc_mean_std(content_feat)
    normalized = (content_feat - content_mean) / content_std
    return normalized * style_std + style_mean


class AttentionBlock(nn.Module):
    """(reference: dfdnet_util.py:99-103)"""
    in_channel: int

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.in_channel, 3, padding=1, name='seq_0')(x)
        x = lrelu(x, 0.2)
        return Conv2d(self.in_channel, 3, padding=1, name='seq_2')(x)


class ConvBlockSN(nn.Module):
    """conv_block used in MSDilationBlock (reference: dfdnet_util.py:106-133)."""
    out_channels: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = ((self.kernel_size - 1) // 2) * self.dilation
        x = Conv2d(self.out_channels, self.kernel_size, padding=pad,
                   dilation=self.dilation, name='seq_0')(x)
        x = lrelu(x, 0.2)
        return Conv2d(self.out_channels, self.kernel_size, padding=pad,
                      dilation=self.dilation, name='seq_2')(x)


class MSDilationBlock(nn.Module):
    """Multi-scale dilation block (reference: dfdnet_util.py:136-171)."""
    in_channels: int
    kernel_size: int = 3
    dilation: tuple = (1, 1, 1, 1)

    @nn.compact
    def __call__(self, x):
        outs = [
            ConvBlockSN(self.in_channels, self.kernel_size,
                        self.dilation[i], name=f'conv_blocks_{i}')(x)
            for i in range(4)
        ]
        out = jnp.concatenate(outs, axis=-1)
        out = Conv2d(self.in_channels, self.kernel_size,
                     padding=(self.kernel_size - 1) // 2,
                     name='conv_fusion')(out)
        return out + x


class UpResBlock(nn.Module):
    """(reference: dfdnet_util.py:174-186)"""
    in_channel: int

    @nn.compact
    def __call__(self, x):
        out = Conv2d(self.in_channel, 3, padding=1, name='body_0')(x)
        out = lrelu(out, 0.2)
        out = Conv2d(self.in_channel, 3, padding=1, name='body_2')(out)
        return x + out
