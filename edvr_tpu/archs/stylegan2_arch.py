"""StyleGAN2 generator and discriminator (flax, NHWC).

Structure parity with reference basicsr/models/archs/stylegan2_arch.py.
TPU-first formulation of the modulated conv: instead of materializing
per-sample weights and running a grouped conv with groups=b
(stylegan2_arch.py:285-319), modulation linearity is exploited —
``conv(x * style, W)`` then a per-sample demodulation scale on the
output — mathematically identical and a single big conv on the MXU.
upfirdn2d smoothing/resampling uses the dilated-conv op
(edvr_tpu/ops/upfirdn2d.py); fused_leaky_relu is a fused XLA
elementwise.

Noise injection draws from the 'noise' RNG collection when no explicit
noise is given; stored per-layer noises live in the 'noises' variable
collection (the reference registers them as buffers,
stylegan2_arch.py:521-525).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from edvr_tpu.ops.fused_act import fused_leaky_relu
from edvr_tpu.ops.upfirdn2d import upfirdn2d
from edvr_tpu.utils.registry import ARCH_REGISTRY


def normalize_style_code(x):
    """(reference: stylegan2_arch.py:16-27)"""
    return x * jax.lax.rsqrt(jnp.mean(x**2, axis=1, keepdims=True) + 1e-8)


def make_resample_kernel(k):
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return jnp.asarray(k / k.sum())


def upfirdn_upsample(x, kernel, factor=2):
    """(reference: stylegan2_arch.py:47-74)"""
    kernel = kernel * (factor**2)
    pad = kernel.shape[0] - factor
    return upfirdn2d(x, kernel, up=factor, down=1,
                     pad=((pad + 1) // 2 + factor - 1, pad // 2))


def upfirdn_downsample(x, kernel, factor=2):
    """(reference: stylegan2_arch.py:77-100)"""
    pad = kernel.shape[0] - factor
    return upfirdn2d(x, kernel, up=1, down=factor,
                     pad=((pad + 1) // 2, pad // 2))


def upfirdn_smooth(x, kernel, upsample_factor=1, downsample_factor=1,
                   kernel_size=1):
    """(reference: stylegan2_arch.py:103-138)"""
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor**2)
        pad = (kernel.shape[0] - upsample_factor) - (kernel_size - 1)
        pads = ((pad + 1) // 2 + upsample_factor - 1, pad // 2 + 1)
    elif downsample_factor > 1:
        pad = (kernel.shape[0] - downsample_factor) + (kernel_size - 1)
        pads = ((pad + 1) // 2, pad // 2)
    else:
        raise NotImplementedError
    return upfirdn2d(x, kernel, up=1, down=1, pad=pads)


class EqualLinear(nn.Module):
    """Equalized linear (reference: stylegan2_arch.py:146-201).

    Stored weight is divided by lr_mul; runtime scale is
    (1/sqrt(in)) * lr_mul.
    """
    in_channels: int
    out_channels: int
    bias: bool = True
    bias_init_val: float = 0.
    lr_mul: float = 1.
    activation: str | None = None

    @nn.compact
    def __call__(self, x):
        scale = (1 / math.sqrt(self.in_channels)) * self.lr_mul
        weight = self.param(
            'weight',
            lambda k, s: jax.random.normal(k, s) / self.lr_mul,
            (self.in_channels, self.out_channels))
        bias = None
        if self.bias:
            bias = self.param(
                'bias', nn.initializers.constant(self.bias_init_val),
                (self.out_channels,)) * self.lr_mul
        out = x @ (weight * scale)
        if self.activation == 'fused_lrelu':
            out = fused_leaky_relu(out, bias)
        elif bias is not None:
            out = out + bias
        return out


class ModulatedConv2d(nn.Module):
    """Style-modulated, optionally demodulated conv
    (reference: stylegan2_arch.py:204-326). No bias."""
    in_channels: int
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: str | None = None
    resample_kernel: tuple = (1, 3, 3, 1)
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, style):
        b, h, w, cin = x.shape
        k = self.kernel_size
        scale = 1 / math.sqrt(self.in_channels * k**2)
        # torch layout (1, cout, cin, k, k); keep it for checkpoint parity
        weight = self.param(
            'weight', lambda key, s: jax.random.normal(key, s),
            (1, self.out_channels, self.in_channels, k, k))
        style = EqualLinear(self.num_style_feat, self.in_channels,
                            bias=True, bias_init_val=1, lr_mul=1,
                            name='modulation')(style)  # (b, cin)

        w_hwio = jnp.transpose(weight[0], (2, 3, 1, 0))  # (k, k, cin, cout)

        if self.demodulate:
            # demod[b, cout] = rsqrt(sum_{cin,k} (scale*W*style)^2 + eps)
            w_sq = jnp.sum((scale * weight[0])**2, axis=(2, 3))  # (cout,cin)
            demod = jax.lax.rsqrt(
                jnp.einsum('oc,bc->bo', w_sq, style**2) + self.eps)

        xs = x * style[:, None, None, :] * scale

        kernel = make_resample_kernel(self.resample_kernel)
        if self.sample_mode == 'upsample':
            # conv_transpose stride 2, padding 0 == dilate input by 2 and
            # convolve with the flipped kernel at full padding
            out = jax.lax.conv_general_dilated(
                xs, jnp.flip(w_hwio, (0, 1)), window_strides=(1, 1),
                padding=((k - 1, k - 1), (k - 1, k - 1)),
                lhs_dilation=(2, 2),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            if self.demodulate:
                out = out * demod[:, None, None, :]
            out = upfirdn_smooth(out, kernel, upsample_factor=2,
                                 kernel_size=k)
        elif self.sample_mode == 'downsample':
            xs = upfirdn_smooth(xs, kernel, downsample_factor=2,
                                kernel_size=k)
            out = jax.lax.conv_general_dilated(
                xs, w_hwio, window_strides=(2, 2), padding='VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            if self.demodulate:
                out = out * demod[:, None, None, :]
        else:
            pad = k // 2
            out = jax.lax.conv_general_dilated(
                xs, w_hwio, window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            if self.demodulate:
                out = out * demod[:, None, None, :]
        return out


class StyleConv(nn.Module):
    """Modulated conv + noise injection + fused activation
    (reference: stylegan2_arch.py:329-374)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: str | None = None
    resample_kernel: tuple = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, noise=None):
        out = ModulatedConv2d(self.in_channels, self.out_channels,
                              self.kernel_size, self.num_style_feat,
                              self.demodulate, self.sample_mode,
                              self.resample_kernel,
                              name='modulated_conv')(x, style)
        noise_weight = self.param('weight', nn.initializers.zeros, (1,))
        if noise is None:
            b, h, w, _ = out.shape
            noise = jax.random.normal(self.make_rng('noise'), (b, h, w, 1),
                                      out.dtype)
        out = out + noise_weight * noise
        act_bias = self.param('activate_bias', nn.initializers.zeros,
                              (self.out_channels,))
        return fused_leaky_relu(out, act_bias)


class ToRGB(nn.Module):
    """(reference: stylegan2_arch.py:377-424)"""
    in_channels: int
    num_style_feat: int
    upsample: bool = True
    resample_kernel: tuple = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv2d(self.in_channels, 3, 1, self.num_style_feat,
                              demodulate=False, sample_mode=None,
                              name='modulated_conv')(x, style)
        bias = self.param('bias', nn.initializers.zeros, (1, 1, 1, 3))
        out = out + bias
        if skip is not None:
            if self.upsample:
                skip = upfirdn_upsample(
                    skip, make_resample_kernel(self.resample_kernel))
            out = out + skip
        return out


@ARCH_REGISTRY.register()
class StyleGAN2Generator(nn.Module):
    """(reference: stylegan2_arch.py:444-658)"""
    out_size: int
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 2
    resample_kernel: tuple = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    narrow: float = 1.0

    @property
    def channels(self):
        nar = self.narrow
        cm = self.channel_multiplier
        return {
            '4': int(512 * nar), '8': int(512 * nar), '16': int(512 * nar),
            '32': int(512 * nar), '64': int(256 * cm * nar),
            '128': int(128 * cm * nar), '256': int(64 * cm * nar),
            '512': int(32 * cm * nar), '1024': int(16 * cm * nar)
        }

    @property
    def log_size(self):
        return int(math.log(self.out_size, 2))

    @property
    def num_layers(self):
        return (self.log_size - 2) * 2 + 1

    @property
    def num_latent(self):
        return self.log_size * 2 - 2

    def setup(self):
        channels = self.channels
        self.style_mlp_layers = [
            EqualLinear(self.num_style_feat, self.num_style_feat, bias=True,
                        bias_init_val=0, lr_mul=self.lr_mlp,
                        activation='fused_lrelu',
                        name=f'style_mlp_{i + 1}')
            for i in range(self.num_mlp)
        ]
        self.constant_input = self.param(
            'constant_input_weight',
            lambda key, s: jax.random.normal(key, s),
            (1, 4, 4, channels['4']))
        self.style_conv1 = StyleConv(
            channels['4'], channels['4'], 3, self.num_style_feat,
            demodulate=True, sample_mode=None,
            resample_kernel=self.resample_kernel)
        self.to_rgb1 = ToRGB(channels['4'], self.num_style_feat,
                             upsample=False,
                             resample_kernel=self.resample_kernel)

        style_convs = []
        to_rgbs = []
        in_channels = channels['4']
        for i in range(3, self.log_size + 1):
            out_channels = channels[f'{2**i}']
            style_convs.append(StyleConv(
                in_channels, out_channels, 3, self.num_style_feat,
                demodulate=True, sample_mode='upsample',
                resample_kernel=self.resample_kernel))
            style_convs.append(StyleConv(
                out_channels, out_channels, 3, self.num_style_feat,
                demodulate=True, sample_mode=None,
                resample_kernel=self.resample_kernel))
            to_rgbs.append(ToRGB(out_channels, self.num_style_feat,
                                 upsample=True,
                                 resample_kernel=self.resample_kernel))
            in_channels = out_channels
        self.style_convs = style_convs
        self.to_rgbs = to_rgbs

        # stored per-layer noises (buffers in the reference)
        self.stored_noises = [
            self.variable(
                'noises', f'noise{i}',
                lambda s=None, i=i: jnp.zeros(
                    (1, 2**((i + 5) // 2), 2**((i + 5) // 2), 1)))
            for i in range(self.num_layers)
        ]

    def style_mlp(self, x):
        x = normalize_style_code(x)
        for layer in self.style_mlp_layers:
            x = layer(x)
        return x

    def get_latent(self, x):
        return self.style_mlp(x)

    def mean_latent(self, rng, num_latent):
        latent_in = jax.random.normal(rng,
                                      (num_latent, self.num_style_feat))
        return jnp.mean(self.style_mlp(latent_in), axis=0, keepdims=True)

    def __call__(self, styles, input_is_latent=False, noise=None,
                 randomize_noise=True, truncation=1, truncation_latent=None,
                 inject_index=None, return_latents=False):
        """(reference: stylegan2_arch.py:578-658). styles: list of
        (b, num_style_feat) codes (or (b, num_latent, c) latents)."""
        if not input_is_latent:
            styles = [self.style_mlp(s) for s in styles]
        if noise is None:
            if randomize_noise:
                noise = [None] * self.num_layers
            else:
                noise = [v.value for v in self.stored_noises]
        if truncation < 1:
            styles = [
                truncation_latent + truncation * (s - truncation_latent)
                for s in styles
            ]
        if len(styles) == 1:
            inject_index = self.num_latent
            if styles[0].ndim < 3:
                latent = jnp.repeat(styles[0][:, None], inject_index, axis=1)
            else:
                latent = styles[0]
        elif len(styles) == 2:
            if inject_index is None:
                raise ValueError(
                    'style mixing requires an explicit inject_index in JAX '
                    '(host-side randomness)')
            latent1 = jnp.repeat(styles[0][:, None], inject_index, axis=1)
            latent2 = jnp.repeat(styles[1][:, None],
                                 self.num_latent - inject_index, axis=1)
            latent = jnp.concatenate([latent1, latent2], axis=1)

        out = jnp.repeat(self.constant_input, latent.shape[0], axis=0)
        out = self.style_conv1(out, latent[:, 0], noise=noise[0])
        skip = self.to_rgb1(out, latent[:, 1])

        i = 1
        for idx in range(len(self.to_rgbs)):
            out = self.style_convs[2 * idx](out, latent[:, i],
                                            noise=noise[1 + 2 * idx])
            out = self.style_convs[2 * idx + 1](out, latent[:, i + 1],
                                                noise=noise[2 + 2 * idx])
            skip = self.to_rgbs[idx](out, latent[:, i + 2], skip)
            i += 2

        if return_latents:
            return skip, latent
        return skip, None


def scaled_leaky_relu(x, negative_slope=0.2):
    """(reference: stylegan2_arch.py:661-674)"""
    return nn.leaky_relu(x, negative_slope) * math.sqrt(2)


class EqualConv2d(nn.Module):
    """(reference: stylegan2_arch.py:677-732)"""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    bias_init_val: float = 0.

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        scale = 1 / math.sqrt(self.in_channels * k**2)
        weight = self.param('weight',
                            lambda key, s: jax.random.normal(key, s),
                            (k, k, self.in_channels, self.out_channels))
        out = jax.lax.conv_general_dilated(
            x, weight * scale, window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),
                     (self.padding, self.padding)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param('bias',
                              nn.initializers.constant(self.bias_init_val),
                              (self.out_channels,))
            out = out + bias
        return out


class ConvLayer(nn.Module):
    """Conv (+ downsample smoothing) (+ activation)
    (reference: stylegan2_arch.py:735-790). Sequential indices match the
    torch module for checkpoint conversion."""
    in_channels: int
    out_channels: int
    kernel_size: int
    downsample: bool = False
    resample_kernel: tuple = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x):
        idx = 0
        if self.downsample:
            x = upfirdn_smooth(x, make_resample_kernel(self.resample_kernel),
                               downsample_factor=2,
                               kernel_size=self.kernel_size)
            stride, padding = 2, 0
            idx = 1
        else:
            stride, padding = 1, self.kernel_size // 2
        x = EqualConv2d(self.in_channels, self.out_channels,
                        self.kernel_size, stride, padding,
                        use_bias=self.use_bias and not self.activate,
                        name=f'seq_{idx}')(x)
        if self.activate:
            if self.use_bias:
                # named by the torch Sequential index of FusedLeakyReLU
                bias = self.param(f'seq_{idx + 1}_bias',
                                  nn.initializers.zeros,
                                  (self.out_channels,))
                x = fused_leaky_relu(x, bias)
            else:
                x = scaled_leaky_relu(x, 0.2)
        return x


class ResBlock(nn.Module):
    """(reference: stylegan2_arch.py:793-833)"""
    in_channels: int
    out_channels: int
    resample_kernel: tuple = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        out = ConvLayer(self.in_channels, self.in_channels, 3,
                        name='conv1')(x)
        out = ConvLayer(self.in_channels, self.out_channels, 3,
                        downsample=True,
                        resample_kernel=self.resample_kernel,
                        name='conv2')(out)
        skip = ConvLayer(self.in_channels, self.out_channels, 1,
                         downsample=True,
                         resample_kernel=self.resample_kernel,
                         use_bias=False, activate=False, name='skip')(x)
        return (out + skip) / math.sqrt(2)


@ARCH_REGISTRY.register()
class StyleGAN2Discriminator(nn.Module):
    """(reference: stylegan2_arch.py:836-924)"""
    out_size: int
    channel_multiplier: int = 2
    resample_kernel: tuple = (1, 3, 3, 1)
    stddev_group: int = 4
    narrow: float = 1.0

    @nn.compact
    def __call__(self, x):
        nar = self.narrow
        cm = self.channel_multiplier
        channels = {
            '4': int(512 * nar), '8': int(512 * nar), '16': int(512 * nar),
            '32': int(512 * nar), '64': int(256 * cm * nar),
            '128': int(128 * cm * nar), '256': int(64 * cm * nar),
            '512': int(32 * cm * nar), '1024': int(16 * cm * nar)
        }
        log_size = int(math.log(self.out_size, 2))

        out = ConvLayer(3, channels[f'{self.out_size}'], 1,
                        name='conv_body_0')(x)
        in_channels = channels[f'{self.out_size}']
        for bi, i in enumerate(range(log_size, 2, -1)):
            out_channels = channels[f'{2**(i - 1)}']
            out = ResBlock(in_channels, out_channels, self.resample_kernel,
                           name=f'conv_body_{bi + 1}')(out)
            in_channels = out_channels

        b, h, w, c = out.shape
        # minibatch stddev (reference: stylegan2_arch.py:908-918): per
        # group-column j, std over the group then mean over (c, h, w)
        group = min(b, self.stddev_group)
        stddev = out.reshape(group, b // group, h, w, c)
        stddev = jnp.sqrt(stddev.var(axis=0) + 1e-8)  # (b//g, h, w, c)
        stddev = jnp.mean(stddev, axis=(1, 2, 3))  # (b//g,)
        stddev = jnp.tile(stddev, group).reshape(b, 1, 1, 1)
        stddev = jnp.broadcast_to(stddev, (b, h, w, 1))
        out = jnp.concatenate([out, stddev], axis=-1)

        out = ConvLayer(in_channels + 1, channels['4'], 3,
                        name='final_conv')(out)
        # flatten matching torch's NCHW view(b, -1): (c, h, w) order
        out = out.transpose(0, 3, 1, 2).reshape(b, -1)
        out = EqualLinear(channels['4'] * 4 * 4, channels['4'], bias=True,
                          activation='fused_lrelu',
                          name='final_linear_0')(out)
        out = EqualLinear(channels['4'], 1, bias=True, activation=None,
                          name='final_linear_1')(out)
        return out
