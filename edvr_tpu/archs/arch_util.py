"""Architecture building blocks (flax.linen, NHWC).

Equivalents of the reference's arch_util
(reference: basicsr/models/archs/arch_util.py): torch-matching weight
initializers, ResidualBlockNoBN, pixel-shuffle Upsample, and DCNv2Pack
(offsets/masks predicted from a *separate* feature tensor,
arch_util.py:232-257). All convs use explicit torch-style padding so
strided shapes match the reference exactly.
"""

from __future__ import annotations

import math
import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import random

from edvr_tpu.ops.dcn import modulated_deform_conv
from edvr_tpu.ops.resize import pixel_shuffle


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d / nn.Linear default weight init:
    kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = int(shape[0] * shape[1] * shape[2]) if len(shape) == 4 else int(
        shape[0])
    bound = 1.0 / math.sqrt(fan_in)
    return random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def scaled_kaiming_normal_init(scale: float = 1.0):
    """kaiming_normal_(fan_in, leaky_relu a=0) * scale — the reference's
    default_init_weights (arch_util.py:20-48): N(0, sqrt(2/fan_in)) * scale.
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = int(shape[0] * shape[1] * shape[2]) if len(
            shape) == 4 else int(shape[0])
        std = math.sqrt(2.0 / fan_in)
        return random.normal(key, shape, dtype) * (std * scale)

    return init


class Conv2d(nn.Module):
    """Conv with torch-default init and torch-style explicit padding.

    kernel layout HWIO; input NHWC (leading dims collapsed by flax).
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | None = None  # default: (kernel_size - 1) // 2 like most
    dilation: int = 1
    use_bias: bool = True
    groups: int = 1
    kernel_init: Any = None
    bias_init: Any = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = self.padding if self.padding is not None else 0
        cin = x.shape[-1]
        fan_in = cin // self.groups * k * k
        kernel_init = self.kernel_init or torch_conv_kernel_init
        bias_init = self.bias_init or torch_bias_init_for(fan_in)
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            name='conv')(x)


def lrelu(x, negative_slope: float = 0.1):
    return nn.leaky_relu(x, negative_slope=negative_slope)


class ResidualBlockNoBN(nn.Module):
    """Conv-ReLU-Conv residual block without BN
    (reference: arch_util.py:67-95). With ``pytorch_init=False`` the two
    convs use kaiming-normal scaled by 0.1."""
    num_feat: int = 64
    res_scale: float = 1.0
    pytorch_init: bool = False

    @nn.compact
    def __call__(self, x):
        if self.pytorch_init:
            kinit = None
        else:
            kinit = scaled_kaiming_normal_init(0.1)
        identity = x
        out = Conv2d(self.num_feat, 3, padding=1, kernel_init=kinit,
                     bias_init=nn.initializers.zeros if kinit else None,
                     name='conv1')(x)
        out = nn.relu(out)
        out = Conv2d(self.num_feat, 3, padding=1, kernel_init=kinit,
                     bias_init=nn.initializers.zeros if kinit else None,
                     name='conv2')(out)
        return identity + out * self.res_scale


class Upsample(nn.Module):
    """Pixel-shuffle upsampler for 2^n and 3 scales
    (reference: arch_util.py:98-118)."""
    scale: int
    num_feat: int

    @nn.compact
    def __call__(self, x):
        scale = self.scale
        if (scale & (scale - 1)) == 0:  # 2^n
            for i in range(int(math.log2(scale))):
                x = Conv2d(4 * self.num_feat, 3, padding=1,
                           name=f'up_{i}')(x)
                x = pixel_shuffle(x, 2)
        elif scale == 3:
            x = Conv2d(9 * self.num_feat, 3, padding=1, name='up_0')(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f'scale {scale} is not supported. '
                             'Supported scales: 2^n and 3.')
        return x


_host_callback_support: list = []


def _host_callbacks_supported() -> bool:
    """Probe (once) whether the backend can run jax.debug.callback —
    tunneled PJRT backends reject host send/recv at execution time."""
    if not _host_callback_support:
        try:
            jax.block_until_ready(
                jax.jit(lambda v: jax.debug.callback(lambda a: None, v)
                        or v)(jnp.zeros(())))
            _host_callback_support.append(True)
        except Exception:
            _host_callback_support.append(False)
            from edvr_tpu.utils.logger import get_root_logger
            get_root_logger().warning(
                'EDVR_TPU_MONITOR_OFFSETS: host callbacks are unsupported '
                'on this backend; offset monitoring is off.')
    return _host_callback_support[0]


class DCNv2Pack(nn.Module):
    """Modulated deformable conv whose offsets/mask come from a separate
    feature tensor (reference: arch_util.py:232-257 + the
    ModulatedDeformConvPack parameterization, deform_conv.py:345-390).

    ``conv_offset`` is zero-initialized (so the op starts as a plain
    conv, deform_conv.py:377-381); the main weight uses the reference's
    uniform(+-1/sqrt(fan_in)) (deform_conv.py:330-337).
    """
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 8
    max_residue_magnitude: float | None = None

    @nn.compact
    def __call__(self, x, feat):
        k = self.kernel_size
        K = k * k
        dg = self.deformable_groups
        out = Conv2d(dg * 3 * K, k, stride=self.stride,
                     padding=self.padding, dilation=self.dilation,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     name='conv_offset')(feat)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = nn.sigmoid(mask)

        if os.environ.get('EDVR_TPU_PCD_NO_ALIGN') == '1':
            # ablation control (dev only): freeze offsets at zero so the
            # DCN degenerates to a modulated plain conv. Trained next to
            # the full model on identical data, the PSNR gap isolates
            # what the alignment path learns (the component-level proof
            # the reference demonstrates via REDS4). Parameters are
            # unchanged, so checkpoints stay interchangeable.
            offset = jnp.zeros_like(jax.lax.stop_gradient(offset))

        if os.environ.get('EDVR_TPU_MONITOR_OFFSETS') == '1':
            # the reference warns when the offset magnitude explodes
            # (arch_util.py:249-253), a sign of diverging alignment.
            # A data-dependent branch is jit-hostile, so this is an
            # opt-in host callback rather than always-on.
            if _host_callbacks_supported():
                from edvr_tpu.utils.logger import get_root_logger

                def _warn(absmean):
                    if absmean > 50:
                        get_root_logger().warning(
                            f'Offset abs mean is {absmean}, '
                            'larger than 50.')
                jax.debug.callback(_warn, jnp.mean(jnp.abs(offset)))

        cin = x.shape[-1]
        weight = self.param('weight', torch_conv_kernel_init,
                            (k, k, cin // self.groups, self.out_channels))
        bias = self.param('bias', nn.initializers.zeros,
                          (self.out_channels,))
        return modulated_deform_conv(x, offset, mask, weight, bias,
                                     self.stride, self.padding,
                                     self.dilation, self.groups, dg)


class WarpAlignPack(nn.Module):
    """Tap-shared deformable alignment — the TPU co-design variant of
    :class:`DCNv2Pack` (round-5 quality/perf frontier work, not a
    reference component).

    DCNv2 predicts K=9 independent (offset, mask) pairs per deformable
    group and pays a fractional gather per tap
    (reference: deform_conv_cuda_kernel.cu:190-244 does this inside one
    fused im2col+GEMM). On TPU those per-tap gathers are the measured
    bottleneck of the whole model (docs/TPUDesign.md). This variant
    predicts ONE (dy, dx, mask) per deformable group, bilinear-warps
    each group's feature plane by it, and applies a DENSE k x k conv to
    the warped planes:

        y(p) = sum_k w_k . u(p + p_k),   u(q) = m(q) . x(q + d(q))

    i.e. "warp the group plane, then dense conv" — the gather work
    drops x K=9 and the tap reduction moves onto the MXU as a plain
    conv. It is NOT algebraically equal to DCNv2 with tied taps (there
    the offset field is evaluated at the output pixel p, here at each
    tap q = p + p_k); it is a different alignment formulation whose
    quality is gated on the training harness next to the exact op
    (docs/TPUDesign.md "Alignment co-design frontier").

    Init matches DCNv2Pack's start-as-plain-conv behavior
    (deform_conv.py:377-381): conv_offset is zero-init, so offsets
    start at 0 and the mask at sigmoid(0) = 0.5.

    Parameters are NOT interchangeable with DCNv2Pack (conv_offset has
    dg*3 output channels instead of dg*3*K and the main conv is a
    standard flax Conv); select with ``align_variant: tap_shared`` in
    an EDVR network config.
    """
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 8

    @nn.compact
    def __call__(self, x, feat):
        dg = self.deformable_groups
        n, h, w, cin = x.shape
        assert cin % dg == 0
        out = Conv2d(dg * 3, self.kernel_size, stride=1,
                     padding=(self.kernel_size - 1) // 2,
                     dilation=self.dilation,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     name='conv_offset')(feat)
        dy, dx, mask = jnp.split(out, 3, axis=-1)  # each (n, h, w, dg)
        mask = nn.sigmoid(mask)

        if os.environ.get('EDVR_TPU_PCD_NO_ALIGN') == '1':
            # same ablation control as DCNv2Pack: freeze the warp at
            # identity so the module degenerates to mask * dense conv
            dy = jnp.zeros_like(jax.lax.stop_gradient(dy))
            dx = jnp.zeros_like(jax.lax.stop_gradient(dx))

        # The masked group warp IS a K=1 modulated deformable conv with
        # an identity 1x1 weight: sample position = own pixel + (dy,
        # dx), zero OOB, mask applied to the sampled value. Expressing
        # it that way rides the op stack's measured dispatch — the
        # banded one-hot Pallas kernels on TPU (at 1/9th of the K=9
        # per-point and selection work) and the packed row-gather path
        # elsewhere — plus their tested custom VJPs, instead of a
        # bespoke gather. The identity contraction is MXU noise next to
        # the selection work it replaces.
        off1 = jnp.stack([dy, dx], axis=-1).reshape(n, h, w, dg * 2)
        eye = jnp.eye(cin, dtype=x.dtype).reshape(1, 1, cin, cin)
        warped = modulated_deform_conv(
            x, off1, mask, eye, None, stride=1, padding=0, dilation=1,
            groups=1, deformable_groups=dg)
        return Conv2d(self.out_channels, self.kernel_size,
                      stride=self.stride, padding=self.padding,
                      dilation=self.dilation, groups=self.groups,
                      name='conv')(warped)


class Sequential(nn.Module):
    """Stack of blocks sharing a constructor, names block_0..block_{n-1}
    (equivalent of make_layer, reference: arch_util.py:51-64)."""
    block_cls: Any
    num_blocks: int
    block_args: dict

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = self.block_cls(**self.block_args, name=f'block_{i}')(x)
        return x


def make_layer(block_cls, num_blocks: int, name: str | None = None,
               **block_args):
    return Sequential(block_cls, num_blocks, block_args, name=name)
