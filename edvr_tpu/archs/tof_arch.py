"""TOFlow + its BN-variant SPyNet (flax, NHWC).

Parity with reference basicsr/models/archs/tof_arch.py: 4-level flow
pyramid with BatchNorm (inference uses running statistics), warp of 6
neighbors to the reference frame, 4-conv reconstruction, ImageNet
normalization.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from edvr_tpu.archs.arch_util import Conv2d
from edvr_tpu.ops.resize import interpolate
from edvr_tpu.ops.sampling import flow_warp
from edvr_tpu.utils.registry import ARCH_REGISTRY

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


class BasicModuleBN(nn.Module):
    """Conv+BN flow refiner (reference: tof_arch.py:8-60)."""
    train: bool = False

    @nn.compact
    def __call__(self, x):
        chans = [32, 64, 32, 16]
        for i, c in enumerate(chans):
            x = Conv2d(c, 7, padding=3, name=f'basic_module_{3 * i}')(x)
            x = nn.BatchNorm(use_running_average=not self.train,
                             momentum=0.9, epsilon=1e-5,
                             name=f'basic_module_{3 * i + 1}')(x)
            x = nn.relu(x)
        return Conv2d(2, 7, padding=3, name='basic_module_12')(x)


class SPyNetTOF(nn.Module):
    """4-level SPyNet with BN (reference: tof_arch.py:63-133)."""
    train: bool = False

    @nn.compact
    def __call__(self, ref, supp):
        n, h, w, _ = ref.shape
        refs, supps = [ref], [supp]
        for _ in range(3):
            refs.insert(0, nn.avg_pool(refs[0], (2, 2), strides=(2, 2)))
            supps.insert(0, nn.avg_pool(supps[0], (2, 2), strides=(2, 2)))

        flow = jnp.zeros((n, h // 16, w // 16, 2), ref.dtype)
        for i in range(4):
            flow_up = interpolate(flow, scale_factor=2, mode='bilinear',
                                  align_corners=True) * 2.0
            inp = jnp.concatenate(
                [refs[i], flow_warp(supps[i], flow_up), flow_up], axis=-1)
            flow = flow_up + BasicModuleBN(
                train=self.train, name=f'basic_module_{i}')(inp)
        return flow


@ARCH_REGISTRY.register()
class TOFlow(nn.Module):
    """(reference: tof_arch.py:136-218). Input (b, 7, h, w, 3) pre-
    upsampled LR frames; output (b, h, w, 3)."""
    adapt_official_weights: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, lrs):
        ref_idx = 0 if self.adapt_official_weights else 3
        if self.adapt_official_weights:
            lrs = lrs[:, jnp.asarray([3, 0, 1, 2, 4, 5, 6])]
        b, t, h, w, c = lrs.shape

        mean = jnp.asarray(_MEAN, lrs.dtype)
        std = jnp.asarray(_STD, lrs.dtype)
        lrs = (lrs - mean) / std

        lr_ref = lrs[:, ref_idx]
        spynet = SPyNetTOF(train=self.train, name='spynet')
        # batch the 6 neighbor flows through one spynet call
        supp_idx = [i for i in range(7) if i != ref_idx]
        supp = lrs[:, jnp.asarray(supp_idx)].reshape(b * 6, h, w, c)
        ref_rep = jnp.repeat(lr_ref[:, None], 6, axis=1).reshape(
            b * 6, h, w, c)
        flow = spynet(ref_rep, supp)
        warped = flow_warp(supp, flow).reshape(b, 6, h, w, c)

        aligned = []
        si = 0
        for i in range(7):
            if i == ref_idx:
                aligned.append(lr_ref)
            else:
                aligned.append(warped[:, si])
                si += 1
        hr = jnp.stack(aligned, axis=1)  # (b, 7, h, w, c)
        # frame-major channel stacking like the reference's
        # view(b, -1, h, w) on NCHW (tof_arch.py:211-212)
        hr = hr.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
        hr = nn.relu(Conv2d(64, 9, padding=4, name='conv_1')(hr))
        hr = nn.relu(Conv2d(64, 9, padding=4, name='conv_2')(hr))
        hr = nn.relu(Conv2d(64, 1, padding=0, name='conv_3')(hr))
        hr = Conv2d(3, 1, padding=0, name='conv_4')(hr) + lr_ref
        return hr * std + mean
