"""SpyNet optical-flow network (flax, NHWC).

Parity with reference basicsr/models/archs/spynet_arch.py: 6-level
pyramid, inputs resized to /32 multiples, flow rescaled back. Flows are
NHWC with last dim (dx, dy).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from edvr_tpu.archs.arch_util import Conv2d
from edvr_tpu.ops.resize import interpolate
from edvr_tpu.ops.sampling import flow_warp
from edvr_tpu.utils.registry import ARCH_REGISTRY

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


class BasicModule(nn.Module):
    """5-conv flow refiner (reference: spynet_arch.py:9-49)."""

    @nn.compact
    def __call__(self, x):
        chans = [32, 64, 32, 16, 2]
        for i, c in enumerate(chans):
            x = Conv2d(c, 7, padding=3, name=f'basic_module_{2 * i}')(x)
            if i < 4:
                x = nn.relu(x)
        return x


def _avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


@ARCH_REGISTRY.register()
class SpyNet(nn.Module):
    """(reference: spynet_arch.py:52-159). Input (n, h, w, 3) pairs;
    output flow (n, h, w, 2)."""

    @nn.compact
    def __call__(self, ref, supp):
        assert ref.shape == supp.shape
        n, h, w, _ = ref.shape
        w_floor = math.floor(math.ceil(w / 32.0) * 32.0)
        h_floor = math.floor(math.ceil(h / 32.0) * 32.0)

        mean = jnp.asarray(_MEAN, ref.dtype)
        std = jnp.asarray(_STD, ref.dtype)

        ref_r = interpolate(ref, size=(h_floor, w_floor), mode='bilinear')
        supp_r = interpolate(supp, size=(h_floor, w_floor), mode='bilinear')

        refs = [(ref_r - mean) / std]
        supps = [(supp_r - mean) / std]
        for _ in range(5):
            refs.insert(0, _avg_pool2(refs[0]))
            supps.insert(0, _avg_pool2(supps[0]))

        flow = jnp.zeros((n, refs[0].shape[1] // 2, refs[0].shape[2] // 2, 2),
                         ref.dtype)
        modules = [BasicModule(name=f'basic_module_{i}') for i in range(6)]
        for level in range(6):
            up = interpolate(flow, scale_factor=2, mode='bilinear',
                             align_corners=True) * 2.0
            if up.shape[1] != refs[level].shape[1]:
                up = jnp.pad(up, ((0, 0), (0, 1), (0, 0), (0, 0)),
                             mode='edge')
            if up.shape[2] != refs[level].shape[2]:
                up = jnp.pad(up, ((0, 0), (0, 0), (0, 1), (0, 0)),
                             mode='edge')
            inp = jnp.concatenate([
                refs[level],
                flow_warp(supps[level], up, padding_mode='border'), up
            ], axis=-1)
            flow = modules[level](inp) + up

        flow = interpolate(flow, size=(h, w), mode='bilinear')
        flow = flow * jnp.asarray(
            [float(w) / float(w_floor), float(h) / float(h_floor)],
            flow.dtype)
        return flow
