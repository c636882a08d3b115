"""interpolate / pixel_shuffle / flow_warp parity vs torch (CPU oracle)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from edvr_tpu.ops import (flow_warp, interpolate, pixel_shuffle,
                          pixel_unshuffle)

rng = np.random.RandomState(0)


def to_nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def from_nchw(t):
    return np.moveaxis(t.numpy(), 1, -1)


@pytest.mark.parametrize('scale', [2, 4, 0.5])
@pytest.mark.parametrize('align_corners', [False, True])
def test_interpolate_bilinear(scale, align_corners):
    x = rng.rand(2, 12, 10, 3).astype(np.float32)
    ref = F.interpolate(to_nchw(x), scale_factor=scale, mode='bilinear',
                        align_corners=align_corners)
    out = interpolate(jnp.asarray(x), scale_factor=scale, mode='bilinear',
                      align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(out), from_nchw(ref), atol=1e-5)


def test_interpolate_size():
    x = rng.rand(1, 9, 7, 2).astype(np.float32)
    ref = F.interpolate(to_nchw(x), size=(13, 5), mode='bilinear',
                        align_corners=False)
    out = interpolate(jnp.asarray(x), size=(13, 5), mode='bilinear')
    np.testing.assert_allclose(np.asarray(out), from_nchw(ref), atol=1e-5)


@pytest.mark.parametrize('scale', [2, 3])
def test_interpolate_nearest(scale):
    x = rng.rand(2, 6, 5, 4).astype(np.float32)
    ref = F.interpolate(to_nchw(x), scale_factor=scale, mode='nearest')
    out = interpolate(jnp.asarray(x), scale_factor=scale, mode='nearest')
    np.testing.assert_allclose(np.asarray(out), from_nchw(ref), atol=0)


def test_pixel_shuffle_matches_torch():
    x = rng.rand(2, 4, 5, 16).astype(np.float32)
    ref = F.pixel_shuffle(to_nchw(x), 2)
    out = pixel_shuffle(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(out), from_nchw(ref), atol=0)


def test_pixel_unshuffle_roundtrip():
    x = rng.rand(2, 8, 6, 3).astype(np.float32)
    down = pixel_unshuffle(jnp.asarray(x), 2)
    ref = F.pixel_unshuffle(to_nchw(x), 2)
    np.testing.assert_allclose(np.asarray(down), from_nchw(ref), atol=0)
    back = pixel_shuffle(down, 2)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)


@pytest.mark.parametrize('padding_mode', ['zeros', 'border'])
@pytest.mark.parametrize('interp', ['bilinear', 'nearest'])
def test_flow_warp_matches_torch_grid_sample(padding_mode, interp):
    n, h, w, c = 2, 11, 9, 4
    x = rng.rand(n, h, w, c).astype(np.float32)
    flow = (rng.rand(n, h, w, 2).astype(np.float32) - 0.5) * 6

    # reference grid construction (arch_util.py:141-160)
    xt = to_nchw(x)
    grid_y, grid_x = torch.meshgrid(torch.arange(h).float(),
                                    torch.arange(w).float(), indexing='ij')
    grid = torch.stack((grid_x, grid_y), 2)
    vgrid = grid[None] + torch.from_numpy(flow)
    vx = 2.0 * vgrid[..., 0] / max(w - 1, 1) - 1.0
    vy = 2.0 * vgrid[..., 1] / max(h - 1, 1) - 1.0
    vgrid_scaled = torch.stack((vx, vy), dim=3)
    ref = F.grid_sample(xt, vgrid_scaled, mode=interp,
                        padding_mode=padding_mode, align_corners=True)

    out = flow_warp(jnp.asarray(x), jnp.asarray(flow), interp_mode=interp,
                    padding_mode=padding_mode)
    np.testing.assert_allclose(np.asarray(out), from_nchw(ref), atol=2e-5)
