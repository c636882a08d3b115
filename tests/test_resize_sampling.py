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


@pytest.mark.parametrize('size_type,sizes',
                         [('ratio', [2.0, 2.0]), ('ratio', [0.5, 0.5]),
                          ('shape', [5, 20])])
def test_resize_flow_matches_torch(size_type, sizes):
    from edvr_tpu.ops import resize_flow
    rng = np.random.RandomState(3)
    flow = rng.randn(2, 8, 12, 2).astype(np.float32) * 3
    # reference semantics (arch_util.py:166-209): NCHW, ch0 = dx scaled
    # by the width ratio, ch1 = dy scaled by the height ratio
    t = torch.from_numpy(np.moveaxis(flow, -1, 1)).clone()
    fh, fw = t.shape[2:]
    if size_type == 'ratio':
        oh, ow = int(fh * sizes[0]), int(fw * sizes[1])
    else:
        oh, ow = sizes
    t[:, 0] *= ow / fw
    t[:, 1] *= oh / fh
    ref = np.moveaxis(
        F.interpolate(t, size=(oh, ow), mode='bilinear',
                      align_corners=False).numpy(), 1, -1)
    out = np.asarray(resize_flow(jnp.asarray(flow), size_type, sizes))
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_dcnv2pack_offset_monitor(monkeypatch):
    """EDVR_TPU_MONITOR_OFFSETS=1 warns when |offset| mean > 50
    (reference: arch_util.py:249-253)."""
    import logging

    import jax

    from edvr_tpu.archs.arch_util import DCNv2Pack

    monkeypatch.setenv('EDVR_TPU_MONITOR_OFFSETS', '1')
    net = DCNv2Pack(out_channels=4, deformable_groups=1)
    x = jnp.ones((1, 8, 8, 4))
    params = net.init(jax.random.PRNGKey(0), x, x)['params']
    # conv_offset is zero-init; force a huge bias so offsets blow up
    params = jax.tree_util.tree_map(lambda p: p, params)
    params['conv_offset']['conv']['bias'] = (
        params['conv_offset']['conv']['bias'] + 100.0)
    from edvr_tpu.utils.logger import get_root_logger
    records = []

    class Grab(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = Grab(level=logging.WARNING)
    logger = get_root_logger()
    logger.addHandler(handler)
    try:
        out = net.apply({'params': params}, x, x)
        jax.block_until_ready(out)
    finally:
        logger.removeHandler(handler)
    assert any('larger than 50' in m for m in records), records
