"""Parity tests against golden outputs of the reference implementation.

Fixtures in tests/data/golden/substrate.npz were produced by
scripts/dev/gen_goldens_substrate.py running the reference toolbox
(basicsr/utils/matlab_functions.py, basicsr/metrics/psnr_ssim.py).
"""

import os.path as osp

import numpy as np
import pytest

from edvr_tpu.metrics import calculate_metric, calculate_psnr, calculate_ssim
from edvr_tpu.utils.matlab_functions import (bgr2ycbcr, imresize, rgb2ycbcr,
                                             ycbcr2bgr, ycbcr2rgb)

GOLDEN = osp.join(osp.dirname(__file__), 'data', 'golden', 'substrate.npz')


@pytest.fixture(scope='module')
def g():
    return np.load(GOLDEN)


def test_imresize_matches_matlab(g):
    img = g['imresize_input']
    for name, scale, antialias in [('down4', 0.25, True), ('up4', 4.0, True),
                                   ('down3', 1 / 3, True),
                                   ('down2_noaa', 0.5, False)]:
        out = imresize(img, scale, antialias)
        ref = g[f'imresize_{name}']
        assert out.shape == ref.shape, name
        np.testing.assert_allclose(out, ref, rtol=0, atol=2e-5, err_msg=name)


def test_color_conversions(g):
    u8 = g['ycbcr_input_u8']
    f32 = u8.astype(np.float32) / 255.
    np.testing.assert_array_equal(rgb2ycbcr(u8), g['rgb2ycbcr_u8'])
    np.testing.assert_allclose(rgb2ycbcr(f32), g['rgb2ycbcr_f32'], atol=1e-6)
    np.testing.assert_allclose(
        rgb2ycbcr(f32, y_only=True), g['rgb2ycbcr_y_f32'], atol=1e-6)
    np.testing.assert_allclose(
        bgr2ycbcr(f32, y_only=True), g['bgr2ycbcr_y_f32'], atol=1e-6)
    ycbcr = g['rgb2ycbcr_f32']
    np.testing.assert_allclose(ycbcr2rgb(ycbcr), g['ycbcr2rgb_f32'],
                               atol=1e-6)
    np.testing.assert_allclose(ycbcr2bgr(ycbcr), g['ycbcr2bgr_f32'],
                               atol=1e-6)


def test_psnr_ssim_golden(g):
    a, b = g['metric_img1'], g['metric_img2']
    for cb in (0, 4):
        for y in (False, True):
            key = f'cb{cb}_y{int(y)}'
            psnr = calculate_psnr(a, b, cb, test_y_channel=y)
            ssim = calculate_ssim(a, b, cb, test_y_channel=y)
            assert abs(psnr - g[f'psnr_{key}']) < 1e-4, key
            assert abs(ssim - g[f'ssim_{key}']) < 1e-7, key


def test_psnr_identical_is_inf():
    a = np.zeros((16, 16, 3), dtype=np.uint8)
    assert calculate_psnr(a, a, 0) == float('inf')


def test_calculate_metric_dispatch(g):
    a, b = g['metric_img1'], g['metric_img2']
    v = calculate_metric(
        dict(img1=a, img2=b),
        dict(type='calculate_psnr', crop_border=0, test_y_channel=False))
    assert abs(v - g['psnr_cb0_y0']) < 1e-4


def test_tensor2img_round_trip():
    from edvr_tpu.utils.img_util import img2tensor, tensor2img
    rng = np.random.RandomState(1)
    bgr = rng.rand(8, 9, 3).astype(np.float32)
    rgb = img2tensor(bgr)  # flips to RGB
    np.testing.assert_allclose(rgb[..., 0], bgr[..., 2])
    out = tensor2img(rgb)  # back to BGR uint8 with rounding
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, (bgr * 255).round().astype(np.uint8))
