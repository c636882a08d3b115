"""PSNR and SSIM, numerically matching the reference / MATLAB.

Both operate on uint8-domain [0, 255] images (float64 internally); SSIM
uses the 11x11 sigma-1.5 Gaussian window of the official MATLAB code
with valid-region cropping (reference: basicsr/metrics/psnr_ssim.py).
"""

from __future__ import annotations

import cv2
import numpy as np

from edvr_tpu.metrics.metric_util import reorder_image, to_y_channel
from edvr_tpu.utils.registry import METRIC_REGISTRY


def _prepare(img1, img2, crop_border, input_order, test_y_channel):
    assert img1.shape == img2.shape, (
        f'Image shapes are different: {img1.shape}, {img2.shape}.')
    img1 = reorder_image(img1, input_order=input_order).astype(np.float64)
    img2 = reorder_image(img2, input_order=input_order).astype(np.float64)
    if crop_border != 0:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img1 = to_y_channel(img1)
        img2 = to_y_channel(img2)
    return img1, img2


@METRIC_REGISTRY.register()
def calculate_psnr(img1, img2, crop_border, input_order='HWC',
                   test_y_channel=False, **kwargs) -> float:
    """PSNR on [0, 255]-range images
    (reference: basicsr/metrics/psnr_ssim.py:7-51)."""
    img1, img2 = _prepare(img1, img2, crop_border, input_order,
                          test_y_channel)
    mse = np.mean((img1 - img2)**2)
    if mse == 0:
        return float('inf')
    return 20. * np.log10(255. / np.sqrt(mse))


def _ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """Single-channel SSIM with the MATLAB 11x11 window, valid region only
    (reference: basicsr/metrics/psnr_ssim.py:54-87)."""
    c1 = (0.01 * 255)**2
    c2 = (0.03 * 255)**2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq = mu1**2
    mu2_sq = mu2**2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return ssim_map.mean()


@METRIC_REGISTRY.register()
def calculate_ssim(img1, img2, crop_border, input_order='HWC',
                   test_y_channel=False, **kwargs) -> float:
    """SSIM on [0, 255]-range images; channels averaged
    (reference: basicsr/metrics/psnr_ssim.py:90-141)."""
    img1, img2 = _prepare(img1, img2, crop_border, input_order,
                          test_y_channel)
    ssims = [_ssim(img1[..., i], img2[..., i])
             for i in range(img1.shape[2])]
    return float(np.mean(ssims))
