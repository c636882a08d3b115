"""Shared metric helpers (reference: basicsr/metrics/metric_util.py)."""

from __future__ import annotations

import numpy as np

from edvr_tpu.utils.matlab_functions import bgr2ycbcr


def reorder_image(img: np.ndarray, input_order: str = 'HWC') -> np.ndarray:
    """Reorder an image to HWC (reference: metric_util.py:6-31)."""
    if input_order not in ['HWC', 'CHW']:
        raise ValueError(f'Wrong input_order {input_order}. Supported '
                         "input_orders are 'HWC' and 'CHW'")
    if img.ndim == 2:
        img = img[..., None]
    if input_order == 'CHW':
        img = img.transpose(1, 2, 0)
    return img


def to_y_channel(img: np.ndarray) -> np.ndarray:
    """BGR [0,255] -> Y channel [0,255] float, without rounding
    (reference: metric_util.py:34-47)."""
    img = img.astype(np.float32) / 255.
    if img.ndim == 3 and img.shape[2] == 3:
        img = bgr2ycbcr(img, y_only=True)
        img = img[..., None]
    return img * 255.
