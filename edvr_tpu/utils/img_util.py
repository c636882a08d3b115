"""Image <-> array conversions and file IO.

NHWC-native equivalents of the reference's img_util
(reference: basicsr/utils/img_util.py). Network arrays here are float32
NHWC RGB in [0, 1]; disk images are cv2-convention BGR uint8. The
uint8 rounding in `tensor2img` (img_util.py:93) is what the published
PSNR/SSIM numbers are measured through, so it is preserved exactly.
"""

from __future__ import annotations

import math
import os

import cv2
import numpy as np


def img2tensor(imgs, bgr2rgb: bool = True, float32: bool = True):
    """Convert HWC BGR image(s) to network-layout arrays (HWC RGB here;
    the framework is NHWC-native so no transpose happens).

    Args:
        imgs: image or list of images, (h, w, c) float arrays.
        bgr2rgb: flip BGR (cv2 convention) to RGB.
        float32: cast to float32.
    """

    def _totensor(img):
        if img.ndim == 3 and img.shape[2] == 3 and bgr2rgb:
            img = img[..., ::-1]
        if float32:
            img = img.astype(np.float32)
        return np.ascontiguousarray(img)

    if isinstance(imgs, list):
        return [_totensor(img) for img in imgs]
    return _totensor(imgs)


def tensor2img(tensor, rgb2bgr: bool = True, out_type=np.uint8,
               min_max=(0, 1)):
    """Convert network output array(s) to image numpy arrays.

    Accepts (h, w), (h, w, c), or (b, h, w, c) arrays (NHWC; the
    reference accepts NCHW, img_util.py:36-98). Batched inputs are tiled
    into a grid like torchvision.make_grid with nrow=ceil? (reference
    uses nrow=sqrt(b)). Values are clamped to min_max, normalized to
    [0, 1], channel-flipped to BGR, and — for uint8 output — multiplied
    by 255 and *rounded* (not truncated).
    """
    if not isinstance(tensor, list):
        tensor = [tensor]
    result = []
    for _t in tensor:
        img_np = np.asarray(_t, dtype=np.float32)
        if img_np.ndim == 4 and img_np.shape[0] == 1:
            img_np = img_np[0]
        img_np = np.clip(img_np, min_max[0], min_max[1])
        img_np = (img_np - min_max[0]) / (min_max[1] - min_max[0])
        if img_np.ndim == 4:
            img_np = _make_grid(img_np, nrow=int(math.sqrt(img_np.shape[0])))
        if img_np.ndim == 3:
            if img_np.shape[2] == 1:
                img_np = img_np[:, :, 0]
            elif rgb2bgr:
                img_np = img_np[..., ::-1]
        if out_type == np.uint8:
            # numpy uint8 cast truncates; MATLAB-compatible metrics need
            # round-to-nearest (reference: img_util.py:93)
            img_np = (img_np * 255.0).round()
        img_np = img_np.astype(out_type)
        result.append(np.ascontiguousarray(img_np))
    # single-element results unwrap, matching the reference
    # (img_util.py:96-98)
    return result[0] if len(result) == 1 else result


def _make_grid(imgs: np.ndarray, nrow: int, padding: int = 2) -> np.ndarray:
    """Tile a (b, h, w, c) batch into one image (make_grid equivalent)."""
    b, h, w, c = imgs.shape
    nrow = max(nrow, 1)
    ncol = int(math.ceil(b / nrow))
    grid = np.zeros((ncol * (h + padding) + padding,
                     nrow * (w + padding) + padding, c), dtype=imgs.dtype)
    for idx in range(b):
        r, col = divmod(idx, nrow)
        y0 = r * (h + padding) + padding
        x0 = col * (w + padding) + padding
        grid[y0:y0 + h, x0:x0 + w] = imgs[idx]
    return grid


def imfrombytes(content: bytes, flag: str = 'color',
                float32: bool = False) -> np.ndarray:
    """Decode an image from bytes (BGR, like cv2)
    (reference: basicsr/utils/img_util.py:101-123)."""
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {
        'color': cv2.IMREAD_COLOR,
        'grayscale': cv2.IMREAD_GRAYSCALE,
        'unchanged': cv2.IMREAD_UNCHANGED
    }
    img = cv2.imdecode(img_np, imread_flags[flag])
    if float32:
        img = img.astype(np.float32) / 255.
    return img


def imwrite(img: np.ndarray, file_path: str, params=None,
            auto_mkdir: bool = True) -> bool:
    """Write a BGR image to disk, creating parent dirs
    (reference: basicsr/utils/img_util.py:126-142)."""
    if auto_mkdir:
        dir_name = os.path.abspath(os.path.dirname(file_path))
        os.makedirs(dir_name, exist_ok=True)
    if params is None:
        return cv2.imwrite(file_path, img)
    return cv2.imwrite(file_path, img, params)


def crop_border(imgs, crop_border: int):
    """Crop `crop_border` pixels from each edge
    (reference: basicsr/utils/img_util.py:145-165)."""
    if crop_border == 0:
        return imgs
    if isinstance(imgs, list):
        return [
            v[crop_border:-crop_border, crop_border:-crop_border, ...]
            for v in imgs
        ]
    return imgs[crop_border:-crop_border, crop_border:-crop_border, ...]
