"""Host-side image transforms for the data pipeline.

Behavioral contract (crop geometry, shared augmentation draw, flow sign
conventions) follows the reference toolbox so configs and trained
models interoperate (reference: basicsr/data/transforms.py); the
implementations here are this project's own.
"""

from __future__ import annotations

import random

import cv2
import numpy as np


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    """Trim the bottom/right edge so H and W divide ``scale``
    (reference: transforms.py:5-22)."""
    if img.ndim not in (2, 3):
        raise ValueError(f'mod_crop expects an HxW or HxWxC array, got '
                         f'ndim={img.ndim}.')
    h, w = img.shape[:2]
    return img[:h - h % scale, :w - w % scale, ...].copy()


def paired_random_crop(img_gts, img_lqs, gt_patch_size: int, scale: int,
                       gt_path: str = ''):
    """Crop the same (scaled) patch from every LQ and GT frame.

    One random top-left is drawn in LQ coordinates and applied to all
    LQ frames; the GT crop is the same location scaled by ``scale``
    (reference: transforms.py:25-84). Single arrays in, single arrays
    out; lists in, lists out.
    """
    gts = img_gts if isinstance(img_gts, list) else [img_gts]
    lqs = img_lqs if isinstance(img_lqs, list) else [img_lqs]

    lq_h, lq_w = lqs[0].shape[:2]
    gt_h, gt_w = gts[0].shape[:2]
    lq_patch = gt_patch_size // scale

    if (gt_h, gt_w) != (lq_h * scale, lq_w * scale):
        raise ValueError(
            f'GT size ({gt_h}, {gt_w}) is not LQ size ({lq_h}, {lq_w}) '
            f'times the scale {scale}.')
    if lq_h < lq_patch or lq_w < lq_patch:
        raise ValueError(
            f'LQ frame ({lq_h}, {lq_w}) cannot fit a {lq_patch}x'
            f'{lq_patch} patch (GT patch {gt_patch_size}, scale {scale}); '
            f'offending sample: {gt_path}.')

    # one draw shared by every frame of the sample
    y0 = random.randint(0, lq_h - lq_patch)
    x0 = random.randint(0, lq_w - lq_patch)

    def window(frames, y, x, size):
        return [f[y:y + size, x:x + size, ...] for f in frames]

    lqs = window(lqs, y0, x0, lq_patch)
    gts = window(gts, y0 * scale, x0 * scale, gt_patch_size)

    # 1-frame samples come back unwrapped, like they went in
    if len(gts) == 1:
        gts = gts[0]
    if len(lqs) == 1:
        lqs = lqs[0]
    return gts, lqs


def augment(imgs, hflip=True, rotation=True, flows=None,
            return_status=False):
    """Random horizontal flip / vertical flip / 90-degree transpose.

    All frames (and optional flow fields) of a sample share one draw;
    flow components are sign-flipped / swapped to stay consistent with
    the flipped geometry (reference: transforms.py:87-151).
    """
    do_hflip = hflip and random.random() < 0.5
    do_vflip = rotation and random.random() < 0.5
    do_rot90 = rotation and random.random() < 0.5

    def apply(img):
        out = img
        if do_hflip:
            out = out[:, ::-1, ...]
        if do_vflip:
            out = out[::-1, :, ...]
        if do_rot90:
            out = out.transpose(1, 0, 2)
        return np.ascontiguousarray(out)

    def apply_flow(flow):
        out = flow.copy()
        if do_hflip:
            out = out[:, ::-1, :]
            out[:, :, 0] = -out[:, :, 0]
        if do_vflip:
            out = out[::-1, :, :]
            out[:, :, 1] = -out[:, :, 1]
        if do_rot90:
            out = out.transpose(1, 0, 2)[:, :, [1, 0]]
        return np.ascontiguousarray(out)

    single = not isinstance(imgs, list)
    out_imgs = [apply(v) for v in ([imgs] if single else imgs)]
    result = out_imgs[0] if len(out_imgs) == 1 else out_imgs

    if flows is not None:
        single_flow = not isinstance(flows, list)
        out_flows = [apply_flow(v) for v in ([flows] if single_flow
                                             else flows)]
        return result, (out_flows[0] if len(out_flows) == 1 else out_flows)
    if return_status:
        return result, (do_hflip, do_vflip, do_rot90)
    return result


def img_rotate(img, angle, center=None, scale=1.0):
    """Rotate ``angle`` degrees counter-clockwise about ``center``
    (image center by default; reference: transforms.py:154-172)."""
    h, w = img.shape[:2]
    matrix = cv2.getRotationMatrix2D(center or (w // 2, h // 2), angle,
                                     scale)
    return cv2.warpAffine(img, matrix, (w, h))
