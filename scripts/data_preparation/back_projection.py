"""Iterative back-projection refinement of SR outputs against their LR
inputs — the reference ships this as MATLAB
(``scripts/matlab_scripts/back_projection/backprojection.m:1-21``,
``main_bp.m``, ``main_reverse_filter.m``); this is the Python
equivalent on the MATLAB-parity ``imresize``.

Two modes:

* ``bp`` (``backprojection.m``): each iteration downsamples the current
  SR estimate, takes the LR residual, bicubic-upsamples it, and adds it
  back smoothed by a squared-and-renormalised 5x5 Gaussian(sigma=1)
  kernel (zero-padded convolution, matching MATLAB ``conv2 'same'``).
* ``reverse`` (``main_reverse_filter.m``): iterative reverse filtering,
  ``out += up(LR) - up(down(out))`` with plain bicubic resampling.

Usage::

    python scripts/data_preparation/back_projection.py --mode bp \
        --lr_folder ./LR --sr_folder ./results --save_folder \
        ./results_20bp --scale 4 --max_iter 20
"""

import argparse
import os
import os.path as osp

import cv2
import numpy as np

from edvr_tpu.utils.matlab_functions import imresize


def _fspecial_gaussian_sq(size=5, sigma=1.0):
    """MATLAB ``p = fspecial('gaussian',5,1); p = p.^2/sum(p(:).^2)``."""
    r = (size - 1) / 2.0
    y, x = np.mgrid[-r:r + 1, -r:r + 1]
    p = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    p /= p.sum()
    p = p * p
    return (p / p.sum()).astype(np.float32)


def backprojection(sr, lr, scale, max_iter):
    kernel = _fspecial_gaussian_sq()
    for _ in range(max_iter):
        down = imresize(sr, 1.0 / scale)
        diff_hr = imresize(lr - down, float(scale))
        # conv2(..., 'same') zero-pads; the kernel is symmetric so
        # correlation == convolution
        smoothed = cv2.filter2D(diff_hr, -1, kernel,
                                borderType=cv2.BORDER_CONSTANT)
        sr = sr + smoothed
    return sr


def reverse_filter(sr, lr, scale, max_iter):
    up_lr = imresize(lr, float(scale))
    for _ in range(max_iter):
        sr = sr + (up_lr - imresize(imresize(sr, 1.0 / scale),
                                    float(scale)))
    return sr


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--mode', choices=('bp', 'reverse'), default='bp')
    parser.add_argument('--lr_folder', required=True)
    parser.add_argument('--sr_folder', required=True,
                        help='folder with the SR model outputs to refine')
    parser.add_argument('--save_folder', required=True)
    parser.add_argument('--scale', type=int, default=4)
    parser.add_argument('--max_iter', type=int, default=20)
    args = parser.parse_args()
    os.makedirs(args.save_folder, exist_ok=True)

    fn = backprojection if args.mode == 'bp' else reverse_filter
    names = sorted(f for f in os.listdir(args.sr_folder)
                   if f.lower().endswith('.png'))
    for i, name in enumerate(names, 1):
        print(f'{i} {name}')
        lr = cv2.imread(osp.join(args.lr_folder, name),
                        cv2.IMREAD_COLOR).astype(np.float32) / 255.0
        sr = cv2.imread(osp.join(args.sr_folder, name),
                        cv2.IMREAD_COLOR).astype(np.float32) / 255.0
        out = fn(sr, lr, args.scale, args.max_iter)
        cv2.imwrite(osp.join(args.save_folder, name),
                    (np.clip(out, 0, 1) * 255.0).round().astype(np.uint8))
    print(f'done: {len(names)} images')


if __name__ == '__main__':
    main()
