"""Standalone PSNR/SSIM calculator over two folders
(reference: scripts/metrics/calculate_psnr_ssim.py)."""

import argparse
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from edvr_tpu.metrics import calculate_psnr, calculate_ssim  # noqa: E402
from edvr_tpu.utils import scandir  # noqa: E402
from edvr_tpu.utils.matlab_functions import bgr2ycbcr  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--gt', type=str, required=True,
                        help='Path to GT folder')
    parser.add_argument('--restored', type=str, required=True,
                        help='Path to restored image folder')
    parser.add_argument('--crop_border', type=int, default=4)
    parser.add_argument('--suffix', type=str, default='')
    parser.add_argument('--test_y_channel', action='store_true')
    args = parser.parse_args()

    psnr_all, ssim_all = [], []
    img_list = sorted(scandir(args.gt, recursive=True, full_path=True))
    for i, img_path in enumerate(img_list):
        basename, ext = osp.splitext(osp.basename(img_path))
        img_gt = cv2.imread(img_path, cv2.IMREAD_UNCHANGED).astype(
            np.float32) / 255.
        restored_path = osp.join(args.restored,
                                 basename + args.suffix + ext)
        img_restored = cv2.imread(restored_path, cv2.IMREAD_UNCHANGED
                                  ).astype(np.float32) / 255.
        if args.test_y_channel and img_gt.ndim == 3:
            img_gt = bgr2ycbcr(img_gt, y_only=True)
            img_restored = bgr2ycbcr(img_restored, y_only=True)

        psnr = calculate_psnr(img_gt * 255, img_restored * 255,
                              crop_border=args.crop_border,
                              input_order='HWC')
        ssim = calculate_ssim(img_gt * 255, img_restored * 255,
                              crop_border=args.crop_border,
                              input_order='HWC')
        print(f'{i+1:3d}: {basename:25}. \tPSNR: {psnr:.6f} dB, '
              f'\tSSIM: {ssim:.6f}')
        psnr_all.append(psnr)
        ssim_all.append(ssim)
    print(f'Average: PSNR: {sum(psnr_all) / len(psnr_all):.6f} dB, '
          f'SSIM: {sum(ssim_all) / len(ssim_all):.6f}')


if __name__ == '__main__':
    main()
