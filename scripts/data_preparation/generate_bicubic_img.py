"""Generate mod-cropped GT, MATLAB-bicubic LR, and bicubic-upsampled
images — the reference ships this as MATLAB code
(``scripts/matlab_scripts/generate_bicubic_img.m`` and
``generate_LR_Vimeo90K.m``, reference ``generate_bicubic_img.m:1-88``);
here it is pure Python on the golden-verified MATLAB-parity
``edvr_tpu.utils.matlab_functions.imresize``, so no MATLAB install is
needed and the outputs are bit-compatible with the published datasets.

Flat-folder use (Set5/Set14/DIV2K GT folders)::

    python scripts/data_preparation/generate_bicubic_img.py \
        --input datasets/Set5/original --scale 2 --mod_scale 12 \
        --save_mod datasets/Set5/GTmod12 --save_lr datasets/Set5/LRbicx2

Vimeo90K-style nested tree (mirrors the directory structure under the
output roots, equivalent to ``generate_LR_Vimeo90K.m``)::

    python scripts/data_preparation/generate_bicubic_img.py \
        --input vimeo_septuplet/sequences --recursive --scale 4 \
        --mod_scale 4 --save_lr vimeo_septuplet_matlabLRx4/sequences
"""

import argparse
import os
import os.path as osp

import cv2
import numpy as np

from edvr_tpu.utils.matlab_functions import imresize


def modcrop(img, modulo):
    """Crop so both spatial dims are multiples of ``modulo``."""
    h, w = img.shape[:2]
    return img[:h - h % modulo if h % modulo else h,
               :w - w % modulo if w % modulo else w, ...]


def _to_uint8(img):
    return (np.clip(img, 0, 1) * 255.0).round().astype(np.uint8)


def process_one(path, rel, args):
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        print(f'skip unreadable: {path}')
        return
    img = img.astype(np.float32) / 255.0
    img = modcrop(img, args.mod_scale)
    base = osp.splitext(rel)[0] + '.png'
    if args.save_mod:
        out = osp.join(args.save_mod, base)
        os.makedirs(osp.dirname(out) or '.', exist_ok=True)
        cv2.imwrite(out, _to_uint8(img))
    lr = imresize(img, 1.0 / args.scale)
    if args.save_lr:
        out = osp.join(args.save_lr, base)
        os.makedirs(osp.dirname(out) or '.', exist_ok=True)
        cv2.imwrite(out, _to_uint8(lr))
    if args.save_bic:
        bic = imresize(lr, float(args.scale))
        out = osp.join(args.save_bic, base)
        os.makedirs(osp.dirname(out) or '.', exist_ok=True)
        cv2.imwrite(out, _to_uint8(bic))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--input', required=True, help='GT image folder')
    parser.add_argument('--scale', type=int, default=4)
    parser.add_argument('--mod_scale', type=int, default=None,
                        help='mod-crop modulo (default: scale)')
    parser.add_argument('--save_mod', default=None,
                        help='folder for mod-cropped GT (optional)')
    parser.add_argument('--save_lr', default=None,
                        help='folder for bicubic LR (optional)')
    parser.add_argument('--save_bic', default=None,
                        help='folder for bicubic-upsampled LR (optional)')
    parser.add_argument('--recursive', action='store_true',
                        help='walk subfolders, mirroring the tree '
                             '(Vimeo90K layout)')
    args = parser.parse_args()
    if args.mod_scale is None:
        args.mod_scale = args.scale
    if not (args.save_mod or args.save_lr or args.save_bic):
        parser.error('give at least one of --save_mod/--save_lr/--save_bic')

    exts = ('.png', '.jpg', '.jpeg', '.bmp')
    n = 0
    if args.recursive:
        for root, _, files in sorted(os.walk(args.input)):
            for f in sorted(files):
                if f.lower().endswith(exts):
                    n += 1
                    rel = osp.relpath(osp.join(root, f), args.input)
                    print(f'{n}\t{rel}')
                    process_one(osp.join(root, f), rel, args)
    else:
        for f in sorted(os.listdir(args.input)):
            if f.lower().endswith(exts):
                n += 1
                print(f'{n}\t{f}')
                process_one(osp.join(args.input, f), f, args)
    print(f'done: {n} images')


if __name__ == '__main__':
    main()
