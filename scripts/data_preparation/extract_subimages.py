"""Crop DIV2K images into overlapping sub-images for faster IO during
training (reference: scripts/data_preparation/extract_subimages.py).

GT: 480px crops, step 240; LR x2/x3/x4 scaled accordingly. Patches
smaller than thresh_size are dropped.
"""

import argparse
import os
import os.path as osp
import sys
from multiprocessing import Pool

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from edvr_tpu.utils import scandir  # noqa: E402


def worker(path, opt):
    crop_size = opt['crop_size']
    step = opt['step']
    thresh_size = opt['thresh_size']
    img_name, extension = osp.splitext(osp.basename(path))
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)

    h, w = img.shape[0:2]
    h_space = np.arange(0, h - crop_size + 1, step)
    if h - (h_space[-1] + crop_size) > thresh_size:
        h_space = np.append(h_space, h - crop_size)
    w_space = np.arange(0, w - crop_size + 1, step)
    if w - (w_space[-1] + crop_size) > thresh_size:
        w_space = np.append(w_space, w - crop_size)

    index = 0
    for x in h_space:
        for y in w_space:
            index += 1
            cropped_img = img[x:x + crop_size, y:y + crop_size, ...]
            cropped_img = np.ascontiguousarray(cropped_img)
            cv2.imwrite(
                osp.join(opt['save_folder'],
                         f'{img_name}_s{index:03d}{extension}'),
                cropped_img,
                [cv2.IMWRITE_PNG_COMPRESSION, opt['compression_level']])
    return f'Processing {img_name} ...'


def extract_subimages(opt):
    input_folder = opt['input_folder']
    save_folder = opt['save_folder']
    if not osp.exists(save_folder):
        os.makedirs(save_folder)
        print(f'mkdir {save_folder} ...')
    else:
        print(f'Folder {save_folder} already exists. Exit.')
        return

    img_list = list(scandir(input_folder, full_path=True))
    pool = Pool(opt['n_thread'])
    for path in img_list:
        pool.apply_async(worker, args=(path, opt),
                         callback=lambda msg: print(msg))
    pool.close()
    pool.join()
    print('All processes done.')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--n_thread', type=int, default=20)
    parser.add_argument('--compression_level', type=int, default=3)
    args = parser.parse_args()
    base = dict(n_thread=args.n_thread,
                compression_level=args.compression_level)

    configs = [
        # (input, save, crop, step, thresh)
        ('datasets/DIV2K/DIV2K_train_HR',
         'datasets/DIV2K/DIV2K_train_HR_sub', 480, 240, 0),
        ('datasets/DIV2K/DIV2K_train_LR_bicubic/X2',
         'datasets/DIV2K/DIV2K_train_LR_bicubic/X2_sub', 240, 120, 0),
        ('datasets/DIV2K/DIV2K_train_LR_bicubic/X3',
         'datasets/DIV2K/DIV2K_train_LR_bicubic/X3_sub', 160, 80, 0),
        ('datasets/DIV2K/DIV2K_train_LR_bicubic/X4',
         'datasets/DIV2K/DIV2K_train_LR_bicubic/X4_sub', 120, 60, 0),
    ]
    for input_folder, save_folder, crop, step, thresh in configs:
        opt = dict(base, input_folder=input_folder, save_folder=save_folder,
                   crop_size=crop, step=step, thresh_size=thresh)
        extract_subimages(opt)


if __name__ == '__main__':
    main()
