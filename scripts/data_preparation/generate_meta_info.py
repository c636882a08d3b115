"""Generate meta-info manifests for datasets
(reference: scripts/data_preparation/generate_meta_info.py).

Image datasets: '<name>.png (h,w,c)' per line.
Video datasets (REDS-style): '<clip> <num_frames> (h,w,c)' per line.
"""

import argparse
import os
import os.path as osp
import sys

import cv2

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from edvr_tpu.utils import scandir  # noqa: E402


def generate_meta_info_div2k(folder, meta_info_path):
    img_list = sorted(scandir(folder))
    with open(meta_info_path, 'w') as f:
        for idx, img_path in enumerate(img_list):
            img = cv2.imread(osp.join(folder, img_path))
            h, w, c = img.shape
            info = f'{img_path} ({h},{w},{c})'
            print(idx + 1, info)
            f.write(f'{info}\n')


def generate_meta_info_video(folder, meta_info_path):
    clips = sorted(os.listdir(folder))
    with open(meta_info_path, 'w') as f:
        for clip in clips:
            frames = sorted(scandir(osp.join(folder, clip)))
            img = cv2.imread(osp.join(folder, clip, frames[0]))
            h, w, c = img.shape
            f.write(f'{clip} {len(frames)} ({h},{w},{c})\n')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--folder', required=True)
    parser.add_argument('--output', required=True)
    parser.add_argument('--mode', choices=['image', 'video'],
                        default='image')
    args = parser.parse_args()
    if args.mode == 'image':
        generate_meta_info_div2k(args.folder, args.output)
    else:
        generate_meta_info_video(args.folder, args.output)
