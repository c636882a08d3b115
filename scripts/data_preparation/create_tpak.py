"""Pack a folder-of-clips image dataset into a .tpak raw-frame file for
the native reader (edvr_tpu/native).

Usage:
    python scripts/data_preparation/create_tpak.py \
        --input datasets/REDS/train_sharp_bicubic/X4 \
        --output datasets/REDS/train_sharp_bicubic_X4.tpak
"""

import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from edvr_tpu.native import write_tpak  # noqa: E402
from edvr_tpu.utils import scandir  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--input', required=True,
                        help='folder containing one subfolder per clip')
    parser.add_argument('--output', required=True, help='output .tpak')
    args = parser.parse_args()

    clip_names = sorted(os.listdir(args.input))

    def loader(clip):
        def read():
            paths = sorted(
                scandir(osp.join(args.input, clip), full_path=True))
            frames = [cv2.imread(p, cv2.IMREAD_COLOR) for p in paths]
            return np.stack(frames, axis=0)  # BGR uint8

        return read

    clips = [(name, loader(name)) for name in clip_names]
    write_tpak(args.output, clips)
    print(f'packed {len(clips)} clips into {args.output}')


if __name__ == '__main__':
    main()
