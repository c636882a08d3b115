"""Create LMDB files for DIV2K / REDS / Vimeo90K
(reference: scripts/data_preparation/create_lmdb.py). Requires the
optional lmdb package; the disk backend works without it.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from edvr_tpu.utils import scandir  # noqa: E402
from edvr_tpu.utils.lmdb_util import make_lmdb_from_imgs  # noqa: E402


def create_lmdb_for_div2k():
    # HR sub images
    folder_path = 'datasets/DIV2K/DIV2K_train_HR_sub'
    lmdb_path = 'datasets/DIV2K/DIV2K_train_HR_sub.lmdb'
    img_path_list, keys = prepare_keys_div2k(folder_path)
    make_lmdb_from_imgs(folder_path, lmdb_path, img_path_list, keys)
    # LRx4 sub images
    folder_path = 'datasets/DIV2K/DIV2K_train_LR_bicubic/X4_sub'
    lmdb_path = 'datasets/DIV2K/DIV2K_train_LR_bicubic_X4_sub.lmdb'
    img_path_list, keys = prepare_keys_div2k(folder_path)
    make_lmdb_from_imgs(folder_path, lmdb_path, img_path_list, keys)


def prepare_keys_div2k(folder_path):
    print('Reading image path list ...')
    img_path_list = sorted(
        list(scandir(folder_path, suffix='png', recursive=False)))
    keys = [img_path.split('.png')[0] for img_path in img_path_list]
    return img_path_list, keys


def create_lmdb_for_reds():
    # train_sharp (GT)
    folder_path = 'datasets/REDS/train_sharp'
    lmdb_path = 'datasets/REDS/train_sharp_with_val.lmdb'
    img_path_list, keys = prepare_keys_reds(folder_path)
    make_lmdb_from_imgs(folder_path, lmdb_path, img_path_list, keys,
                        multiprocessing_read=True)
    # train_sharp_bicubic (LQ)
    folder_path = 'datasets/REDS/train_sharp_bicubic/X4'
    lmdb_path = 'datasets/REDS/train_sharp_bicubic_with_val.lmdb'
    img_path_list, keys = prepare_keys_reds(folder_path)
    make_lmdb_from_imgs(folder_path, lmdb_path, img_path_list, keys,
                        multiprocessing_read=True)


def prepare_keys_reds(folder_path):
    print('Reading image path list ...')
    img_path_list = sorted(
        list(scandir(folder_path, suffix='png', recursive=True)))
    keys = [v.split('.png')[0] for v in img_path_list]  # 000/00000000
    return img_path_list, keys


def create_lmdb_for_vimeo90k():
    # GT
    folder_path = 'datasets/vimeo90k/vimeo_septuplet/sequences'
    lmdb_path = 'datasets/vimeo90k/vimeo90k_train_GT_only4.lmdb'
    train_list_path = 'datasets/vimeo90k/vimeo_septuplet/sep_trainlist.txt'
    img_path_list, keys = prepare_keys_vimeo90k(folder_path,
                                                train_list_path, 'gt')
    make_lmdb_from_imgs(folder_path, lmdb_path, img_path_list, keys,
                        multiprocessing_read=True)
    # LQ
    folder_path = 'datasets/vimeo90k/vimeo_septuplet_matlabLRx4/sequences'
    lmdb_path = 'datasets/vimeo90k/vimeo90k_train_LR7frames.lmdb'
    img_path_list, keys = prepare_keys_vimeo90k(folder_path,
                                                train_list_path, 'lq')
    make_lmdb_from_imgs(folder_path, lmdb_path, img_path_list, keys,
                        multiprocessing_read=True)


def prepare_keys_vimeo90k(folder_path, train_list_path, mode):
    """GT stores only im4; LQ stores all 7 frames
    (reference: create_lmdb.py vimeo90k section)."""
    print('Reading image path list ...')
    with open(train_list_path, 'r') as fin:
        train_list = [line.strip() for line in fin]

    img_path_list = []
    keys = []
    for line in train_list:
        folder, sub_folder = line.split('/')
        if mode == 'gt':
            img_path_list.append(osp.join(folder, sub_folder, 'im4.png'))
            keys.append(f'{folder}/{sub_folder}/im4')
        else:
            img_path_list.extend([
                osp.join(folder, sub_folder, f'im{j + 1}.png')
                for j in range(7)
            ])
            keys.extend(
                [f'{folder}/{sub_folder}/im{j + 1}' for j in range(7)])
    return img_path_list, keys


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--dataset', choices=['div2k', 'reds', 'vimeo90k'],
                        required=True)
    args = parser.parse_args()
    {'div2k': create_lmdb_for_div2k,
     'reds': create_lmdb_for_reds,
     'vimeo90k': create_lmdb_for_vimeo90k}[args.dataset]()
