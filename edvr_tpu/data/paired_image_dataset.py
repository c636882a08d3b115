"""Paired LQ/GT image dataset (reference: basicsr/data/paired_image_dataset.py).

Supports lmdb / meta-info / folder path modes, train-time paired crop +
flip/rot augmentation, and optional mean/std normalization. Items are
NHWC float32 RGB numpy arrays.
"""

from __future__ import annotations

import numpy as np

from edvr_tpu.data.data_util import (paired_paths_from_folder,
                                     paired_paths_from_lmdb,
                                     paired_paths_from_meta_info_file)
from edvr_tpu.data.file_client import FileClient
from edvr_tpu.data.transforms import augment, paired_random_crop
from edvr_tpu.utils import imfrombytes, img2tensor
from edvr_tpu.utils.registry import DATASET_REGISTRY


def normalize(img: np.ndarray, mean, std) -> np.ndarray:
    mean = np.asarray(mean, dtype=img.dtype)
    std = np.asarray(std, dtype=img.dtype)
    return (img - mean) / std


@DATASET_REGISTRY.register()
class PairedImageDataset:

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.mean = opt.get('mean')
        self.std = opt.get('std')
        self.gt_folder, self.lq_folder = opt['dataroot_gt'], opt[
            'dataroot_lq']
        filename_tmpl = opt.get('filename_tmpl', '{}')

        if self.io_backend_opt['type'] == 'lmdb':
            self.io_backend_opt['db_paths'] = [self.lq_folder,
                                               self.gt_folder]
            self.io_backend_opt['client_keys'] = ['lq', 'gt']
            self.paths = paired_paths_from_lmdb(
                [self.lq_folder, self.gt_folder], ['lq', 'gt'])
        elif opt.get('meta_info_file') is not None:
            self.paths = paired_paths_from_meta_info_file(
                [self.lq_folder, self.gt_folder], ['lq', 'gt'],
                opt['meta_info_file'], filename_tmpl)
        else:
            self.paths = paired_paths_from_folder(
                [self.lq_folder, self.gt_folder], ['lq', 'gt'],
                filename_tmpl)

    def __getitem__(self, index):
        if self.file_client is None:
            backend = dict(self.io_backend_opt)
            self.file_client = FileClient(backend.pop('type'), **backend)

        scale = self.opt['scale']

        gt_path = self.paths[index]['gt_path']
        img_gt = imfrombytes(self.file_client.get(gt_path, 'gt'),
                             float32=True)
        lq_path = self.paths[index]['lq_path']
        img_lq = imfrombytes(self.file_client.get(lq_path, 'lq'),
                             float32=True)

        if self.opt['phase'] == 'train':
            gt_size = self.opt['gt_size']
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, gt_size,
                                                scale, gt_path)
            img_gt, img_lq = augment([img_gt, img_lq], self.opt['use_flip'],
                                     self.opt['use_rot'])

        # BGR->RGB, HWC float32
        img_gt, img_lq = img2tensor([img_gt, img_lq])
        if self.mean is not None or self.std is not None:
            img_lq = normalize(img_lq, self.mean, self.std)
            img_gt = normalize(img_gt, self.mean, self.std)

        return {'lq': img_lq, 'gt': img_gt, 'lq_path': lq_path,
                'gt_path': gt_path}

    def __len__(self):
        return len(self.paths)
