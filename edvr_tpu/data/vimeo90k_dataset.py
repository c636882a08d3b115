"""Vimeo90K septuplet training dataset
(reference: basicsr/data/vimeo90k_dataset.py). GT is frame im4; the
neighbor window is centered on it."""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np

from edvr_tpu.data.file_client import FileClient
from edvr_tpu.data.transforms import augment, paired_random_crop
from edvr_tpu.utils import get_root_logger, imfrombytes, img2tensor
from edvr_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class Vimeo90KDataset:

    def __init__(self, opt):
        self.opt = opt
        self.gt_root = Path(opt['dataroot_gt'])
        self.lq_root = Path(opt['dataroot_lq'])

        with open(opt['meta_info_file'], 'r') as fin:
            self.keys = [line.split(' ')[0] for line in fin]

        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.is_lmdb = self.io_backend_opt['type'] == 'lmdb'
        if self.is_lmdb:
            self.io_backend_opt['db_paths'] = [str(self.lq_root),
                                               str(self.gt_root)]
            self.io_backend_opt['client_keys'] = ['lq', 'gt']

        # neighbor frames centered on im4 (reference: vimeo90k:69-71)
        self.neighbor_list = [
            i + (9 - opt['num_frame']) // 2 for i in range(opt['num_frame'])
        ]
        self.random_reverse = opt['random_reverse']
        get_root_logger().info(f'Random reverse is {self.random_reverse}.')

    def __getitem__(self, index):
        if self.file_client is None:
            backend = dict(self.io_backend_opt)
            self.file_client = FileClient(backend.pop('type'), **backend)

        if self.random_reverse and random.random() < 0.5:
            self.neighbor_list.reverse()

        scale = self.opt['scale']
        gt_size = self.opt['gt_size']
        key = self.keys[index]
        clip, seq = key.split('/')

        if self.is_lmdb:
            img_gt_path = f'{key}/im4'
        else:
            img_gt_path = self.gt_root / clip / seq / 'im4.png'
        img_gt = imfrombytes(self.file_client.get(img_gt_path, 'gt'),
                             float32=True)

        img_lqs = []
        for neighbor in self.neighbor_list:
            if self.is_lmdb:
                img_lq_path = f'{clip}/{seq}/im{neighbor}'
            else:
                img_lq_path = self.lq_root / clip / seq / f'im{neighbor}.png'
            img_lqs.append(
                imfrombytes(self.file_client.get(img_lq_path, 'lq'),
                            float32=True))

        img_gt, img_lqs = paired_random_crop(img_gt, img_lqs, gt_size, scale,
                                             str(img_gt_path))
        img_lqs.append(img_gt)
        img_results = img2tensor(augment(img_lqs, self.opt['use_flip'],
                                         self.opt['use_rot']))
        return {'lq': np.stack(img_results[0:-1], axis=0),
                'gt': img_results[-1], 'key': key}

    def __len__(self):
        return len(self.keys)
