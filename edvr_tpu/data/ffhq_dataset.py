"""FFHQ dataset for StyleGAN training
(reference: basicsr/data/ffhq_dataset.py)."""

from __future__ import annotations

from os import path as osp

from edvr_tpu.data.file_client import FileClient
from edvr_tpu.data.paired_image_dataset import normalize
from edvr_tpu.data.transforms import augment
from edvr_tpu.utils import imfrombytes, img2tensor
from edvr_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class FFHQDataset:

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.gt_folder = opt['dataroot_gt']
        self.mean = opt['mean']
        self.std = opt['std']

        if self.io_backend_opt['type'] == 'lmdb':
            self.io_backend_opt['db_paths'] = self.gt_folder
            if not self.gt_folder.endswith('.lmdb'):
                raise ValueError("'dataroot_gt' should end with '.lmdb', "
                                 f'but received {self.gt_folder}')
            with open(osp.join(self.gt_folder, 'meta_info.txt')) as fin:
                self.paths = [line.split('.')[0] for line in fin]
        else:
            # FFHQ has 70000 images in total
            self.paths = [
                osp.join(self.gt_folder, f'{v:08d}.png')
                for v in range(70000)
            ]

    def __getitem__(self, index):
        if self.file_client is None:
            backend = dict(self.io_backend_opt)
            self.file_client = FileClient(backend.pop('type'), **backend)
        gt_path = self.paths[index]
        img_gt = imfrombytes(self.file_client.get(gt_path), float32=True)
        img_gt = augment(img_gt, hflip=self.opt['use_hflip'], rotation=False)
        img_gt = img2tensor(img_gt)
        img_gt = normalize(img_gt, self.mean, self.std)
        return {'gt': img_gt, 'gt_path': gt_path}

    def __len__(self):
        return len(self.paths)
