"""FFHQ faces for StyleGAN2 training.

GT-only dataset over the 70k-image Flickr-Faces-HQ set (disk tree or
one .lmdb), with horizontal-flip augmentation and mean/std
normalization to the GAN's input range. Matches the reference
toolbox's sample dict (reference: basicsr/data/ffhq_dataset.py).
"""

from __future__ import annotations

from os import path as osp

from edvr_tpu.data.file_client import FileClient
from edvr_tpu.data.paired_image_dataset import normalize
from edvr_tpu.data.transforms import augment
from edvr_tpu.utils import imfrombytes, img2tensor
from edvr_tpu.utils.registry import DATASET_REGISTRY

_FFHQ_SIZE = 70000  # the released set is exactly 70k images


@DATASET_REGISTRY.register()
class FFHQDataset:

    def __init__(self, opt):
        self.opt = opt
        self.root = opt['dataroot_gt']
        self.mean = opt['mean']
        self.std = opt['std']
        self.io_backend_opt = dict(opt['io_backend'])
        self.file_client = None

        if self.io_backend_opt['type'] == 'lmdb':
            if not self.root.endswith('.lmdb'):
                raise ValueError(
                    f'lmdb backend needs an .lmdb dataroot_gt, got '
                    f'{self.root}')
            self.io_backend_opt['db_paths'] = self.root
            # lmdb keys are the image names from the bundled manifest
            with open(osp.join(self.root, 'meta_info.txt')) as fin:
                self.paths = [line.split('.')[0] for line in fin]
        else:
            self.paths = [osp.join(self.root, f'{v:08d}.png')
                          for v in range(_FFHQ_SIZE)]

    def __getitem__(self, index):
        if self.file_client is None:
            backend = dict(self.io_backend_opt)
            self.file_client = FileClient(backend.pop('type'), **backend)
        path = self.paths[index]
        img = imfrombytes(self.file_client.get(path), float32=True)
        img = augment(img, hflip=self.opt['use_hflip'], rotation=False)
        img = normalize(img2tensor(img), self.mean, self.std)
        return {'gt': img, 'gt_path': path}

    def __len__(self):
        return len(self.paths)
