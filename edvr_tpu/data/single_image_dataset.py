"""LQ-only dataset for no-GT testing
(reference: basicsr/data/single_image_dataset.py)."""

from __future__ import annotations

from edvr_tpu.data.data_util import paths_from_folder, paths_from_lmdb
from edvr_tpu.data.file_client import FileClient
from edvr_tpu.data.paired_image_dataset import normalize
from edvr_tpu.utils import imfrombytes, img2tensor
from edvr_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class SingleImageDataset:

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.mean = opt.get('mean')
        self.std = opt.get('std')
        self.lq_folder = opt['dataroot_lq']

        if self.io_backend_opt['type'] == 'lmdb':
            self.io_backend_opt['db_paths'] = [self.lq_folder]
            self.io_backend_opt['client_keys'] = ['lq']
            self.paths = paths_from_lmdb(self.lq_folder)
        elif opt.get('meta_info_file') is not None:
            with open(opt['meta_info_file'], 'r') as fin:
                self.paths = [
                    f'{self.lq_folder}/{line.rstrip()}' for line in fin
                ]
        else:
            self.paths = sorted(paths_from_folder(self.lq_folder))

    def __getitem__(self, index):
        if self.file_client is None:
            backend = dict(self.io_backend_opt)
            self.file_client = FileClient(backend.pop('type'), **backend)
        lq_path = self.paths[index]
        img_lq = imfrombytes(self.file_client.get(lq_path, 'lq'),
                             float32=True)
        img_lq = img2tensor(img_lq)
        if self.mean is not None or self.std is not None:
            img_lq = normalize(img_lq, self.mean, self.std)
        return {'lq': img_lq, 'lq_path': lq_path}

    def __len__(self):
        return len(self.paths)
