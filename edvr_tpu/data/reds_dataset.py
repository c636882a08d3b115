"""REDS training dataset (reference: basicsr/data/reds_dataset.py).

Temporal window sampling with random interval and border re-roll,
random reverse, REDS4/official val-clip removal, optional quantized-flow
branch, paired crop + flip/rot augmentation. Items: lq (t, h, w, c) and
center-frame gt (h, w, c), float32 RGB.
"""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np

from edvr_tpu.data.file_client import FileClient
from edvr_tpu.data.transforms import augment, paired_random_crop
from edvr_tpu.utils import get_root_logger, imfrombytes, img2tensor
from edvr_tpu.utils.flow_util import dequantize_flow
from edvr_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class REDSDataset:

    def __init__(self, opt):
        self.opt = opt
        self.gt_root = Path(opt['dataroot_gt'])
        self.lq_root = Path(opt['dataroot_lq'])
        self.flow_root = Path(opt['dataroot_flow']) if opt.get(
            'dataroot_flow') is not None else None
        assert opt['num_frame'] % 2 == 1, (
            f'num_frame should be odd number, but got {opt["num_frame"]}')
        self.num_frame = opt['num_frame']
        self.num_half_frames = opt['num_frame'] // 2

        self.keys = []
        with open(opt['meta_info_file'], 'r') as fin:
            for line in fin:
                folder, frame_num, _ = line.split(' ')
                self.keys.extend(
                    [f'{folder}/{i:08d}' for i in range(int(frame_num))])

        # remove validation clips (reference: reds_dataset.py:71-81)
        if opt['val_partition'] == 'REDS4':
            val_partition = ['000', '011', '015', '020']
        elif opt['val_partition'] == 'official':
            val_partition = [f'{v:03d}' for v in range(240, 270)]
        else:
            raise ValueError(
                f'Wrong validation partition {opt["val_partition"]}.'
                f"Supported ones are ['official', 'REDS4'].")
        self.keys = [
            v for v in self.keys if v.split('/')[0] not in val_partition
        ]

        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.is_lmdb = self.io_backend_opt['type'] == 'lmdb'
        if self.is_lmdb:
            if self.flow_root is not None:
                self.io_backend_opt['db_paths'] = [
                    str(self.lq_root), str(self.gt_root), str(self.flow_root)
                ]
                self.io_backend_opt['client_keys'] = ['lq', 'gt', 'flow']
            else:
                self.io_backend_opt['db_paths'] = [str(self.lq_root),
                                                   str(self.gt_root)]
                self.io_backend_opt['client_keys'] = ['lq', 'gt']

        self.interval_list = opt['interval_list']
        self.random_reverse = opt['random_reverse']
        interval_str = ','.join(str(x) for x in opt['interval_list'])
        get_root_logger().info(
            f'Temporal augmentation interval list: [{interval_str}]; '
            f'random reverse is {self.random_reverse}.')

    def __getitem__(self, index):
        if self.file_client is None:
            backend = dict(self.io_backend_opt)
            self.file_client = FileClient(backend.pop('type'), **backend)

        scale = self.opt['scale']
        gt_size = self.opt['gt_size']
        key = self.keys[index]
        clip_name, frame_name = key.split('/')
        center_frame_idx = int(frame_name)

        # temporal window with random interval; re-roll when the window
        # would cross the clip border (reference: reds_dataset.py:117-133)
        interval = random.choice(self.interval_list)
        start_frame_idx = center_frame_idx - self.num_half_frames * interval
        end_frame_idx = center_frame_idx + self.num_half_frames * interval
        while (start_frame_idx < 0) or (end_frame_idx > 99):
            center_frame_idx = random.randint(0, 99)
            start_frame_idx = (
                center_frame_idx - self.num_half_frames * interval)
            end_frame_idx = center_frame_idx + self.num_half_frames * interval
        frame_name = f'{center_frame_idx:08d}'
        neighbor_list = list(
            range(center_frame_idx - self.num_half_frames * interval,
                  center_frame_idx + self.num_half_frames * interval + 1,
                  interval))
        if self.random_reverse and random.random() < 0.5:
            neighbor_list.reverse()
        assert len(neighbor_list) == self.num_frame

        # GT center frame
        if self.is_lmdb:
            img_gt_path = f'{clip_name}/{frame_name}'
        else:
            img_gt_path = self.gt_root / clip_name / f'{frame_name}.png'
        img_gt = imfrombytes(self.file_client.get(img_gt_path, 'gt'),
                             float32=True)

        # neighboring LQ frames
        img_lqs = []
        for neighbor in neighbor_list:
            if self.is_lmdb:
                img_lq_path = f'{clip_name}/{neighbor:08d}'
            else:
                img_lq_path = self.lq_root / clip_name / f'{neighbor:08d}.png'
            img_lqs.append(
                imfrombytes(self.file_client.get(img_lq_path, 'lq'),
                            float32=True))

        # optional quantized flows (reference: reds_dataset.py:160-198)
        img_flows = None
        if self.flow_root is not None:
            img_flows = []
            for tag in ([f'_p{i}' for i in
                         range(self.num_half_frames, 0, -1)] +
                        [f'_n{i}' for i in
                         range(1, self.num_half_frames + 1)]):
                if self.is_lmdb:
                    flow_path = f'{clip_name}/{frame_name}{tag}'
                else:
                    flow_path = (self.flow_root / clip_name /
                                 f'{frame_name}{tag}.png')
                cat_flow = imfrombytes(
                    self.file_client.get(flow_path, 'flow'),
                    flag='grayscale', float32=False)
                dx, dy = np.split(cat_flow, 2, axis=0)
                img_flows.append(
                    dequantize_flow(dx, dy, max_val=20, denorm=False))
            img_lqs.extend(img_flows)

        img_gt, img_lqs = paired_random_crop(img_gt, img_lqs, gt_size, scale,
                                             str(img_gt_path))
        if self.flow_root is not None:
            img_lqs, img_flows = (img_lqs[:self.num_frame],
                                  img_lqs[self.num_frame:])

        img_lqs.append(img_gt)
        if self.flow_root is not None:
            img_results, img_flows = augment(img_lqs, self.opt['use_flip'],
                                             self.opt['use_rot'], img_flows)
        else:
            img_results = augment(img_lqs, self.opt['use_flip'],
                                  self.opt['use_rot'])

        img_results = img2tensor(img_results)
        img_lqs = np.stack(img_results[0:-1], axis=0)
        img_gt = img_results[-1]

        out = {'lq': img_lqs, 'gt': img_gt, 'key': key}
        if self.flow_root is not None:
            img_flows = img2tensor(img_flows, bgr2rgb=False)
            img_flows.insert(self.num_half_frames,
                             np.zeros_like(img_flows[0]))
            out['flow'] = np.stack(img_flows, axis=0)
        return out

    def __len__(self):
        return len(self.keys)
