"""REDS training dataset on the native packed-frame (tpak) backend.

Same sampling semantics as REDSDataset (temporal window with random
interval + border re-roll, random reverse, REDS4/official val-clip
removal, paired crop, flip/rot augmentation — reference:
basicsr/data/reds_dataset.py) but reads raw-uint8 crops through the
C++ tpak reader: no PNG decode, no full-frame reads, multithreaded
strided copies (edvr_tpu/native/tpak.cpp). Build the .tpak files with
scripts/data_preparation/create_tpak.py.
"""

from __future__ import annotations

import random

import numpy as np

from edvr_tpu.data.transforms import augment
from edvr_tpu.utils import get_root_logger
from edvr_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class REDSPackedDataset:
    """opt keys: dataroot_gt/dataroot_lq point at .tpak files; the rest
    match REDSDataset (num_frame, gt_size, interval_list,
    random_reverse, use_flip, use_rot, val_partition, scale)."""

    def __init__(self, opt):
        from edvr_tpu.native import TpakReader
        self.opt = opt
        self.gt_pak = TpakReader(opt['dataroot_gt'])
        self.lq_pak = TpakReader(opt['dataroot_lq'])
        assert opt['num_frame'] % 2 == 1
        self.num_frame = opt['num_frame']
        self.num_half_frames = opt['num_frame'] // 2

        if opt['val_partition'] == 'REDS4':
            val_partition = ['000', '011', '015', '020']
        elif opt['val_partition'] == 'official':
            val_partition = [f'{v:03d}' for v in range(240, 270)]
        else:
            raise ValueError(
                f'Wrong validation partition {opt["val_partition"]}.')

        self.keys = []  # (clip_idx_lq, clip_idx_gt, frame)
        for name in self.lq_pak.clip_names:
            if name in val_partition:
                continue
            lq_idx = self.lq_pak.name_to_idx[name]
            gt_idx = self.gt_pak.name_to_idx[name]
            for f in range(self.lq_pak.clip_frames[lq_idx]):
                self.keys.append((lq_idx, gt_idx, f))

        self.interval_list = opt['interval_list']
        self.random_reverse = opt['random_reverse']
        self.n_threads = opt.get('num_worker_per_gpu', 4) or 4
        get_root_logger().info(
            f'REDSPackedDataset: {len(self.keys)} samples from '
            f'{opt["dataroot_lq"]}')

    def __getitem__(self, index):
        scale = self.opt['scale']
        gt_size = self.opt['gt_size']
        lq_size = gt_size // scale
        lq_idx, gt_idx, center = self.keys[index]
        num_frames_clip = self.lq_pak.clip_frames[lq_idx]
        h_lq, w_lq, _ = self.lq_pak.clip_shapes[lq_idx]

        interval = random.choice(self.interval_list)
        start = center - self.num_half_frames * interval
        end = center + self.num_half_frames * interval
        while start < 0 or end > num_frames_clip - 1:
            center = random.randint(0, num_frames_clip - 1)
            start = center - self.num_half_frames * interval
            end = center + self.num_half_frames * interval
        if self.random_reverse and random.random() < 0.5:
            start, interval = end, -interval

        top = random.randint(0, h_lq - lq_size)
        left = random.randint(0, w_lq - lq_size)

        lqs = self.lq_pak.read_windows(
            np.array([lq_idx]), np.array([start]), np.array([interval]),
            np.array([top]), np.array([left]), lq_size, lq_size,
            self.num_frame, self.n_threads)[0]  # (t, h, w, c) uint8 BGR
        gt = self.gt_pak.read_windows(
            np.array([gt_idx]), np.array([center]), np.array([1]),
            np.array([top * scale]), np.array([left * scale]),
            gt_size, gt_size, 1, self.n_threads)[0, 0]

        imgs = [lqs[i] for i in range(self.num_frame)] + [gt]
        imgs = augment(imgs, self.opt['use_flip'], self.opt['use_rot'])
        # BGR uint8 -> RGB float32 (packed files store cv2-convention BGR)
        imgs = [im[..., ::-1].astype(np.float32) / 255. for im in imgs]
        img_lqs = np.ascontiguousarray(np.stack(imgs[:-1], axis=0))
        img_gt = np.ascontiguousarray(imgs[-1])
        clip_name = self.lq_pak.clip_names[lq_idx]
        return {'lq': img_lqs, 'gt': img_gt,
                'key': f'{clip_name}/{center:08d}'}

    def __len__(self):
        return len(self.keys)
