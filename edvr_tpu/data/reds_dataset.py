"""REDS training dataset.

Feeds EDVR training with temporal windows from the 270-clip REDS set:
random center frame + frame interval (re-rolled when the window would
leave the 100-frame clip), optional window reversal, validation-clip
exclusion, paired crop and shared flip/rot augmentation, optional
quantized optical-flow supervision. Sample layout and augmentation
semantics follow the reference toolbox
(reference: basicsr/data/reds_dataset.py); items are lq (t, h, w, c)
float32 RGB stacks plus the center-frame gt (h, w, c).
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

# REDS clips are exactly 100 frames, 00000000..00000099
_CLIP_LEN = 100


def _val_clips(partition: str) -> set[str]:
    """Clip names reserved for validation
    (reference: reds_dataset.py:71-81)."""
    if partition == 'REDS4':
        return {'000', '011', '015', '020'}
    if partition == 'official':
        return {f'{v:03d}' for v in range(240, 270)}
    raise ValueError(f'Unknown REDS validation partition "{partition}" '
                     f"(expected 'REDS4' or 'official').")


@DATASET_REGISTRY.register()
class REDSDataset:

    def __init__(self, opt):
        self.opt = opt
        self.gt_root = Path(opt['dataroot_gt'])
        self.lq_root = Path(opt['dataroot_lq'])
        flow = opt.get('dataroot_flow')
        self.flow_root = Path(flow) if flow is not None else None

        self.num_frame = opt['num_frame']
        if self.num_frame % 2 != 1:
            raise ValueError(
                f'num_frame must be odd, got {self.num_frame}')
        self.half_window = self.num_frame // 2

        excluded = _val_clips(opt['val_partition'])
        self.keys = []
        with open(opt['meta_info_file']) as fin:
            for line in fin:
                clip, n_frames = line.split(' ')[:2]
                if clip not in excluded:
                    self.keys += [f'{clip}/{i:08d}'
                                  for i in range(int(n_frames))]

        self.io_backend_opt = dict(opt['io_backend'])
        self.is_lmdb = self.io_backend_opt['type'] == 'lmdb'
        if self.is_lmdb:
            roots = [self.lq_root, self.gt_root]
            names = ['lq', 'gt']
            if self.flow_root is not None:
                roots.append(self.flow_root)
                names.append('flow')
            self.io_backend_opt['db_paths'] = [str(r) for r in roots]
            self.io_backend_opt['client_keys'] = names
        self.file_client = None

        self.interval_list = opt['interval_list']
        self.random_reverse = opt['random_reverse']
        get_root_logger().info(
            'Temporal augmentation interval list: '
            f'[{",".join(str(x) for x in self.interval_list)}]; '
            f'random reverse is {self.random_reverse}.')

    # ------------------------------------------------------------------ #
    def _key_for(self, clip: str, frame: int, root: Path, suffix=''):
        """lmdb key or on-disk path of one frame."""
        if self.is_lmdb:
            return f'{clip}/{frame:08d}{suffix}'
        return root / clip / f'{frame:08d}{suffix}.png'

    def _window(self, center: int) -> tuple[int, list[int]]:
        """Draw the temporal window: random interval from the config
        list, center re-rolled until the window fits in the clip,
        optional reversal (reference: reds_dataset.py:117-136)."""
        interval = random.choice(self.interval_list)
        reach = self.half_window * interval
        while center - reach < 0 or center + reach > _CLIP_LEN - 1:
            center = random.randint(0, _CLIP_LEN - 1)
        frames = list(range(center - reach, center + reach + 1, interval))
        if self.random_reverse and random.random() < 0.5:
            frames.reverse()
        assert len(frames) == self.num_frame
        return center, frames

    def _read(self, client_key: str, path, **decode):
        return imfrombytes(self.file_client.get(path, client_key),
                           **decode)

    # ------------------------------------------------------------------ #
    def __getitem__(self, index):
        if self.file_client is None:
            backend = dict(self.io_backend_opt)
            self.file_client = FileClient(backend.pop('type'), **backend)

        scale = self.opt['scale']
        gt_size = self.opt['gt_size']
        key = self.keys[index]
        clip, frame_name = key.split('/')

        center, window = self._window(int(frame_name))

        gt_path = self._key_for(clip, center, self.gt_root)
        img_gt = self._read('gt', gt_path, float32=True)
        img_lqs = [
            self._read('lq', self._key_for(clip, f, self.lq_root),
                       float32=True) for f in window
        ]

        # optional quantized flows, center->neighbor, past then future
        # (reference: reds_dataset.py:160-198)
        flows = None
        if self.flow_root is not None:
            tags = ([f'_p{i}' for i in range(self.half_window, 0, -1)] +
                    [f'_n{i}' for i in range(1, self.half_window + 1)])
            flows = []
            for tag in tags:
                packed = self._read(
                    'flow', self._key_for(clip, center, self.flow_root,
                                          tag),
                    flag='grayscale', float32=False)
                dx, dy = np.split(packed, 2, axis=0)
                flows.append(dequantize_flow(dx, dy, max_val=20,
                                             denorm=False))
            # ride along through the paired crop
            img_lqs.extend(flows)

        img_gt, img_lqs = paired_random_crop(img_gt, img_lqs, gt_size,
                                             scale, str(gt_path))
        if flows is not None:
            img_lqs, flows = (img_lqs[:self.num_frame],
                              img_lqs[self.num_frame:])

        # one shared augmentation draw for LQ window + GT (+ flows)
        img_lqs.append(img_gt)
        if flows is not None:
            frames, flows = augment(img_lqs, self.opt['use_flip'],
                                    self.opt['use_rot'], flows)
        else:
            frames = augment(img_lqs, self.opt['use_flip'],
                             self.opt['use_rot'])

        frames = img2tensor(frames)
        sample = {
            'lq': np.stack(frames[:-1], axis=0),
            'gt': frames[-1],
            'key': key,
        }
        if flows is not None:
            flows = img2tensor(flows, bgr2rgb=False)
            # the center frame has no flow to itself: zero placeholder
            flows.insert(self.half_window, np.zeros_like(flows[0]))
            sample['flow'] = np.stack(flows, axis=0)
        return sample

    def __len__(self):
        return len(self.keys)
