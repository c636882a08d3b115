"""Data layer: datasets by YAML ``type`` name + loader factory
(reference: basicsr/data/__init__.py)."""

from __future__ import annotations

from copy import deepcopy

# importing registers the dataset classes
from edvr_tpu.data import (ffhq_dataset, paired_image_dataset,  # noqa: F401
                           reds_dataset, single_image_dataset,
                           video_test_dataset, vimeo90k_dataset)

# the packed-native REDS dataset needs the optional C++ core; register
# it only when the library builds/loads
try:
    from edvr_tpu.data import reds_packed_dataset  # noqa: F401
except Exception:  # pragma: no cover - no compiler available
    pass
from edvr_tpu.data.data_sampler import EnlargedSampler
from edvr_tpu.data.loader import CPUPrefetcher, DataLoader, DevicePrefetcher
from edvr_tpu.parallel.dist_util import get_dist_info
from edvr_tpu.utils import get_root_logger
from edvr_tpu.utils.registry import DATASET_REGISTRY

__all__ = ['create_dataset', 'create_dataloader', 'EnlargedSampler',
           'DataLoader', 'DevicePrefetcher', 'CPUPrefetcher']


def create_dataset(dataset_opt: dict):
    """Create a dataset from its YAML options
    (reference: basicsr/data/__init__.py:29-53)."""
    dataset_opt = deepcopy(dataset_opt)
    dataset = DATASET_REGISTRY.get(dataset_opt['type'])(dataset_opt)
    get_root_logger().info(
        f'Dataset {dataset.__class__.__name__} - {dataset_opt["name"]} '
        'is created.')
    return dataset


def create_dataloader(dataset, dataset_opt, num_gpu=1, dist=False,
                      sampler=None, seed=None):
    """Create a loader with the reference's phase semantics
    (reference: basicsr/data/__init__.py:56-119): train loaders batch
    per device-count with drop_last and seeded shuffling; val/test
    loaders are batch-1 synchronous.

    ``num_gpu`` is interpreted as the local device count when not
    running multi-host ('dist').
    """
    phase = dataset_opt['phase']
    if phase == 'train':
        if dist:
            batch_size = dataset_opt['batch_size_per_gpu']
            num_workers = dataset_opt['num_worker_per_gpu']
        else:
            multiplier = 1 if num_gpu == 0 else num_gpu
            batch_size = dataset_opt['batch_size_per_gpu'] * multiplier
            num_workers = dataset_opt['num_worker_per_gpu'] * multiplier
        return DataLoader(dataset, batch_size=batch_size,
                          shuffle=(sampler is None), num_workers=num_workers,
                          sampler=sampler, drop_last=True, seed=seed)
    elif phase in ('val', 'test'):
        return DataLoader(dataset, batch_size=1, shuffle=False,
                          num_workers=0)
    raise ValueError(f'Wrong dataset phase: {phase}. '
                     "Supported ones are 'train', 'val' and 'test'.")
