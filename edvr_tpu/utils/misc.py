"""Miscellaneous host-side utilities: seeding, experiment-directory
management, directory scanning, and resume-path rewriting (behavior
parity with basicsr/utils/misc.py)."""

from __future__ import annotations

import os
import os.path as osp
import random
import time

import numpy as np

from edvr_tpu.parallel.dist_util import master_only


def set_random_seed(seed: int) -> None:
    """Seed python and numpy RNGs.

    JAX randomness is handled by explicit `jax.random` keys derived from
    the same seed at the engine level, not by global state.
    """
    random.seed(seed)
    np.random.seed(seed)


def get_time_str() -> str:
    return time.strftime('%Y%m%d_%H%M%S', time.localtime())


def mkdir_and_rename(path: str) -> None:
    """Create ``path``, archiving any existing directory of that name.

    A pre-existing directory is moved aside to
    ``<path>_archived_<timestamp>`` so reruns never overwrite earlier
    experiment outputs.
    """
    if osp.exists(path):
        archived = f'{path}_archived_{get_time_str()}'
        print(f'{path} exists — archiving the old run to {archived}',
              flush=True)
        os.rename(path, archived)
    os.makedirs(path, exist_ok=True)


# opt['path'] keys that are settings rather than directories
_NON_DIR_PATH_KEYS = ('strict_load', 'pretrain_network', 'resume',
                      'param_key')


@master_only
def make_exp_dirs(opt) -> None:
    """Create the experiment (train) / results (test) directory tree."""
    paths = dict(opt['path'])
    root_key = 'experiments_root' if opt['is_train'] else 'results_root'
    mkdir_and_rename(paths.pop(root_key))
    for key, path in paths.items():
        if path is None:
            continue
        if any(tag in key for tag in _NON_DIR_PATH_KEYS):
            continue
        os.makedirs(path, exist_ok=True)


def scandir(dir_path, suffix=None, recursive=False, full_path=False):
    """Yield files under ``dir_path``, skipping dot-files.

    Args:
        dir_path: Directory to scan.
        suffix: Only yield files whose (relative) path ends with this
            str or any of this tuple of strs.
        recursive: Descend into (non-hidden) subdirectories.
        full_path: Yield absolute-style joined paths instead of paths
            relative to ``dir_path``.

    Yields:
        str: file paths in os.scandir order.
    """
    if suffix is not None and not isinstance(suffix, (str, tuple)):
        raise TypeError(
            f'suffix must be str or tuple of str, got {type(suffix)}')

    def walk(cur):
        for entry in os.scandir(cur):
            if entry.name.startswith('.'):
                continue
            if entry.is_dir():
                if recursive:
                    yield from walk(entry.path)
                continue
            out = entry.path if full_path else osp.relpath(entry.path,
                                                           dir_path)
            if suffix is None or out.endswith(suffix):
                yield out

    return walk(dir_path)


def check_resume(opt, resume_iter: int) -> None:
    """Point every ``pretrain_network_*`` option at the resume-iter
    checkpoint files (``<models>/net_<suffix>_<iter>.ckpt``).

    Called when a training state is being resumed: whatever pretrain
    paths the YAML named are superseded by the run's own checkpoints.
    """
    from edvr_tpu.utils.logger import get_root_logger
    if not opt['path'].get('resume_state'):
        return
    logger = get_root_logger()
    networks = [k for k in opt if k.startswith('network_')]
    if any(opt['path'].get(f'pretrain_{n}') is not None for n in networks):
        logger.warning(
            'resume overrides the configured pretrain_network paths')
    skip = opt['path'].get('ignore_resume_networks') or ()
    for net in networks:
        if net in skip:
            continue
        suffix = net[len('network_'):]
        ckpt = osp.join(opt['path']['models'],
                        f'net_{suffix}_{resume_iter}.ckpt')
        opt['path'][f'pretrain_{net}'] = ckpt
        logger.info(f'resume: pretrain_{net} <- {ckpt}')


def sizeof_fmt(size: float, suffix: str = 'B') -> str:
    """Human-readable size."""
    for unit in ['', 'K', 'M', 'G', 'T', 'P', 'E', 'Z']:
        if abs(size) < 1024.0:
            return f'{size:3.1f} {unit}{suffix}'
        size /= 1024.0
    return f'{size:3.1f} Y{suffix}'
