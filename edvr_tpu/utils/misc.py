"""Miscellaneous host-side utilities.

Equivalents of the reference's misc helpers
(reference: basicsr/utils/misc.py): seeding, experiment directory
management, directory scanning, and resume-path rewriting.
"""

from __future__ import annotations

import os
import os.path as osp
import random
import time

import numpy as np

from edvr_tpu.parallel.dist_util import master_only


def set_random_seed(seed: int) -> None:
    """Seed python and numpy RNGs (reference: basicsr/utils/misc.py:12-18).

    JAX randomness is handled by explicit `jax.random` keys derived from
    the same seed at the engine level, not by global state.
    """
    random.seed(seed)
    np.random.seed(seed)


def get_time_str() -> str:
    return time.strftime('%Y%m%d_%H%M%S', time.localtime())


def mkdir_and_rename(path: str) -> None:
    """mkdir; if it exists, rename the old one with a timestamp then mkdir
    (reference: basicsr/utils/misc.py:25-35)."""
    if osp.exists(path):
        new_name = path + '_archived_' + get_time_str()
        print(f'Path already exists. Rename it to {new_name}', flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


@master_only
def make_exp_dirs(opt) -> None:
    """Create experiment/result directories
    (reference: basicsr/utils/misc.py:38-50)."""
    path_opt = opt['path'].copy()
    if opt['is_train']:
        mkdir_and_rename(path_opt.pop('experiments_root'))
    else:
        mkdir_and_rename(path_opt.pop('results_root'))
    for key, path in path_opt.items():
        if ('strict_load' in key or 'pretrain_network' in key
                or 'resume' in key or 'param_key' in key):
            continue
        if path is not None:
            os.makedirs(path, exist_ok=True)


def scandir(dir_path, suffix=None, recursive=False, full_path=False):
    """Scan a directory for files, optionally recursively
    (reference: basicsr/utils/misc.py:53-93).

    Args:
        dir_path: Directory to scan.
        suffix: Only return files with this suffix (str or tuple).
        recursive: Recurse into subdirectories.
        full_path: Return full paths instead of paths relative to dir_path.

    Yields:
        str: file paths.
    """
    if (suffix is not None) and not isinstance(suffix, (str, tuple)):
        raise TypeError('"suffix" must be a string or tuple of strings')
    root = dir_path

    def _scandir(dir_path, suffix, recursive):
        for entry in os.scandir(dir_path):
            if not entry.name.startswith('.') and entry.is_file():
                return_path = entry.path if full_path else osp.relpath(
                    entry.path, root)
                if suffix is None or return_path.endswith(suffix):
                    yield return_path
            elif recursive and entry.is_dir():
                yield from _scandir(entry.path, suffix, recursive)

    return _scandir(dir_path, suffix, recursive)


def check_resume(opt, resume_iter: int) -> None:
    """When resuming, rewrite pretrain paths to the resume checkpoints
    (reference: basicsr/utils/misc.py:96-122).

    Networks are saved as ``<models>/net_<name-suffix>_<iter>.<ext>``; on
    resume every ``pretrain_network_*`` key is pointed at the matching
    file for ``resume_iter``.
    """
    from edvr_tpu.utils.logger import get_root_logger
    logger = get_root_logger()
    if not opt['path'].get('resume_state'):
        return
    # get all the networks
    networks = [key for key in opt.keys() if key.startswith('network_')]
    flag_pretrain = False
    for network in networks:
        if opt['path'].get(f'pretrain_{network}') is not None:
            flag_pretrain = True
    if flag_pretrain:
        logger.warning('pretrain_network paths will be ignored during '
                       'resuming.')
    for network in networks:
        name = f'pretrain_{network}'
        basename = network.replace('network_', '')
        if opt['path'].get('ignore_resume_networks') is None or (
                network not in opt['path']['ignore_resume_networks']):
            opt['path'][name] = osp.join(opt['path']['models'],
                                         f'net_{basename}_{resume_iter}.ckpt')
            logger.info(f"Set {name} to {opt['path'][name]}")


def sizeof_fmt(size: float, suffix: str = 'B') -> str:
    """Human-readable size."""
    for unit in ['', 'K', 'M', 'G', 'T', 'P', 'E', 'Z']:
        if abs(size) < 1024.0:
            return f'{size:3.1f} {unit}{suffix}'
        size /= 1024.0
    return f'{size:3.1f} Y{suffix}'
