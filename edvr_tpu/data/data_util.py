"""Dataset path/index helpers.

Protocol parity with the reference toolbox's data_util
(reference: basicsr/data/data_util.py): the same pairing rules over
lmdb/meta-info/folder sources, the same border-padding index modes, and
the official DUF Gaussian downsampling. All image sequences here are
NHWC float32 RGB [0, 1] numpy arrays (the reference returns NCHW torch
tensors).
"""

from __future__ import annotations

import os.path as osp

import cv2
import numpy as np

from edvr_tpu.data.transforms import mod_crop
from edvr_tpu.utils import img2tensor, scandir


def read_img_seq(path, require_mod_crop=False, scale=1) -> np.ndarray:
    """Read an image folder (or explicit path list) as a (t, h, w, c)
    RGB float32 stack (reference: data_util.py:11-32)."""
    frame_paths = path if isinstance(path, list) else sorted(
        scandir(path, full_path=True))
    frames = []
    for p in frame_paths:
        img = cv2.imread(p).astype(np.float32) / 255.
        if require_mod_crop:
            img = mod_crop(img, scale)
        frames.append(img)
    return np.stack(img2tensor(frames, bgr2rgb=True, float32=True), axis=0)


def generate_frame_indices(crt_idx: int, max_frame_num: int, num_frames: int,
                           padding: str = 'reflection'):
    """Temporal window indices around ``crt_idx`` with border padding
    (reference: data_util.py:35-88).

    Out-of-range positions are remapped per mode:
      * replicate:          ... 0 0 | 0 1 2 ... n | n n ...
      * reflection:         ... 2 1 | 0 1 2 ... n | n-1 n-2 ...
      * reflection_circle:  reflect about the window's own edge frames
      * circle:             wrap by the window length
    """
    if num_frames % 2 != 1:
        raise ValueError(f'window length must be odd, got {num_frames}')
    if padding not in ('replicate', 'reflection', 'reflection_circle',
                       'circle'):
        raise ValueError(f'unknown padding mode {padding!r}')
    last = max_frame_num - 1
    half = num_frames // 2

    def remap(i):
        if 0 <= i <= last:
            return i
        if padding == 'replicate':
            return min(max(i, 0), last)
        if padding == 'reflection':
            return -i if i < 0 else 2 * last - i
        if padding == 'reflection_circle':
            # reflect about the window edges (crt_idx +/- half)
            return (crt_idx + half - i if i < 0
                    else crt_idx - half - (i - last))
        if padding == 'circle':
            return i + num_frames if i < 0 else i - num_frames
        raise ValueError(f'unknown padding mode {padding!r}')

    return [remap(i) for i in range(crt_idx - half, crt_idx + half + 1)]


def _pair_of(folders, keys):
    if len(folders) != 2 or len(keys) != 2:
        raise ValueError(
            f'need exactly (input, gt) folders and keys, got {len(folders)} '
            f'folders / {len(keys)} keys')
    return folders[0], folders[1], keys[0], keys[1]


def _lmdb_keys(folder):
    with open(osp.join(folder, 'meta_info.txt')) as fh:
        return [line.split('.')[0] for line in fh]


def paired_paths_from_lmdb(folders, keys):
    """Paired path dicts from two .lmdb folders sharing keys
    (reference: data_util.py:91-155)."""
    in_dir, gt_dir, in_key, gt_key = _pair_of(folders, keys)
    bad = [d for d in (in_dir, gt_dir) if not d.endswith('.lmdb')]
    if bad:
        raise ValueError(
            f'paired lmdb mode needs both folders in .lmdb form; got '
            f'{in_key}: {in_dir}, {gt_key}: {gt_dir}')
    in_keys, gt_keys = set(_lmdb_keys(in_dir)), set(_lmdb_keys(gt_dir))
    if in_keys != gt_keys:
        raise ValueError(
            f'{in_key} and {gt_key} lmdb key sets differ '
            f'(e.g. {sorted(in_keys ^ gt_keys)[:3]})')
    return [{f'{in_key}_path': k, f'{gt_key}_path': k}
            for k in sorted(in_keys)]


def paired_paths_from_meta_info_file(folders, keys, meta_info_file,
                                     filename_tmpl):
    """Paired path dicts from a meta-info manifest
    (reference: data_util.py:158-206)."""
    in_dir, gt_dir, in_key, gt_key = _pair_of(folders, keys)
    with open(meta_info_file) as fh:
        gt_names = [line.split(' ')[0] for line in fh]
    out = []
    for gt_name in gt_names:
        stem, ext = osp.splitext(osp.basename(gt_name))
        out.append({
            f'{in_key}_path':
                osp.join(in_dir, filename_tmpl.format(stem) + ext),
            f'{gt_key}_path': osp.join(gt_dir, gt_name),
        })
    return out


def paired_paths_from_folder(folders, keys, filename_tmpl):
    """Paired path dicts by scanning two folders
    (reference: data_util.py:209-247)."""
    in_dir, gt_dir, in_key, gt_key = _pair_of(folders, keys)
    in_names = set(scandir(in_dir))
    gt_names = list(scandir(gt_dir))
    if len(in_names) != len(gt_names):
        raise ValueError(
            f'{in_key} folder has {len(in_names)} images but {gt_key} '
            f'folder has {len(gt_names)}')
    out = []
    for gt_name in gt_names:
        stem, ext = osp.splitext(osp.basename(gt_name))
        in_name = filename_tmpl.format(stem) + ext
        if in_name not in in_names:
            raise ValueError(
                f'{in_name} (paired with {gt_name}) missing from {in_dir}')
        out.append({f'{in_key}_path': osp.join(in_dir, in_name),
                    f'{gt_key}_path': osp.join(gt_dir, gt_name)})
    return out


def paths_from_folder(folder):
    return [osp.join(folder, p) for p in scandir(folder)]


def paths_from_lmdb(folder):
    if not folder.endswith('.lmdb'):
        raise ValueError(f'{folder} is not an .lmdb folder')
    return _lmdb_keys(folder)


def generate_gaussian_kernel(kernel_size=13, sigma=1.6) -> np.ndarray:
    """Gaussian kernel for duf_downsample
    (reference: data_util.py:270-285)."""
    from scipy.ndimage import gaussian_filter
    kernel = np.zeros((kernel_size, kernel_size))
    kernel[kernel_size // 2, kernel_size // 2] = 1
    return gaussian_filter(kernel, sigma)


def duf_downsample(x: np.ndarray, kernel_size=13, scale=4) -> np.ndarray:
    """Gaussian-blur-and-stride downsampling used by the official DUF
    code (reference: data_util.py:288-331).

    Args:
        x: (t, h, w, c) or (b, t, h, w, c) float array.
    """
    if scale not in (2, 3, 4):
        raise ValueError(f'DUF downsampling supports scale 2/3/4, '
                         f'got {scale}')
    squeeze_flag = False
    if x.ndim == 4:
        squeeze_flag = True
        x = x[None]
    b, t, h, w, c = x.shape
    pad = kernel_size // 2 + scale * 2
    xr = x.reshape(b * t, h, w, c)
    xr = np.pad(xr, ((0, 0), (pad, pad), (pad, pad), (0, 0)), 'reflect')

    kernel = generate_gaussian_kernel(kernel_size, 0.4 * scale)
    kh = kernel.shape[0]
    H, W = xr.shape[1], xr.shape[2]
    oh = (H - kh) // scale + 1
    ow = (W - kh) // scale + 1
    out = np.zeros((b * t, oh, ow, c), np.float32)
    for i in range(kh):
        for j in range(kh):
            out += kernel[i, j] * xr[:, i:i + oh * scale:scale,
                                     j:j + ow * scale:scale, :]
    out = out[:, 2:-2, 2:-2, :]
    return out.reshape(b, t, out.shape[1], out.shape[2], c) if not \
        squeeze_flag else out.reshape(t, out.shape[1], out.shape[2], c)
