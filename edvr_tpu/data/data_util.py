"""Dataset path/index helpers (reference: basicsr/data/data_util.py).

All image sequences are NHWC float32 RGB [0, 1] numpy arrays (the
reference returns NCHW torch tensors)."""

from __future__ import annotations

import os.path as osp

import cv2
import numpy as np

from edvr_tpu.data.transforms import mod_crop
from edvr_tpu.utils import img2tensor, scandir


def read_img_seq(path, require_mod_crop=False, scale=1) -> np.ndarray:
    """Read an image-folder (or list of paths) as a (t, h, w, c) RGB
    float32 stack (reference: data_util.py:11-32)."""
    if isinstance(path, list):
        img_paths = path
    else:
        img_paths = sorted(list(scandir(path, full_path=True)))
    imgs = [cv2.imread(v).astype(np.float32) / 255. for v in img_paths]
    if require_mod_crop:
        imgs = [mod_crop(img, scale) for img in imgs]
    imgs = img2tensor(imgs, bgr2rgb=True, float32=True)
    return np.stack(imgs, axis=0)


def generate_frame_indices(crt_idx: int, max_frame_num: int, num_frames: int,
                           padding: str = 'reflection'):
    """Border-padded temporal window indices
    (reference: data_util.py:35-88). Padding modes:
    replicate | reflection | reflection_circle | circle."""
    assert num_frames % 2 == 1, 'num_frames should be an odd number.'
    assert padding in ('replicate', 'reflection', 'reflection_circle',
                       'circle'), f'Wrong padding mode: {padding}.'
    max_frame_num = max_frame_num - 1
    num_pad = num_frames // 2

    indices = []
    for i in range(crt_idx - num_pad, crt_idx + num_pad + 1):
        if i < 0:
            if padding == 'replicate':
                pad_idx = 0
            elif padding == 'reflection':
                pad_idx = -i
            elif padding == 'reflection_circle':
                pad_idx = crt_idx + num_pad - i
            else:
                pad_idx = num_frames + i
        elif i > max_frame_num:
            if padding == 'replicate':
                pad_idx = max_frame_num
            elif padding == 'reflection':
                pad_idx = max_frame_num * 2 - i
            elif padding == 'reflection_circle':
                pad_idx = (crt_idx - num_pad) - (i - max_frame_num)
            else:
                pad_idx = i - num_frames
        else:
            pad_idx = i
        indices.append(pad_idx)
    return indices


def paired_paths_from_lmdb(folders, keys):
    """Paired path dicts from two .lmdb folders sharing keys
    (reference: data_util.py:91-155)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    if not (input_folder.endswith('.lmdb') and gt_folder.endswith('.lmdb')):
        raise ValueError(
            f'{input_key} folder and {gt_key} folder should both in lmdb '
            f'formats. But received {input_key}: {input_folder}; '
            f'{gt_key}: {gt_folder}')
    with open(osp.join(input_folder, 'meta_info.txt')) as fin:
        input_lmdb_keys = [line.split('.')[0] for line in fin]
    with open(osp.join(gt_folder, 'meta_info.txt')) as fin:
        gt_lmdb_keys = [line.split('.')[0] for line in fin]
    if set(input_lmdb_keys) != set(gt_lmdb_keys):
        raise ValueError(
            f'Keys in {input_key}_folder and {gt_key}_folder are different.')
    return [{f'{input_key}_path': k, f'{gt_key}_path': k}
            for k in sorted(input_lmdb_keys)]


def paired_paths_from_meta_info_file(folders, keys, meta_info_file,
                                     filename_tmpl):
    """Paired path dicts from a meta-info manifest
    (reference: data_util.py:158-206)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    with open(meta_info_file, 'r') as fin:
        gt_names = [line.split(' ')[0] for line in fin]
    paths = []
    for gt_name in gt_names:
        basename, ext = osp.splitext(osp.basename(gt_name))
        input_name = f'{filename_tmpl.format(basename)}{ext}'
        paths.append({
            f'{input_key}_path': osp.join(input_folder, input_name),
            f'{gt_key}_path': osp.join(gt_folder, gt_name)
        })
    return paths


def paired_paths_from_folder(folders, keys, filename_tmpl):
    """Paired path dicts by scanning two folders
    (reference: data_util.py:209-247)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    input_paths = list(scandir(input_folder))
    gt_paths = list(scandir(gt_folder))
    assert len(input_paths) == len(gt_paths), (
        f'{input_key} and {gt_key} datasets have different number of '
        f'images: {len(input_paths)}, {len(gt_paths)}.')
    paths = []
    for gt_path in gt_paths:
        basename, ext = osp.splitext(osp.basename(gt_path))
        input_name = f'{filename_tmpl.format(basename)}{ext}'
        assert input_name in input_paths, (
            f'{input_name} is not in {input_key}_paths.')
        paths.append({
            f'{input_key}_path': osp.join(input_folder, input_name),
            f'{gt_key}_path': osp.join(gt_folder, gt_path)
        })
    return paths


def paths_from_folder(folder):
    return [osp.join(folder, p) for p in scandir(folder)]


def paths_from_lmdb(folder):
    if not folder.endswith('.lmdb'):
        raise ValueError(f'Folder {folder} should be in lmdb format.')
    with open(osp.join(folder, 'meta_info.txt')) as fin:
        return [line.split('.')[0] for line in fin]


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
    assert scale in (2, 3, 4), f'Only support scale (2, 3, 4), got {scale}.'
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
