"""Dataset-class unit tests on synthetic trees — the reference only has
manual visual scripts for these (SURVEY section 4); here each class is
asserted on shapes, value ranges, key bookkeeping, and padding logic."""

import os.path as osp

import cv2
import numpy as np
import pytest


def _write(path, hw, rng):
    img = (rng.rand(hw, hw, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(path), img)
    return img


@pytest.fixture()
def vimeo_tree(tmp_path):
    rng = np.random.RandomState(0)
    keys = ['00001/0001', '00001/0002']
    for key in keys:
        gt_dir = tmp_path / 'gt' / key
        lq_dir = tmp_path / 'lq' / key
        gt_dir.mkdir(parents=True)
        lq_dir.mkdir(parents=True)
        for i in range(1, 8):
            _write(gt_dir / f'im{i}.png', 32, rng)
            _write(lq_dir / f'im{i}.png', 8, rng)
    meta = tmp_path / 'meta.txt'
    meta.write_text(''.join(f'{k} 7 (32,32,3)\n' for k in keys))
    return tmp_path, keys


def test_vimeo90k_train_dataset(vimeo_tree):
    from edvr_tpu.data.vimeo90k_dataset import Vimeo90KDataset
    root, keys = vimeo_tree
    ds = Vimeo90KDataset({
        'dataroot_gt': str(root / 'gt'), 'dataroot_lq': str(root / 'lq'),
        'meta_info_file': str(root / 'meta.txt'),
        'io_backend': {'type': 'disk'}, 'num_frame': 7, 'gt_size': 16,
        'interval_list': [1], 'random_reverse': False, 'use_flip': False,
        'use_rot': False, 'scale': 4,
    })
    assert len(ds) == len(keys)
    item = ds[0]
    assert item['lq'].shape == (7, 4, 4, 3)
    assert item['gt'].shape == (16, 16, 3)
    assert item['key'] == keys[0]
    assert 0 <= item['lq'].min() and item['lq'].max() <= 1


def test_vimeo90k_neighbor_window(vimeo_tree):
    """num_frame=5 uses im2..im6 centered on im4 (reference:
    vimeo90k_dataset.py:69-71)."""
    from edvr_tpu.data.vimeo90k_dataset import Vimeo90KDataset
    root, _ = vimeo_tree
    ds = Vimeo90KDataset({
        'dataroot_gt': str(root / 'gt'), 'dataroot_lq': str(root / 'lq'),
        'meta_info_file': str(root / 'meta.txt'),
        'io_backend': {'type': 'disk'}, 'num_frame': 5, 'gt_size': 16,
        'interval_list': [1], 'random_reverse': False, 'use_flip': False,
        'use_rot': False, 'scale': 4,
    })
    assert ds.neighbor_list == [2, 3, 4, 5, 6]
    assert ds[0]['lq'].shape == (5, 4, 4, 3)


def test_video_test_vimeo90k_dataset(vimeo_tree):
    from edvr_tpu.data.video_test_dataset import VideoTestVimeo90KDataset
    root, keys = vimeo_tree
    ds = VideoTestVimeo90KDataset({
        'name': 'Vimeo90K-Test', 'cache_data': False,
        'dataroot_gt': str(root / 'gt'), 'dataroot_lq': str(root / 'lq'),
        'meta_info_file': str(root / 'meta.txt'),
        'io_backend': {'type': 'disk'}, 'num_frame': 7,
    })
    assert len(ds) == len(keys)
    item = ds[1]
    assert item['lq'].shape == (7, 8, 8, 3)
    assert item['gt'].shape == (32, 32, 3)
    assert item['folder'] == 'vimeo90k'
    assert item['idx'] == f'1/{len(keys)}'


def test_ffhq_dataset(tmp_path):
    from edvr_tpu.data.ffhq_dataset import FFHQDataset
    rng = np.random.RandomState(1)
    (tmp_path / 'ffhq').mkdir()
    for i in range(3):
        _write(tmp_path / 'ffhq' / f'{i:08d}.png', 16, rng)
    ds = FFHQDataset({
        'dataroot_gt': str(tmp_path / 'ffhq'),
        'io_backend': {'type': 'disk'},
        'mean': [0.5, 0.5, 0.5], 'std': [0.5, 0.5, 0.5],
        'use_hflip': False, 'phase': 'train',
    })
    # FFHQ path list is the fixed 70k enumeration (reference:
    # ffhq_dataset.py:22-62)
    assert len(ds) == 70000
    item = ds[0]
    assert item['gt'].shape == (16, 16, 3)
    # mean/std 0.5 normalization -> [-1, 1]
    assert item['gt'].min() >= -1 - 1e-6 and item['gt'].max() <= 1 + 1e-6
    assert item['gt'].min() < 0


def test_single_image_dataset(tmp_path):
    from edvr_tpu.data.single_image_dataset import SingleImageDataset
    rng = np.random.RandomState(2)
    (tmp_path / 'lq').mkdir()
    for i in range(2):
        _write(tmp_path / 'lq' / f'img_{i}.png', 12, rng)
    ds = SingleImageDataset({
        'dataroot_lq': str(tmp_path / 'lq'),
        'io_backend': {'type': 'disk'}, 'phase': 'test',
    })
    assert len(ds) == 2
    item = ds[0]
    assert item['lq'].shape == (12, 12, 3)
    assert 'gt' not in item
    assert item['lq_path'].endswith('img_0.png')


@pytest.fixture()
def clip_tree(tmp_path):
    rng = np.random.RandomState(3)
    for sub, size in [('gt', 16), ('lq', 4)]:
        for clip in ('calendar', 'city'):
            d = tmp_path / sub / clip
            d.mkdir(parents=True)
            for i in range(7):
                _write(d / f'{i:08d}.png', size, rng)
    return tmp_path


def test_video_test_duf_dataset(clip_tree):
    """use_duf_downsampling generates LQ from GT with the Gaussian
    kernel (reference: video_test_dataset.py:231-290)."""
    from edvr_tpu.data.video_test_dataset import VideoTestDUFDataset
    ds = VideoTestDUFDataset({
        'name': 'Vid4', 'cache_data': False,
        'dataroot_gt': str(clip_tree / 'gt'),
        'dataroot_lq': str(clip_tree / 'lq'),
        'io_backend': {'type': 'disk'}, 'num_frame': 7, 'padding': 'circle',
        'use_duf_downsampling': True, 'scale': 4,
    })
    item = ds[0]
    assert item['lq'].shape == (7, 4, 4, 3)
    assert item['gt'].shape == (16, 16, 3)
    # LQ really is the blurred-strided GT, not the lq folder contents;
    # item 0 reads the circle-padded window [4,5,6,0,1,2,3]
    from edvr_tpu.data.data_util import duf_downsample, read_img_seq
    gt_seq = read_img_seq([
        str(clip_tree / 'gt' / 'calendar' / f'{i:08d}.png')
        for i in [4, 5, 6, 0, 1, 2, 3]])
    ref_lq = duf_downsample(gt_seq, kernel_size=13, scale=4)
    np.testing.assert_allclose(np.asarray(item['lq']),
                               np.asarray(ref_lq), atol=1e-6)


def test_video_recurrent_test_dataset(clip_tree):
    from edvr_tpu.data.video_test_dataset import VideoRecurrentTestDataset
    ds = VideoRecurrentTestDataset({
        'name': 'REDS4', 'cache_data': True,
        'dataroot_gt': str(clip_tree / 'gt'),
        'dataroot_lq': str(clip_tree / 'lq'),
        'io_backend': {'type': 'disk'}, 'num_frame': -1,
    })
    assert len(ds) == 2  # one item per clip
    item = ds[0]
    assert item['folder'] == 'calendar'
    assert item['lq'].shape == (7, 4, 4, 3)
    assert item['gt'].shape == (7, 16, 16, 3)


def test_generate_frame_indices_padding_modes():
    from edvr_tpu.data.data_util import generate_frame_indices
    # reference: data_util.py:35-88 semantics at the left border
    assert generate_frame_indices(0, 100, 5, 'replicate') == [0, 0, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, 'reflection') == [2, 1, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, 'reflection_circle') == [
        4, 3, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, 'circle') == [3, 4, 0, 1, 2]
    # right border
    assert generate_frame_indices(99, 100, 5, 'replicate') == [
        97, 98, 99, 99, 99]
    assert generate_frame_indices(99, 100, 5, 'reflection') == [
        97, 98, 99, 98, 97]
