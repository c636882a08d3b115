"""Native tpak reader: build, write, windowed reads vs numpy, and the
packed REDS dataset."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which('g++') is None,
                                reason='no C++ compiler')


@pytest.fixture(scope='module')
def pak(tmp_path_factory):
    from edvr_tpu.native import TpakReader, write_tpak
    rng = np.random.RandomState(0)
    clips = [(f'{i:03d}', rng.randint(0, 256, (12, 20, 24, 3), np.uint8))
             for i in range(3)]
    path = str(tmp_path_factory.mktemp('tpak') / 'test.tpak')
    write_tpak(path, clips)
    return TpakReader(path), dict(clips)


def test_tpak_metadata(pak):
    reader, clips = pak
    assert reader.num_clips == 3
    assert reader.clip_names == ['000', '001', '002']
    assert reader.clip_frames == [12, 12, 12]
    assert reader.clip_shapes[0] == (20, 24, 3)


def test_tpak_windows_match_numpy(pak):
    reader, clips = pak
    rng = np.random.RandomState(1)
    B, T, CH, CW = 4, 5, 8, 10
    clip_idx = rng.randint(0, 3, B)
    start = rng.randint(0, 12 - T, B)
    interval = np.ones(B, np.int64)
    y0 = rng.randint(0, 20 - CH, B)
    x0 = rng.randint(0, 24 - CW, B)
    out = reader.read_windows(clip_idx, start, interval, y0, x0, CH, CW, T,
                              n_threads=3)
    assert out.shape == (B, T, CH, CW, 3)
    for b in range(B):
        arr = clips[f'{clip_idx[b]:03d}']
        for t in range(T):
            ref = arr[start[b] + t, y0[b]:y0[b] + CH, x0[b]:x0[b] + CW]
            np.testing.assert_array_equal(out[b, t], ref)


def test_tpak_negative_interval_and_clamp(pak):
    reader, clips = pak
    out = reader.read_windows(np.array([0]), np.array([11]),
                              np.array([3]), np.array([0]), np.array([0]),
                              4, 4, 3)
    arr = clips['000']
    # frames 11, 14->clamped to 11, 17->11 (replicate padding)
    np.testing.assert_array_equal(out[0, 1], arr[11, :4, :4])
    out = reader.read_windows(np.array([1]), np.array([6]),
                              np.array([-2]), np.array([2]), np.array([3]),
                              4, 4, 3)
    arr = clips['001']
    np.testing.assert_array_equal(out[0, 2], arr[2, 2:6, 3:7])


def test_tpak_oob_crop_raises(pak):
    reader, _ = pak
    with pytest.raises(ValueError):
        reader.read_windows(np.array([0]), np.array([0]), np.array([1]),
                            np.array([18]), np.array([0]), 8, 8, 1)


def test_reds_packed_dataset(tmp_path):
    from edvr_tpu.native import write_tpak
    from edvr_tpu.data.reds_packed_dataset import REDSPackedDataset
    rng = np.random.RandomState(0)
    scale = 4
    lq_clips, gt_clips = [], []
    for name in ['000', '001']:  # '000' is a REDS4 val clip -> removed
        lq = rng.randint(0, 256, (10, 16, 20, 3), np.uint8)
        gt = rng.randint(0, 256, (10, 64, 80, 3), np.uint8)
        lq_clips.append((name, lq))
        gt_clips.append((name, gt))
    lq_path = str(tmp_path / 'lq.tpak')
    gt_path = str(tmp_path / 'gt.tpak')
    write_tpak(lq_path, lq_clips)
    write_tpak(gt_path, gt_clips)

    ds = REDSPackedDataset(dict(
        dataroot_gt=gt_path, dataroot_lq=lq_path, val_partition='REDS4',
        num_frame=5, gt_size=32, interval_list=[1], random_reverse=True,
        use_flip=True, use_rot=True, scale=scale))
    assert len(ds) == 10  # only clip 001 remains
    item = ds[3]
    assert item['lq'].shape == (5, 8, 8, 3)
    assert item['gt'].shape == (32, 32, 3)
    assert item['lq'].dtype == np.float32
    assert 0.0 <= item['lq'].min() and item['lq'].max() <= 1.0
    assert item['key'].startswith('001/')
