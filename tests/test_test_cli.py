"""End-to-end ``python -m edvr_tpu.test`` dry run of the REDS4
evaluation protocol: VideoTestDataset over synthetic clips, EDVRModel
per-folder x per-frame metrics, and save_img output files
(reference: basicsr/test.py + basicsr/models/video_base_model.py)."""

import os
import os.path as osp

import cv2
import numpy as np
import pytest
import yaml


def _make_clips(root, clips=('000', '011'), frames=7, lq_hw=16, scale=4):
    rng = np.random.RandomState(0)
    for clip in clips:
        os.makedirs(osp.join(root, 'gt', clip))
        os.makedirs(osp.join(root, 'lq', clip))
        for f in range(frames):
            gt = rng.randint(0, 256, (lq_hw * scale, lq_hw * scale, 3),
                             np.uint8)
            cv2.imwrite(osp.join(root, 'gt', clip, f'{f:08d}.png'), gt)
            cv2.imwrite(osp.join(root, 'lq', clip, f'{f:08d}.png'),
                        cv2.resize(gt, (lq_hw, lq_hw),
                                   interpolation=cv2.INTER_AREA))


def _reds4_opt(root, name):
    return {
        'name': name, 'model_type': 'EDVRModel', 'scale': 4,
        'num_gpu': 1, 'manual_seed': 0,
        'datasets': {
            'test_1': dict(
                name='REDS4', type='VideoTestDataset',
                dataroot_gt=f'{root}/gt', dataroot_lq=f'{root}/lq',
                meta_info_file=None, io_backend=dict(type='disk'),
                cache_data=True, num_frame=5,
                padding='reflection_circle'),
        },
        'network_g': dict(type='EDVR', num_in_ch=3, num_out_ch=3,
                          num_feat=8, num_frame=5, deformable_groups=2,
                          num_extract_block=1, num_reconstruct_block=1,
                          center_frame_idx=None, hr_in=False,
                          with_predeblur=False, with_tsa=True),
        'path': dict(pretrain_network_g=None, strict_load_g=False),
        'val': dict(save_img=True, suffix=None,
                    metrics=dict(
                        psnr=dict(type='calculate_psnr', crop_border=0,
                                  test_y_channel=False),
                        ssim=dict(type='calculate_ssim', crop_border=0,
                                  test_y_channel=False))),
    }


@pytest.mark.slow
def test_reds4_protocol_clip_mode_matches_per_window(tmp_path, monkeypatch):
    """val.clip_mode (pyramid-once whole-clip eval) must reproduce the
    per-window protocol's metric table and save layout."""
    root = str(tmp_path / 'reds4')
    _make_clips(root, frames=6)
    monkeypatch.chdir(tmp_path)
    from edvr_tpu.test import main

    opt_win = _reds4_opt(root, 'clipcmp_window')
    opt_win['val']['save_img'] = False
    yml_win = str(tmp_path / 'win.yml')
    with open(yml_win, 'w') as f:
        yaml.safe_dump(opt_win, f, sort_keys=False)
    model_win = main(args=['-opt', yml_win])

    opt_clip = _reds4_opt(root, 'clipcmp_clip')
    opt_clip['val']['clip_mode'] = True
    opt_clip['val']['clip_win_batch'] = 4  # 6 frames -> padded last step
    yml_clip = str(tmp_path / 'clip.yml')
    with open(yml_clip, 'w') as f:
        yaml.safe_dump(opt_clip, f, sort_keys=False)
    model_clip = main(args=['-opt', yml_clip])

    assert set(model_clip.metric_results) == set(model_win.metric_results)
    for folder in model_win.metric_results:
        np.testing.assert_allclose(model_clip.metric_results[folder],
                                   model_win.metric_results[folder],
                                   rtol=2e-3, atol=2e-3)

    # clip mode wrote the same per-frame visualization files
    vis = osp.join(str(tmp_path), 'results', 'clipcmp_clip',
                   'visualization', 'REDS4')
    for clip in ('000', '011'):
        assert len(os.listdir(osp.join(vis, clip))) == 6


@pytest.mark.slow
def test_reds4_protocol_dry_run(tmp_path, monkeypatch):
    root = str(tmp_path / 'reds4')
    _make_clips(root)

    opt = {
        'name': 'test_cli_dry', 'model_type': 'EDVRModel', 'scale': 4,
        'num_gpu': 1, 'manual_seed': 0,
        'datasets': {
            'test_1': dict(
                name='REDS4', type='VideoTestDataset',
                dataroot_gt=f'{root}/gt', dataroot_lq=f'{root}/lq',
                meta_info_file=None, io_backend=dict(type='disk'),
                cache_data=True, num_frame=5,
                padding='reflection_circle'),
        },
        'network_g': dict(type='EDVR', num_in_ch=3, num_out_ch=3,
                          num_feat=8, num_frame=5, deformable_groups=2,
                          num_extract_block=1, num_reconstruct_block=1,
                          center_frame_idx=None, hr_in=False,
                          with_predeblur=False, with_tsa=True),
        'path': dict(pretrain_network_g=None, strict_load_g=False),
        'val': dict(save_img=True, suffix=None,
                    metrics=dict(
                        psnr=dict(type='calculate_psnr', crop_border=0,
                                  test_y_channel=False),
                        ssim=dict(type='calculate_ssim', crop_border=0,
                                  test_y_channel=False))),
    }
    yml = str(tmp_path / 'test.yml')
    with open(yml, 'w') as f:
        yaml.safe_dump(opt, f, sort_keys=False)

    monkeypatch.chdir(tmp_path)
    from edvr_tpu.test import main
    model = main(args=['-opt', yml])

    # per-folder x per-frame metric table, every slot scored
    assert set(model.metric_results) == {'000', '011'}
    for folder, table in model.metric_results.items():
        assert table.shape == (7, 2)
        assert (table > 0).all(), (folder, table)
        psnr = table[:, 0]
        assert np.isfinite(psnr).all() and (psnr < 60).all()

    # save_img wrote one output png per frame per clip
    vis = osp.join(str(tmp_path), 'results', 'test_cli_dry',
                   'visualization', 'REDS4')
    for clip in ('000', '011'):
        pngs = sorted(os.listdir(osp.join(vis, clip)))
        assert len(pngs) == 7, pngs
        img = cv2.imread(osp.join(vis, clip, pngs[0]))
        assert img.shape == (64, 64, 3)
