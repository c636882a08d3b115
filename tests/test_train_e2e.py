"""End-to-end training/validation smoke tests through the CLI mains,
on the virtual 8-device CPU mesh with synthetic datasets."""

import os

import cv2
import numpy as np
import pytest

SR_YML = """
name: debug_smoke_sr
model_type: SRModel
scale: 4
num_gpu: 8
manual_seed: 0

datasets:
  train:
    name: toy
    type: PairedImageDataset
    dataroot_gt: {root}/gt
    dataroot_lq: {root}/lq
    io_backend: {{type: disk}}
    gt_size: 32
    use_flip: true
    use_rot: true
    use_shuffle: true
    num_worker_per_gpu: 0
    batch_size_per_gpu: 1
    dataset_enlarge_ratio: 2
  val:
    name: toyval
    type: PairedImageDataset
    dataroot_gt: {root}/gt
    dataroot_lq: {root}/lq
    io_backend: {{type: disk}}

network_g:
  type: MSRResNet
  num_in_ch: 3
  num_out_ch: 3
  num_feat: 8
  num_block: 1
  upscale: 4

path:
  pretrain_network_g: ~
  strict_load_g: true
  resume_state: ~

train:
  optim_g: {{type: Adam, lr: !!float 2e-4, weight_decay: 0, betas: [0.9, 0.99]}}
  scheduler: {{type: CosineAnnealingRestartLR, periods: [16], restart_weights: [1], eta_min: !!float 1e-7}}
  total_iter: 16
  warmup_iter: 2
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}

val:
  val_freq: 8
  save_img: true
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 4, test_y_channel: false}}

logger:
  print_freq: 4
  save_checkpoint_freq: 8
  use_tb_logger: false
"""


def make_paired_data(root, n=8, hw=48, scale=4):
    rng = np.random.RandomState(0)
    os.makedirs(f'{root}/gt', exist_ok=True)
    os.makedirs(f'{root}/lq', exist_ok=True)
    for i in range(n):
        gt = (rng.rand(hw, hw, 3) * 255).astype(np.uint8)
        gt = cv2.GaussianBlur(gt, (5, 5), 1.5)
        lq = cv2.resize(gt, (hw // scale, hw // scale),
                        interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(f'{root}/gt/{i:03d}.png', gt)
        cv2.imwrite(f'{root}/lq/{i:03d}.png', lq)


def test_sr_training_e2e(tmp_path, monkeypatch):
    from edvr_tpu.train import main
    data_root = str(tmp_path / 'data')
    make_paired_data(data_root)
    yml = str(tmp_path / 'opt.yml')
    with open(yml, 'w') as f:
        f.write(SR_YML.format(root=data_root))
    monkeypatch.chdir(tmp_path)

    model = main(args=['-opt', yml])

    exp = tmp_path / 'experiments' / 'debug_smoke_sr'
    assert (exp / 'models' / 'net_g_8.ckpt').exists()
    assert (exp / 'models' / 'net_g_16.ckpt').exists()
    assert (exp / 'models' / 'net_g_latest.ckpt').exists()
    assert (exp / 'training_states' / '8.state').exists()
    # training losses logged and finite
    log = model.get_current_log()
    assert np.isfinite(log['l_pix'])
    # validation computed PSNR on upscaled outputs
    assert np.isfinite(model.metric_results['psnr'])
    assert model.metric_results['psnr'] > 5
    # saved val images exist
    vis = exp / 'visualization'
    assert any(vis.rglob('*.png'))


def test_sr_resume(tmp_path, monkeypatch):
    from edvr_tpu.train import main
    data_root = str(tmp_path / 'data')
    make_paired_data(data_root)
    yml = str(tmp_path / 'opt.yml')
    with open(yml, 'w') as f:
        f.write(SR_YML.format(root=data_root))
    monkeypatch.chdir(tmp_path)
    main(args=['-opt', yml, '--force_yml', 'train:total_iter=8',
               'val:val_freq=100'])
    state = str(tmp_path / 'experiments' / 'debug_smoke_sr' /
                'training_states' / '8.state')
    model = main(args=['-opt', yml, '--force_yml',
                       f'path:resume_state={state}',
                       'train:total_iter=12', 'val:val_freq=100'])
    assert np.isfinite(model.get_current_log()['l_pix'])


EDVR_YML = """
name: debug_smoke_edvr
model_type: EDVRModel
scale: 4
num_gpu: 8
manual_seed: 10

datasets:
  train:
    name: REDS
    type: REDSDataset
    dataroot_gt: {root}/train_sharp
    dataroot_lq: {root}/train_sharp_bicubic
    dataroot_flow: ~
    meta_info_file: {root}/meta_info_REDS_GT.txt
    val_partition: REDS4
    io_backend: {{type: disk}}
    num_frame: 5
    gt_size: 32
    interval_list: [1]
    random_reverse: false
    use_flip: true
    use_rot: true
    use_shuffle: true
    num_worker_per_gpu: 2
    batch_size_per_gpu: 1
    dataset_enlarge_ratio: 1
  val:
    name: REDS4
    type: VideoTestDataset
    dataroot_gt: {root}/val/gt
    dataroot_lq: {root}/val/lq
    io_backend: {{type: disk}}
    cache_data: false
    num_frame: 5
    padding: reflection_circle

network_g:
  type: EDVR
  num_in_ch: 3
  num_out_ch: 3
  num_feat: 8
  num_frame: 5
  deformable_groups: 2
  num_extract_block: 1
  num_reconstruct_block: 1
  center_frame_idx: ~
  hr_in: false
  with_predeblur: false
  with_tsa: true

path: {{pretrain_network_g: ~, strict_load_g: false, resume_state: ~}}

train:
  optim_g: {{type: Adam, lr: !!float 4e-4, weight_decay: 0, betas: [0.9, 0.99]}}
  scheduler: {{type: CosineAnnealingRestartLR, periods: [6], restart_weights: [1], eta_min: !!float 1e-7}}
  total_iter: 6
  warmup_iter: -1
  tsa_iter: 3
  dcn_lr_mul: 0.5
  pixel_opt: {{type: CharbonnierLoss, loss_weight: 1.0, reduction: sum}}

val:
  val_freq: 6
  save_img: false
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 0, test_y_channel: false}}

logger: {{print_freq: 2, save_checkpoint_freq: 6, use_tb_logger: false}}
"""


@pytest.mark.slow
def test_edvr_training_e2e(tmp_path, monkeypatch):
    from edvr_tpu.train import main
    rng = np.random.RandomState(1)
    root = tmp_path / 'reds'
    # training clips: REDS border logic assumes 100 frames per clip
    meta_lines = []
    for clip in ['001', '002']:
        (root / 'train_sharp' / clip).mkdir(parents=True)
        (root / 'train_sharp_bicubic' / clip).mkdir(parents=True)
        for i in range(100):
            gt = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
            lq = cv2.resize(gt, (8, 8), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(root / 'train_sharp' / clip / f'{i:08d}.png'),
                        gt)
            cv2.imwrite(
                str(root / 'train_sharp_bicubic' / clip / f'{i:08d}.png'),
                lq)
        meta_lines.append(f'{clip} 100 (32,32,3)\n')
    with open(root / 'meta_info_REDS_GT.txt', 'w') as f:
        f.writelines(meta_lines)
    # small val clip
    for sub, size in [('gt', 32), ('lq', 8)]:
        d = root / 'val' / sub / '000'
        d.mkdir(parents=True)
        for i in range(6):
            img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(d / f'{i:08d}.png'), img)

    yml = str(tmp_path / 'opt.yml')
    with open(yml, 'w') as f:
        f.write(EDVR_YML.format(root=str(root)))
    monkeypatch.chdir(tmp_path)

    model = main(args=['-opt', yml])
    log = model.get_current_log()
    assert np.isfinite(log['l_pix'])
    # per-folder video validation ran
    assert '000' in model.metric_results
    assert np.isfinite(model.metric_results['000']).all()
