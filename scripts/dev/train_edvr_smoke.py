"""EDVR learning smoke: train a small EDVR on synthetic translating
video and verify multi-frame SR beats bicubic. Exercises PCD deformable
alignment + TSA fusion + the TSA-warmup phase on real hardware.

Usage: python scripts/dev/train_edvr_smoke.py [--iters 300]
"""

import argparse
import os
import os.path as osp
import sys
import tempfile

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def make_video_dataset(root, num_clips=3, frames=100, hw=96, scale=4,
                       seed=0):
    """Clips of a textured canvas translating 1-2 px/frame: neighbors
    carry sub-pixel information the center frame lacks."""
    from edvr_tpu.utils.matlab_functions import imresize
    rng = np.random.RandomState(seed)
    big = cv2.GaussianBlur(rng.rand(hw * 3, hw * 3, 3).astype(np.float32),
                           (5, 5), 1.0)
    big = np.clip(big / big.max(), 0, 1)
    for clip in range(num_clips):
        gt_dir = osp.join(root, 'train_sharp', f'{clip:03d}')
        lq_dir = osp.join(root, 'train_sharp_bicubic', f'{clip:03d}')
        os.makedirs(gt_dir, exist_ok=True)
        os.makedirs(lq_dir, exist_ok=True)
        x0, y0 = hw, hw
        vx, vy = rng.randint(1, 3), rng.randint(1, 3)
        for f in range(frames):
            gx = (x0 + f * vx) % (hw * 2)
            gy = (y0 + f * vy) % (hw * 2)
            gt = big[gy:gy + hw, gx:gx + hw]
            lq = np.clip(imresize(gt, 1.0 / scale), 0, 1)
            cv2.imwrite(osp.join(gt_dir, f'{f:08d}.png'),
                        (gt * 255).round().astype(np.uint8))
            cv2.imwrite(osp.join(lq_dir, f'{f:08d}.png'),
                        (lq * 255).round().astype(np.uint8))
    with open(osp.join(root, 'meta.txt'), 'w') as fh:
        for clip in range(num_clips):
            fh.write(f'{clip:03d} {frames} ({hw},{hw},3)\n')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--iters', type=int, default=300)
    parser.add_argument('--hw', type=int, default=96,
                        help='GT frame size; 256 exercises the banded '
                             'DCN kernels in training (64px LQ crops)')
    args = parser.parse_args()

    workdir = tempfile.mkdtemp(prefix='edvr_smoke_')
    root = osp.join(workdir, 'reds')
    # REDSDataset mirrors the reference's 100-frames-per-clip layout
    make_video_dataset(root, hw=args.hw)

    # bicubic baseline on a few center frames
    from edvr_tpu.metrics import calculate_psnr
    from edvr_tpu.utils.matlab_functions import imresize
    base = []
    for f in range(20, 24):
        gt = cv2.imread(
            osp.join(root, 'train_sharp', '001',
                     f'{f:08d}.png')).astype(np.float32) / 255.
        lq = cv2.imread(
            osp.join(root, 'train_sharp_bicubic', '001',
                     f'{f:08d}.png')).astype(np.float32) / 255.
        up = np.clip(imresize(lq, 4.0), 0, 1)
        base.append(calculate_psnr((up * 255).round(), (gt * 255).round(),
                                   crop_border=0))
    base_psnr = float(np.mean(base))
    print(f'bicubic baseline PSNR: {base_psnr:.3f} dB', flush=True)

    import yaml

    from edvr_tpu import train as train_mod

    opt = {
        'name': 'edvr_smoke', 'model_type': 'EDVRModel', 'scale': 4,
        'num_gpu': 1, 'manual_seed': 10,
        'datasets': {
            'train': dict(
                name='REDS', type='REDSDataset',
                dataroot_gt=f'{root}/train_sharp',
                dataroot_lq=f'{root}/train_sharp_bicubic',
                dataroot_flow=None, meta_info_file=f'{root}/meta.txt',
                val_partition='REDS4', io_backend=dict(type='disk'),
                num_frame=5, gt_size=args.hw, interval_list=[1],
                random_reverse=False, use_flip=True, use_rot=True,
                use_shuffle=True, num_worker_per_gpu=4,
                batch_size_per_gpu=8, dataset_enlarge_ratio=10,
                prefetch_mode=None),
            'val': dict(
                name='REDS4', type='VideoTestDataset',
                dataroot_gt=f'{root}/train_sharp',
                dataroot_lq=f'{root}/train_sharp_bicubic',
                meta_info_file=None, io_backend=dict(type='disk'),
                cache_data=True, num_frame=5,
                padding='reflection_circle'),
        },
        'network_g': dict(type='EDVR', num_in_ch=3, num_out_ch=3,
                          num_feat=32, num_frame=5, deformable_groups=4,
                          num_extract_block=2, num_reconstruct_block=4,
                          center_frame_idx=None, hr_in=False,
                          with_predeblur=False, with_tsa=True),
        'path': dict(pretrain_network_g=None, strict_load_g=False,
                     resume_state=None),
        'train': dict(
            optim_g=dict(type='Adam', lr=4e-4, weight_decay=0,
                         betas=[0.9, 0.99]),
            scheduler=dict(type='CosineAnnealingRestartLR',
                           periods=[args.iters], restart_weights=[1],
                           eta_min=1e-6),
            total_iter=args.iters, warmup_iter=10,
            tsa_iter=max(args.iters // 10, 1), dcn_lr_mul=1,
            pixel_opt=dict(type='CharbonnierLoss', loss_weight=1.0,
                           reduction='mean')),
        'val': dict(val_freq=args.iters, save_img=False,
                    metrics=dict(psnr=dict(type='calculate_psnr',
                                           crop_border=0,
                                           test_y_channel=False))),
        'logger': dict(print_freq=50, save_checkpoint_freq=10**9,
                       use_tb_logger=False),
    }
    # validation dataset: keep only clip 001 to stay quick
    opt['datasets']['val']['meta_info_file'] = None

    yml = osp.join(workdir, 'opt.yml')
    with open(yml, 'w') as f:
        yaml.safe_dump(opt, f, sort_keys=False)
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        model = train_mod.main(args=['-opt', yml])
    finally:
        os.chdir(cwd)
    # per-folder metric average
    vals = [float(arr.mean(axis=0)[0])
            for arr in model.metric_results.values()]
    trained = float(np.mean(vals))
    print(f'\nbicubic {base_psnr:.3f} dB -> EDVR {trained:.3f} dB '
          f'(+{trained - base_psnr:.3f})', flush=True)
    assert trained > base_psnr, 'EDVR training did not learn!'
    print('OK: EDVR training beats bicubic.')


if __name__ == '__main__':
    main()
