"""Quality smoke: train a small MSRResNet x4 on synthetic
bicubic-degraded data (on whatever backend is available) and verify the
model learns to beat bicubic upsampling PSNR within a few hundred
iterations. Exercises the full train loop + validation on real
hardware.

Usage: python scripts/dev/train_quality_smoke.py [--iters 300]
"""

import argparse
import os
import os.path as osp
import sys
import tempfile

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def make_dataset(root, n=32, hw=128, scale=4, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(f'{root}/gt', exist_ok=True)
    os.makedirs(f'{root}/lq', exist_ok=True)
    from edvr_tpu.utils.matlab_functions import imresize
    for i in range(n):
        # detail-rich images: multi-scale blobs + sharp random edges, so
        # bicubic leaves a meaningful gap for the network to close
        img = cv2.GaussianBlur(rng.rand(hw, hw, 3).astype(np.float32),
                               (5, 5), 1.2)
        img = img + 0.7 * cv2.GaussianBlur(
            rng.rand(hw, hw, 3).astype(np.float32), (21, 21), 6.0)
        edges = (cv2.GaussianBlur(rng.rand(hw, hw).astype(np.float32),
                                  (15, 15), 4.0) > 0.5).astype(np.float32)
        img = img * (0.4 + 0.6 * edges[..., None])
        img = np.clip(img / img.max(), 0, 1)
        lq = np.clip(imresize(img, 1.0 / scale), 0, 1)
        cv2.imwrite(f'{root}/gt/{i:03d}.png',
                    (img * 255).round().astype(np.uint8))
        cv2.imwrite(f'{root}/lq/{i:03d}.png',
                    (lq * 255).round().astype(np.uint8))


def bicubic_psnr(root, scale=4):
    from edvr_tpu.metrics import calculate_psnr
    from edvr_tpu.utils.matlab_functions import imresize
    vals = []
    for name in sorted(os.listdir(f'{root}/gt'))[:8]:
        gt = cv2.imread(f'{root}/gt/{name}').astype(np.float32) / 255.
        lq = cv2.imread(f'{root}/lq/{name}').astype(np.float32) / 255.
        up = np.clip(imresize(lq, scale), 0, 1)
        vals.append(calculate_psnr((up * 255).round(), (gt * 255).round(),
                                   crop_border=scale))
    return float(np.mean(vals))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--iters', type=int, default=300)
    parser.add_argument('--workdir', type=str, default=None)
    args = parser.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix='edvr_tpu_smoke_')
    data_root = osp.join(workdir, 'data')
    make_dataset(data_root)
    base_psnr = bicubic_psnr(data_root)
    print(f'bicubic baseline PSNR: {base_psnr:.3f} dB')

    import yaml

    from edvr_tpu import train as train_mod

    opt = {
        'name': 'quality_smoke', 'model_type': 'SRModel', 'scale': 4,
        'num_gpu': 1, 'manual_seed': 0,
        'datasets': {
            'train': dict(name='toy', type='PairedImageDataset',
                          dataroot_gt=f'{data_root}/gt',
                          dataroot_lq=f'{data_root}/lq',
                          io_backend=dict(type='disk'), gt_size=96,
                          use_flip=True, use_rot=True, use_shuffle=True,
                          num_worker_per_gpu=4, batch_size_per_gpu=8,
                          dataset_enlarge_ratio=100, prefetch_mode=None),
            'val': dict(name='toyval', type='PairedImageDataset',
                        dataroot_gt=f'{data_root}/gt',
                        dataroot_lq=f'{data_root}/lq',
                        io_backend=dict(type='disk')),
        },
        'network_g': dict(type='MSRResNet', num_in_ch=3, num_out_ch=3,
                          num_feat=24, num_block=4, upscale=4),
        'path': dict(pretrain_network_g=None, strict_load_g=True,
                     resume_state=None),
        'train': dict(
            optim_g=dict(type='Adam', lr=1e-3, weight_decay=0,
                         betas=[0.9, 0.99]),
            scheduler=dict(type='CosineAnnealingRestartLR',
                           periods=[args.iters], restart_weights=[1],
                           eta_min=1e-6),
            total_iter=args.iters, warmup_iter=10,
            pixel_opt=dict(type='L1Loss', loss_weight=1.0,
                           reduction='mean')),
        'val': dict(val_freq=args.iters, save_img=False,
                    metrics=dict(psnr=dict(type='calculate_psnr',
                                           crop_border=4,
                                           test_y_channel=False))),
        'logger': dict(print_freq=50, save_checkpoint_freq=10**9,
                       use_tb_logger=False),
    }
    yml = osp.join(workdir, 'opt.yml')
    with open(yml, 'w') as f:
        yaml.safe_dump(opt, f, sort_keys=False)

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        model = train_mod.main(args=['-opt', yml])
    finally:
        os.chdir(cwd)
    trained_psnr = model.metric_results['psnr']
    print(f'\nbicubic {base_psnr:.3f} dB -> trained {trained_psnr:.3f} dB '
          f'(+{trained_psnr - base_psnr:.3f})')
    assert trained_psnr > base_psnr + 0.5, 'training did not learn!'
    print('OK: training beats bicubic.')


if __name__ == '__main__':
    main()
