"""Fast fixed-seed EDVR learning invariant (minutes, not an hour).

The 1500-iter `train_edvr_smoke.py` check is a weak signal: its
bicubic-delta lands within +/-0.07 dB of zero and needs ~4000 iters for
a clear pass. This harness asserts a much steeper, earlier invariant
instead: with a FIXED seed on the same synthetic translating-texture
data, the median Charbonnier training loss over the last 50 of 300
iters must drop below a calibrated fraction of the first-25-iter
median. A broken train step (dead gradients, mis-wired TSA mask, a
band-kernel backward regression) flattens the slope immediately and
fails this in ~3 minutes on the v5e, while day-to-day PSNR noise never
touches it.

Calibration (v5e, 2026-08-20, seed 10): head median 0.1408, tail
median 0.0161 -> ratio 0.114; two reruns within +/-10% of that ratio.
The gate is ratio < 0.45 (4x margin over the measured slope; a step
that learns at even a quarter of the healthy rate still passes, one
that doesn't learn at all sits at ~1.0 and fails loudly).

Drives the engine directly (create_model + feed_data +
optimize_parameters) so every per-iter loss is recorded — the train
CLI only logs at print_freq granularity.

Usage: python scripts/dev/train_fast_invariant.py [--iters 300]
       (add --cpu for a plumbing check on the CPU backend)
"""

import argparse
import os
import os.path as osp
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

from train_edvr_smoke import make_video_dataset  # noqa: E402

HEAD_WIN = 25
TAIL_WIN = 50
GATE = 0.45


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--iters', type=int, default=300)
    parser.add_argument('--cpu', action='store_true',
                        help='run the tiny plumbing variant on CPU')
    args = parser.parse_args()
    if args.cpu:
        os.environ['EDVR_TPU_PLATFORM'] = 'cpu'

    workdir = tempfile.mkdtemp(prefix='edvr_fastinv_')
    root = osp.join(workdir, 'reds')
    make_video_dataset(root, num_clips=3, frames=100, hw=96, seed=0)

    from edvr_tpu.data import create_dataloader, create_dataset
    from edvr_tpu.models import create_model

    train_ds_opt = dict(
        name='REDS', type='REDSDataset', phase='train', scale=4,
        dataroot_gt=f'{root}/train_sharp',
        dataroot_lq=f'{root}/train_sharp_bicubic',
        dataroot_flow=None, meta_info_file=f'{root}/meta.txt',
        val_partition='REDS4', io_backend=dict(type='disk'),
        num_frame=5, gt_size=96, interval_list=[1],
        random_reverse=False, use_flip=True, use_rot=True,
        use_shuffle=True, num_worker_per_gpu=0, batch_size_per_gpu=8,
        dataset_enlarge_ratio=100, prefetch_mode=None)
    opt = {
        'name': 'edvr_fastinv', 'model_type': 'EDVRModel', 'scale': 4,
        'num_gpu': 1, 'manual_seed': 10, 'is_train': True, 'dist': False,
        'rank': 0, 'world_size': 1,
        'datasets': {'train': train_ds_opt},
        'network_g': dict(type='EDVR', num_in_ch=3, num_out_ch=3,
                          num_feat=32, num_frame=5, deformable_groups=4,
                          num_extract_block=2, num_reconstruct_block=4,
                          center_frame_idx=None, hr_in=False,
                          with_predeblur=False, with_tsa=True),
        'path': dict(pretrain_network_g=None, strict_load_g=False,
                     resume_state=None, experiments_root=workdir,
                     models=workdir, training_states=workdir,
                     log=workdir, visualization=workdir),
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
        'val': None,
        'logger': dict(print_freq=10**9, save_checkpoint_freq=10**9,
                       use_tb_logger=False),
    }

    np.random.seed(10)
    dataset = create_dataset(train_ds_opt)
    loader = create_dataloader(dataset, train_ds_opt, num_gpu=1,
                               dist=False, sampler=None, seed=10)
    model = create_model(opt)

    losses = []
    t0 = time.time()
    it = 0
    while it < args.iters:
        for batch in loader:
            it += 1
            if it > args.iters:
                break
            model.feed_data(batch)
            model.optimize_parameters(it)
            losses.append(float(model.get_current_log()['l_pix']))
            if it in (1, HEAD_WIN, 100, 200, args.iters):
                print(f'iter {it:4d}  l_pix {losses[-1]:.4f}  '
                      f'({time.time() - t0:.0f}s)', flush=True)

    head = float(np.median(losses[:HEAD_WIN]))
    tail = float(np.median(losses[-TAIL_WIN:]))
    ratio = tail / head
    print(f'\nhead median (first {HEAD_WIN}) {head:.4f}  '
          f'tail median (last {TAIL_WIN}) {tail:.4f}  '
          f'ratio {ratio:.3f}  gate < {GATE}', flush=True)
    assert ratio < GATE, (
        f'learning invariant FAILED: loss ratio {ratio:.3f} >= {GATE} '
        f'(healthy calibration ~0.11; the train step is not learning)')
    print('OK: fast learning invariant holds.')


if __name__ == '__main__':
    main()
