"""Fast fixed-seed EDVR learning invariant (minutes, not an hour).

The 1500-iter `train_edvr_smoke.py` check is a weak signal: its
bicubic-delta lands within +/-0.07 dB of zero and needs ~4000 iters
for a clear pass. Per-iter TRAINING loss is no better at short
horizons — measured on the v5e, the 300-iter head/tail median ratio of
a healthy run is 0.93 (batch-sampling variance ~ the true drop). The
robust fast signal is a FIXED held-aside batch: with sampling noise
removed, the center-frame PSNR on that batch rises monotonically from
the first hundred iters, and a broken train step (dead gradients,
mis-wired TSA mask, a band-kernel backward regression) flattens it
immediately.

Calibration (v5e, 2026-08-20, fixed 8-sample eval batch,
tsa_iter = 90), two independent seeds:

    seed 10                            seed 17
    iter    0   21.496 dB              21.639 dB
    iter  100   22.130  <- warmup      22.173
    iter  500   22.143                 22.477
    iter  600   22.357  <- full-model  22.493
    iter  900   22.427                 22.497
    total gain  +0.931                 +0.858
    post-warmup +0.297                 +0.325

TWO gates, both far above fixed-batch eval noise (each trajectory is
seeded end-to-end; run-to-run spread is TPU-scheduling level, ~1e-3
dB) and confirmed across both calibration seeds (worst case +0.86 /
+0.30 vs gates +0.4 / +0.1 — >2x margin on the total, 3x on the
post-warmup): total gain at 900 iters >= +0.4 dB, and
post-warmup gain (iter 100 -> 900) >= +0.1 dB. The
second gate exists because the first 100 iters train ONLY the TSA
fusion (tsa_iter grad mask): a regression that kills gradients to the
PCD/DCN/reconstruction paths would still bank the warmup's +0.6 dB
and pass a single total-gain gate. Wall clock ~6 min on the v5e
including compile (~0.04 s/iter after).

Drives the engine directly (create_model + feed_data +
optimize_parameters / test) so the eval points are exact.

Usage: python scripts/dev/train_fast_invariant.py [--iters 900]
       (add --cpu for a plumbing check on the CPU backend;
        --calibrate prints the curve without asserting)
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

GATE_TOTAL_DB = 0.4
GATE_POSTWARM_DB = 0.1
EVAL_EVERY = 100


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--iters', type=int, default=900,
                        help='gates are calibrated for the default 900 '
                             'iters; must be >= %d so the post-warmup '
                             'gate has its iter-%d eval point'
                             % (EVAL_EVERY, EVAL_EVERY))
    parser.add_argument('--cpu', action='store_true',
                        help='run the plumbing variant on CPU')
    parser.add_argument('--calibrate', action='store_true',
                        help='print the eval curve, skip the assert')
    parser.add_argument('--mp', action='store_true',
                        help='run the step under train.mixed_precision: '
                             'bf16 — same gates; validates the '
                             'mixed-precision path learns')
    parser.add_argument('--seed', type=int, default=10,
                        help='model-init / sampling / eval-batch seed '
                             '(synthetic data stays seed-0 so the task '
                             'is identical); the gates are calibrated '
                             'against seeds 10 and 17 — see the '
                             'docstring calibration table')
    args = parser.parse_args()
    if not args.calibrate and args.iters < EVAL_EVERY:
        parser.error(f'--iters must be >= {EVAL_EVERY}: without the '
                     f'iter-{EVAL_EVERY} eval point the post-warmup '
                     'gate would silently collapse into the total gate')
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
        'num_gpu': 1, 'manual_seed': args.seed, 'is_train': True,
        'dist': False,
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
                           periods=[max(args.iters, 600)],
                           restart_weights=[1], eta_min=1e-6),
            total_iter=args.iters, warmup_iter=10,
            tsa_iter=max(args.iters // 10, 1), dcn_lr_mul=1,
            pixel_opt=dict(type='CharbonnierLoss', loss_weight=1.0,
                           reduction='mean'),
            **({'mixed_precision': 'bf16'} if args.mp else {})),
        'val': None,
        'logger': dict(print_freq=10**9, save_checkpoint_freq=10**9,
                       use_tb_logger=False),
    }

    np.random.seed(args.seed)
    dataset = create_dataset(train_ds_opt)
    loader = create_dataloader(dataset, train_ds_opt, num_gpu=1,
                               dist=False, sampler=None, seed=args.seed)
    model = create_model(opt)

    # fixed held-aside eval batch: sampling noise removed, so the PSNR
    # trend is the learning signal itself
    eval_batch = next(iter(loader))

    def eval_psnr():
        model.feed_data({'lq': eval_batch['lq']})
        model.test()
        out = np.clip(np.asarray(model.output, np.float64), 0, 1)
        gt = np.asarray(eval_batch['gt'], np.float64)
        mse = float(((out - gt) ** 2).mean())
        return -10.0 * np.log10(mse)

    t0 = time.time()
    curve = [(0, eval_psnr())]
    print(f'iter {0:4d}  eval PSNR {curve[-1][1]:.3f} dB  '
          f'({time.time() - t0:.0f}s)', flush=True)
    it = 0
    while it < args.iters:
        for batch in loader:
            it += 1
            if it > args.iters:
                break
            model.feed_data(batch)
            model.optimize_parameters(it)
            if it % EVAL_EVERY == 0 or it == args.iters:
                curve.append((it, eval_psnr()))
                print(f'iter {it:4d}  eval PSNR {curve[-1][1]:.3f} dB  '
                      f'({time.time() - t0:.0f}s)', flush=True)

    gain = curve[-1][1] - curve[0][1]
    at100 = dict(curve).get(EVAL_EVERY, curve[0][1])
    postwarm = curve[-1][1] - at100
    print(f'\neval-batch PSNR gain over {args.iters} iters: '
          f'{gain:+.3f} dB (gate >= +{GATE_TOTAL_DB}), post-warmup '
          f'{postwarm:+.3f} dB (gate >= +{GATE_POSTWARM_DB})',
          flush=True)
    if args.calibrate:
        return
    assert gain >= GATE_TOTAL_DB, (
        f'learning invariant FAILED: fixed-batch PSNR gain {gain:+.3f} '
        f'dB < +{GATE_TOTAL_DB} (healthy ~+0.93 at 900 iters; the '
        f'train step is not learning)')
    assert postwarm >= GATE_POSTWARM_DB, (
        f'learning invariant FAILED: post-warmup gain {postwarm:+.3f} '
        f'dB < +{GATE_POSTWARM_DB} (healthy ~+0.30) — the TSA-warmup '
        f'phase learned but the full-model phase did not (check the '
        f'tsa_iter grad mask / DCN backward)')
    print('OK: fast learning invariant holds.')


if __name__ == '__main__':
    main()
