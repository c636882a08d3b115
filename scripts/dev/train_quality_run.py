"""EDVR-M extended quality run on real hardware (VERDICT item 4).

Trains the REAL EDVR-M configuration (64 feat, 8 deformable groups,
5 extract + 10 reconstruct blocks, TSA) for tens of thousands of
iterations on synthetic translating-texture video with the production
schedule shape (TSA warmup -> full training, cosine-restart LR), and
writes a PSNR-vs-iteration curve that demonstrates convergence well
past the bicubic baseline.

The data pipeline is the native tpak packed-frame reader
(REDSPackedDataset) so the 1-vCPU host can feed the ~128 ms/step TPU
train loop (the PNG path measures ~109 ms/batch at this shape —
docs/TPUDesign.md "Input-pipeline throughput").

Outputs (committed as quality evidence):
  experiments/quality_run_r2/curve.jsonl  — one {"iter", "psnr"} line
      per validation pass + the bicubic baseline
  experiments/quality_run_r2/summary.json — final numbers

Usage: python scripts/dev/train_quality_run.py [--iters 30000]
       [--val_freq 1000] [--batch 4]
"""

import argparse
import json
import os
import os.path as osp
import sys
import tempfile

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

from train_edvr_smoke import make_video_dataset  # noqa: E402

REPO = osp.join(osp.dirname(osp.abspath(__file__)), '..', '..')


def pack(root):
    """Pack the synthetic PNG clips into .tpak files for the native
    reader."""
    from edvr_tpu.native import write_tpak
    from edvr_tpu.utils import scandir
    for sub in ('train_sharp', 'train_sharp_bicubic'):
        src = osp.join(root, sub)
        dst = osp.join(root, f'{sub}.tpak')
        clips = sorted(os.listdir(src))

        def loader(clip):
            def read():
                paths = sorted(scandir(osp.join(src, clip),
                                       full_path=True))
                return np.stack([cv2.imread(p, cv2.IMREAD_COLOR)
                                 for p in paths], axis=0)

            return read

        write_tpak(dst, [(c, loader(c)) for c in clips])
    return (osp.join(root, 'train_sharp.tpak'),
            osp.join(root, 'train_sharp_bicubic.tpak'))


def bicubic_baseline(root, clip='000', frames=(20, 40, 60, 80)):
    from edvr_tpu.metrics import calculate_psnr
    from edvr_tpu.utils.matlab_functions import imresize
    vals = []
    for f in frames:
        gt = cv2.imread(osp.join(root, 'train_sharp', clip,
                                 f'{f:08d}.png')).astype(np.float32) / 255.
        lq = cv2.imread(osp.join(root, 'train_sharp_bicubic', clip,
                                 f'{f:08d}.png')).astype(np.float32) / 255.
        up = np.clip(imresize(lq, 4.0), 0, 1)
        vals.append(calculate_psnr((up * 255).round(),
                                   (gt * 255).round(), crop_border=0))
    return float(np.mean(vals))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--iters', type=int, default=30000)
    parser.add_argument('--val_freq', type=int, default=1000)
    parser.add_argument('--batch', type=int, default=4)
    parser.add_argument('--hw', type=int, default=256,
                        help='GT frame size (LQ = hw/4; 256 engages the '
                             'banded DCN train kernels)')
    parser.add_argument('--tiny', action='store_true',
                        help='shrink the net/frames for a CPU plumbing '
                             'check of the harness itself')
    parser.add_argument('--name', default='quality_run_r2',
                        help='experiment name / committed output dir '
                             'under experiments/')
    parser.add_argument('--no_align', action='store_true',
                        help='no-alignment control: freeze PCD offsets '
                             'at zero (EDVR_TPU_PCD_NO_ALIGN) to isolate '
                             'what the DCN alignment path learns')
    parser.add_argument('--pretrain', default=None,
                        help='warm-start from a .ckpt (e.g. the '
                             'committed 20k checkpoint) with a fresh '
                             'cosine schedule — the cheap form of the '
                             '"did the model or the schedule saturate" '
                             'extension (no optimizer state was saved)')
    parser.add_argument('--lr', type=float, default=4e-4)
    parser.add_argument('--variant', default='dcn',
                        choices=['dcn', 'tap_shared'],
                        help='alignment formulation (EDVR align_variant '
                             '— the round-5 co-design frontier axis)')
    parser.add_argument('--dg', type=int, default=None,
                        help='override deformable_groups (co-design '
                             'frontier axis; default 8, tiny default 2)')
    args = parser.parse_args()
    if args.pretrain:
        # main() runs under os.chdir(workdir) — resolve now so a
        # repo-relative checkpoint path survives the move
        args.pretrain = osp.abspath(args.pretrain)
    if args.tiny:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    if args.no_align:
        os.environ['EDVR_TPU_PCD_NO_ALIGN'] = '1'
        if args.name == 'quality_run_r2':
            args.name = 'quality_ablation_noalign'
    if args.name == 'quality_run_r2' and (args.variant != 'dcn'
                                          or args.dg is not None):
        args.name = (f'quality_codesign_{args.variant}'
                     + (f'_dg{args.dg}' if args.dg is not None else ''))

    out_dir = (tempfile.mkdtemp(prefix='quality_tiny_') if args.tiny
               else osp.join(REPO, 'experiments', args.name))
    os.makedirs(out_dir, exist_ok=True)

    # tiny plumbing-check runs get a distinct prefix so the harvester's
    # default newest-workdir glob can never mistake one for a real run
    workdir = tempfile.mkdtemp(
        prefix='edvr_quality_tiny_' if args.tiny else 'edvr_quality_')
    root = osp.join(workdir, 'reds')
    # 8 clips x 100 frames of translating texture; REDS4 partition
    # holds out clip 000 for validation
    make_video_dataset(root, num_clips=8, frames=100, hw=args.hw)
    gt_pak, lq_pak = pack(root)

    base_psnr = bicubic_baseline(root)
    print(f'bicubic baseline PSNR: {base_psnr:.3f} dB', flush=True)

    import yaml

    from edvr_tpu import train as train_mod

    # warm starts already have a trained TSA — no TSA-only warmup phase
    tsa_iter = 0 if args.pretrain else max(args.iters // 10, 1)
    opt = {
        'name': args.name, 'model_type': 'EDVRModel', 'scale': 4,
        'num_gpu': 1, 'manual_seed': 10,
        'datasets': {
            'train': dict(
                name='REDS-synth', type='REDSPackedDataset',
                dataroot_gt=gt_pak, dataroot_lq=lq_pak,
                val_partition='REDS4', num_frame=5, gt_size=args.hw,
                interval_list=[1], random_reverse=False, use_flip=True,
                use_rot=True, use_shuffle=True, num_worker_per_gpu=2,
                batch_size_per_gpu=args.batch, dataset_enlarge_ratio=1,
                prefetch_mode=None, scale=4,
                io_backend=dict(type='disk')),
            'val': dict(
                # 'REDS4' selects the folder-scan protocol
                name='REDS4', type='VideoTestDataset',
                dataroot_gt=f'{root}/train_sharp',
                dataroot_lq=f'{root}/train_sharp_bicubic',
                meta_info_file=None, io_backend=dict(type='disk'),
                cache_data=True, num_frame=5,
                padding='reflection_circle'),
        },
        'network_g': dict(type='EDVR', num_in_ch=3, num_out_ch=3,
                          num_feat=16 if args.tiny else 64, num_frame=5,
                          deformable_groups=(args.dg if args.dg is not None
                                             else 2 if args.tiny else 8),
                          num_extract_block=1 if args.tiny else 5,
                          num_reconstruct_block=1 if args.tiny else 10,
                          center_frame_idx=None, hr_in=False,
                          with_predeblur=False, with_tsa=True,
                          align_variant=args.variant),
        'path': dict(pretrain_network_g=args.pretrain,
                     strict_load_g=True, resume_state=None),
        'train': dict(
            optim_g=dict(type='Adam', lr=args.lr, weight_decay=0,
                         betas=[0.9, 0.99]),
            scheduler=dict(type='CosineAnnealingRestartLR',
                           periods=[args.iters], restart_weights=[1],
                           eta_min=1e-7),
            total_iter=args.iters, warmup_iter=200,
            tsa_iter=tsa_iter, dcn_lr_mul=1,
            pixel_opt=dict(type='CharbonnierLoss', loss_weight=1.0,
                           reduction='mean')),
        'val': dict(val_freq=args.val_freq, save_img=False,
                    metrics=dict(psnr=dict(type='calculate_psnr',
                                           crop_border=0,
                                           test_y_channel=False))),
        'logger': dict(print_freq=200, save_checkpoint_freq=10**9,
                       use_tb_logger=False),
    }

    # keep validation to the held-out clip only: the val dataset scans
    # dataroot_gt, so point a pruned view at clip 000
    val_root = osp.join(workdir, 'val')
    for sub in ('train_sharp', 'train_sharp_bicubic'):
        os.makedirs(osp.join(val_root, sub), exist_ok=True)
        os.symlink(osp.join(root, sub, '000'),
                   osp.join(val_root, sub, '000'))
    opt['datasets']['val']['dataroot_gt'] = f'{val_root}/train_sharp'
    opt['datasets']['val']['dataroot_lq'] = \
        f'{val_root}/train_sharp_bicubic'

    yml = osp.join(workdir, 'opt.yml')
    with open(yml, 'w') as f:
        yaml.safe_dump(opt, f, sort_keys=False)

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        model = train_mod.main(args=['-opt', yml])
    finally:
        os.chdir(cwd)

    # harvest the PSNR-vs-iter curve from the experiment log (the
    # validation header carries its own iter, so points are exact)
    from harvest_quality_run import parse_curve
    log_dir = osp.join(workdir, 'experiments', args.name)
    curve = parse_curve(log_dir)

    final = [float(arr.mean(axis=0)[0])
             for arr in model.metric_results.values()]
    final_psnr = float(np.mean(final))
    # the train loop's end-of-training validation is logged as
    # iter args.iters+1 — drop it (same state as the final point) and
    # keep exactly one row per iter so the committed evidence file has
    # no duplicate/overshoot tail (r4 advisor finding)
    curve = [pt for pt in curve if pt['iter'] <= args.iters]
    if not curve or curve[-1]['iter'] != args.iters:
        curve.append({'iter': args.iters, 'psnr': final_psnr})

    with open(osp.join(out_dir, 'curve.jsonl'), 'w') as fh:
        fh.write(json.dumps({'iter': 0, 'psnr': round(base_psnr, 4),
                             'note': 'bicubic baseline'}) + '\n')
        seen = set()
        for pt in curve:
            if pt['iter'] in seen:
                continue
            seen.add(pt['iter'])
            fh.write(json.dumps({'iter': pt['iter'],
                                 'psnr': round(pt['psnr'], 4)}) + '\n')
    summary = {
        'config': ('NO-ALIGN CONTROL (PCD offsets frozen at zero) '
                   if args.no_align else '') +
                  ('WARM START from '
                   f'{osp.basename(args.pretrain)} ' if args.pretrain
                   else '') +
                  (f'CO-DESIGN VARIANT align_variant={args.variant} '
                   if args.variant != 'dcn' else '') +
                  'EDVR-M (64f/'
                  f"{opt['network_g']['deformable_groups']}dg/"
                  '5+10 blocks, TSA), B'
                  f'{args.batch}/{args.hw}px GT crops, Charbonnier, '
                  f'Adam {args.lr:g} cosine->1e-7, tsa_iter={tsa_iter}',
        'iters': args.iters,
        'bicubic_psnr': round(base_psnr, 3),
        'final_psnr': round(final_psnr, 3),
        'gain_db': round(final_psnr - base_psnr, 3),
    }
    with open(osp.join(out_dir, 'summary.json'), 'w') as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary), flush=True)
    print(f'curve: {osp.join(out_dir, "curve.jsonl")}', flush=True)
    if not args.tiny:
        assert final_psnr > base_psnr + 1.0, (
            'quality run did not clearly beat bicubic')


if __name__ == '__main__':
    main()
