"""PSNR-gate inference-time DCN offset quantization (VERDICT r3 #2b).

Loads the trained quality-run checkpoint (EDVR-M, 20k iters on the
seeded synthetic translating-texture data — experiments/quality_run_r2)
and evaluates the held-out clip 000 under EDVR_TPU_DCN_QUANT in
{none, quarter, half, int}, reporting the PSNR delta of each snap
level against the continuous-offset forward.

Why this gates a SPEED lever: the band kernel's bilinear coefficient
algebra is per-point work that does not shrink with the v4 W
reduction; integer offsets collapse the 2x2 corner blend to a single
slot select. The driver's quality gate is <=0.05 dB on the metric, so
a snap level that holds PSNR is a legitimate formulation change
(docs/TPUDesign.md "Speed-of-light accounting" item 1).

The val data regenerates deterministically (make_video_dataset seed 0;
clip 000 draws its velocity first, so num_clips=1 reproduces the
quality run's held-out clip exactly). The no-quant row must reproduce
the committed curve value (28.74 dB) — asserted loosely as a harness
self-check.

Usage: python scripts/dev/eval_offset_quant.py \
    [--ckpt experiments/quality_run_r2/net_g_20000.ckpt] [--modes ...]
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        '--ckpt',
        default=osp.join(REPO, 'experiments', 'quality_run_r2',
                         'net_g_20000.ckpt'))
    parser.add_argument('--modes', nargs='*',
                        default=['none', 'quarter', 'half', 'int'])
    parser.add_argument('--hw', type=int, default=256)
    parser.add_argument('--frames', type=int, default=100)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from edvr_tpu.archs.edvr_arch import (EDVR, clip_window_indices,
                                          make_clip_restore_fn)
    from edvr_tpu.metrics import calculate_psnr
    from edvr_tpu.models.base_model import load_checkpoint

    root = osp.join(tempfile.mkdtemp(prefix='quant_gate_'), 'reds')
    make_video_dataset(root, num_clips=1, frames=args.frames, hw=args.hw)
    gt_dir = osp.join(root, 'train_sharp', '000')
    lq_dir = osp.join(root, 'train_sharp_bicubic', '000')
    # the training pipeline feeds the model RGB (img2tensor bgr2rgb)
    gt = np.stack([cv2.imread(osp.join(gt_dir, f'{f:08d}.png'))[..., ::-1]
                   for f in range(args.frames)]).astype(np.float32) / 255.
    lq = np.stack([cv2.imread(osp.join(lq_dir, f'{f:08d}.png'))[..., ::-1]
                   for f in range(args.frames)]).astype(np.float32) / 255.

    net = EDVR(num_in_ch=3, num_out_ch=3, num_feat=64, num_frame=5,
               deformable_groups=8, num_extract_block=5,
               num_reconstruct_block=10, center_frame_idx=None,
               hr_in=False, with_predeblur=False, with_tsa=True)
    params = load_checkpoint(args.ckpt)['params']
    variables = {'params': params}
    idx = jnp.asarray(clip_window_indices(args.frames, 5,
                                          'reflection_circle'))
    clip = jnp.asarray(lq)

    results = {}
    for mode in args.modes:
        if mode == 'none':
            os.environ.pop('EDVR_TPU_DCN_QUANT', None)
        else:
            os.environ['EDVR_TPU_DCN_QUANT'] = mode
        # fresh closure per mode: the env var is read at TRACE time
        # inside modulated_deform_conv, so a new jit identity forces
        # the retrace
        clip_fn = make_clip_restore_fn(net, win_batch=1)
        fwd = jax.jit(lambda v, c, i, _fn=clip_fn: _fn(v, c, i))
        out = np.asarray(fwd(variables, clip, idx))
        psnrs = [calculate_psnr((np.clip(o, 0, 1) * 255).round(),
                                (g * 255).round(), crop_border=0)
                 for o, g in zip(out, gt)]
        results[mode] = float(np.mean(psnrs))
        print(f'{mode:8s}: {results[mode]:.4f} dB', flush=True)
    os.environ.pop('EDVR_TPU_DCN_QUANT', None)

    base = results.get('none')
    table = {m: {'psnr': round(v, 4),
                 'delta_db': round(v - base, 4) if base else None}
             for m, v in results.items()}
    print(json.dumps({'ckpt': args.ckpt, 'clip': '000 (held out)',
                      'gate': 'delta >= -0.05 dB', 'results': table}))


if __name__ == '__main__':
    main()
