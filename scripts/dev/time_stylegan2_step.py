"""Time the StyleGAN2 256px FFHQ training steps on the real TPU
(VERDICT item 5: prove the GAN engine compiles and steps on hardware —
second-order autodiff for R1/path regularization through the
upfirdn-heavy graphs is exactly what might fail or crawl at trace time
on this backend).

Mirrors options/train/StyleGAN/train_StyleGAN2_256_Cmul2_FFHQ.yml
(out_size 256, channel_multiplier 2, batch 3, lazy reg every 16/4;
reference behavior: basicsr/models/stylegan2_model.py:216-293).

Prints one JSON line with compile times and per-variant step times:
  plain   — D step + G step + EMA
  g_reg   — + path-length regularization (grad-of-grad through G)
  full    — + R1 regularization (grad-of-grad through D) as well

Usage: python scripts/dev/time_stylegan2_step.py [--batch 3]
       [--out_size 256]
"""

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def sync(model):
    # pull one loss scalar to the host: forces completion of every
    # step this iteration enqueued (async dispatch otherwise lies)
    for v in model.log_dict.values():
        float(v)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=3)
    parser.add_argument('--out_size', type=int, default=256)
    parser.add_argument('--cpu', action='store_true',
                        help='CPU plumbing check (use a small out_size)')
    args = parser.parse_args()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np

    from edvr_tpu.models import create_model

    opt = {
        'name': 'sg2_time', 'model_type': 'StyleGAN2Model', 'scale': 1,
        'num_gpu': 1, 'manual_seed': 0, 'is_train': True, 'dist': False,
        'network_g': dict(type='StyleGAN2Generator',
                          out_size=args.out_size, num_style_feat=512,
                          num_mlp=8, channel_multiplier=2,
                          resample_kernel=[1, 3, 3, 1], lr_mlp=0.01),
        'network_d': dict(type='StyleGAN2Discriminator',
                          out_size=args.out_size, channel_multiplier=2,
                          resample_kernel=[1, 3, 3, 1]),
        'path': {},
        'train': dict(
            optim_g=dict(type='Adam', lr=2e-3),
            optim_d=dict(type='Adam', lr=2e-3),
            scheduler=dict(type='MultiStepLR', milestones=[600000],
                           gamma=0.5),
            total_iter=800000, warmup_iter=-1,
            gan_opt=dict(type='GANLoss', gan_type='wgan_softplus',
                         loss_weight=1.0),
            r1_reg_weight=10.0, path_reg_weight=2.0,
            net_g_reg_every=4, net_d_reg_every=16, mixing_prob=0.9,
            path_batch_shrink=2),
        'logger': dict(print_freq=1, save_checkpoint_freq=10**9),
    }

    rng = np.random.RandomState(0)
    batch = {'gt': rng.rand(args.batch, args.out_size, args.out_size,
                            3).astype(np.float32) * 2 - 1}

    t0 = time.time()
    model = create_model(opt)
    model.feed_data(batch)
    t_build = time.time() - t0

    # iter choices: 1 -> plain; 4 -> +path reg; 16 -> +R1 (+path)
    variants = {'plain': 1, 'g_reg': 4, 'full': 16}
    compile_s, step_ms = {}, {}
    for name, base_it in variants.items():
        t0 = time.time()
        model.optimize_parameters(base_it)
        sync(model)
        compile_s[name] = round(time.time() - t0, 1)
        times = []
        for k in range(4):
            model.feed_data({'gt': rng.rand(*batch['gt'].shape).astype(
                np.float32) * 2 - 1})
            t0 = time.time()
            model.optimize_parameters(base_it + 32 * (k + 1))
            sync(model)
            times.append(time.time() - t0)
        step_ms[name] = round(min(times) * 1e3, 1)

    print(json.dumps({
        'config': f'StyleGAN2 {args.out_size}px cmul2 B{args.batch}',
        'build_s': round(t_build, 1),
        'compile_s': compile_s,
        'step_ms': step_ms,
        'losses_finite': all(np.isfinite(float(v))
                             for v in model.log_dict.values()),
    }))


if __name__ == '__main__':
    main()
