"""FID of a StyleGAN2 generator checkpoint against dataset statistics
(reference: scripts/metrics/calculate_stylegan2_fid.py)."""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def main():
    import jax
    import jax.numpy as jnp

    from edvr_tpu.archs.stylegan2_arch import StyleGAN2Generator
    from edvr_tpu.metrics.fid import (calculate_fid,
                                      load_patched_inception_v3)
    from edvr_tpu.models.base_model import BaseModel
    from edvr_tpu.ops.resize import interpolate

    parser = argparse.ArgumentParser()
    parser.add_argument('ckpt', type=str)
    parser.add_argument('--fid_stats', type=str, required=True)
    parser.add_argument('--inception_weights', type=str, default=None)
    parser.add_argument('--out_size', type=int, default=256)
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--num_sample', type=int, default=50000)
    parser.add_argument('--param_key', type=str, default='params_ema')
    args = parser.parse_args()

    net = StyleGAN2Generator(out_size=args.out_size)
    variables = net.init({'params': jax.random.PRNGKey(0)},
                         [jnp.zeros((1, 512))], randomize_noise=False)
    loader = BaseModel({'is_train': False, 'num_gpu': 1, 'path': {}})
    variables = dict(variables)
    variables['params'] = loader.load_network(
        args.ckpt, strict=True, param_key=args.param_key,
        params_template=variables['params'])

    inception_fn, _ = load_patched_inception_v3(args.inception_weights)

    key = jax.random.PRNGKey(0)
    features = []
    total = 0
    while total < args.num_sample:
        key, k1, k2 = jax.random.split(key, 3)
        latent = jax.random.normal(k1, (args.batch_size, 512))
        img, _ = net.apply(variables, [latent], rngs={'noise': k2})
        # [-1, 1] -> [0, 1], resize to 299 for inception
        img = jnp.clip((img + 1) / 2, 0, 1)
        img = interpolate(img, size=(299, 299), mode='bilinear')
        features.append(np.asarray(inception_fn(img)))
        total += args.batch_size
        print(f'{total}/{args.num_sample}')
    features = np.concatenate(features, 0)[:args.num_sample]

    sample_mean = np.mean(features, 0)
    sample_cov = np.cov(features, rowvar=False)
    stats = np.load(args.fid_stats)
    fid = calculate_fid(sample_mean, sample_cov, stats['mean'], stats['cov'])
    print('fid:', fid)


if __name__ == '__main__':
    main()
