"""StyleGAN2 sampling (reference: inference/inference_stylegan2.py).

Usage:
    python inference/inference_stylegan2.py --ckpt <net_g ckpt>
        --out_size 1024 --nums 16 --output samples/
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def main():
    import jax
    import jax.numpy as jnp

    from edvr_tpu.archs.stylegan2_arch import StyleGAN2Generator
    from edvr_tpu.models.base_model import BaseModel
    from edvr_tpu.utils import imwrite, tensor2img

    parser = argparse.ArgumentParser()
    parser.add_argument('--ckpt', type=str, required=True)
    parser.add_argument('--out_size', type=int, default=1024)
    parser.add_argument('--channel_multiplier', type=int, default=2)
    parser.add_argument('--nums', type=int, default=16,
                        help='number of samples')
    parser.add_argument('--output', type=str, default='samples')
    parser.add_argument('--truncation', type=float, default=0.7)
    parser.add_argument('--truncation_mean', type=int, default=4096)
    parser.add_argument('--param_key', type=str, default='params_ema')
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    net = StyleGAN2Generator(out_size=args.out_size,
                             channel_multiplier=args.channel_multiplier)
    variables = net.init({'params': jax.random.PRNGKey(0)},
                         [jnp.zeros((1, 512))], randomize_noise=False)
    loader = BaseModel({'is_train': False, 'num_gpu': 1, 'path': {}})
    params = loader.load_network(args.ckpt, strict=True,
                                 param_key=args.param_key,
                                 params_template=variables['params'])
    variables = dict(variables)
    variables['params'] = params

    key = jax.random.PRNGKey(args.seed)
    if args.truncation < 1:
        key, sub = jax.random.split(key)
        mean_latent = net.apply(variables, sub, args.truncation_mean,
                                method=net.mean_latent)
    else:
        mean_latent = None

    os.makedirs(args.output, exist_ok=True)
    for i in range(args.nums):
        key, k1, k2 = jax.random.split(key, 3)
        latent = jax.random.normal(k1, (1, 512))
        img, _ = net.apply(variables, [latent], truncation=args.truncation,
                           truncation_latent=mean_latent,
                           randomize_noise=False, rngs={'noise': k2})
        img = tensor2img(np.asarray(img), min_max=(-1, 1))
        imwrite(img, osp.join(args.output, f'{i:08d}.png'))
        print(f'sample {i}: saved')


if __name__ == '__main__':
    main()
