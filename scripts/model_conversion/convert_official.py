"""Convert *official third-party* checkpoints into this framework's
.ckpt format (reference: scripts/model_conversion/convert_models.py,
convert_stylegan.py, convert_dfdnet.py — which converted the same
checkpoints into BasicSR .pth files).

Two stages: (1) rename official keys to BasicSR-style names
(edvr_tpu/convert/official.py), (2) run the regular torch->flax layout
importer against the target arch.

Usage:
    python scripts/model_conversion/convert_official.py \
        --source EDVR --arch EDVR --pth EDVR_official.pth \
        --out net_g.ckpt --arch_args '{"num_feat": 64}'

    # rosinality stylegan2 bundles g_ema/d in one file:
    python scripts/model_conversion/convert_official.py \
        --source StyleGAN2Generator --arch StyleGAN2Generator \
        --pth stylegan2-ffhq.pth --param_key g_ema --out g_ema.ckpt
"""

import argparse
import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def main():
    import jax
    import jax.numpy as jnp

    from edvr_tpu.archs import define_network
    from edvr_tpu.archs.vgg_arch import NAMES
    from edvr_tpu.models.base_model import dump_checkpoint
    from edvr_tpu.convert import convert_state_dict, load_torch_weights
    from edvr_tpu.convert.official import REMAPPERS

    parser = argparse.ArgumentParser()
    parser.add_argument('--source', required=True,
                        choices=sorted(REMAPPERS),
                        help='official checkpoint family')
    parser.add_argument('--arch', required=True,
                        help='registered arch type to instantiate')
    parser.add_argument('--arch_args', default='{}')
    parser.add_argument('--pth', required=True)
    parser.add_argument('--out', required=True)
    parser.add_argument('--param_key', default=None,
                        help='sub-dict key in the official file '
                        '(e.g. g_ema for rosinality bundles)')
    parser.add_argument('--sample_shape', default=None,
                        help='JSON list input shape, e.g. [1,5,16,16,3]')
    parser.add_argument('--num_block', type=int, default=None,
                        help='EDSR/RCAN body length in the official file')
    args = parser.parse_args()

    state = load_torch_weights(args.pth, args.param_key)
    arch_args = json.loads(args.arch_args)

    remap = REMAPPERS[args.source]
    kwargs = {}
    if args.source in ('EDSR', 'RCAN') and args.num_block is not None:
        kwargs['num_block'] = args.num_block
    if args.source == 'DFDNet':
        kwargs['vgg_names'] = NAMES['vgg19']
    if args.source == 'DUF16':
        # de-interleave the dynamic-filter head channels (the official
        # layout is color-fastest; our pixel_shuffle is color-major)
        kwargs['scale'] = arch_args.get('scale', 4)
    renamed, unmatched = remap(state, **kwargs)
    if unmatched:
        print('WARNING: official keys without a rename rule:', unmatched)
    net = define_network(dict(type=args.arch, **arch_args))
    if args.sample_shape:
        sample = jnp.zeros(tuple(json.loads(args.sample_shape)))
    elif args.arch == 'EDVR':
        sample = jnp.zeros((1, 5, 16, 16, 3))
    elif args.arch == 'DUF':
        sample = jnp.zeros((1, 7, 16, 16, 3))
    elif args.arch.startswith('StyleGAN2G'):
        sample = jnp.zeros((1, arch_args.get('num_style_feat', 512)))
    else:
        sample = jnp.zeros((1, 16, 16, 3))
    variables = net.init(jax.random.PRNGKey(0), sample)

    multi = any(c in variables for c in ('batch_stats', 'noises'))
    template = dict(variables) if multi else variables['params']
    converted, unconverted = convert_state_dict(renamed, template)
    if unconverted:
        print('WARNING: unconverted keys:', unconverted)

    host = jax.tree_util.tree_map(np.asarray,
                                  converted if multi else
                                  {'params': converted})
    dump_checkpoint(host, args.out)
    print(f'Saved {args.out}')


if __name__ == '__main__':
    main()
