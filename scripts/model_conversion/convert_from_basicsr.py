"""Convert a reference (BasicSR/EDVR PyTorch) checkpoint into this
framework's native .ckpt (replaces the direction of the reference's
scripts/model_conversion/convert_models.py which converted official
checkpoints into BasicSR format).

Usage:
    python scripts/model_conversion/convert_from_basicsr.py \
        --arch EDVR --pth net_g_600000.pth --out net_g_600000.ckpt \
        --arch_args '{"num_feat": 64, "num_frame": 5}'
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
    from edvr_tpu.models.base_model import dump_checkpoint
    from edvr_tpu.convert import convert_state_dict, load_torch_weights
    from edvr_tpu.convert.torch_import import fold_spectral_norm

    parser = argparse.ArgumentParser()
    parser.add_argument('--arch', required=True,
                        help='registered arch type, e.g. EDVR, MSRResNet')
    parser.add_argument('--arch_args', default='{}',
                        help='JSON dict of arch constructor args')
    parser.add_argument('--pth', required=True,
                        help='reference .pth checkpoint')
    parser.add_argument('--out', required=True, help='output .ckpt path')
    parser.add_argument('--param_key', default='params')
    parser.add_argument('--sample_shape', default=None,
                        help='JSON list input shape override, e.g. '
                        '[1,5,16,16,3] for video models')
    parser.add_argument('--fold_spectral_norm', action='store_true')
    args = parser.parse_args()

    net = define_network(dict(type=args.arch, **json.loads(args.arch_args)))
    if args.sample_shape:
        sample = jnp.zeros(tuple(json.loads(args.sample_shape)))
    elif args.arch == 'EDVR':
        sample = jnp.zeros((1, 5, 16, 16, 3))
    else:
        sample = jnp.zeros((1, 16, 16, 3))
    variables = net.init(jax.random.PRNGKey(0), sample)

    state = load_torch_weights(args.pth, args.param_key)
    if args.fold_spectral_norm:
        state = fold_spectral_norm(state)
    multi = any(c in variables for c in ('batch_stats', 'noises'))
    template = dict(variables) if multi else variables['params']
    converted, unmatched = convert_state_dict(state, template)
    if unmatched:
        print('WARNING: unconverted torch keys:', unmatched)

    host = jax.tree_util.tree_map(np.asarray,
                                  converted if multi else
                                  {'params': converted})
    if not multi:
        payload = host
    else:
        payload = {'params': host['params'],
                   **{k: v for k, v in host.items() if k != 'params'}}
    dump_checkpoint(payload, args.out)
    print(f'Saved {args.out}')


if __name__ == '__main__':
    main()
