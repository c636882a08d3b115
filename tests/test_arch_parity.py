"""End-to-end architecture parity vs reference-torch golden fixtures.

Each fixture (tests/data/golden/arch_*.npz, produced by
scripts/dev/gen_goldens_archs.py from /root/reference) holds the
reference module's state_dict, a fixed input, and its output. The test
builds the flax arch from the same config, imports the weights through
the converter, and compares outputs.
"""

import glob
import json
import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edvr_tpu.archs import define_network
from edvr_tpu.convert import convert_state_dict

GOLDEN_DIR = osp.join(osp.dirname(__file__), 'data', 'golden')
FIXTURES = sorted(
    osp.basename(p)[5:-4]
    for p in glob.glob(osp.join(GOLDEN_DIR, 'arch_*.npz')))


def nchw_to_nhwc(x):
    # 2D tensors (latent codes, logits) have no channel axis to move
    return np.moveaxis(x, -3, -1) if x.ndim >= 4 else x


@pytest.mark.parametrize('name', FIXTURES)
def test_arch_matches_reference(name):
    data = np.load(osp.join(GOLDEN_DIR, f'arch_{name}.npz'))
    config = json.loads(bytes(data['__config__']).decode())
    x = nchw_to_nhwc(data['__input__'])
    ref_out = nchw_to_nhwc(data['__output__'])
    state = {}
    for k in data.files:
        if k.startswith('__'):
            continue
        # fixtures may wrap the net (SpyNet pair / StyleGAN2 adapters)
        for prefix in ('net.', 'g.'):
            if k.startswith(prefix):
                state[k[len(prefix):]] = data[k]
                break
        else:
            state[k] = data[k]

    mix_inject = config.pop('__mix_inject__', None)
    net = define_network(config)
    kwargs = {}
    if config['type'] == 'SpyNet':
        args = (jnp.asarray(x[:, 0]), jnp.asarray(x[:, 1]))
    elif config['type'] == 'StyleGAN2Generator':
        if mix_inject is not None:
            args = ([jnp.asarray(x[:, 0]), jnp.asarray(x[:, 1])],)
            kwargs = dict(randomize_noise=False, inject_index=mix_inject)
        else:
            args = ([jnp.asarray(x)],)
            kwargs = dict(randomize_noise=False)
    else:
        args = (jnp.asarray(x),)
    variables = net.init(jax.random.PRNGKey(0), *args, **kwargs)
    multi_coll = any(c in variables for c in ('batch_stats', 'noises'))
    template = dict(variables) if multi_coll else variables['params']
    converted, unmatched = convert_state_dict(state, template)
    # ImageNet mean/std constant buffers are baked into the flax archs
    unmatched = [k for k in unmatched
                 if not k.split('.')[-1] in ('mean', 'std')]
    assert not unmatched, f'unconverted torch keys: {unmatched}'
    out = net.apply(converted if multi_coll else {'params': converted},
                    *args, **kwargs)
    if isinstance(out, tuple):
        out = out[0]

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=3e-4,
                               err_msg=name)


def test_fixtures_exist():
    assert len(FIXTURES) >= 11, FIXTURES
