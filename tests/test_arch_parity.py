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
    return np.moveaxis(x, -3, -1)


@pytest.mark.parametrize('name', FIXTURES)
def test_arch_matches_reference(name):
    data = np.load(osp.join(GOLDEN_DIR, f'arch_{name}.npz'))
    config = json.loads(bytes(data['__config__']).decode())
    x = nchw_to_nhwc(data['__input__'])
    ref_out = nchw_to_nhwc(data['__output__'])
    state = {k: data[k] for k in data.files if not k.startswith('__')}

    net = define_network(config)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, unmatched = convert_state_dict(state, variables['params'])
    assert not unmatched, f'unconverted torch keys: {unmatched}'

    out = net.apply({'params': params}, jnp.asarray(x))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4,
                               err_msg=name)


def test_fixtures_exist():
    assert len(FIXTURES) >= 11, FIXTURES
