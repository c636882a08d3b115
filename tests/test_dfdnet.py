"""DFDNet smoke test: eager apply with synthetic dictionary and
locations; spectral-norm folding unit test."""

import numpy as np

import jax
import jax.numpy as jnp


def _dummy_dict(k=3):
    sizes = {'256': 128, '128': 256, '64': 512, '32': 512}
    rng = np.random.RandomState(0)
    return {
        key: {part: jnp.asarray(rng.randn(k, 8, 8, c).astype(np.float32))
              for part in ('left_eye', 'right_eye', 'nose', 'mouth')}
        for key, c in sizes.items()
    }


import pytest


@pytest.mark.slow
def test_dfdnet_forward_shape():
    from edvr_tpu.archs.dfdnet_arch import DFDNet
    net = DFDNet(num_feat=64)  # num_feat*8 must equal VGG conv5_4's 512
    x = jnp.asarray(np.random.RandomState(1).rand(
        1, 512, 512, 3).astype(np.float32) * 2 - 1)
    locs = [np.array([[100, 120, 180, 200]]),
            np.array([[300, 120, 380, 200]]),
            np.array([[220, 200, 290, 300]]),
            np.array([[180, 330, 330, 420]])]
    variables = net.init(jax.random.PRNGKey(0), x, locs, _dummy_dict())
    out = net.apply(variables, x, locs, _dummy_dict())
    assert out.shape == (1, 512, 512, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.abs(out).max()) <= 1.0  # tanh output


@pytest.mark.slow
def test_dfdnet_full_golden():
    """End-to-end DFDNet parity vs the reference torch pipeline
    (VGG extraction, per-part dictionary swap with AdaIN + argmax
    selection, MS-dilation, SFT decoding), via the spectral-norm-folded
    converter path (fixture: scripts/dev/gen_golden_dfdnet.py)."""
    import os.path as osp

    from edvr_tpu.archs.dfdnet_arch import DFDNet
    from edvr_tpu.convert import convert_state_dict
    from edvr_tpu.convert.torch_import import fold_spectral_norm

    path = osp.join(osp.dirname(__file__), 'data', 'golden',
                    'dfdnet_full.npz')
    data = np.load(path)
    x = jnp.asarray(np.moveaxis(data['__input__'], 1, -1))
    ref = np.moveaxis(data['__output__'], 1, -1)
    locs = [data['__locs__'][i] for i in range(4)]
    dict_feat = {}
    state = {}
    for k in data.files:
        if k.startswith('dict.'):
            _, size, part = k.split('.')
            dict_feat.setdefault(size, {})[part] = jnp.asarray(
                np.moveaxis(data[k], 1, -1))
        elif k.startswith('sd.'):
            state[k[3:]] = data[k]

    # the reference names its embedded VGG layers (conv1_1...); the
    # flax extractor uses torchvision feature indices (features_{idx})
    import re

    from edvr_tpu.archs.vgg_arch import NAMES
    vgg_names = list(NAMES['vgg19'])
    renamed = {}
    for k, v in state.items():
        m = re.match(r'vgg_extractor\.vgg_net\.([^.]+)\.(.*)', k)
        if m:
            k = (f'vgg_extractor.features_'
                 f'{vgg_names.index(m.group(1))}.{m.group(2)}')
        renamed[k] = v
    state = renamed

    net = DFDNet(num_feat=64)
    variables = net.init(jax.random.PRNGKey(0), x, locs, dict_feat)
    state = fold_spectral_norm(state)
    converted, unmatched = convert_state_dict(state, variables['params'])
    # ImageNet mean/std constants are baked into the flax extractor
    assert all(u.endswith(('.mean', '.std')) for u in unmatched), unmatched
    out = np.asarray(net.apply({'params': converted}, x, locs, dict_feat))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=3e-4)


def test_fold_spectral_norm():
    import torch

    from edvr_tpu.convert.torch_import import fold_spectral_norm

    conv = torch.nn.utils.spectral_norm(torch.nn.Conv2d(4, 6, 3))
    conv.eval()
    with torch.no_grad():
        x = torch.randn(1, 4, 8, 8)
        ref = conv(x)
    state = {k: v.numpy() for k, v in conv.state_dict().items()}
    folded = fold_spectral_norm(state)
    assert set(folded) == {'weight', 'bias'}
    with torch.no_grad():
        plain = torch.nn.Conv2d(4, 6, 3)
        plain.weight.copy_(torch.from_numpy(folded['weight']))
        plain.bias.copy_(torch.from_numpy(folded['bias']))
        out = plain(x)
    # rtol-based: torch's spectral_norm power iteration and the folded
    # weights agree to f32 roundoff, but output magnitudes are O(1e2)
    # here so a pure-atol bound flakes at ~2e-5 relative error.
    np.testing.assert_allclose(out.numpy(), ref.numpy(), rtol=1e-4,
                               atol=1e-5)
