"""End-to-end rehearsal of the real-weight metric conversion flow
(scripts/model_conversion/prepare_metric_weights.py) with synthetic
stand-ins shaped exactly like the torchvision vgg19 and
pt_inception-2015-12-05 checkpoints (the genuine files are not
available offline; reference: basicsr/models/archs/vgg_arch.py:59-171,
basicsr/metrics/fid.py:10-27)."""

import os.path as osp
from edvr_tpu.models.base_model import load_checkpoint
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..',
                            'scripts', 'model_conversion'))
import prepare_metric_weights as pmw  # noqa: E402


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def make_fake_vgg19(path, rng):
    """torchvision-vgg19-shaped state dict with random weights."""
    from edvr_tpu.archs.vgg_arch import NAMES, _STAGE_CH
    state = {}
    in_ch = 3
    for idx, name in enumerate(NAMES['vgg19']):
        if not name.startswith('conv'):
            continue
        out_ch = _STAGE_CH[int(name[4])]
        state[f'features.{idx}.weight'] = torch.tensor(
            rng.randn(out_ch, in_ch, 3, 3).astype(np.float32) * 0.05)
        state[f'features.{idx}.bias'] = torch.tensor(
            rng.randn(out_ch).astype(np.float32) * 0.05)
        in_ch = out_ch
    # classifier weights must be ignored by the importer
    state['classifier.0.weight'] = torch.zeros(4096, 25088)
    torch.save(state, path)


def make_fake_fid_inception(path, rng):
    """pt_inception-shaped state dict generated from the flax template
    (names invert the converter's mapping)."""
    from edvr_tpu.archs.inception import FIDInceptionV3
    import jax
    import jax.numpy as jnp
    net = FIDInceptionV3()
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 299, 299, 3)))
    state = {}
    for pth, arr in _flatten(variables['params']):
        base = '.'.join(pth[:-1])
        leaf = pth[-1]
        if leaf == 'kernel':
            val = rng.randn(*np.asarray(arr).transpose(3, 2, 0, 1).shape)
            state[f'{base}.weight'] = torch.tensor(
                val.astype(np.float32) * 0.05)
        elif leaf == 'scale':
            state[f'{base}.weight'] = torch.tensor(
                (1 + rng.randn(*arr.shape) * 0.02).astype(np.float32))
        elif leaf == 'bias':
            state[f'{base}.bias'] = torch.tensor(
                rng.randn(*arr.shape).astype(np.float32) * 0.02)
        else:
            raise AssertionError(pth)
    for pth, arr in _flatten(variables['batch_stats']):
        base = '.'.join(pth[:-1])
        tname = {'mean': 'running_mean', 'var': 'running_var'}[pth[-1]]
        if tname == 'running_var':
            val = 1 + np.abs(rng.randn(*arr.shape)) * 0.05
        else:
            val = rng.randn(*arr.shape) * 0.02
        state[f'{base}.{tname}'] = torch.tensor(val.astype(np.float32))
    # heads must be ignored by the importer
    state['fc.weight'] = torch.zeros(1008, 2048)
    state['fc.bias'] = torch.zeros(1008)
    torch.save(state, path)


def test_prepare_metric_weights_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    vgg_pth = str(tmp_path / 'vgg19-fake.pth')
    inc_pth = str(tmp_path / 'pt_inception-fake.pth')
    make_fake_vgg19(vgg_pth, rng)
    make_fake_fid_inception(inc_pth, rng)

    out = str(tmp_path / 'converted')
    record = str(tmp_path / 'fingerprints.json')
    pmw.main(['--vgg', vgg_pth, '--inception', inc_pth, '--out', out,
              '--record', record])

    # converted artifacts exist (with the guard header) and reload
    # into working nets
    vgg_blob = load_checkpoint(osp.join(out, 'vgg19_features.ckpt'))
    assert 'params' in vgg_blob
    import jax
    from edvr_tpu.archs.vgg_arch import VGGFeatureExtractor
    net = VGGFeatureExtractor(layer_name_list=['conv5_4'])
    feats = net.apply({'params': vgg_blob['params']},
                      np.zeros((1, 64, 64, 3), np.float32))
    assert feats['conv5_4'].shape == (1, 4, 4, 512)
    assert np.isfinite(np.asarray(feats['conv5_4'])).all()

    inc_vars = load_checkpoint(osp.join(out, 'fid_inception.ckpt'))
    from edvr_tpu.archs.inception import FIDInceptionV3
    feats = FIDInceptionV3().apply(
        inc_vars, np.zeros((1, 299, 299, 3), np.float32))
    assert feats.shape == (1, 2048)
    assert np.isfinite(np.asarray(feats)).all()

    # validation against the recorded fingerprints passes...
    pmw.main(['--vgg', vgg_pth, '--inception', inc_pth, '--out', out,
              '--expect', record])

    # ...and catches a corrupted checkpoint
    blob = torch.load(vgg_pth, weights_only=True)
    blob['features.0.weight'] = blob['features.0.weight'] * 3 + 0.5
    torch.save(blob, vgg_pth)
    with pytest.raises(SystemExit):
        pmw.main(['--vgg', vgg_pth, '--out', out, '--expect', record])
