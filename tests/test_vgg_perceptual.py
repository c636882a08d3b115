"""VGG feature extractor + PerceptualLoss parity vs reference goldens."""

import os.path as osp

import numpy as np

import jax
import jax.numpy as jnp

GOLDEN_DIR = osp.join(osp.dirname(__file__), 'data', 'golden')


def nchw_to_nhwc(x):
    return np.moveaxis(x, -3, -1)


def test_vgg_feature_extractor_parity():
    from edvr_tpu.archs.vgg_arch import VGGFeatureExtractor
    from edvr_tpu.convert import convert_state_dict

    data = np.load(osp.join(GOLDEN_DIR, 'vgg_extractor.npz'))
    x = nchw_to_nhwc(data['__input__'])
    layers = ('relu2_2', 'conv4_4')
    from edvr_tpu.archs.vgg_arch import NAMES
    net = VGGFeatureExtractor(layer_name_list=layers, vgg_type='vgg19')
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    idx_of = {n: i for i, n in enumerate(NAMES['vgg19'])}
    state = {}
    for k in data.files:
        if not k.startswith('vgg_net.'):
            continue
        _, layer, pname = k.split('.')
        state[f'features_{idx_of[layer]}.{pname}'] = data[k]
    params, unmatched = convert_state_dict(state, variables['params'])
    assert not unmatched, unmatched
    feats = net.apply({'params': params}, jnp.asarray(x))
    for layer in layers:
        ref = nchw_to_nhwc(data[f'__feat_{layer}__'])
        np.testing.assert_allclose(np.asarray(feats[layer]), ref,
                                   rtol=3e-5, atol=1e-3, err_msg=layer)


def test_perceptual_loss_parity(tmp_path, monkeypatch):
    import torch

    from edvr_tpu.models.losses import PerceptualLoss

    from edvr_tpu.archs.vgg_arch import NAMES

    data = np.load(osp.join(GOLDEN_DIR, 'perceptual_loss.npz'))
    # the reference extractor renames VGG layers ('vgg_net.conv1_1');
    # translate back to torchvision's 'features.N' index format
    idx_of = {n: i for i, n in enumerate(NAMES['vgg19'])}
    state = {}
    for k in data.files:
        if not k.startswith('vgg_net.'):
            continue
        _, layer, pname = k.split('.')
        state[f'features.{idx_of[layer]}.{pname}'] = torch.from_numpy(
            data[k])
    vgg_path = str(tmp_path / 'vgg19.pth')
    torch.save(state, vgg_path)

    loss = PerceptualLoss(layer_weights={'relu2_2': 0.5, 'conv4_4': 1.0},
                          vgg_type='vgg19', perceptual_weight=1.0,
                          style_weight=0.7, criterion='l1',
                          vgg_pretrain_path=vgg_path)
    a = jnp.asarray(nchw_to_nhwc(data['__a__']))
    b = jnp.asarray(nchw_to_nhwc(data['__b__']))
    lp, ls = loss(a, b)
    assert abs(float(lp) - float(data['__lp__'])) < 2e-4
    assert abs(float(ls) - float(data['__ls__'])) < 2e-4
