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


def test_vgg_bn_variant_matches_torch_oracle():
    """bn VGG variants (reference vgg_arch.py:41-57 insert_bn): conv ->
    frozen BatchNorm(running stats) -> relu ordering and torchvision
    'features.N' key numbering, verified against a torch functional
    oracle on a random-weight vgg16_bn prefix."""
    import torch
    import torch.nn.functional as F

    from edvr_tpu.archs.vgg_arch import NAMES, VGGFeatureExtractor, insert_bn
    from edvr_tpu.convert import convert_state_dict

    rng = np.random.RandomState(0)
    names = insert_bn(NAMES['vgg16'])
    layers = ('relu1_2', 'relu2_1')
    max_idx = max(names.index(v) for v in layers)

    # synthetic torch state in torchvision vgg16_bn numbering
    state, torch_mods = {}, []
    cin = 3
    for idx, name in enumerate(names[:max_idx + 1]):
        if name.startswith('conv'):
            cout = {1: 64, 2: 128}[int(name[4])]
            w = rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.1
            b = rng.randn(cout).astype(np.float32) * 0.1
            state[f'features.{idx}.weight'] = w
            state[f'features.{idx}.bias'] = b
            torch_mods.append(('conv', w, b))
            cin = cout
        elif name.startswith('bn'):
            g = (1 + 0.1 * rng.randn(cin)).astype(np.float32)
            bet = (0.1 * rng.randn(cin)).astype(np.float32)
            mean = (0.2 * rng.randn(cin)).astype(np.float32)
            var = (1 + 0.1 * rng.rand(cin)).astype(np.float32)
            state[f'features.{idx}.weight'] = g
            state[f'features.{idx}.bias'] = bet
            state[f'features.{idx}.running_mean'] = mean
            state[f'features.{idx}.running_var'] = var
            state[f'features.{idx}.num_batches_tracked'] = np.asarray(1)
            torch_mods.append(('bn', g, bet, mean, var))
        elif name.startswith('relu'):
            torch_mods.append(('relu',))
        else:
            torch_mods.append(('pool',))

    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    t = torch.from_numpy((x - mean[None, :, None, None]) /
                         std[None, :, None, None])
    ref = {}
    for name, mod in zip(names, torch_mods):
        if mod[0] == 'conv':
            t = F.conv2d(t, torch.from_numpy(mod[1]),
                         torch.from_numpy(mod[2]), padding=1)
        elif mod[0] == 'bn':
            t = F.batch_norm(t, torch.from_numpy(mod[3]),
                             torch.from_numpy(mod[4]),
                             torch.from_numpy(mod[1]),
                             torch.from_numpy(mod[2]), False, 0.1, 1e-5)
        elif mod[0] == 'relu':
            t = F.relu(t)
        else:
            t = F.max_pool2d(t, 2, 2)
        if name in layers:
            ref[name] = t.numpy()

    net = VGGFeatureExtractor(layer_name_list=layers, vgg_type='vgg16_bn')
    xj = jnp.asarray(nchw_to_nhwc(x))
    variables = net.init(jax.random.PRNGKey(0), xj)
    state_flax = {k.replace('features.', 'features_'): v
                  for k, v in state.items()}
    converted, unmatched = convert_state_dict(state_flax, dict(variables))
    assert not unmatched, unmatched
    feats = net.apply(converted, xj)
    for layer in layers:
        np.testing.assert_allclose(np.asarray(feats[layer]),
                                   nchw_to_nhwc(ref[layer]),
                                   rtol=3e-5, atol=2e-5, err_msg=layer)
