"""VGG feature extractor for perceptual losses (flax, NHWC).

Parity with reference basicsr/models/archs/vgg_arch.py: builds a
truncated VGG by named layers, normalizes inputs with the ImageNet
mean/std, returns a dict of requested intermediate features. Pretrained
weights are imported from a torchvision ``vgg*.pth`` state_dict via
``load_vgg_weights`` / scripts/model_conversion/convert_vgg.py (the
reference downloads torchvision's pretrained model, vgg_arch.py:106-116;
this environment has no network access so the checkpoint must be
provided).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from edvr_tpu.archs.arch_util import Conv2d
from edvr_tpu.utils.registry import ARCH_REGISTRY

VGG_PRETRAIN_PATH = 'experiments/pretrained_models/vgg19-dcbb9e9d.pth'

NAMES = {
    'vgg11': [
        'conv1_1', 'relu1_1', 'pool1', 'conv2_1', 'relu2_1', 'pool2',
        'conv3_1', 'relu3_1', 'conv3_2', 'relu3_2', 'pool3', 'conv4_1',
        'relu4_1', 'conv4_2', 'relu4_2', 'pool4', 'conv5_1', 'relu5_1',
        'conv5_2', 'relu5_2', 'pool5'
    ],
    'vgg13': [
        'conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1', 'conv2_1',
        'relu2_1', 'conv2_2', 'relu2_2', 'pool2', 'conv3_1', 'relu3_1',
        'conv3_2', 'relu3_2', 'pool3', 'conv4_1', 'relu4_1', 'conv4_2',
        'relu4_2', 'pool4', 'conv5_1', 'relu5_1', 'conv5_2', 'relu5_2',
        'pool5'
    ],
    'vgg16': [
        'conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1', 'conv2_1',
        'relu2_1', 'conv2_2', 'relu2_2', 'pool2', 'conv3_1', 'relu3_1',
        'conv3_2', 'relu3_2', 'conv3_3', 'relu3_3', 'pool3', 'conv4_1',
        'relu4_1', 'conv4_2', 'relu4_2', 'conv4_3', 'relu4_3', 'pool4',
        'conv5_1', 'relu5_1', 'conv5_2', 'relu5_2', 'conv5_3', 'relu5_3',
        'pool5'
    ],
    'vgg19': [
        'conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1', 'conv2_1',
        'relu2_1', 'conv2_2', 'relu2_2', 'pool2', 'conv3_1', 'relu3_1',
        'conv3_2', 'relu3_2', 'conv3_3', 'relu3_3', 'conv3_4', 'relu3_4',
        'pool3', 'conv4_1', 'relu4_1', 'conv4_2', 'relu4_2', 'conv4_3',
        'relu4_3', 'conv4_4', 'relu4_4', 'pool4', 'conv5_1', 'relu5_1',
        'conv5_2', 'relu5_2', 'conv5_3', 'relu5_3', 'conv5_4', 'relu5_4',
        'pool5'
    ]
}

# output channels per conv stage
_STAGE_CH = {1: 64, 2: 128, 3: 256, 4: 512, 5: 512}

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


def insert_bn(names):
    """Insert a bn layer name after each conv (reference
    basicsr/models/archs/vgg_arch.py:41-57)."""
    names_bn = []
    for name in names:
        names_bn.append(name)
        if 'conv' in name:
            names_bn.append('bn' + name.replace('conv', ''))
    return names_bn


@ARCH_REGISTRY.register()
class VGGFeatureExtractor(nn.Module):
    """Truncated VGG returning a dict of named features.

    Torch layer indices map to flax names ``features_{idx}`` so
    torchvision state_dicts convert directly.
    """
    layer_name_list: tuple
    vgg_type: str = 'vgg19'
    use_input_norm: bool = True
    range_norm: bool = False
    remove_pooling: bool = False
    pooling_stride: int = 2

    @nn.compact
    def __call__(self, x):
        names = NAMES[self.vgg_type.replace('_bn', '')]
        if 'bn' in self.vgg_type:
            names = insert_bn(names)
        max_idx = max(names.index(v) for v in self.layer_name_list)

        if self.range_norm:
            x = (x + 1) / 2
        if self.use_input_norm:
            x = (x - jnp.asarray(_MEAN, x.dtype)) / jnp.asarray(
                _STD, x.dtype)

        output = {}
        for idx, name in enumerate(names[:max_idx + 1]):
            if name.startswith('conv'):
                stage = int(name[4])
                x = Conv2d(_STAGE_CH[stage], 3, padding=1,
                           name=f'features_{idx}')(x)
            elif name.startswith('bn'):
                # frozen feature extractor: always running statistics
                # (the reference never trains the VGG, vgg_arch.py:135)
                x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                 name=f'features_{idx}')(x)
            elif name.startswith('relu'):
                x = nn.relu(x)
            elif name.startswith('pool'):
                if not self.remove_pooling:
                    s = self.pooling_stride
                    x = nn.max_pool(x, (2, 2), strides=(s, s))
            if name in self.layer_name_list:
                output[name] = x
        return output


def load_vgg_weights(path: str, variables_template):
    """Import a torchvision vgg .pth (features.N.weight keys) into the
    flax VGGFeatureExtractor variables.

    ``variables_template`` may be a params-only dict or a full
    variables dict with 'batch_stats' (the bn variants' running
    statistics convert into that collection)."""
    from edvr_tpu.convert import convert_state_dict, load_torch_weights
    state = load_torch_weights(path, param_key=None)
    state = {k.replace('features.', 'features_'): v
             for k, v in state.items() if k.startswith('features.')}
    variables, unmatched = convert_state_dict(state, variables_template)
    # classifier weights are irrelevant; features_N beyond max_idx too
    return variables
