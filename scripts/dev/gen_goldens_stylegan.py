"""Golden fixtures for StyleGAN2 G/D, VGG discriminator, VGG feature
extractor and PerceptualLoss, generated from the reference with torch
stand-ins for the CUDA ops (verified against the JAX ops first).

Usage: python scripts/dev/gen_goldens_stylegan.py
"""

import json
import os
import sys
import types

import numpy as np
import torch

REF = os.environ.get('REFERENCE_PATH', '/root/reference')
HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, '..', '..'))
OUT = os.path.join(REPO, 'tests', 'data', 'golden')
sys.path.insert(0, HERE)
sys.path.insert(0, REF)

from torch_sg2_ops_stub import (FusedLeakyReLU, fused_leaky_relu,
                                upfirdn2d_torch)

# ---- build a minimal torchvision stub with a real VGG19 features stack ----
tv = types.ModuleType('torchvision')
tv.__path__ = []
tv.utils = types.ModuleType('torchvision.utils')
tv.utils.make_grid = None
tv.models = types.ModuleType('torchvision.models')
tv.models.__path__ = []
_vggmod = types.ModuleType('torchvision.models.vgg')


def _make_vgg_features(cfg):
    from torch import nn
    layers = []
    in_ch = 3
    for v in cfg:
        if v == 'M':
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_ch = v
    return nn.Sequential(*layers)


_VGG19_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
              512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M']


class _VGGNet(torch.nn.Module):

    def __init__(self):
        super().__init__()
        self.features = _make_vgg_features(_VGG19_CFG)


def vgg19(pretrained=False, **kwargs):
    net = _VGGNet()
    torch.manual_seed(3)
    for p in net.parameters():
        p.data.normal_(0, 0.05)
    return net


_vggmod.vgg19 = vgg19
tv.models.vgg = _vggmod
sys.modules['torchvision'] = tv
sys.modules['torchvision.utils'] = tv.utils
sys.modules['torchvision.models'] = tv.models
sys.modules['torchvision.models.vgg'] = _vggmod

# stub the compiled ops packages before reference imports
fa = types.ModuleType('basicsr.models.ops.fused_act')
fa.FusedLeakyReLU = FusedLeakyReLU
fa.fused_leaky_relu = fused_leaky_relu
uf = types.ModuleType('basicsr.models.ops.upfirdn2d')
uf.upfirdn2d = upfirdn2d_torch
ops_pkg = types.ModuleType('basicsr.models.ops')
sys.modules.setdefault('basicsr.models.ops', ops_pkg)
sys.modules['basicsr.models.ops.fused_act'] = fa
sys.modules['basicsr.models.ops.upfirdn2d'] = uf

# ---- verify torch upfirdn2d stub against the JAX op ----
sys.path.insert(0, REPO)
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'float32')
import jax.numpy as jnp  # noqa: E402
from edvr_tpu.ops import upfirdn2d as upfirdn2d_jax  # noqa: E402

rng = np.random.RandomState(0)
x = rng.randn(2, 3, 9, 11).astype(np.float32)
k = rng.rand(4, 4).astype(np.float32)
for up, down, pad in [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (2, 2))]:
    ref = upfirdn2d_torch(torch.from_numpy(x), torch.from_numpy(k), up,
                          down, pad).numpy()
    out = np.asarray(upfirdn2d_jax(
        jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(k), up, down, pad))
    err = np.abs(np.moveaxis(ref, 1, -1) - out).max()
    assert err < 1e-5, (up, down, pad, err)
print('torch upfirdn2d stub vs JAX op OK')

from basicsr.models.archs.stylegan2_arch import (  # noqa: E402
    StyleGAN2Discriminator, StyleGAN2Generator)
from basicsr.models.archs.discriminator_arch import (  # noqa: E402
    VGGStyleDiscriminator128)
from basicsr.models.archs.vgg_arch import VGGFeatureExtractor  # noqa: E402
from basicsr.models.losses.losses import PerceptualLoss  # noqa: E402

torch.manual_seed(0)


def dump(name, net, x, config, y=None):
    net.eval()
    if y is None:
        with torch.no_grad():
            y = net(x)
    state = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(
        os.path.join(OUT, f'arch_{name}.npz'),
        __input__=x.numpy(), __output__=y.numpy(),
        __config__=np.frombuffer(json.dumps(config).encode(),
                                 dtype=np.uint8),
        **state)
    print(f'{name}: in {tuple(x.shape)} out {tuple(y.shape)} '
          f'({len(state)} tensors)')


# --- StyleGAN2 generator (fixed stored noise) ---
g_cfg = dict(out_size=32, num_style_feat=64, num_mlp=2,
             channel_multiplier=1, narrow=0.25)


class GWrap(torch.nn.Module):

    def __init__(self, mix=False):
        super().__init__()
        self.g = StyleGAN2Generator(**g_cfg)
        self.mix = mix

    def forward(self, x):
        if self.mix:
            return self.g([x[:, 0], x[:, 1]], randomize_noise=False,
                          inject_index=3)[0]
        return self.g([x], randomize_noise=False)[0]


gw = GWrap()
dump('stylegan2_g', gw, torch.randn(2, 64),
     dict(type='StyleGAN2Generator', **g_cfg))
gm = GWrap(mix=True)
gm.g.load_state_dict(gw.g.state_dict())
dump('stylegan2_g_mix', gm, torch.randn(2, 2, 64),
     dict(type='StyleGAN2Generator', **g_cfg, __mix_inject__=3))

# --- StyleGAN2 discriminator ---
d_cfg = dict(out_size=32, channel_multiplier=1, narrow=0.25,
             stddev_group=4)
dump('stylegan2_d', StyleGAN2Discriminator(**d_cfg),
     torch.randn(4, 3, 32, 32), dict(type='StyleGAN2Discriminator',
                                     **d_cfg))

# --- VGG-style discriminator 128 ---
vd = VGGStyleDiscriminator128(num_in_ch=3, num_feat=16)
vd.eval()
with torch.no_grad():
    for m in vd.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
dump('vggstyle_d128', vd, torch.rand(2, 3, 128, 128),
     dict(type='VGGStyleDiscriminator128', num_in_ch=3, num_feat=16))

# --- VGG feature extractor + PerceptualLoss ---
layers = ('relu2_2', 'conv4_4')
fx = VGGFeatureExtractor(layer_name_list=list(layers), vgg_type='vgg19')
fx.eval()
xin = torch.rand(1, 3, 48, 48)
with torch.no_grad():
    feats = fx(xin)
state = {k: v.numpy() for k, v in fx.state_dict().items()}
np.savez_compressed(
    os.path.join(OUT, 'vgg_extractor.npz'),
    __input__=xin.numpy(),
    **{f'__feat_{k}__': v.numpy() for k, v in feats.items()},
    **state)
print('vgg_extractor: layers', list(feats.keys()))

pl = PerceptualLoss(layer_weights={'relu2_2': 0.5, 'conv4_4': 1.0},
                    vgg_type='vgg19', perceptual_weight=1.0,
                    style_weight=0.7, criterion='l1')
pl.eval()
a = torch.rand(2, 3, 48, 48)
b = torch.rand(2, 3, 48, 48)
with torch.no_grad():
    lp, ls = pl(a, b)
state = {k: v.numpy() for k, v in pl.vgg.state_dict().items()}
np.savez_compressed(
    os.path.join(OUT, 'perceptual_loss.npz'),
    __a__=a.numpy(), __b__=b.numpy(),
    __lp__=np.float64(lp.item()), __ls__=np.float64(ls.item()),
    **state)
print(f'perceptual: lp={lp.item():.6f} ls={ls.item():.6f}')
print('done')
