"""Generate the DFDNet end-to-end parity golden from the reference.

Builds the reference (torch) DFDNet with a synthetic-weight VGG19 stub
(torchvision is absent in this environment — same stand-in as
gen_goldens_stylegan.py), a synthetic facial-component dictionary, and
random weights; runs one 512x512 face through the full pipeline
(VGG extraction, per-part dictionary swap with AdaIN + argmax
selection, MS-dilation, SFT upsampling) and stores
{state_dict, dict, input, part_locations, output} in
tests/data/golden/dfdnet_full.npz.

Reference: basicsr/models/archs/dfdnet_arch.py:57-180.

Usage: python scripts/dev/gen_golden_dfdnet.py
"""

import os
import sys
import tempfile
import types

import numpy as np
import torch

REF = os.environ.get('REFERENCE_PATH', '/root/reference')
HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, '..', '..'))
OUT = os.path.join(REPO, 'tests', 'data', 'golden')
os.makedirs(OUT, exist_ok=True)
sys.path.insert(0, REF)

# ---- torchvision stub with a real VGG19 features stack (no weights) ----
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


def main():
    rng = np.random.RandomState(11)

    # synthetic facial-component dictionary: {f_size: {part: (k,C,h,w)}}
    # varied spatial sizes per part to exercise the resize paths
    channel_by_size = {256: 128, 128: 256, 64: 512, 32: 512}
    part_hw = {'left_eye': 6, 'right_eye': 6, 'nose': 5, 'mouth': 7}
    comp_dict = {
        f'{size}': {
            part: torch.from_numpy(
                rng.randn(3, c, hw, hw).astype(np.float32) * 0.5)
            for part, hw in part_hw.items()
        }
        for size, c in channel_by_size.items()
    }
    dict_path = os.path.join(tempfile.mkdtemp(), 'dict.pth')
    torch.save(comp_dict, dict_path)

    from basicsr.models.archs.dfdnet_arch import DFDNet

    torch.manual_seed(7)
    net = DFDNet(num_feat=64, dict_path=dict_path)
    # random weights with fan-in scaling (incl. the VGG stack and the
    # spectral-norm weight_orig tensors): a flat uniform init explodes
    # through the 19-layer VGG + 4 SFT blocks into inf/NaN
    with torch.no_grad():
        for p in net.parameters():
            if p.dim() >= 2:
                fan_in = int(np.prod(p.shape[1:]))
                p.data.normal_(0, 0.7 * (2.0 / fan_in) ** 0.5)
            else:
                p.data.uniform_(-0.05, 0.05)
    net.eval()

    # the spectral-norm u/v buffers were power-iterated against the
    # ORIGINAL init; after the re-init sigma = u^T W v is garbage (can
    # be ~0 -> effective weights explode). Refresh them with a few
    # train-mode power iterations before capturing the state.
    x_warm = torch.from_numpy(
        (rng.rand(1, 3, 512, 512).astype(np.float32) * 2 - 1))
    locs_warm = [torch.tensor([[96, 128, 176, 208]]),
                 torch.tensor([[304, 128, 384, 208]]),
                 torch.tensor([[224, 208, 288, 304]]),
                 torch.tensor([[176, 336, 336, 416]])]
    net.train()
    with torch.no_grad():
        for _ in range(3):
            net(x_warm, locs_warm)
    net.eval()

    x = torch.from_numpy(
        (rng.rand(1, 3, 512, 512).astype(np.float32) * 2 - 1))
    # (x0, y0, x1, y1) in 512-space, multiples of 16 so every pyramid
    # level's integer division is exact
    locs = [torch.tensor([[96, 128, 176, 208]]),
            torch.tensor([[304, 128, 384, 208]]),
            torch.tensor([[224, 208, 288, 304]]),
            torch.tensor([[176, 336, 336, 416]])]

    with torch.no_grad():
        out = net(x, locs)

    arrays = {
        '__input__': x.numpy(),
        '__output__': out.numpy(),
        '__locs__': np.stack([loc.numpy() for loc in locs], axis=0),
    }
    for k, v in net.state_dict().items():
        arrays[f'sd.{k}'] = v.numpy()
    for size, parts in comp_dict.items():
        for part, v in parts.items():
            arrays[f'dict.{size}.{part}'] = v.numpy()
    path = os.path.join(OUT, 'dfdnet_full.npz')
    np.savez_compressed(path, **arrays)
    print(f'wrote {path}: out range [{out.min():.4f}, {out.max():.4f}]')


if __name__ == '__main__':
    main()
