"""Full-scale EDVR-M golden: the real REDS config (64 feat, 8 dg, 5
extract, 10 reconstruct, TSA) on a 96x160 input, run through the
reference implementation with random weights. Catches any bug that only
appears at production scale (tile packing, group handling, layout).
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

tv = types.ModuleType('torchvision')
tv.__path__ = []
tv.utils = types.ModuleType('torchvision.utils')
tv.utils.make_grid = None
tv.models = types.ModuleType('torchvision.models')
tv.models.__path__ = []
_vgg = types.ModuleType('torchvision.models.vgg')
tv.models.vgg = _vgg
for k, m in [('torchvision', tv), ('torchvision.utils', tv.utils),
             ('torchvision.models', tv.models),
             ('torchvision.models.vgg', _vgg)]:
    sys.modules.setdefault(k, m)

from torch_dcn_stub import ModulatedDeformConvPackStub, mdc_functional

ops_pkg = types.ModuleType('basicsr.models.ops')
dcn_mod = types.ModuleType('basicsr.models.ops.dcn')
dcn_mod.ModulatedDeformConvPack = ModulatedDeformConvPackStub
dcn_mod.modulated_deform_conv = mdc_functional
sys.modules.setdefault('basicsr.models.ops', ops_pkg)
sys.modules.setdefault('basicsr.models.ops.dcn', dcn_mod)

from basicsr.models.archs.edvr_arch import EDVR  # noqa: E402

torch.manual_seed(42)
cfg = dict(num_in_ch=3, num_out_ch=3, num_feat=64, num_frame=5,
           deformable_groups=8, num_extract_block=5,
           num_reconstruct_block=10, center_frame_idx=2, hr_in=False,
           with_predeblur=False, with_tsa=True)
net = EDVR(**cfg)
with torch.no_grad():
    for name, mod in net.named_modules():
        if name.endswith('conv_offset'):
            mod.weight.normal_(0, 0.01)
            mod.bias.normal_(0, 0.5)
net.eval()
x = torch.rand(1, 5, 3, 96, 160)
with torch.no_grad():
    y = net(x)
state = {k: v.numpy() for k, v in net.state_dict().items()}
np.savez_compressed(
    os.path.join(OUT, 'arch_edvr_m_full.npz'),
    __input__=x.numpy(), __output__=y.numpy(),
    __config__=np.frombuffer(json.dumps(dict(type='EDVR', **cfg)).encode(),
                             dtype=np.uint8),
    **state)
print('EDVR-M full golden:', x.shape, '->', y.shape,
      f'{len(state)} tensors')
