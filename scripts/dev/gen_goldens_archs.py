"""Generate arch-parity golden fixtures from the reference (torch) archs.

For each arch: build the reference module with a tiny config, run a
fixed random input, and store {state_dict, input, output, config} in
tests/data/golden/arch_<name>.npz. EDVR uses a pure-torch DCN stand-in
(torch_dcn_stub.py) which is first verified against the JAX op.

Usage: python scripts/dev/gen_goldens_archs.py
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
os.makedirs(OUT, exist_ok=True)
sys.path.insert(0, HERE)
sys.path.insert(0, REF)

# ---- stub torchvision + the dcn extension before importing reference ----
tv = types.ModuleType('torchvision')
tv.__path__ = []
tv.utils = types.ModuleType('torchvision.utils')
tv.utils.make_grid = None
tv.models = types.ModuleType('torchvision.models')
tv.models.__path__ = []
_vgg = types.ModuleType('torchvision.models.vgg')
tv.models.vgg = _vgg
sys.modules.setdefault('torchvision', tv)
sys.modules.setdefault('torchvision.utils', tv.utils)
sys.modules.setdefault('torchvision.models', tv.models)
sys.modules.setdefault('torchvision.models.vgg', _vgg)

from torch_dcn_stub import (ModulatedDeformConvPackStub, mdc_functional,
                            modulated_deform_conv_torch)

ops_pkg = types.ModuleType('basicsr.models.ops')
dcn_mod = types.ModuleType('basicsr.models.ops.dcn')
dcn_mod.ModulatedDeformConvPack = ModulatedDeformConvPackStub
dcn_mod.modulated_deform_conv = mdc_functional
dcn_mod.DCNv2 = ModulatedDeformConvPackStub
sys.modules['basicsr.models.ops'] = ops_pkg
sys.modules['basicsr.models.ops.dcn'] = dcn_mod

# ---- verify the torch DCN stand-in against the JAX op ----------------------
sys.path.insert(0, REPO)
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'float32')
import jax.numpy as jnp  # noqa: E402
from edvr_tpu.ops import modulated_deform_conv as mdc_jax  # noqa: E402

rng = np.random.RandomState(0)
n, h, w, cin, cout, dg, K = 2, 6, 5, 4, 6, 2, 9
x = rng.randn(n, h, w, cin).astype(np.float32)
off = (rng.randn(n, h, w, dg * 2 * K) * 2).astype(np.float32)
m = rng.rand(n, h, w, dg * K).astype(np.float32)
wt = rng.randn(3, 3, cin, cout).astype(np.float32)
b = rng.randn(cout).astype(np.float32)
out_jax = np.asarray(mdc_jax(jnp.asarray(x), jnp.asarray(off),
                             jnp.asarray(m), jnp.asarray(wt),
                             jnp.asarray(b), 1, 1, 1, 1, dg))
out_torch = modulated_deform_conv_torch(
    torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
    torch.from_numpy(np.moveaxis(off, -1, 1).copy()),
    torch.from_numpy(np.moveaxis(m, -1, 1).copy()),
    torch.from_numpy(wt.transpose(3, 2, 0, 1).copy()),
    torch.from_numpy(b), 1, 1, 1, 1, dg).numpy()
err = np.abs(np.moveaxis(out_torch, 1, -1) - out_jax).max()
assert err < 1e-4, f'torch DCN stub disagrees with JAX op: {err}'
print(f'torch DCN stub vs JAX op: max abs err {err:.2e} OK')

# ---- reference archs --------------------------------------------------------
from basicsr.models.archs.edvr_arch import EDVR  # noqa: E402
from basicsr.models.archs.edsr_arch import EDSR  # noqa: E402
from basicsr.models.archs.rrdbnet_arch import RRDBNet  # noqa: E402
from basicsr.models.archs.srresnet_arch import MSRResNet  # noqa: E402

torch.manual_seed(0)


def dump(name, net, x, config):
    net.eval()
    with torch.no_grad():
        y = net(x)
    state = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(
        os.path.join(OUT, f'arch_{name}.npz'),
        __input__=x.numpy(), __output__=y.numpy(),
        __config__=np.frombuffer(json.dumps(config).encode(), dtype=np.uint8),
        **state)
    print(f'{name}: in {tuple(x.shape)} out {tuple(y.shape)} '
          f'({len(state)} tensors)')


for upscale in (2, 3, 4):
    cfg = dict(num_in_ch=3, num_out_ch=3, num_feat=12, num_block=2,
               upscale=upscale)
    net = MSRResNet(**cfg)
    dump(f'msrresnet_x{upscale}', net,
         torch.rand(1, 3, 12, 10), dict(type='MSRResNet', **cfg))

for upscale in (2, 3, 4):
    cfg = dict(num_in_ch=3, num_out_ch=3, num_feat=12, num_block=2,
               upscale=upscale)
    net = EDSR(**cfg)
    dump(f'edsr_x{upscale}', net, torch.rand(1, 3, 12, 10),
         dict(type='EDSR', **cfg))

cfg = dict(num_in_ch=3, num_out_ch=3, num_feat=12, num_block=2,
           num_grow_ch=8)
dump('rrdbnet', RRDBNet(**cfg), torch.rand(1, 3, 12, 10),
     dict(type='RRDBNet', **cfg))

edvr_variants = {
    'edvr_tsa': dict(num_feat=16, num_frame=5, deformable_groups=2,
                     num_extract_block=2, num_reconstruct_block=2,
                     center_frame_idx=2, hr_in=False, with_predeblur=False,
                     with_tsa=True),
    'edvr_notsa': dict(num_feat=16, num_frame=5, deformable_groups=2,
                       num_extract_block=2, num_reconstruct_block=2,
                       center_frame_idx=2, hr_in=False, with_predeblur=False,
                       with_tsa=False),
    'edvr_predeblur': dict(num_feat=16, num_frame=5, deformable_groups=2,
                           num_extract_block=2, num_reconstruct_block=2,
                           center_frame_idx=2, hr_in=False,
                           with_predeblur=True, with_tsa=True),
    'edvr_hrin': dict(num_feat=16, num_frame=5, deformable_groups=2,
                      num_extract_block=2, num_reconstruct_block=2,
                      center_frame_idx=2, hr_in=True, with_predeblur=True,
                      with_tsa=True),
}
for name, cfg in edvr_variants.items():
    full = dict(num_in_ch=3, num_out_ch=3, **cfg)
    net = EDVR(**full)
    # nonzero offsets: the Pack convs are zero-init, so perturb them to
    # exercise the deformable sampling path
    with torch.no_grad():
        for mod_name, mod in net.named_modules():
            if mod_name.endswith('conv_offset'):
                mod.weight.normal_(0, 0.02)
                mod.bias.normal_(0, 0.3)
    size = 32 if cfg['hr_in'] else 16
    x = torch.rand(1, 5, 3, size, size)
    dump(name, net, x, dict(type='EDVR', **full))
print('done')

# ---- round 2: RCAN / SpyNet / TOF / DUF -------------------------------------
from basicsr.models.archs.rcan_arch import RCAN  # noqa: E402
from basicsr.models.archs.spynet_arch import SpyNet  # noqa: E402
from basicsr.models.archs.tof_arch import TOFlow  # noqa: E402
from basicsr.models.archs.duf_arch import DUF  # noqa: E402

cfg = dict(num_in_ch=3, num_out_ch=3, num_feat=16, num_group=2, num_block=2,
           squeeze_factor=4, upscale=4)
dump('rcan', RCAN(**cfg), torch.rand(1, 3, 12, 10), dict(type='RCAN', **cfg))


class SpyNetPair(torch.nn.Module):
    """Wrap SpyNet's two-arg forward into one stacked input for dump()."""

    def __init__(self):
        super().__init__()
        self.net = SpyNet()
        # random weights (default init is uniform already); randomize BN-free
        for p in self.net.parameters():
            p.data.normal_(0, 0.05)

    def forward(self, x):
        return self.net(x[:, 0], x[:, 1])


sp = SpyNetPair()
dump('spynet', sp, torch.rand(1, 2, 3, 36, 44),
     dict(type='SpyNet'))

tof = TOFlow(adapt_official_weights=False)
tof.eval()
with torch.no_grad():
    for name, p in tof.named_parameters():
        p.data.normal_(0, 0.05)
    # keep BN stats nontrivial
    for m in tof.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
dump('toflow', tof, torch.rand(1, 7, 3, 32, 32), dict(type='TOFlow'))

duf = DUF(scale=4, num_layer=16, adapt_official_weights=False)
duf.eval()
with torch.no_grad():
    for m in duf.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
dump('duf16', duf, torch.rand(1, 7, 3, 12, 12),
     dict(type='DUF', scale=4, num_layer=16, adapt_official_weights=False))
print('round 2 done')
