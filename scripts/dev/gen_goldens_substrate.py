"""Generate golden fixtures for substrate parity tests.

Runs the *reference* implementation (expected at /root/reference) on
deterministic inputs and stores the outputs as npz fixtures under
tests/data/golden/. The fixtures are committed; tests never import the
reference. Re-run only if fixtures need regeneration.

Usage: python scripts/dev/gen_goldens_substrate.py
"""

import os
import sys

import numpy as np

REF = os.environ.get('REFERENCE_PATH', '/root/reference')
OUT = os.path.join(os.path.dirname(__file__), '..', '..', 'tests', 'data',
                   'golden')
os.makedirs(OUT, exist_ok=True)
sys.path.insert(0, REF)

# the reference imports torchvision at module level; stub it (unused here)
import types  # noqa: E402
tv = types.ModuleType('torchvision')
tv.utils = types.ModuleType('torchvision.utils')
tv.utils.make_grid = None
sys.modules.setdefault('torchvision', tv)
sys.modules.setdefault('torchvision.utils', tv.utils)

from basicsr.metrics.psnr_ssim import calculate_psnr, calculate_ssim  # noqa
from basicsr.utils.matlab_functions import (bgr2ycbcr, imresize, rgb2ycbcr,  # noqa
                                            ycbcr2bgr, ycbcr2rgb)

rng = np.random.RandomState(0)

# --- imresize goldens -------------------------------------------------------
img_u8 = rng.randint(0, 256, (36, 52, 3), dtype=np.uint8)
img_f = img_u8.astype(np.float32) / 255.
res = {}
for name, scale in [('down4', 0.25), ('up4', 4.0), ('down3', 1 / 3),
                    ('down2_noaa', 0.5)]:
    antialias = not name.endswith('noaa')
    res[f'imresize_{name}'] = imresize(img_f, scale, antialias)
res['imresize_input'] = img_f

# --- color conversions ------------------------------------------------------
res['ycbcr_input_u8'] = img_u8
res['rgb2ycbcr_u8'] = rgb2ycbcr(img_u8)
res['rgb2ycbcr_f32'] = rgb2ycbcr(img_f)
res['rgb2ycbcr_y_f32'] = rgb2ycbcr(img_f, y_only=True)
res['bgr2ycbcr_y_f32'] = bgr2ycbcr(img_f, y_only=True)
res['ycbcr2rgb_f32'] = ycbcr2rgb(res['rgb2ycbcr_f32'])
res['ycbcr2bgr_f32'] = ycbcr2bgr(res['rgb2ycbcr_f32'])

# --- psnr/ssim goldens ------------------------------------------------------
a = rng.randint(0, 256, (64, 72, 3), dtype=np.uint8)
noise = rng.randint(-12, 13, a.shape)
b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
res['metric_img1'] = a
res['metric_img2'] = b
vals = {}
for cb in (0, 4):
    for y in (False, True):
        key = f'cb{cb}_y{int(y)}'
        vals[f'psnr_{key}'] = calculate_psnr(a, b, cb, test_y_channel=y)
        vals[f'ssim_{key}'] = calculate_ssim(a, b, cb, test_y_channel=y)
for k, v in vals.items():
    res[k] = np.float64(v)

np.savez_compressed(os.path.join(OUT, 'substrate.npz'), **res)
print('wrote', os.path.join(OUT, 'substrate.npz'))
for k, v in vals.items():
    print(k, v)
