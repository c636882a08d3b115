"""Official-checkpoint key remapping (edvr_tpu/convert/official.py).

Round-trip strategy: the golden fixtures store the reference's
BasicSR-named state dicts. For each family we translate those BasicSR
keys into the *official* third-party naming using the reference's own
rename rules (scripts/model_conversion/convert_models.py /
convert_stylegan.py elif chains, re-expressed here), then run our
inverse remapper and require that every original BasicSR key is
recovered exactly.
"""

import glob
import json
import os.path as osp
import re

import numpy as np
import pytest

from edvr_tpu.convert.official import (remap_dfdnet, remap_duf_16l,
                                       remap_edsr, remap_edvr,
                                       remap_esrgan, remap_rcan,
                                       remap_stylegan2_d,
                                       remap_stylegan2_g)

GOLDEN_DIR = osp.join(osp.dirname(__file__), 'data', 'golden')


def fixture_keys(name, prefix=''):
    path = osp.join(GOLDEN_DIR, f'arch_{name}.npz')
    if not osp.exists(path):
        pytest.skip(f'missing fixture {name}')
    data = np.load(path)
    cfg = json.loads(bytes(data['__config__']).decode())
    keys = [k[len(prefix):] for k in data.files
            if not k.startswith('__') and k.startswith(prefix)
            and not k.endswith('num_batches_tracked')]
    return keys, cfg


def roundtrip(keys, to_official, remap, **remap_kwargs):
    official = {}
    for k in keys:
        ok = to_official(k)
        assert ok is not None, f'no official name for {k}'
        assert ok not in official, f'collision at {ok}'
        official[ok] = k  # value = expected BasicSR key
    renamed, unmatched = remap(official, **remap_kwargs)
    assert not unmatched, f'remapper missed: {unmatched}'
    bad = [(got, want) for got, want in renamed.items() if got != want]
    assert not bad, f'wrong renames: {bad[:10]}'
    assert set(renamed) == set(keys)


# ---------------------------------------------------------------- EDVR

# inverse map lives in the package (used by the ModelZoo
# rehearsal to synthesize official .pth files); remap_edvr and
# edvr_to_official remain independent transcriptions of the
# reference mapping, so the roundtrip below cross-checks them
from edvr_tpu.convert.official import edvr_to_official  # noqa: E402


@pytest.mark.parametrize('fixture', ['edvr_m_full', 'edvr_tsa',
                                     'edvr_notsa', 'edvr_predeblur',
                                     'edvr_hrin'])
def test_edvr_official_roundtrip(fixture):
    keys, _ = fixture_keys(fixture)
    roundtrip(keys, edvr_to_official, remap_edvr)


# ---------------------------------------------------------------- EDSR

def edsr_to_official(num_block):
    def fn(k):
        if 'conv_first' in k:
            return k.replace('conv_first', 'head.0')
        if 'conv_after_body' in k:
            return k.replace('conv_after_body', f'body.{num_block}')
        if 'body' in k:
            return k.replace('conv1', 'body.0').replace('conv2', 'body.2')
        if 'upsample.0' in k:
            return k.replace('upsample.0', 'tail.0.0')
        if 'upsample.2' in k:
            return k.replace('upsample.2', 'tail.0.2')
        if 'upsample.1' in k or 'upsample.3' in k:  # x3 path uses idx 1
            return k.replace('upsample.', 'tail.0.')
        if 'conv_last' in k:
            return k.replace('conv_last', 'tail.1')
        return None
    return fn


@pytest.mark.parametrize('fixture', ['edsr_x2', 'edsr_x4'])
def test_edsr_official_roundtrip(fixture):
    keys, cfg = fixture_keys(fixture)
    nb = cfg['num_block']
    roundtrip(keys, edsr_to_official(nb), remap_edsr, num_block=nb)


# ---------------------------------------------------------------- RCAN

def rcan_to_official(num_group, num_block):
    def fn(k):
        if 'conv_first' in k:
            return k.replace('conv_first', 'head.0')
        if 'conv_after_body' in k:
            return k.replace('conv_after_body', f'body.{num_group}')
        if 'attention' in k:
            a, ai, b, bi, c, ci, d, di, e = k.split('.')
            return (f'body.{ai}.body.{bi}.body.{ci}.conv_du.'
                    f'{int(di) - 1}.{e}')
        if 'rcab' in k:
            a, ai, b, bi, c, ci, d = k.split('.')
            return f'body.{ai}.body.{bi}.body.{ci}.{d}'
        if 'upsample.0' in k:
            return k.replace('upsample.0', 'tail.0.0')
        if 'upsample.2' in k:
            return k.replace('upsample.2', 'tail.0.2')
        if 'conv_last' in k:
            return k.replace('conv_last', 'tail.1')
        if 'body' in k:
            return re.sub(r'body\.(\d+)\.conv\.',
                          rf'body.\1.body.{num_block}.', k)
        return None
    return fn


def test_rcan_official_roundtrip():
    keys, cfg = fixture_keys('rcan')
    roundtrip(keys, rcan_to_official(cfg['num_group'], cfg['num_block']),
              remap_rcan, num_group=cfg['num_group'],
              num_block=cfg['num_block'])


# -------------------------------------------------------------- ESRGAN

def esrgan_to_official(k):
    if 'rdb' in k:
        return k.replace('rdb', 'RDB').replace('body', 'RRDB_trunk')
    if 'conv_body' in k:
        return k.replace('conv_body', 'trunk_conv')
    if 'conv_up' in k:
        return k.replace('conv_up', 'upconv')
    if 'conv_hr' in k:
        return k.replace('conv_hr', 'HRconv')
    return k


def test_esrgan_official_roundtrip():
    keys, _ = fixture_keys('rrdbnet')
    roundtrip(keys, esrgan_to_official, remap_esrgan)


# ----------------------------------------------------------------- DUF

def duf_to_official(k):
    if 'conv3d1' in k:
        return k.replace('conv3d1', 'conv3d_1')
    if 'conv3d2' in k:
        return k.replace('conv3d2', 'conv3d_2')
    m = re.match(r'dense_block1\.dense_blocks\.(\d+)\.(\d+)\.(.*)', k)
    if m:
        block, pos, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        kind, off = {0: ('bn3d', 1), 2: ('conv3d', 1),
                     3: ('bn3d', 2), 5: ('conv3d', 2)}[pos]
        return f'dense_block_1.{kind}_{2 * block + off}.{rest}'
    m = re.match(r'dense_block2\.temporal_reduce(\d)\.(\d+)\.(.*)', k)
    if m:
        red, pos, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        kind, off = {0: ('bn3d', 1), 2: ('conv3d', 1),
                     3: ('bn3d', 2), 5: ('conv3d', 2)}[pos]
        return f'dense_block_2.{kind}_{2 * (red - 1) + off}.{rest}'
    if 'bn3d2' in k:
        return k.replace('bn3d2', 'bn3d_2')
    return k


def test_duf16_official_roundtrip():
    keys, cfg = fixture_keys('duf16')
    assert cfg['num_layer'] == 16
    roundtrip(keys, duf_to_official, remap_duf_16l)


def test_duf16_conv3d_r2_deinterleave():
    """Value-level check of the residual-head channel reorder.

    The official DUF (a TF port) emits residual channels in TF
    depth_to_space order — (dy, dx) position-major, color-fastest:
    row (dy*s+dx)*3 + c. Torch-style pixel_shuffle (what our DUF arch
    uses) expects color-major rows c*s^2 + dy*s + dx. The remap with
    scale set must reorder so that pixel_shuffle(reordered) ==
    depth_to_space(official) pixel for pixel.
    """
    s, h, w = 4, 3, 5
    rng = np.random.RandomState(7)
    official = rng.randn(3 * s * s, h, w).astype(np.float32)

    # TF depth_to_space on the official layout
    dts = official.reshape(s, s, 3, h, w).transpose(3, 0, 4, 1, 2)
    dts = dts.reshape(h * s, w * s, 3)

    state = {'conv3d_r2.weight': official,
             'conv3d_r2.bias': np.arange(3 * s * s, dtype=np.float32)}
    renamed, unmatched = remap_duf_16l(state, scale=s)
    assert not unmatched
    reordered = renamed['conv3d_r2.weight']

    # torch pixel_shuffle on the reordered layout
    ps = reordered.reshape(3, s, s, h, w).transpose(0, 3, 1, 4, 2)
    ps = ps.reshape(3, h * s, w * s).transpose(1, 2, 0)
    np.testing.assert_array_equal(ps, dts)

    # bias rows follow the same permutation
    bias = renamed['conv3d_r2.bias']
    expect = np.concatenate([np.arange(c, 3 * s * s, 3) for c in range(3)])
    np.testing.assert_array_equal(bias, expect.astype(np.float32))

    # without scale (key-only round trips) values pass through untouched
    renamed2, _ = remap_duf_16l(dict(state))
    np.testing.assert_array_equal(renamed2['conv3d_r2.weight'], official)


# ------------------------------------------------------------ StyleGAN2

def sg2_g_to_official(k):
    """convert_stylegan.py:11-37 elif chain (needs no shapes: the
    noise-injection weight is exactly style_conv*[.N].weight)."""
    if 'style_mlp' in k:
        return k.replace('style_mlp', 'style')
    if 'constant_input.weight' in k:
        return k.replace('constant_input.weight', 'input.input')
    if 'style_conv1.modulated_conv' in k:
        return k.replace('style_conv1.modulated_conv', 'conv1.conv')
    if 'style_conv1' in k:
        if re.fullmatch(r'style_conv1\.weight', k):
            return k.replace('style_conv1', 'conv1.noise')
        return k.replace('style_conv1', 'conv1')
    if 'style_convs' in k:
        ok = k.replace('style_convs', 'convs').replace(
            'modulated_conv', 'conv')
        if re.fullmatch(r'convs\.\d+\.weight', ok):
            ok = ok.replace('.weight', '.noise.weight')
        return ok
    if 'to_rgb1.modulated_conv' in k:
        return k.replace('to_rgb1.modulated_conv', 'to_rgb1.conv')
    if 'to_rgbs' in k:
        return k.replace('modulated_conv', 'conv')
    if 'noises' in k:
        return k.replace('.noise', '.noise_')
    return k


def test_stylegan2_g_official_roundtrip():
    keys, _ = fixture_keys('stylegan2_g', prefix='g.')
    assert keys, 'expected g.-prefixed keys in fixture'
    roundtrip(keys, sg2_g_to_official, remap_stylegan2_g)


def test_stylegan2_d_official_roundtrip():
    keys, _ = fixture_keys('stylegan2_d', prefix='d.')
    if not keys:
        keys, _ = fixture_keys('stylegan2_d')
    roundtrip(keys,
              lambda k: k.replace('conv_body', 'convs'),
              remap_stylegan2_d)


# -------------------------------------------------------------- DFDNet

def test_dfdnet_official_spot_renames():
    from edvr_tpu.archs.vgg_arch import NAMES
    names = NAMES['vgg19']
    official = {
        'VggExtract.RGB_mean': 1,
        'VggExtract.model.features.0.weight': 2,
        'VggExtract.model.features.2.bias': 3,
        'le.0.weight': 4,
        'mo.1.bias': 5,
        'MSDilate.conv1.0.weight': 6,
        'MSDilate.convi.weight': 7,
        'up1.ScaleModel1.0.weight': 8,
        'up2.ShiftModel1.0.weight': 9,
        'up4.Model.0.weight': 10,
        'up3.0.weight': 11,
    }
    renamed, unmatched = remap_dfdnet(official, vgg_names=names)
    assert not unmatched
    assert renamed == {
        'vgg_extractor.mean': 1,
        f'vgg_extractor.vgg_net.{names[0]}.weight': 2,
        f'vgg_extractor.vgg_net.{names[2]}.bias': 3,
        'attn_blocks.left_eye.0.weight': 4,
        'attn_blocks.mouth.1.bias': 5,
        'multi_scale_dilation.conv_blocks.0.0.weight': 6,
        'multi_scale_dilation.conv_fusion.weight': 7,
        'upsample1.scale_block.0.weight': 8,
        'upsample2.shift_block.0.weight': 9,
        'upsample4.body.0.weight': 10,
        'upsample3.0.weight': 11,
    }
