"""Tests for the tap-shared alignment co-design variant
(WarpAlignPack / EDVR align_variant='tap_shared').

The variant is a TPU-first reformulation of the PCD alignment op
(one offset+mask per deformable group, bilinear group warp, dense
conv on the MXU) — not a reference component; its quality is gated on
the training harness (docs/TPUDesign.md "Alignment co-design").
These tests pin its math: start-as-plain-conv init (the DCNv2Pack
contract, reference deform_conv.py:377-381), warp direction
conventions, gradient flow, and the EDVR config plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edvr_tpu.archs import define_network
from edvr_tpu.archs.arch_util import WarpAlignPack


def _rand(shape, seed):
    return jnp.asarray(
        np.random.RandomState(seed).rand(*shape).astype(np.float32))


@pytest.fixture(scope='module')
def pack_and_params():
    m = WarpAlignPack(16, 3, padding=1, deformable_groups=4)
    x = _rand((2, 8, 8, 16), 0)
    feat = _rand((2, 8, 8, 16), 1)
    v = m.init(jax.random.PRNGKey(0), x, feat)
    return m, v, x, feat


def test_init_is_plain_conv_of_half_input(pack_and_params):
    """Zero-init conv_offset => identity warp, mask 0.5 => the module
    must reduce exactly to a dense conv of 0.5*x (the same
    start-as-plain-conv behavior DCNv2Pack inherits from the
    reference's zero-initialized conv_offset)."""
    m, v, x, feat = pack_and_params
    y = m.apply(v, x, feat)
    k = v['params']['conv']['conv']['kernel']
    b = v['params']['conv']['conv']['bias']
    want = jax.lax.conv_general_dilated(
        0.5 * x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               atol=1e-6)


def test_integer_shift_matches_rolled_input():
    """Force dx=+1 for every group (via the conv_offset bias) and
    mask->1: the warp must sample x at column j+1, i.e. the output
    equals the dense conv of x shifted LEFT by one column with zero
    fill — pins the (dx, dy) channel order and sign convention."""
    m = WarpAlignPack(8, 3, padding=1, deformable_groups=2)
    x = _rand((1, 6, 6, 8), 2)
    feat = jnp.zeros((1, 6, 6, 8))
    v = m.init(jax.random.PRNGKey(1), x, feat)
    dg = 2
    bias = np.zeros(3 * dg, np.float32)
    bias[dg:2 * dg] = 1.0     # dx = +1 (layout: [dy | dx | mask])
    bias[2 * dg:] = 100.0     # mask logit -> sigmoid ~ 1
    params = jax.tree_util.tree_map(lambda a: a, v['params'])
    params['conv_offset']['conv']['bias'] = jnp.asarray(bias)

    y = m.apply({'params': params}, x, feat)

    shifted = jnp.concatenate(
        [x[:, :, 1:], jnp.zeros_like(x[:, :, :1])], axis=2)
    k = params['conv']['conv']['kernel']
    b = params['conv']['conv']['bias']
    want = jax.lax.conv_general_dilated(
        shifted, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               atol=1e-5)


def test_warp_core_matches_flow_warp_oracle():
    """The module's K=1 modulated-deform-conv warp (identity 1x1
    weight) must equal the independent flow_warp implementation
    (ops/sampling.py) applied per group — two formulations of the same
    masked bilinear warp."""
    from edvr_tpu.ops.dcn import modulated_deform_conv
    from edvr_tpu.ops.sampling import flow_warp
    n, h, w, cin, dg = 2, 10, 12, 8, 2
    c_per = cin // dg
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    dy = jnp.asarray(rng.uniform(-3, 3, (n, h, w, dg)).astype(np.float32))
    dx = jnp.asarray(rng.uniform(-3, 3, (n, h, w, dg)).astype(np.float32))
    mask = jnp.asarray(rng.rand(n, h, w, dg).astype(np.float32))

    off1 = jnp.stack([dy, dx], axis=-1).reshape(n, h, w, dg * 2)
    eye = jnp.eye(cin, dtype=x.dtype).reshape(1, 1, cin, cin)
    got = modulated_deform_conv(x, off1, mask, eye, None, stride=1,
                                padding=0, dilation=1, groups=1,
                                deformable_groups=dg)

    xg = x.reshape(n, h, w, dg, c_per).transpose(0, 3, 1, 2, 4).reshape(
        n * dg, h, w, c_per)
    flow = jnp.stack([dx, dy], axis=-1).transpose(0, 3, 1, 2, 4).reshape(
        n * dg, h, w, 2)
    warped = flow_warp(xg, flow, interp_mode='bilinear',
                       padding_mode='zeros', align_corners=True)
    warped = warped.reshape(n, dg, h, w, c_per)
    warped = warped * mask.transpose(0, 3, 1, 2)[..., None]
    want = warped.transpose(0, 2, 3, 1, 4).reshape(n, h, w, cin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_warp_core_band_kernel_k1(monkeypatch):
    """On TPU the K=1 warp rides the banded Pallas kernels
    (1/9th of the K=9 selection work). Prove the band fwd+bwd handle
    K=1 exactly (interpret mode; conftest pins f32 matmul precision so
    band and gather paths quantize identically)."""
    from edvr_tpu.ops import dcn, dcn_band
    from edvr_tpu.ops.sampling import flow_warp
    monkeypatch.setenv('EDVR_TPU_DCN_BAND', '1')
    monkeypatch.setenv('EDVR_TPU_DCN_BAND_INTERPRET', '1')
    monkeypatch.setenv('EDVR_TPU_DCN_BAND_MIN_P', '1024')
    n, h, w, cin, dg = 1, 32, 64, 16, 2
    c_per = cin // dg
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    dy = jnp.asarray(rng.uniform(-3, 3, (n, h, w, dg)).astype(np.float32))
    dx = jnp.asarray(rng.uniform(-3, 3, (n, h, w, dg)).astype(np.float32))
    mask = jnp.asarray(rng.rand(n, h, w, dg).astype(np.float32))
    off1 = jnp.stack([dy, dx], axis=-1).reshape(n, h, w, dg * 2)
    eye = jnp.eye(cin, dtype=x.dtype).reshape(1, 1, cin, cin)

    fwd_before = dcn_band.TRACE_COUNTS['fwd']
    got = dcn.modulated_deform_conv(x, off1, mask, eye, None, stride=1,
                                    padding=0, dilation=1, groups=1,
                                    deformable_groups=dg)
    assert dcn_band.TRACE_COUNTS['fwd'] > fwd_before, \
        'K=1 case did not dispatch to the band kernel'

    xg = x.reshape(n, h, w, dg, c_per).transpose(0, 3, 1, 2, 4).reshape(
        n * dg, h, w, c_per)
    flow = jnp.stack([dx, dy], axis=-1).transpose(0, 3, 1, 2, 4).reshape(
        n * dg, h, w, 2)
    warped = flow_warp(xg, flow, interp_mode='bilinear',
                       padding_mode='zeros', align_corners=True)
    warped = warped.reshape(n, dg, h, w, c_per)
    warped = warped * mask.transpose(0, 3, 1, 2)[..., None]
    want = warped.transpose(0, 2, 3, 1, 4).reshape(n, h, w, cin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)

    # backward: band bwd kernel must trace and produce finite grads
    def f(x_, off_, m_):
        out = dcn.modulated_deform_conv(x_, off_, m_, eye, None, 1, 0,
                                        1, 1, dg)
        return jnp.sum(out * jnp.cos(out * 3))

    bwd_before = dcn_band.TRACE_COUNTS['bwd']
    g = jax.grad(f, argnums=(0, 1, 2))(x, off1, mask)
    assert dcn_band.TRACE_COUNTS['bwd'] > bwd_before
    assert all(bool(jnp.isfinite(a).all()) for a in g)


def test_offset_gradients_flow(pack_and_params):
    """The loss gradient must reach conv_offset (the warp is
    differentiable in the offsets) and the main conv."""
    m, v, x, feat = pack_and_params

    def loss(params):
        y = m.apply({'params': params}, x, feat)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(v['params'])
    g_off = g['conv_offset']['conv']['kernel']
    g_conv = g['conv']['conv']['kernel']
    assert float(jnp.abs(g_off).max()) > 0, 'no gradient to conv_offset'
    assert float(jnp.abs(g_conv).max()) > 0, 'no gradient to main conv'


def test_no_align_env_freezes_warp(pack_and_params, monkeypatch):
    """EDVR_TPU_PCD_NO_ALIGN=1 must freeze the warp at identity for
    the variant too (same ablation control as DCNv2Pack)."""
    m, v, x, feat = pack_and_params
    params = jax.tree_util.tree_map(lambda a: a, v['params'])
    # non-zero offsets via the bias; with the env set they are ignored
    bias = np.zeros(3 * 4, np.float32)
    bias[:8] = 1.7
    params['conv_offset']['conv']['bias'] = jnp.asarray(bias)
    moved = m.apply({'params': params}, x, feat)
    monkeypatch.setenv('EDVR_TPU_PCD_NO_ALIGN', '1')
    frozen = m.apply({'params': params}, x, feat)
    assert float(jnp.abs(moved - frozen).max()) > 1e-4
    k = params['conv']['conv']['kernel']
    b = params['conv']['conv']['bias']
    want = jax.lax.conv_general_dilated(
        0.5 * x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b
    np.testing.assert_allclose(np.asarray(frozen), np.asarray(want),
                               atol=1e-6)


EDVR_TINY = dict(type='EDVR', num_in_ch=3, num_out_ch=3, num_feat=16,
                 num_frame=5, deformable_groups=4, num_extract_block=1,
                 num_reconstruct_block=1, center_frame_idx=None,
                 hr_in=False, with_predeblur=False, with_tsa=True)


def test_edvr_variant_forward_and_grads():
    """EDVR(align_variant='tap_shared') builds, jits, produces x4
    output, and backprops into the alignment offsets of all 4 DCN
    sites (3 pyramid levels + cascade)."""
    net = define_network(dict(EDVR_TINY, align_variant='tap_shared'))
    x = _rand((1, 5, 16, 16, 3), 3)
    v = net.init(jax.random.PRNGKey(0), x)
    y = jax.jit(net.apply)(v, x)
    assert y.shape == (1, 64, 64, 3)

    def loss(params):
        return jnp.sum(net.apply({'params': params}, x) ** 2)

    g = jax.grad(loss)(v['params'])
    pcd = g['pcd_align']
    for site in ('dcn_pack_l1', 'dcn_pack_l2', 'dcn_pack_l3',
                 'cas_dcnpack'):
        gk = pcd[site]['conv_offset']['conv']['kernel']
        assert float(jnp.abs(gk).max()) > 0, f'no offset grad at {site}'


def test_edvr_variant_param_count_is_smaller():
    """The variant must actually shed the K=9 per-tap offset heads:
    conv_offset shrinks from dg*3*K to dg*3 channels at every site."""
    x = jnp.zeros((1, 5, 16, 16, 3))
    p_dcn = define_network(dict(EDVR_TINY)).init(
        jax.random.PRNGKey(0), x)['params']
    p_ts = define_network(dict(EDVR_TINY, align_variant='tap_shared')
                          ).init(jax.random.PRNGKey(0), x)['params']
    dg = EDVR_TINY['deformable_groups']
    k_dcn = p_dcn['pcd_align']['dcn_pack_l1']['conv_offset']['conv'][
        'kernel']
    k_ts = p_ts['pcd_align']['dcn_pack_l1']['conv_offset']['conv'][
        'kernel']
    assert k_dcn.shape[-1] == dg * 3 * 9
    assert k_ts.shape[-1] == dg * 3


def test_unknown_variant_raises():
    net = define_network(dict(EDVR_TINY, align_variant='nope'))
    with pytest.raises(KeyError):
        net.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)))


def test_tapshared_production_yml_builds_the_variant():
    """The committed co-design config
    (options/train/EDVR/train_EDVR_M_x4_SR_REDS_tapshared.yml) parses
    and its network_g block constructs the tap_shared EDVR — pins the
    YAML <-> arch contract so the generated file cannot drift from the
    arch surface."""
    import os.path as osp

    import yaml

    path = osp.join(osp.dirname(__file__), '..', 'options', 'train',
                    'EDVR', 'train_EDVR_M_x4_SR_REDS_tapshared.yml')
    opt = yaml.safe_load(open(path))
    net_opt = dict(opt['network_g'])
    net = define_network(net_opt)
    assert net.align_variant == 'tap_shared'
    assert opt['train']['mixed_precision'] == 'bf16'
    # shrink to test size and prove the constructed module runs
    net_opt.update(num_feat=16, num_extract_block=1,
                   num_reconstruct_block=1, deformable_groups=2)
    small = define_network(net_opt)
    v = small.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)))
    out = small.apply(v, _rand((1, 5, 16, 16, 3), 7))
    assert out.shape == (1, 64, 64, 3)
