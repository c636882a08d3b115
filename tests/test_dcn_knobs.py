"""Guard tests for the DCN env-knob surface (docs/TPUDesign.md "DCN
env-knob reference").

The hot path reads 9+ switches; these tests pin the documented
precedence rules and make the one genuinely dangerous combination —
EDVR_TPU_DCN_QUANT under training — fail loudly instead of silently
freezing offset learning (jnp.round has zero gradient)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edvr_tpu.ops import dcn


def _tiny_case(seed=0, h=16, w=16, cin=8, cout=8, dg=2):
    rng = np.random.RandomState(seed)
    K = 9
    x = rng.randn(1, h, w, cin).astype(np.float32)
    off = rng.uniform(-2, 2, size=(1, h, w, dg * 2 * K)).astype(np.float32)
    mask = (1 / (1 + np.exp(-rng.randn(1, h, w, dg * K)))).astype(
        np.float32)
    weight = (rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (x, off, mask, weight))


def _mdcn(case, dg=2):
    x, off, mask, weight = case
    return dcn.modulated_deform_conv(x, off, mask, weight, None,
                                     stride=1, padding=1, dilation=1,
                                     groups=1, deformable_groups=dg)


def _train_opt():
    return {
        'name': 'knob_guard', 'model_type': 'EDVRModel', 'scale': 4,
        'num_gpu': 1, 'manual_seed': 0, 'is_train': True, 'dist': False,
        'rank': 0, 'world_size': 1,
        'network_g': dict(type='EDVR', num_in_ch=3, num_out_ch=3,
                          num_feat=8, num_frame=5, deformable_groups=2,
                          num_extract_block=1, num_reconstruct_block=1,
                          center_frame_idx=None, hr_in=False,
                          with_predeblur=False, with_tsa=True),
        'path': dict(pretrain_network_g=None, strict_load_g=False,
                     resume_state=None),
        'train': dict(
            optim_g=dict(type='Adam', lr=1e-4, weight_decay=0,
                         betas=[0.9, 0.99]),
            scheduler=dict(type='MultiStepLR', milestones=[100],
                           gamma=0.5),
            total_iter=10, warmup_iter=-1, tsa_iter=0, dcn_lr_mul=1,
            pixel_opt=dict(type='CharbonnierLoss', loss_weight=1.0,
                           reduction='mean')),
        'val': None,
        'logger': dict(print_freq=10**9, save_checkpoint_freq=10**9,
                       use_tb_logger=False),
    }


def test_quant_is_refused_for_training(monkeypatch):
    """EDVR_TPU_DCN_QUANT + a training EDVR engine must raise — the
    knob routes sample positions through jnp.round (zero gradient), so
    a run with it exported would train with frozen alignment."""
    from edvr_tpu.models import create_model
    monkeypatch.setenv('EDVR_TPU_DCN_QUANT', 'half')
    with pytest.raises(RuntimeError, match='inference-only'):
        create_model(_train_opt())


def test_quant_still_allowed_for_inference(monkeypatch):
    """Same knob in a test-mode engine builds fine (the measured
    inference trade study needs it)."""
    from edvr_tpu.models import create_model
    monkeypatch.setenv('EDVR_TPU_DCN_QUANT', 'half')
    opt = _train_opt()
    opt['is_train'] = False
    opt.pop('train')
    model = create_model(opt)
    assert model is not None


def test_quant_actually_snaps_positions(monkeypatch):
    """'int' quantization must equal computing the op on pre-rounded
    offsets (the knob's documented semantics)."""
    case = _tiny_case()
    monkeypatch.delenv('EDVR_TPU_DCN_QUANT', raising=False)
    x, off, mask, weight = case
    # integer base taps mean rounding offsets == rounding positions
    want = _mdcn((x, jnp.round(off), mask, weight))
    monkeypatch.setenv('EDVR_TPU_DCN_QUANT', 'int')
    got = _mdcn(case)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_pallas_takes_precedence_over_band(monkeypatch):
    """EDVR_TPU_DCN_PALLAS=1 + EDVR_TPU_DCN_BAND=1: the pallas blend
    path must win and the band kernel must NOT trace (the documented
    precedence; both in interpret mode for this CPU suite)."""
    from edvr_tpu.ops import dcn_band, dcn_pallas
    monkeypatch.setenv('EDVR_TPU_DCN_PALLAS', '1')
    monkeypatch.setenv('EDVR_TPU_DCN_PALLAS_INTERPRET', '1')
    monkeypatch.setenv('EDVR_TPU_DCN_BAND', '1')
    monkeypatch.setenv('EDVR_TPU_DCN_BAND_INTERPRET', '1')
    monkeypatch.setenv('EDVR_TPU_DCN_BAND_MIN_P', '1')
    band_before = dcn_band.TRACE_COUNTS['fwd']
    blend_before = dcn_pallas.TRACE_COUNTS['blend']
    _mdcn(_tiny_case()).block_until_ready()
    assert dcn_pallas.TRACE_COUNTS['blend'] > blend_before, \
        'pallas blend path did not run'
    assert dcn_band.TRACE_COUNTS['fwd'] == band_before, \
        'band kernel traced despite EDVR_TPU_DCN_PALLAS precedence'


def test_band_dispatch_respects_min_p(monkeypatch):
    """P below EDVR_TPU_DCN_BAND_MIN_P must dispatch to the gather
    path (the measured dispatch policy)."""
    from edvr_tpu.ops import dcn_band
    monkeypatch.delenv('EDVR_TPU_DCN_PALLAS', raising=False)
    monkeypatch.setenv('EDVR_TPU_DCN_BAND', '1')
    monkeypatch.setenv('EDVR_TPU_DCN_BAND_INTERPRET', '1')
    monkeypatch.setenv('EDVR_TPU_DCN_BAND_MIN_P', '100000')
    band_before = dcn_band.TRACE_COUNTS['fwd']
    gather_before = dcn.DISPATCH_COUNTS['gather']
    _mdcn(_tiny_case()).block_until_ready()
    assert dcn_band.TRACE_COUNTS['fwd'] == band_before
    assert dcn.DISPATCH_COUNTS['gather'] > gather_before


def test_quant_rejects_unknown_value(monkeypatch):
    monkeypatch.setenv('EDVR_TPU_DCN_QUANT', 'eighth')
    with pytest.raises(KeyError):
        _mdcn(_tiny_case())
