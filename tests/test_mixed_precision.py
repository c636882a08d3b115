"""Mixed-precision training (train.mixed_precision: bf16).

The engine keeps f32 master params and Adam state and casts params +
inputs to bf16 inside the loss, so activations (and their backward
re-reads, the HBM-bound bulk of the step — docs/TPUDesign.md
"Train-step decomposition") are half-width. bf16 keeps f32's exponent
range, so no loss scaling is involved; these tests pin the contract:
master state stays f32, the step tracks the f32 step closely, and the
band DCN kernels differentiate correctly under bf16 inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_dcn_band import _case, _run


def _opt(mp):
    opt = {
        'name': 'mp', 'model_type': 'SRModel', 'scale': 4,
        'num_gpu': 1, 'manual_seed': 0, 'is_train': True,
        'dist': False,
        'network_g': dict(type='MSRResNet', num_in_ch=3, num_out_ch=3,
                          num_feat=8, num_block=1, upscale=4),
        'path': {},
        'train': {
            'optim_g': dict(type='Adam', lr=1e-3, weight_decay=0,
                            betas=[0.9, 0.99]),
            'scheduler': dict(type='ConstantLR'),
            'total_iter': 10, 'warmup_iter': -1,
            'pixel_opt': dict(type='L1Loss', loss_weight=1.0,
                              reduction='mean'),
        },
    }
    if mp:
        opt['train']['mixed_precision'] = mp
    return opt


def test_mp_step_keeps_f32_master_and_tracks_f32_step():
    from edvr_tpu.models import create_model
    rng = np.random.RandomState(0)
    batch = {'lq': rng.rand(2, 16, 16, 3).astype(np.float32),
             'gt': rng.rand(2, 64, 64, 3).astype(np.float32)}

    results, losses = {}, {}
    for mp in (None, 'bf16'):
        model = create_model(_opt(mp))
        model.feed_data(batch)
        for it in (1, 2):
            model.optimize_parameters(it)
        losses[mp] = float(model.log_dict['l_pix'])
        results[mp] = jax.tree_util.tree_map(np.asarray, model.params_g)

    # master params (and therefore checkpoints) stay f32
    for leaf in jax.tree_util.tree_leaves(results['bf16']):
        assert leaf.dtype == np.float32
    assert np.isfinite(losses['bf16'])
    assert abs(losses['bf16'] - losses[None]) < 5e-3

    # per-step Adam update magnitude is <= ~lr, so two steps of a
    # bf16-vs-f32 sign flip bound the param divergence at ~4*lr
    for a, b in zip(jax.tree_util.tree_leaves(results[None]),
                    jax.tree_util.tree_leaves(results['bf16'])):
        np.testing.assert_allclose(b, a, atol=4.5e-3)


def test_mp_rejects_unknown_policy():
    from edvr_tpu.models import create_model
    with pytest.raises(NotImplementedError):
        create_model(_opt('fp16'))


def test_mp_rejected_by_gan_engines():
    """The GAN engines build their own G/D steps that do not implement
    the policy — a config setting it must fail loudly, not silently
    train in f32."""
    from edvr_tpu.models import create_model
    opt = _opt('bf16')
    opt['model_type'] = 'SRGANModel'
    with pytest.raises(NotImplementedError, match='mixed_precision'):
        create_model(opt)


def test_band_kernel_grads_under_bf16_inputs():
    """The band fwd+bwd kernels must differentiate correctly when the
    whole net runs in bf16 (mixed-precision training engages them at
    64px crops): bf16 inputs through the full band path vs the gather
    path fed the SAME bf16-rounded inputs (comparing against f32 inputs
    instead would confound the kernel with legitimate coordinate-
    gradient jumps where rounding moves an offset across an integer
    grid line — bilinear's position gradient is discontinuous there)."""
    from edvr_tpu.ops import dcn_band
    case_bf16 = tuple(a.astype(jnp.bfloat16) for a in _case(11))
    refs = _run(case_bf16, band=False, grad=True)
    # TRACE_COUNTS is cumulative across the whole pytest session, so
    # assert it INCREASED over this specific band run — an absolute
    # nonzero check is vacuous once test_dcn_band.py has already run
    bwd_before = dcn_band.TRACE_COUNTS['bwd']
    gots = _run(case_bf16, band=True, grad=True)
    assert dcn_band.TRACE_COUNTS['bwd'] > bwd_before, (
        'band backward kernel was not traced for the bf16 case — the '
        'path silently fell back to the gather implementation')
    for name, a, b in zip(['dx', 'doffset', 'dmask', 'dweight'], refs,
                          gots):
        a = np.asarray(a, dtype=np.float32)
        b = np.asarray(b, dtype=np.float32)
        assert np.isfinite(b).all(), name
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=4e-2,
                                   err_msg=name)
