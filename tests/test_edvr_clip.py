"""Clip-mode EDVR evaluation must match the per-window forward.

The clip path (edvr_tpu/archs/edvr_arch.py::make_clip_restore_fn)
batches sliding windows through one scanned dispatch in either of two
formulations — 'window' (raw-frame windows through the standard
forward, the shipped default) or 'pyramid' (clip pyramid extracted
once, feature windows gathered per step); the reference protocol
evaluates one window per output frame (reference:
basicsr/models/archs/edvr_arch.py:376-388 is recomputed per window).
All must produce the same frames.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edvr_tpu.archs.edvr_arch import (EDVR, clip_window_indices,
                                      make_clip_restore_fn)


def _build(num_frame=5, **kw):
    model = EDVR(num_feat=8, num_frame=num_frame, deformable_groups=2,
                 num_extract_block=1, num_reconstruct_block=1, **kw)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, num_frame, 16, 16, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)
    return model, params


@pytest.mark.parametrize('padding', ['reflection_circle', 'replicate'])
@pytest.mark.parametrize('win_batch', [1, 4])
@pytest.mark.parametrize('mode', ['window', 'pyramid'])
def test_clip_matches_window_forward(padding, win_batch, mode):
    T, t = 7, 5
    model, params = _build(num_frame=t)
    rng = np.random.RandomState(1)
    clip = jnp.asarray(rng.rand(T, 16, 16, 3), jnp.float32)

    idx = clip_window_indices(T, t, padding)
    assert idx.shape == (T, t)
    # the output frame always sits at the window center
    np.testing.assert_array_equal(idx[:, t // 2], np.arange(T))

    clip_fn = make_clip_restore_fn(model, win_batch=win_batch, mode=mode)
    got = np.asarray(clip_fn(params, clip, jnp.asarray(idx)))
    assert got.shape == (T, 64, 64, 3)

    fwd = jax.jit(model.apply)
    for i in range(T):
        window = clip[idx[i]][None]  # (1, t, h, w, c)
        want = np.asarray(fwd(params, window))[0]
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-5,
                                   err_msg=f'frame {i}')


def test_clip_window_indices_border_protocol():
    # reflection_circle at the clip head matches the reference's
    # generate_frame_indices (reference: data_util.py:35-88)
    idx = clip_window_indices(100, 5, 'reflection_circle')
    np.testing.assert_array_equal(idx[0], [4, 3, 0, 1, 2])
    np.testing.assert_array_equal(idx[1], [4, 0, 1, 2, 3])
    np.testing.assert_array_equal(idx[50], [48, 49, 50, 51, 52])
    np.testing.assert_array_equal(idx[99], [97, 98, 99, 96, 95])


def test_clip_matches_window_forward_predeblur_hr_in():
    # the EDVR-L deblur configs (predeblur + hr_in) route x_center and
    # the pyramid through different resolutions; clip mode must agree
    T, t = 6, 5
    model, params = _build(num_frame=t, with_predeblur=True, hr_in=True)
    rng = np.random.RandomState(3)
    clip = jnp.asarray(rng.rand(T, 32, 32, 3), jnp.float32)
    idx = clip_window_indices(T, t, 'replicate')
    # pyramid mode pinned: restore_windows routes x_center and features
    # through different resolutions here — the trickier formulation
    got = np.asarray(make_clip_restore_fn(model, 3, mode='pyramid')(
        params, clip, jnp.asarray(idx)))
    fwd = jax.jit(model.apply)
    for i in range(T):
        want = np.asarray(fwd(params, clip[idx[i]][None]))[0]
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-5)


def test_clip_matches_window_forward_no_tsa():
    T, t = 6, 5
    model, params = _build(num_frame=t, with_tsa=False)
    rng = np.random.RandomState(2)
    clip = jnp.asarray(rng.rand(T, 16, 16, 3), jnp.float32)
    idx = clip_window_indices(T, t, 'reflection_circle')
    got = np.asarray(make_clip_restore_fn(model, 4)(params, clip,
                                                    jnp.asarray(idx)))
    fwd = jax.jit(model.apply)
    for i in range(T):
        want = np.asarray(fwd(params, clip[idx[i]][None]))[0]
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-5)
