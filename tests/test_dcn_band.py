"""Banded one-hot DCN kernel (edvr_tpu/ops/dcn_band.py), full-path.

EDVR_TPU_DCN_BAND_INTERPRET=1 routes modulated_deform_conv through the
banded Pallas kernel in interpret mode on CPU, so these tests compare
the COMPLETE band path (in-kernel coefficients, one-hot select,
outlier patch, analytic coordinate-gradient backward) against the
gather path, which is itself golden-tested against the reference CUDA
oracle (tests/test_dcn.py). TPU-side parity/perf runs live in
scripts/dev/test_dcn_band.py.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edvr_tpu.ops import dcn


def _case(seed, n=1, h=32, w=64, cin=16, cout=16, dg=2, big_frac=0.0):
    rng = np.random.RandomState(seed)
    K = 9
    x = rng.randn(n, h, w, cin).astype(np.float32)
    off = rng.uniform(-2, 2, size=(n, h, w, dg * 2 * K)).astype(
        np.float32)
    if big_frac:
        big = rng.rand(*off.shape) < big_frac
        off = np.where(big, rng.uniform(10, 25, size=off.shape) *
                       rng.choice([-1, 1], size=off.shape),
                       off).astype(np.float32)
    mask = (1 / (1 + np.exp(-rng.randn(n, h, w, dg * K)))).astype(
        np.float32)
    weight = (rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (x, off, mask, weight))


def _run(case, band, grad=False):
    env = {'EDVR_TPU_DCN_BAND': '1' if band else '0',
           'EDVR_TPU_DCN_BAND_INTERPRET': '1',
           'EDVR_TPU_DCN_BAND_MIN_P': '1024'}
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        dgr = case[2].shape[-1] // 9

        def f(x, off, mask, weight):
            out = dcn.modulated_deform_conv(
                x, off, mask, weight, None, stride=1, padding=1,
                dilation=1, groups=1, deformable_groups=dgr)
            return jnp.sum(out * jnp.cos(out * 3)) if grad else out

        if grad:
            return jax.grad(f, argnums=(0, 1, 2, 3))(*case)
        return (f(*case),)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@pytest.mark.parametrize('seed,big_frac', [(0, 0.0), (1, 0.01),
                                           (2, 0.4)])
def test_band_forward_matches_gather(seed, big_frac):
    from edvr_tpu.ops import dcn_band
    case = _case(seed, big_frac=big_frac)
    (ref,) = _run(case, band=False)
    (got,) = _run(case, band=True)
    # the band kernel must actually have been engaged (a silent
    # fallback to the gather path once made this whole file vacuous)
    assert dcn_band.TRACE_COUNTS['fwd'] > 0
    scale = float(jnp.abs(ref).max()) + 1e-8
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-6)


@pytest.mark.parametrize('seed,big_frac', [(3, 0.0), (4, 0.02)])
def test_band_grads_match_gather(seed, big_frac):
    from edvr_tpu.ops import dcn_band
    case = _case(seed, big_frac=big_frac)
    refs = _run(case, band=False, grad=True)
    gots = _run(case, band=True, grad=True)
    assert dcn_band.TRACE_COUNTS['bwd'] > 0
    for name, a, b in zip(['dx', 'doffset', 'dmask', 'dweight'], refs,
                          gots):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-5,
                                   err_msg=name)


def test_band_matches_gather_at_edvr_l3_geometry():
    """The EDVR L3 level (45x80, dg=8, 64 feat) is the one PCD shape
    still below the default MIN_P policy gate; exactness at this
    geometry (non-multiple-of-band out_h, out_w between bw and 2*bw)
    must hold so the gate can admit it when measurement says so."""
    from edvr_tpu.ops import dcn_band
    case = _case(7, n=1, h=45, w=80, cin=64, cout=64, dg=8,
                 big_frac=0.01)
    (ref,) = _run(case, band=False)
    before = dcn_band.TRACE_COUNTS['fwd']
    (got,) = _run(case, band=True)
    assert dcn_band.TRACE_COUNTS['fwd'] > before
    scale = float(jnp.abs(ref).max()) + 1e-8
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-6)


def test_flagship_dispatch_band_paths():
    """At the flagship EDVR-M inference shape, the DEFAULT dispatch
    policy must route exactly the measured-optimal set of PCD levels
    through the band kernel: L1 (x2: PCD + cascade) and L2 banded,
    L3 on the gather path (measured FASTER there, 0.4 vs 3.7 ms —
    docs/TPUDesign.md "Measured dispatch policy"). Traced (not
    executed) via eval_shape, so it pins the policy, not the math;
    dcn.DISPATCH_COUNTS makes every dispatch DECISION observable —
    dcn_band.TRACE_COUNTS cannot serve here, since jit caching hides
    repeat geometries (a silent fallback once made a whole parity
    file vacuous)."""
    from edvr_tpu.archs.edvr_arch import EDVR

    env = {'EDVR_TPU_DCN_BAND': '1', 'EDVR_TPU_DCN_BAND_INTERPRET': '1'}
    saved = {k: os.environ.get(k) for k in env}
    saved['EDVR_TPU_DCN_BAND_MIN_P'] = os.environ.pop(
        'EDVR_TPU_DCN_BAND_MIN_P', None)   # the DEFAULT policy
    os.environ.update(env)
    try:
        net = EDVR(num_in_ch=3, num_out_ch=3, num_feat=64, num_frame=5,
                   deformable_groups=8, num_extract_block=5,
                   num_reconstruct_block=10, center_frame_idx=2,
                   with_tsa=True)
        x = jnp.zeros((1, 5, 180, 320, 3))
        before = dict(dcn.DISPATCH_COUNTS)
        jax.eval_shape(net.init, jax.random.PRNGKey(0), x)
        banded = dcn.DISPATCH_COUNTS['band'] - before['band']
        gathered = dcn.DISPATCH_COUNTS['gather'] - before['gather']
        # 4 DCN calls per forward: L2, L1, cascade-L1 banded; L3
        # (45x80) stays on the gather path by the measured policy
        assert (banded, gathered) == (3, 1), (banded, gathered)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_band_gate_excludes_small_problems():
    # without the MIN_P override a 32x64 problem stays on the gather
    # path (no Pallas call on CPU); just probe it doesn't crash
    case = _case(5)
    prev = os.environ.pop('EDVR_TPU_DCN_BAND_INTERPRET', None)
    try:
        out = dcn.modulated_deform_conv(
            *case[:3], case[3], None, stride=1, padding=1, dilation=1,
            groups=1, deformable_groups=2)
        assert out.shape == (1, 32, 64, 16)
    finally:
        if prev is not None:
            os.environ['EDVR_TPU_DCN_BAND_INTERPRET'] = prev
