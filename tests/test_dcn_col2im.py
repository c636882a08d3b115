"""col2im backward of the packed DCN (edvr_tpu/ops/dcn._gather_blend).

The windowed one-hot backward must produce the same gradients as plain
XLA autodiff through the gathers (EDVR_TPU_DCN_COL2IM=0), including
when offsets push sample rows outside the chunk windows (compacted
fallback) and when the outlier count exceeds the fallback capacity
(lax.cond full-scatter branch). Shapes here are chosen large enough to
take the one-hot path (m >= 4 chunks, window < table) rather than
_col2im_add's small-problem plain-scatter shortcut.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edvr_tpu.ops import dcn


def _grads(x, offset, mask, weight, use_col2im):
    prev = os.environ.get('EDVR_TPU_DCN_COL2IM')
    os.environ['EDVR_TPU_DCN_COL2IM'] = '1' if use_col2im else '0'
    try:
        def loss(x, offset, mask, weight):
            out = dcn.modulated_deform_conv(
                x, offset, mask, weight, None, stride=1, padding=1,
                dilation=1, groups=1, deformable_groups=1)
            return jnp.sum(out * jnp.cos(out))
        return jax.grad(loss, argnums=(0, 1, 2, 3))(x, offset, mask,
                                                    weight)
    finally:
        if prev is None:
            os.environ.pop('EDVR_TPU_DCN_COL2IM', None)
        else:
            os.environ['EDVR_TPU_DCN_COL2IM'] = prev


def _case(offset_big_frac, big_lo, big_hi, seed=0, h=128, w=128):
    rng = np.random.RandomState(seed)
    n, cin, cout, K = 1, 8, 8, 9
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    off = rng.uniform(-2, 2, size=(n, h, w, 2 * K)).astype(np.float32)
    big = rng.rand(n, h, w, 2 * K) < offset_big_frac
    off = np.where(big, rng.uniform(big_lo, big_hi,
                                    size=off.shape) *
                   rng.choice([-1, 1], size=off.shape), off)
    offset = jnp.asarray(off.astype(np.float32))
    mask = jnp.asarray(
        1 / (1 + np.exp(-rng.randn(n, h, w, K))).astype(np.float32))
    weight = jnp.asarray(
        (rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32))
    return x, offset, mask, weight


@pytest.mark.parametrize('big_frac,lo,hi', [
    (0.0, 0, 0),          # pure window path
    (0.005, 40, 90),      # few outliers -> compacted fallback
    (0.3, 40, 90),        # many outliers -> lax.cond full-scatter branch
])
def test_col2im_grads_match_autodiff(big_frac, lo, hi):
    args = _case(big_frac, lo, hi)
    g_ref = _grads(*args, use_col2im=False)
    g_new = _grads(*args, use_col2im=True)
    names = ['dx', 'doffset', 'dmask', 'dweight']
    for name, a, b in zip(names, g_ref, g_new):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-5,
                                   err_msg=name)


def test_col2im_add_exactness_direct():
    # direct unit: random rows incl. duplicates vs dense accumulation
    rng = np.random.RandomState(1)
    nrows, lanes, m = 2048, 128, 8192
    # raster-ish rows with heavy jitter and duplicates
    rows = np.clip((np.arange(m) // 4) % nrows +
                   rng.randint(-300, 300, size=m), 0, nrows - 1)
    upd = rng.randn(m, lanes).astype(np.float32)
    got = np.asarray(dcn._col2im_add(
        jnp.asarray(rows.astype(np.int32)), jnp.asarray(upd), nrows,
        jnp.float32, span_rows=512))
    want = np.zeros((nrows, lanes), np.float64)
    np.add.at(want, rows, upd.astype(np.float64))
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-3)
