"""Banded one-hot DCN kernel units (edvr_tpu/ops/dcn_band.py).

The Pallas kernel proper only compiles on TPU; these tests run it in
interpret mode against a dense numpy oracle, and verify the pure-XLA
outlier patch restores exactness for points outside the static windows.
TPU-side parity/perf runs live in scripts/dev/test_dcn_band.py.
"""

import numpy as np

import jax.numpy as jnp

from edvr_tpu.ops import dcn_band


def _case(seed=0, n=1, h=40, tiles_x=10, out_h=40, out_w=64, dg=2,
          cout=16, jitter=None):
    rng = np.random.RandomState(seed)
    K, c_per = 9, 8
    geom = dcn_band.BandGeom(n, h, tiles_x, out_h, out_w, 3, 3, dg,
                             c_per, cout, 1, 1, 1, r=4, bw=32, J=4)
    T = dg * K
    P = out_h * out_w
    tab4 = rng.randn(n, dg, h, tiles_x, 128).astype(np.float32)
    # raster rows (band-local) with jitter; absolute via (n, g) base
    base = (np.arange(P) // out_w) * tiles_x
    jit_lo, jit_hi = jitter if jitter else (0, tiles_x)
    rows = np.stack([
        np.clip(base[None, :] + rng.randint(jit_lo, jit_hi, size=(n, P)),
                0, h * tiles_x - 1) +
        ((np.arange(n)[:, None] * dg + s // K) * (h * tiles_x))
        for s in range(T)]).astype(np.int32)
    cs = rng.randn(T, n, P, 16).astype(np.float32)
    wexp = (rng.randn(K, dg, 128, cout) * 0.1).astype(np.float32)
    return geom, tab4, rows, cs, wexp


def _dense(tab4, rows, cs, wexp, mask=None):
    T, n, P = rows.shape
    K = wexp.shape[0]
    tab = tab4.reshape(-1, 128)
    cf = np.repeat(cs, 8, axis=3)
    want = np.zeros((n * P, wexp.shape[-1]), np.float32)
    for s in range(T):
        g, k = divmod(s, K)
        blend = tab[rows[s].reshape(-1)] * cf[s].reshape(-1, 128)
        if mask is not None:
            blend = blend * mask[s].reshape(-1, 1)
        want += blend @ wexp[k, g]
    return want


def test_band_forward_interpret_matches_dense():
    geom, tab4, rows, cs, wexp = _case()
    rel, csb, inw = dcn_band.band_prep(geom, jnp.asarray(rows),
                                       jnp.asarray(cs))
    out5 = dcn_band.band_forward(geom, jnp.asarray(tab4), rel, csb,
                                 jnp.asarray(wexp), interpret=True)
    out = np.asarray(dcn_band.unband(geom, out5)).reshape(
        -1, geom.cout)
    want = _dense(tab4, rows, cs, wexp, mask=np.asarray(inw))
    scale = np.abs(want).max() + 1e-8
    np.testing.assert_allclose(out / scale, want / scale, atol=2e-6)


def test_outlier_patch_restores_exactness():
    geom, tab4, rows, cs, wexp = _case(seed=1)
    # fling 2% of the points far outside their band's y-window
    rng = np.random.RandomState(7)
    T, n, P = rows.shape
    blk = geom.h * geom.tiles_x
    base = rows % blk
    jump = rng.randint(-30, 30, size=rows.shape) * geom.tiles_x
    flung = np.clip(base + jump, 0, blk - 1) + (rows - base)
    sel = rng.rand(*rows.shape) < 0.02
    rows = np.where(sel, flung, rows).astype(np.int32)
    rel, csb, inw = dcn_band.band_prep(geom, jnp.asarray(rows),
                                       jnp.asarray(cs))
    inw_np = np.asarray(inw)
    n_out = int((~inw_np).sum())
    assert n_out > 0, 'case has no outliers to patch'
    partial = _dense(tab4, rows, cs, wexp, mask=inw_np)
    tab = jnp.asarray(tab4.reshape(-1, 128))
    want = _dense(tab4, rows, cs, wexp)
    scale = np.abs(want).max() + 1e-8
    # cap > n_out: single pass; cap << n_out: the rank-windowed
    # while_loop must iterate and still be exact
    for cap in (n_out + 17, max(n_out // 3, 1)):
        patched = dcn_band.outlier_patch(
            geom, jnp.asarray(partial), tab, jnp.asarray(rows),
            jnp.asarray(cs), inw, jnp.asarray(wexp), jnp.float32, cap)
        np.testing.assert_allclose(
            np.asarray(patched) / scale, want / scale, atol=2e-6)


def test_band_prep_in_window_when_jitter_small():
    # rows that stay within the J-pixel headroom never need the patch
    geom, tab4, rows, cs, wexp = _case(seed=2)
    rng = np.random.RandomState(3)
    T, n, P = rows.shape
    out_w, tiles_x, h = geom.out_w, geom.tiles_x, geom.h
    yo, xo = np.arange(P) // out_w, np.arange(P) % out_w
    tx = np.clip(xo // geom.SX, 0, tiles_x - 1)
    rows = np.stack([
        np.clip(yo[None, :] + rng.randint(-1, 2, size=(n, P)),
                0, h - 1) * tiles_x + tx[None, :] +
        ((np.arange(n)[:, None] * geom.dg + s // geom.K) * (h * tiles_x))
        for s in range(T)]).astype(np.int32)
    rel, csb, inw = dcn_band.band_prep(
        geom, jnp.asarray(rows),
        jnp.asarray(np.zeros((T, n, P, 16), np.float32)))
    assert bool(np.asarray(inw).all())
