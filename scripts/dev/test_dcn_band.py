"""Exactness + timing of the banded one-hot DCN kernel.

Usage:
  python scripts/dev/test_dcn_band.py          # parity vs gather path
  python scripts/dev/test_dcn_band.py bench    # time EDVR-M L1 shape
  python scripts/dev/test_dcn_band.py cpu      # interpret-mode on CPU

Compares modulated_deform_conv with EDVR_TPU_DCN_BAND=1 vs =0 (both
bf16 fast path) on the real TPU, including outlier offsets.
"""

import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import numpy as np


def make_case(rng, n, h, w, cin, cout, dg, big_frac=0.0, lo=40, hi=90):
    import jax.numpy as jnp
    K = 9
    x = rng.randn(n, h, w, cin).astype(np.float32)
    off = rng.uniform(-2, 2, size=(n, h, w, dg * 2 * K)).astype(np.float32)
    if big_frac:
        big = rng.rand(*off.shape) < big_frac
        off = np.where(
            big, rng.uniform(lo, hi, size=off.shape) *
            rng.choice([-1, 1], size=off.shape), off).astype(np.float32)
    mask = (1 / (1 + np.exp(-rng.randn(n, h, w, dg * K)))).astype(
        np.float32)
    weight = (rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask),
            jnp.asarray(weight))


def run(case, band):
    import jax
    from edvr_tpu.ops import dcn
    os.environ['EDVR_TPU_DCN_BAND'] = '1' if band else '0'
    x, off, mask, weight = case
    fn = jax.jit(lambda *a: dcn.modulated_deform_conv(
        *a, None, stride=1, padding=1, dilation=1, groups=1,
        deformable_groups=int(mask.shape[-1] // 9)))
    out = np.asarray(fn(x, off, mask, weight))
    return out


def parity():
    rng = np.random.RandomState(0)
    cases = [
        # band-eligible shapes (P >= 16384)
        ('clean 128x160 dg8', dict(n=2, h=128, w=160, cin=64, cout=64,
                                   dg=8, big_frac=0.0)),
        ('outliers 0.2% 128x160', dict(n=2, h=128, w=160, cin=64,
                                       cout=64, dg=8, big_frac=0.002)),
        ('many outliers 30% 128x160', dict(n=1, h=128, w=160, cin=64,
                                           cout=64, dg=8, big_frac=0.3)),
        # below the size gate: exercises the gather fallback
        ('train-crop 64x64 b4', dict(n=4, h=64, w=64, cin=64, cout=64,
                                     dg=8, big_frac=0.01)),
    ]
    for name, kw in cases:
        case = make_case(rng, **kw)
        ref = run(case, band=False)
        got = run(case, band=True)
        scale = np.abs(ref).max() + 1e-8
        err = np.abs(got - ref).max() / scale
        print(f'{name}: max rel err {err:.3e} '
              f'({"OK" if err < 2e-2 else "FAIL"})')


def bench():
    import jax
    import jax.numpy as jnp
    from edvr_tpu.ops import dcn
    rng = np.random.RandomState(0)
    case = make_case(rng, n=5, h=180, w=320, cin=64, cout=64, dg=8)
    for band in (False, True):
        os.environ['EDVR_TPU_DCN_BAND'] = '1' if band else '0'
        fn = jax.jit(lambda *a: dcn.modulated_deform_conv(
            *a, None, stride=1, padding=1, dilation=1, groups=1,
            deformable_groups=8).mean())
        xs = []
        for _ in range(5):
            x = jnp.asarray(rng.randn(5, 180, 320, 64).astype(np.float32))
            xs.append((x,) + case[1:])
        tiny = jax.jit(lambda v: (v * 2).mean())
        ones = jnp.ones((8, 128))
        float(tiny(ones))
        overhead = min(
            (lambda t0: (float(tiny(ones)), time.time() - t0)[1])(
                time.time()) for _ in range(5))
        float(fn(*xs[0]))
        times = []
        for a in xs[1:]:
            t0 = time.time()
            float(fn(*a))
            times.append(time.time() - t0 - overhead)
        print(f'band={band}: L1-shape DCN {min(times)*1000:.1f} ms')


def cpu_interpret():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from edvr_tpu.ops import dcn_band
    rng = np.random.RandomState(0)
    n, h, tiles_x, c_per, dg, K, cout = 1, 40, 10, 8, 2, 9, 16
    geom = dcn_band.BandGeom(n, h, tiles_x, 40, 64, 3, 3, dg, c_per,
                             cout, 1, 1, 1, r=4, bw=32, J=4)
    print('geom: span_y', geom.span_y, 'span_tx', geom.span_tx,
          'W', geom.W, 'NC', geom.NC, 'eligible', geom.eligible())
    T = dg * K
    P = geom.out_h * geom.out_w
    nrows = n * dg * h * tiles_x
    tab4 = jnp.asarray(
        rng.randn(n, dg, h, tiles_x, 128).astype(np.float32))
    # raster-ish rows with jitter
    base = np.arange(P) // geom.out_w * tiles_x
    base = base[None, :] + np.zeros((n, 1), np.int32)
    rows = np.stack([
        np.clip(base + rng.randint(0, tiles_x, size=(n, P)),
                0, h * tiles_x - 1) +
        (np.arange(n)[:, None] * dg + s // K) * (h * tiles_x)
        for s in range(T)]).astype(np.int32)
    cs = rng.randn(T, n, P, 16).astype(np.float32)
    wexp = rng.randn(K, dg, 128, cout).astype(np.float32) * 0.1
    rel, csb, inw = dcn_band.band_prep(geom, jnp.asarray(rows),
                                       jnp.asarray(cs))
    out5 = dcn_band.band_forward(geom, tab4, rel, csb,
                                 jnp.asarray(wexp), interpret=True)
    out = np.asarray(dcn_band.unband(geom, out5)).reshape(-1, cout)
    # dense reference
    tab = np.asarray(tab4).reshape(nrows, 128)
    want = np.zeros((n * P, cout), np.float32)
    cf = np.repeat(cs, 8, axis=3)
    inw_np = np.asarray(inw)
    for s in range(T):
        g, k = divmod(s, K)
        G = tab[rows[s].reshape(-1)]
        blend = G * cf[s].reshape(-1, 128) * \
            inw_np[s].reshape(-1, 1)
        want += blend @ wexp[k, g]
    err = np.abs(out - want).max() / (np.abs(want).max() + 1e-8)
    print('interpret parity (in-window only): max rel err', err)
    assert err < 1e-4, err
    print('outliers skipped:', int((~inw_np).sum()), 'of', T * n * P)


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'parity'
    if mode == 'cpu':
        cpu_interpret()
    elif mode == 'bench':
        bench()
    else:
        parity()
