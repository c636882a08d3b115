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


def grads():
    """TPU gradient parity: band (Pallas bwd kernel) vs gather autodiff."""
    import jax
    from edvr_tpu.ops import dcn
    os.environ['EDVR_TPU_DCN_BAND_MIN_P'] = '4096'
    rng = np.random.RandomState(0)
    for name, kw in [('clean 128x160', dict(n=1, h=128, w=160, cin=64,
                                            cout=64, dg=8)),
                     ('outliers 1%', dict(n=1, h=128, w=160, cin=64,
                                          cout=64, dg=8, big_frac=0.01)),
                     ('train-shape 64x64 b4', dict(n=4, h=64, w=64,
                                                   cin=64, cout=64,
                                                   dg=8))]:
        case = make_case(rng, **kw)
        outs = {}
        for band in (False, True):
            os.environ['EDVR_TPU_DCN_BAND'] = '1' if band else '0'
            dgr = int(case[2].shape[-1] // 9)

            def loss(x, off, mask, weight):
                out = dcn.modulated_deform_conv(
                    x, off, mask, weight, None, stride=1, padding=1,
                    dilation=1, groups=1, deformable_groups=dgr)
                return (out * jnp_cos(out * 3)).sum()
            import jax.numpy as jnp
            jnp_cos = jnp.cos
            outs[band] = jax.jit(jax.grad(
                loss, argnums=(0, 1, 2, 3)))(*case)
        for gname, a, b in zip(['dx', 'doffset', 'dmask', 'dweight'],
                               outs[False], outs[True]):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            err = np.abs(b / scale - a / scale).max()
            print(f'{name} {gname}: {err:.3e} '
                  f'({"OK" if err < 3e-2 else "FAIL"})', flush=True)


def cpu_interpret():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    os.environ['EDVR_TPU_DCN_BAND_INTERPRET'] = '1'
    os.environ['EDVR_TPU_DCN_BAND_MIN_P'] = '1024'
    rng = np.random.RandomState(0)
    case = make_case(rng, n=1, h=32, w=64, cin=16, cout=16, dg=2,
                     big_frac=0.02)
    ref = run(case, band=False)
    got = run(case, band=True)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
    print('interpret full-path parity: max rel err', err)
    assert err < 2e-6, err


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'parity'
    if mode == 'cpu':
        cpu_interpret()
    elif mode == 'grads':
        grads()
    elif mode == 'bench':
        bench()
    else:
        parity()
