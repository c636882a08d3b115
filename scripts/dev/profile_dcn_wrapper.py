"""Decompose one banded-DCN call into kernel vs XLA-wrapper costs.

VERDICT r2 item 1: the band-kernel ablation (docs/TPUDesign.md)
attributes ~45% of every DCN call to graph-level prep outside the
Pallas kernel (table build, offset/mask banding transpose, outlier
patch, in-window field traffic). This harness times each piece in
isolation at the EDVR-M pyramid geometries so the attack order is set
by measurement, not guesswork.

Pieces timed per geometry (all jitted separately, host-synced by
pulling a scalar per call, fixed sync overhead subtracted):

  full       modulated_deform_conv, band path (the production call)
  kernel     band_forward alone on NHWC fields (in-kernel one-hot
             select-transpose replaced the old banding transposes)
  table      packed tile-table build (gather + stack + transpose)
  patch      outlier_patch on the kernel outputs (zero outliers, the
             common case)

Usage: python scripts/dev/profile_dcn_wrapper.py [--n 5] [--levels l1 l2 l3]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import numpy as np


def timed(fn, args, overhead, reps=5):
    out = fn(*args)
    jax_block(out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        jax_block(fn(*args))
        times.append(time.time() - t0)
    return min(times) - overhead


def jax_block(out):
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    # pull one scalar: forces completion under async dispatch
    float(leaves[0].ravel()[0])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--n', type=int, default=5,
                        help='DCN batch (frames in flight)')
    parser.add_argument('--levels', nargs='*', default=['l1', 'l2', 'l3'])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from edvr_tpu.ops import dcn, dcn_band

    geoms = {
        'l1': (180, 320),
        'l2': (90, 160),
        'l3': (45, 80),
    }
    n, cin, cout, dg, K = args.n, 64, 64, 8, 9
    c_per = cin // dg
    PX = 128 // (2 * c_per)
    SX = PX - 1

    tiny = jax.jit(lambda v: (v * 2).mean())
    ones = jnp.ones((8, 128))
    float(tiny(ones))
    overhead = min(
        (lambda t0: (float(tiny(ones)), time.time() - t0)[1])(time.time())
        for _ in range(8))
    print(f'sync overhead: {overhead * 1e3:.1f} ms')

    rng = np.random.RandomState(0)
    for lev in args.levels:
        h, w = geoms[lev]
        x = jnp.asarray(rng.rand(n, h, w, cin).astype(np.float32))
        off = jnp.asarray(
            (rng.rand(n, h, w, dg * 2 * K).astype(np.float32) - 0.5) * 2)
        msk = jnp.asarray(rng.rand(n, h, w, dg * K).astype(np.float32))
        wgt = jnp.asarray(
            rng.rand(3, 3, cin, cout).astype(np.float32) * 0.1)

        full = jax.jit(lambda x, o, m, w_: dcn.modulated_deform_conv(
            x, o, m, w_, None, 1, 1, 1, 1, dg))
        t_full = timed(full, (x, off, msk, wgt), overhead)

        tiles_x = (w - 1) // SX + 1
        geom = dcn_band.BandGeom(
            n, h, tiles_x, h, w, 3, 3, dg, c_per, cout, 1, 1, 1,
            r=8, bw=64, J=2, w_pix=w)
        if not geom.eligible():
            print(f'{lev}: band geometry ineligible, skipping pieces')
            continue

        lanes = 2 * PX * c_per
        etype = jnp.bfloat16
        txp = geom.tiles_x_pad

        def build_table(x):
            col_idx = (np.arange(txp)[:, None] * SX +
                       np.arange(PX)[None, :]).reshape(-1)
            col_valid = jnp.asarray((col_idx < w).astype(np.float32))
            col_idx2 = jnp.asarray(np.minimum(col_idx, w - 1))
            tab = (jnp.take(x, col_idx2, axis=2) *
                   col_valid[None, None, :, None]).astype(etype)
            tab_dn = jnp.concatenate(
                [tab[:, 1:], jnp.zeros_like(tab[:, :1])], axis=1)
            tab4 = jnp.stack([tab, tab_dn], axis=2).reshape(
                n, h, 2, txp, PX, dg, c_per)
            return tab4.transpose(0, 5, 1, 3, 2, 4, 6).reshape(
                n, dg, h, txp, lanes)

        def build_wexp(weight):
            wk = weight.reshape(K, cin, cout)
            wexp = wk.reshape(K, dg, c_per, cout)
            return jnp.tile(wexp[:, :, None, :, :],
                            (1, 1, 2 * PX, 1, 1)).reshape(
                K, dg, lanes, cout).astype(etype)

        tab4 = jax.jit(build_table)(x)
        wexp = jax.jit(build_wexp)(wgt)
        jax_block((tab4, wexp))

        t_table = timed(jax.jit(build_table), (x,), overhead)

        kern = jax.jit(lambda t, o, m, w_: dcn_band.band_forward(
            geom, t, o, m, w_))
        t_kernel = timed(kern, (tab4, off, msk, wexp), overhead)

        outp, inw = kern(tab4, off, msk, wexp)
        jax_block((outp, inw))
        cap = max(1024, inw.size // 64)

        def patch(outp, inw, tab4, off, msk, wexp):
            tab = tab4.reshape(-1, tab4.shape[-1])
            of = dcn_band.outlier_patch(
                geom, outp.reshape(-1, cout), tab,
                off.astype(jnp.float32), msk.astype(jnp.float32), inw,
                wexp, tab.dtype, cap)
            return of

        t_patch = timed(jax.jit(patch),
                        (outp, inw, tab4, off, msk, wexp), overhead)

        pieces = t_table + t_kernel + t_patch
        print(f'{lev} (n={n}, {h}x{w}): full {t_full * 1e3:7.2f} ms | '
              f'kernel {t_kernel * 1e3:6.2f} | table {t_table * 1e3:6.2f} | '
              f'patch {t_patch * 1e3:6.2f} | pieces-sum {pieces * 1e3:6.2f} '
              f'| unattributed {(t_full - pieces) * 1e3:6.2f}')


if __name__ == '__main__':
    main()
