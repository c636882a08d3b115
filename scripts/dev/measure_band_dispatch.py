"""Measure band-vs-gather DCN time at every EDVR geometry (VERDICT r2 #4).

The band/gather dispatch policy (EDVR_TPU_DCN_BAND_MIN_P in
edvr_tpu/ops/dcn.py) must be set from measurement, not guesswork: this
harness times the full modulated_deform_conv call on the real TPU with
the band kernel forced on vs off, at each geometry EDVR actually runs
(PCD pyramid levels at the flagship inference shape, train-crop shapes
at the canonical batch), and prints a winners table.

Each timing is min-of-N with the repo's sync discipline (pull a scalar
per call on DISTINCT inputs, subtract the measured fixed host-sync
overhead — see CLAUDE.md).

Usage: python scripts/dev/measure_band_dispatch.py [--fwd-only]
"""

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import numpy as np

# (name, n, h, w, dg) at cin=cout=64 — every DCN geometry in EDVR-M/L
# at the flagship REDS shapes (L1 runs twice per window: PCD + cascade)
GEOMS = [
    ('infer L1 180x320 n5', 5, 180, 320, 8),
    ('infer L2 90x160 n5', 5, 90, 160, 8),
    ('infer L3 45x80 n5', 5, 45, 80, 8),
    ('train L1 64x64 n20', 20, 64, 64, 8),
    ('train L2 32x32 n20', 20, 32, 32, 8),
    ('train L3 16x16 n20', 20, 16, 16, 8),
]


def timed(fn, argsets, overhead, reps=4):
    float(fn(*argsets[0]))
    times = []
    for a in (argsets[1:] * reps)[:reps]:
        t0 = time.time()
        float(fn(*a))
        times.append(time.time() - t0)
    return max(min(times) - overhead, 0.0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--fwd-only', action='store_true')
    parser.add_argument('--full-grads', action='store_true',
                        help='differentiate wrt x/offset/mask/weight '
                             '(the full train-time chain incl. '
                             'coordinate grads and fold_windows) '
                             'instead of weights only')
    parser.add_argument('--geoms', nargs='*',
                        help='substring filter on geometry names')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from edvr_tpu.ops import dcn

    tiny = jax.jit(lambda v: (v * 2).mean())
    ones = jnp.ones((8, 128))
    float(tiny(ones))
    overhead = min(
        (lambda t0: (float(tiny(ones)), time.time() - t0)[1])(time.time())
        for _ in range(8))
    print(f'sync overhead: {overhead * 1e3:.1f} ms')

    rng = np.random.RandomState(0)
    cin = cout = 64
    K = 9
    geoms = [g for g in GEOMS
             if not args.geoms or any(s in g[0] for s in args.geoms)]
    for name, n, h, w, dg in geoms:
        weight = jnp.asarray(
            (rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32))
        sets = []
        for _ in range(3):
            x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
            off = jnp.asarray(rng.uniform(
                -2, 2, size=(n, h, w, dg * 2 * K)).astype(np.float32))
            msk = jnp.asarray((1 / (1 + np.exp(
                -rng.randn(n, h, w, dg * K)))).astype(np.float32))
            sets.append((x, off, msk, weight))

        res = {}
        for band in (False, True):
            os.environ['EDVR_TPU_DCN_BAND'] = '1' if band else '0'
            os.environ['EDVR_TPU_DCN_BAND_MIN_P'] = '1'

            def fwd(x, o, m, w_):
                return dcn.modulated_deform_conv(
                    x, o, m, w_, None, 1, 1, 1, 1, dg).mean()

            label = 'band' if band else 'gather'
            res[f'fwd {label}'] = timed(jax.jit(fwd), sets, overhead)
            if not args.fwd_only:
                # weights-only grads DCE the coordinate-gradient
                # chain (the dispatch signal); --full-grads keeps the
                # whole train-time backward incl. the offset/mask
                # gradients and the fold_windows table overlap-add
                argnums = (0, 1, 2, 3) if args.full_grads else 3
                gfn = jax.jit(jax.grad(
                    lambda x, o, m, w_: fwd(x, o, m, w_),
                    argnums=argnums))
                if args.full_grads:
                    def pull(*a, _g=gfn):
                        return sum(g.mean() for g in _g(*a))
                else:
                    def pull(*a, _g=gfn):
                        return _g(*a).mean()
                key = 'fwdbwd-full' if args.full_grads else 'fwdbwd'
                res[f'{key} {label}'] = timed(
                    jax.jit(pull), sets, overhead)

        parts = ' | '.join(f'{k} {v * 1e3:7.2f} ms'
                           for k, v in res.items())
        win = 'BAND' if res['fwd band'] < res['fwd gather'] else 'GATHER'
        print(f'{name}: {parts}  -> {win}', flush=True)


if __name__ == '__main__':
    main()
