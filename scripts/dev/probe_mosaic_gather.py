"""Probe: can Mosaic (Pallas/TPU) do an in-VMEM dynamic gather yet?

The shipped DCN kernels (edvr_tpu/ops/dcn_band.py) avoid data-dependent
gathers entirely by turning row selection into banded one-hot matmuls —
because XLA:TPU routes a data-dependent `jnp.take` through HBM and
Mosaic historically rejects vectorized dynamic indexing inside kernels.
docs/TPUDesign.md names an in-VMEM gather primitive as the ONLY
order-of-magnitude lever left for the exact DCNv2 formulation: gather
the K=9 bilinear neighbor rows straight from a VMEM-resident feature
tile and feed the blend matmul (ops/dcn_pallas.py is the ready
consumer) without the one-hot expansion FLOPs or the HBM round trip.

This probe answers, in seconds, per access pattern x DCN level shape:
does the current jax/Mosaic toolchain compile AND execute it on this
backend? Run it after every toolchain bump:

    python scripts/dev/probe_mosaic_gather.py          # real TPU
    EDVR_TPU_PLATFORM=cpu python ... --interpret       # plumbing check

Patterns probed (all gather G rows from a (R, 128) VMEM table):
  * vector_take       — jnp.take(table, idx, axis=0) inside the kernel:
                        the true vectorized gather the consumer wants.
  * take_along_axis   — jnp.take_along_axis formulation of the same.
  * ds_loop           — lax.fori_loop of single-row in_ref[pl.ds(i,1)]
                        dynamic slices: the supported-but-scalar
                        fallback; execution proves pl.ds with a
                        data-dependent start works, timing shows
                        whether it is usable (expected: far too slow).
  * onehot_matmul     — the shipped formulation as the baseline that
                        must always pass (sanity + timing reference).

Result (2026-08-20, v5 lite): see docs/TPUDesign.md "Mosaic in-VMEM
gather probe" — ALL THREE gather patterns are rejected at every DCN
level shape: vector_take (shape-mismatch ValueError in the Mosaic
take lowering), take_along_axis (lowering AssertionError), and even
the scalar ds_loop with a data-dependent `pl.ds` start (remote-compile
MosaicError). Only the shipped one-hot selection compiles (and its
baseline comparison must pin f32 matmul precision). The
order-of-magnitude lever stays fully locked on this toolchain.
"""

import argparse
import functools
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--interpret', action='store_true',
                    help='run kernels in interpreter mode (CPU check '
                         'of the probe itself, not of Mosaic)')
    ap.add_argument('--rows', type=int, default=None,
                    help='override the table row count (default: DCN '
                         'level shapes)')
    args = ap.parse_args()

    import jax
    if args.interpret or os.environ.get('EDVR_TPU_PLATFORM') == 'cpu':
        # the environment's sitecustomize pre-registers the axon TPU
        # backend and overrides JAX_PLATFORMS; forcing CPU must happen
        # via jax.config AFTER import (CLAUDE.md "Environment gotchas")
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    LANES = 128  # one group tile strip: lanes = c_per * slots

    # DCN level geometries at the flagship bench shape (LQ 180x320):
    # rows = h*w of the level, G = pixels * K taps for one band's worth
    # of gathers (the consumer gathers per 8-row band; G here is one
    # full level's row demand to stress VMEM sizing too)
    shapes = ([(args.rows, args.rows)] if args.rows else
              [(3600, 8 * 3600),      # L3 45x80, K=8 rows worth
               (14400, 8 * 14400),    # L2 90x160
               (57600, 8 * 57600)])   # L1 180x320

    def make_inputs(rows, g):
        rng = np.random.RandomState(0)
        table = jnp.asarray(rng.rand(rows, LANES).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, rows, (g,)).astype(np.int32))
        return table, idx

    def run(fn, table, idx, g):
        out_shape = jax.ShapeDtypeStruct((g, LANES), jnp.float32)
        call = pl.pallas_call(fn, out_shape=out_shape,
                              interpret=args.interpret)
        jfn = jax.jit(call)
        y = jfn(table, idx)  # compile + execute
        want = np.asarray(table)[np.asarray(idx)]
        ok = np.allclose(np.asarray(y), want, atol=1e-6)
        if not ok:
            return 'WRONG_RESULT', None
        # indicative timing: scalar-pull sync (CLAUDE.md timing rule)
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(jnp.sum(jfn(table, idx)))
            ts.append(time.time() - t0)
        return 'ok', round(min(ts) * 1e3, 2)

    def vector_take_kernel(table_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take(table_ref[...], idx_ref[...], axis=0)

    def take_along_axis_kernel(table_ref, idx_ref, out_ref):
        idx2 = idx_ref[...][:, None]
        out_ref[...] = jnp.take_along_axis(
            table_ref[...], jnp.broadcast_to(idx2, out_ref.shape), axis=0)

    def ds_loop_kernel(table_ref, idx_ref, out_ref):
        def body(i, _):
            out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i], 1), :]
            return 0
        jax.lax.fori_loop(0, out_ref.shape[0], body, 0)

    def onehot(table, idx, g):
        # the shipped formulation's core: selection as a one-hot matmul
        # (banded in the real kernel; dense here purely as a baseline
        # at a size that fits). Precision must be pinned: the real band
        # kernel emits f32 matmuls (Mosaic requires them), while a bare
        # `@` at TPU-default precision quantizes through bf16 and fails
        # an exact-selection comparison (CLAUDE.md timing/precision
        # gotcha, observed 2026-08-20).
        rows = table.shape[0]
        oh = jax.nn.one_hot(idx, rows, dtype=table.dtype)
        with jax.default_matmul_precision('float32'):
            return jax.jit(lambda a, b: a @ b)(oh, table)

    patterns = [('vector_take', vector_take_kernel),
                ('take_along_axis', take_along_axis_kernel),
                ('ds_loop', ds_loop_kernel)]

    report = {'backend': jax.default_backend(),
              'jax': jax.__version__,
              'interpret': args.interpret,
              'results': []}
    for rows, g in shapes:
        # cap the probe's G so failures are about the PATTERN, not VMEM
        g_probe = min(g, 4096)
        table, idx = make_inputs(rows, g_probe)
        entry = {'rows': rows, 'lanes': LANES, 'gathers': g_probe}
        for name, kern in patterns:
            g_loop = 16 if args.interpret else 1024
            if name == 'ds_loop' and g_probe > g_loop:
                # scalar loop at full G takes minutes (interpreter:
                # each row is a Python-level step); probe small
                t2, i2 = make_inputs(rows, g_loop)
                try:
                    status, ms = run(kern, t2, i2, g_loop)
                except Exception as e:  # noqa: BLE001 — report, not raise
                    status, ms = type(e).__name__, None
                    entry[f'{name}_error'] = str(e).split('\n')[0][:200]
                entry[name] = (status if ms is None
                               else f'ok {ms} ms@{g_loop}')
                continue
            try:
                status, ms = run(kern, table, idx, g_probe)
            except Exception as e:  # noqa: BLE001
                status, ms = type(e).__name__, None
                entry[f'{name}_error'] = str(e).split('\n')[0][:200]
            entry[name] = status if ms is None else f'ok {ms} ms'
        # baseline outside pallas
        try:
            y = onehot(table, idx, g_probe)
            ok = np.allclose(np.asarray(y),
                             np.asarray(table)[np.asarray(idx)], atol=1e-5)
            entry['onehot_matmul'] = 'ok' if ok else 'WRONG_RESULT'
        except Exception as e:  # noqa: BLE001
            entry['onehot_matmul'] = type(e).__name__
        report['results'].append(entry)
        print(json.dumps(entry), flush=True)

    unlocked = any('ok' in str(r.get('vector_take', '')) or
                   'ok' in str(r.get('take_along_axis', ''))
                   for r in report['results'])
    if args.interpret:
        # the interpreter accepts everything — only a real Mosaic
        # lowering answers the question
        unlocked = 'n/a (interpret mode — run on the TPU backend)'
    report['vmem_gather_unlocked'] = unlocked
    print(json.dumps({'vmem_gather_unlocked': unlocked,
                      'consumer': 'edvr_tpu/ops/dcn_pallas.py',
                      'next': ('wire the gather into blend_matmul_group'
                               if unlocked else
                               'locked — re-run after toolchain bumps')}))


if __name__ == '__main__':
    main()
