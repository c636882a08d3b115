"""Trace one banded-DCN forward on the TPU and print the op breakdown.

Usage: python scripts/dev/profile_dcn_band.py [outdir]
"""

import glob
import gzip
import json
import os.path as osp
import sys
from collections import defaultdict

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/prof_band'
    import jax
    import jax.numpy as jnp
    from edvr_tpu.ops import dcn

    rng = np.random.RandomState(0)
    n, h, w, cin, cout, dg, K = 5, 180, 320, 64, 64, 8, 9
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    off = jnp.asarray(
        rng.uniform(-2, 2, size=(n, h, w, dg * 2 * K)).astype(np.float32))
    mask = jnp.asarray(
        (1 / (1 + np.exp(-rng.randn(n, h, w, dg * K)))).astype(np.float32))
    weight = jnp.asarray(
        (rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32))
    fn = jax.jit(lambda *a: dcn.modulated_deform_conv(
        *a, None, stride=1, padding=1, dilation=1, groups=1,
        deformable_groups=dg).mean())
    float(fn(x, off, mask, weight))  # compile
    with jax.profiler.trace(outdir):
        for _ in range(3):
            float(fn(x, off, mask, weight))

    path = sorted(glob.glob(
        outdir + '/plugins/profile/*/*.trace.json.gz'))[-1]
    with gzip.open(path, 'rt') as f:
        trace = json.load(f)
    # keep only TensorCore op events (pid with 'TPU' and 'XLA Ops'-like)
    name_by_pid = {}
    for ev in trace['traceEvents']:
        if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
            name_by_pid[ev['pid']] = ev['args'].get('name', '')
    tid_names = {}
    for ev in trace['traceEvents']:
        if ev.get('ph') == 'M' and ev.get('name') == 'thread_name':
            tid_names[(ev['pid'], ev['tid'])] = ev['args'].get('name', '')
    tot = defaultdict(float)
    for ev in trace['traceEvents']:
        if ev.get('ph') != 'X':
            continue
        tname = tid_names.get((ev.get('pid'), ev.get('tid')), '')
        if 'XLA Ops' not in tname:
            continue
        tot[ev['name']] += ev.get('dur', 0) / 1e3  # ms
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f'total device op time {total:.1f} ms over 3 calls '
          f'({total / 3:.1f} ms/call)')
    for name, ms in items[:25]:
        print(f'{ms / 3:8.2f} ms  {name[:110]}')


if __name__ == '__main__':
    main()
