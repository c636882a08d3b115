"""Trace whole-clip EDVR-M eval on the TPU and print the op breakdown.

Usage: python scripts/dev/profile_clip.py [T] [win_batch] [outdir]
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
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    wb = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    outdir = sys.argv[3] if len(sys.argv) > 3 else '/tmp/prof_clip'
    import jax
    import jax.numpy as jnp

    from edvr_tpu.archs.edvr_arch import (EDVR, clip_window_indices,
                                          make_clip_restore_fn)

    model = EDVR(num_feat=64, num_frame=5, deformable_groups=8,
                 num_extract_block=5, num_reconstruct_block=10,
                 center_frame_idx=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)))
    rng = np.random.RandomState(0)
    clip = jnp.asarray(rng.rand(T, 180, 320, 3).astype(np.float32))
    idx = jnp.asarray(clip_window_indices(T, 5, 'reflection_circle'))
    fn = make_clip_restore_fn(model, win_batch=wb)
    run = jax.jit(lambda p, c, i: fn(p, c, i).mean())
    float(run(params, clip, idx))  # compile
    with jax.profiler.trace(outdir):
        float(run(params, clip, idx))

    path = sorted(glob.glob(
        outdir + '/plugins/profile/*/*.trace.json.gz'))[-1]
    with gzip.open(path, 'rt') as f:
        trace = json.load(f)
    tid_names = {}
    for ev in trace['traceEvents']:
        if ev.get('ph') == 'M' and ev.get('name') == 'thread_name':
            tid_names[(ev['pid'], ev['tid'])] = ev['args'].get('name', '')
    tot = defaultdict(float)
    for ev in trace['traceEvents']:
        if ev.get('ph') != 'X':
            continue
        if 'XLA Ops' not in tid_names.get((ev.get('pid'), ev.get('tid')),
                                          ''):
            continue
        tot[ev['name']] += ev.get('dur', 0) / 1e3  # ms
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f'total device op time {total:.1f} ms/clip '
          f'({total / T:.2f} ms/frame, {T / total * 1e3:.2f} fps)')
    for name, ms in items[:30]:
        print(f'{ms:8.2f} ms  {name[:110]}')


if __name__ == '__main__':
    main()
