"""Time whole-clip EDVR evaluation on the TPU (dev tool).

Usage: python scripts/dev/time_clip_mode.py [T] [spec ...]
Env: EDVR_TPU_CLIP_CONFIG=edvr_m|edvr_l selects the variant
     (EDVR-L: 128 feat, 40 recon blocks).

Each spec times one configuration:
  N    window mode, win_batch N — scan over batches of N raw-frame
       windows through the standard forward (the shipped bench path)
  pN   pyramid mode, win_batch N — resident clip pyramid + per-step
       feature-window gathers (the trade-study alternative)
  0    the PER-WINDOW protocol (the reference's evaluation unit: one
       (1, 5, h, w, 3) host-dispatched forward per output frame),
       through the same sync discipline, so every comparison is
       apples-to-apples (same inputs, same precision, same timing
       method).
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from edvr_tpu.archs.edvr_arch import (EDVR, clip_window_indices,
                                          make_clip_restore_fn)

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    specs = sys.argv[2:] or ['4']

    import os
    cfgs = {'edvr_m': dict(num_feat=64, num_reconstruct_block=10),
            'edvr_l': dict(num_feat=128, num_reconstruct_block=40)}
    cfg = cfgs[os.environ.get('EDVR_TPU_CLIP_CONFIG', 'edvr_m')]
    model = EDVR(num_frame=5, deformable_groups=8,
                 num_extract_block=5, center_frame_idx=2, **cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)))
    rng = np.random.RandomState(0)
    clips = [jnp.asarray(rng.rand(T, 180, 320, 3).astype(np.float32))
             for _ in range(3)]
    idx = jnp.asarray(clip_window_indices(T, 5, 'reflection_circle'))

    tiny = jax.jit(lambda v: (v * 2).mean())
    ones = jnp.ones((8, 128))
    float(tiny(ones))
    overhead = min(
        (lambda t0: (float(tiny(ones)), time.time() - t0)[1])(time.time())
        for _ in range(5))

    for spec in specs:
        mode = 'pyramid' if spec.startswith('p') else 'window'
        wb = int(spec.lstrip('p'))
        if wb == 0:
            # per-window protocol: one (1, 5, h, w, 3) forward per
            # output frame, full pyramid re-extraction per window
            win_fwd = jax.jit(lambda p, x: model.apply(p, x).mean())
            label = 'per-window'

            def run(p, c, i, _f=win_fwd):
                acc = 0.0
                for t in range(T):
                    acc += float(_f(p, c[i[t]][None]))
                return acc

            t0 = time.time()
            run(params, clips[0], idx)
            print(f'{label}: compile+first {time.time() - t0:.1f}s',
                  flush=True)
            times = []
            for c in clips:
                t0 = time.time()
                run(params, c, idx)
                # each of the T calls pays one host sync round-trip
                times.append(time.time() - t0 - overhead * T)
        else:
            fn = make_clip_restore_fn(model, win_batch=wb, mode=mode)
            run = jax.jit(lambda p, c, i: fn(p, c, i).mean())
            label = f'{mode} win_batch={wb}'
            t0 = time.time()
            float(run(params, clips[0], idx))
            print(f'{label}: compile+first {time.time() - t0:.1f}s',
                  flush=True)
            times = []
            for c in clips:
                t0 = time.time()
                float(run(params, c, idx))
                times.append(time.time() - t0 - overhead)
        best = min(times)
        print(f'{label}: {best * 1e3:.1f} ms/clip '
              f'({T / best:.2f} frames/sec)', flush=True)


if __name__ == '__main__':
    main()
