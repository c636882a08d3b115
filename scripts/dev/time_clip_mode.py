"""Time whole-clip EDVR-M evaluation on the TPU (dev tool).

Usage: python scripts/dev/time_clip_mode.py [T] [win_batch ...]

win_batch 0 times the PER-WINDOW protocol instead (the reference's
evaluation unit: one (1, 5, h, w, 3) forward per output frame,
re-extracting every pyramid 5x), batched T windows at a time through
the same sync discipline, so the clip-vs-window comparison is
apples-to-apples (same inputs, same precision, same timing method).
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
    batches = [int(a) for a in sys.argv[2:]] or [4]

    model = EDVR(num_feat=64, num_frame=5, deformable_groups=8,
                 num_extract_block=5, num_reconstruct_block=10,
                 center_frame_idx=2)
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

    for wb in batches:
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
            fn = make_clip_restore_fn(model, win_batch=wb)
            run = jax.jit(lambda p, c, i: fn(p, c, i).mean())
            label = f'win_batch={wb}'
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
