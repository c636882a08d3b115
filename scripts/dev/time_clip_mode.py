"""Time whole-clip EDVR-M evaluation on the TPU (dev tool).

Usage: python scripts/dev/time_clip_mode.py [T] [win_batch ...]
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
        fn = make_clip_restore_fn(model, win_batch=wb)
        run = jax.jit(lambda p, c, i: fn(p, c, i).mean())
        t0 = time.time()
        float(run(params, clips[0], idx))
        print(f'win_batch={wb}: compile+first {time.time() - t0:.1f}s')
        times = []
        for c in clips:
            t0 = time.time()
            float(run(params, c, idx))
            times.append(time.time() - t0)
        best = min(times) - overhead
        print(f'win_batch={wb}: {best * 1e3:.1f} ms/clip '
              f'({T / best:.2f} frames/sec)')


if __name__ == '__main__':
    main()
