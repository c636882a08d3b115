"""Stage-level timing of clip-mode EDVR-M on the TPU (dev tool).

Times extract_pyramid and restore_windows separately (python-loop
dispatch, no scan) to attribute clip-mode cost.

Usage: python scripts/dev/time_clip_stages.py [T] [win_batches ...]
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import numpy as np


def sync_time(fn, *args, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        times.append(time.time() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from edvr_tpu.archs.edvr_arch import EDVR, clip_window_indices

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    wbs = [int(a) for a in sys.argv[2:]] or [1, 2, 4]

    model = EDVR(num_feat=64, num_frame=5, deformable_groups=8,
                 num_extract_block=5, num_reconstruct_block=10,
                 center_frame_idx=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)))
    rng = np.random.RandomState(0)
    clip = jnp.asarray(rng.rand(T, 180, 320, 3).astype(np.float32))
    idx_all = clip_window_indices(T, 5, 'reflection_circle')

    # sync overhead
    tiny = jax.jit(lambda v: (v * 2).mean())
    ones = jnp.ones((8, 128))
    float(tiny(ones))
    ovh = min((lambda t0: (float(tiny(ones)), time.time() - t0)[1])(
        time.time()) for _ in range(5))
    print(f'sync overhead {ovh * 1e3:.1f} ms')

    extract = jax.jit(lambda p, c: jax.tree_util.tree_map(
        lambda v: v.mean(),
        model.apply(p, c, method=EDVR.extract_pyramid)))
    t0 = time.time()
    jax.tree_util.tree_map(float, extract(params, clip))
    print(f'extract compile+run {time.time() - t0:.1f}s')
    te = sync_time(lambda p, c: extract(p, c)[0], params, clip) - ovh
    print(f'extract_pyramid({T} frames): {te * 1e3:.1f} ms '
          f'({te / T * 1e3:.2f} ms/frame)')

    pyr = jax.jit(lambda p, c: model.apply(
        p, c, method=EDVR.extract_pyramid))(params, clip)

    for wb in wbs:
        restore = jax.jit(lambda p, pyr_, c, i: model.apply(
            p, pyr_, c, i, method=EDVR.restore_windows).mean())
        idx = jnp.asarray(idx_all[T // 2:T // 2 + wb])
        t0 = time.time()
        float(restore(params, pyr, clip, idx))
        print(f'restore wb={wb}: compile+first {time.time() - t0:.1f}s')
        tr = sync_time(restore, params, pyr, clip, idx) - ovh
        print(f'restore_windows wb={wb}: {tr * 1e3:.1f} ms '
              f'({tr / wb * 1e3:.1f} ms/frame) -> clip-mode est '
              f'{1.0 / (tr / wb + te / T):.2f} fps')


if __name__ == '__main__':
    main()
