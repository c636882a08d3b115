"""Benchmark: EDVR-M x4 inference throughput on REDS-sized inputs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: EDVR-M (64 feat, 5 frames, TSA) forward on a (1, 5, 180, 320,
3) float32 window -> one 720x1280 frame, the REDS4 evaluation shape.
Timing is host-synchronized per call (a scalar reduction is pulled to
the host each iteration) because this environment's async dispatch
otherwise under-reports; measured fixed sync overhead is subtracted.

vs_baseline: the reference repo publishes no speed numbers
(SURVEY.md section 6). The driver's north star is >=5x A100
frames/sec/chip; we assume EDVR-M PyTorch on A100 ~= 25 fps at this
shape (paper-era TITAN Xp was ~10 fps), so baseline = 125 fps and
vs_baseline = fps / 125.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from edvr_tpu.archs import define_network

    net = define_network(
        dict(type='EDVR', num_in_ch=3, num_out_ch=3, num_feat=64,
             num_frame=5, deformable_groups=8, num_extract_block=5,
             num_reconstruct_block=10, center_frame_idx=2, hr_in=False,
             with_predeblur=False, with_tsa=True))
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 5, 16, 16, 3)))['params']
    rng = np.random.RandomState(0)
    # distinct inputs per timed call: repeat executions on identical
    # buffers can be served from an execution cache in this environment
    xs = [jnp.asarray(rng.rand(1, 5, 180, 320, 3).astype(np.float32))
          for _ in range(6)]

    fwd = jax.jit(lambda p, x: net.apply({'params': p}, x).mean())

    # fixed host-sync overhead
    tiny = jax.jit(lambda v: (v * 2).mean())
    ones = jnp.ones((8, 128))
    float(tiny(ones))
    overheads = []
    for _ in range(5):
        t0 = time.time()
        float(tiny(ones))
        overheads.append(time.time() - t0)
    overhead = min(overheads)

    float(fwd(params, xs[0]))  # compile + warm
    times = []
    for x in xs[1:]:
        t0 = time.time()
        float(fwd(params, x))
        times.append(time.time() - t0)
    per_call = max(min(times) - overhead, 1e-9)
    fps = 1.0 / per_call

    baseline_fps = 125.0  # assumed 5x of A100-torch ~25 fps
    print(json.dumps({
        'metric': 'EDVR-M x4 REDS (180x320x5) frames/sec/chip '
                  '(f32 params, TPU-default matmul precision)',
        'value': round(fps, 2),
        'unit': 'frames/sec',
        'vs_baseline': round(fps / baseline_fps, 3),
    }))


if __name__ == '__main__':
    main()
