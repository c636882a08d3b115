"""Benchmark: EDVR-M x4 whole-clip inference throughput on REDS.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: EDVR-M (64 feat, 5 frames, TSA) restores a 100-frame
(180, 320, 3) clip -> 100 720x1280 frames, the REDS4 evaluation unit
(the reference evaluates whole clips, docs/ModelZoo.md:82-85). The
whole clip runs as ONE device dispatch: a lax.scan over sliding
windows of raw frames through the standard forward
(edvr_tpu/archs/edvr_arch.py::make_clip_restore_fn, mode='window').
Parity with the per-window forward is asserted in
tests/test_edvr_clip.py.

Timing is host-synchronized per call (a scalar reduction is pulled to
the host each iteration) because this environment's async dispatch
otherwise under-reports; measured fixed sync overhead is subtracted.

vs_baseline: the reference repo publishes no speed numbers
(SURVEY.md section 6). The driver's north star is >=5x A100
frames/sec/chip; we assume EDVR-M PyTorch on A100 ~= 25 fps at this
shape (paper-era TITAN Xp was ~10 fps), so baseline = 125 fps and
vs_baseline = fps / 125.

Env: EDVR_TPU_BENCH_WIN_BATCH (default 1) — windows restored per scan
step; EDVR_TPU_BENCH_FRAMES (default 100). win_batch=1 is the
MEASURED-fastest configuration (v5e sweep, docs/TPUDesign.md "Clip
evaluation"): per-window cost RISES with window batch (113.9 ms at
wb=1 -> 158 ms at wb=8) because the graph outside the DCN kernels is
HBM-bound — each extra window in flight adds (win_batch*5, 180, 320,
64)-shaped live intermediates (~73.7 MB each in f32) whose traffic
costs more than the saved per-step scheduling; the resident-pyramid
formulation (mode='pyramid', bf16 storage) measured slower at every
win_batch (best 8.64 vs 8.78 fps).
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

    from edvr_tpu.archs.edvr_arch import (EDVR, clip_window_indices,
                                          make_clip_restore_fn)

    T = int(os.environ.get('EDVR_TPU_BENCH_FRAMES', '100'))
    win_batch = int(os.environ.get('EDVR_TPU_BENCH_WIN_BATCH', '1'))

    # EDVR_TPU_BENCH_VARIANT=L benches the reference's flagship EDVR-L
    # (128 feat, 40 recon blocks, docs/ModelZoo.md:106-109); default M
    variant = os.environ.get('EDVR_TPU_BENCH_VARIANT', 'M').upper()
    feat, recon = (128, 40) if variant == 'L' else (64, 10)
    # co-design frontier knobs (docs/TPUDesign.md "Alignment co-design"):
    # EDVR_TPU_BENCH_ALIGN=tap_shared selects the warp-then-conv
    # alignment, EDVR_TPU_BENCH_DG overrides deformable_groups — so
    # variant fps is measured under the EXACT headline protocol
    align = os.environ.get('EDVR_TPU_BENCH_ALIGN', 'dcn')
    dg = int(os.environ.get('EDVR_TPU_BENCH_DG', '8'))
    net = EDVR(num_in_ch=3, num_out_ch=3, num_feat=feat, num_frame=5,
               deformable_groups=dg, num_extract_block=5,
               num_reconstruct_block=recon, center_frame_idx=2,
               hr_in=False, with_predeblur=False, with_tsa=True,
               align_variant=align)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 5, 16, 16, 3)))
    rng = np.random.RandomState(0)
    # distinct inputs per timed call: repeat executions on identical
    # buffers can be served from an execution cache in this environment
    clips = [jnp.asarray(rng.rand(T, 180, 320, 3).astype(np.float32))
             for _ in range(4)]
    idx = jnp.asarray(clip_window_indices(T, 5, 'reflection_circle'))

    # bf16 params + activations: the HBM-bound trunk halves its
    # traffic; the DCN kernels already compute in bf16 under the
    # default precision. DEFAULT since the measurement landed
    # (docs/TPUDesign.md "bf16 inference"): window fwd 110.5 -> 101.7
    # ms, clip 9.2 -> 9.96 fps, output PSNR vs a strict-f32 reference
    # 60.9 dB — far above the ~48 dB uint8 rounding floor, so the
    # REDS4 metric impact is nil. EDVR_TPU_BENCH_DTYPE=f32 opts out.
    bf16 = os.environ.get('EDVR_TPU_BENCH_DTYPE', 'bf16') == 'bf16'
    if bf16:
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), variables)

    clip_fn = make_clip_restore_fn(net, win_batch=win_batch)
    if bf16:
        fwd = jax.jit(lambda v, c, i: clip_fn(
            v, c.astype(jnp.bfloat16), i).astype(jnp.float32).mean())
    else:
        fwd = jax.jit(lambda v, c, i: clip_fn(v, c, i).mean())

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

    float(fwd(variables, clips[0], idx))  # compile + warm
    times = []
    for c in clips[1:]:
        t0 = time.time()
        float(fwd(variables, c, idx))
        times.append(time.time() - t0)
    per_clip = max(min(times) - overhead, 1e-9)
    fps = T / per_clip

    baseline_fps = 125.0  # assumed 5x of A100-torch ~25 fps
    print(json.dumps({
        'metric': f'EDVR-{variant} x4 REDS {T}-frame clip '
                  '(180x320x5 windows) '
                  'frames/sec/chip (whole-clip eval, '
                  f'{"bf16" if bf16 else "f32"} params, '
                  'TPU-default matmul precision'
                  + (f', align={align}' if align != 'dcn' else '')
                  + (f', dg={dg}' if dg != 8 else '') + ')',
        'value': round(fps, 2),
        'unit': 'frames/sec',
        'vs_baseline': round(fps / baseline_fps, 3),
    }))


if __name__ == '__main__':
    main()
