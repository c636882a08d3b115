"""Measure a bf16-cast EDVR-M window forward vs the shipped f32 one.

The non-DCN trunk is HBM-bound on its activations (docs/TPUDesign.md
"Clip evaluation" finding 1), so storing activations in bf16 — params
and input cast once, every intermediate then flows bf16 — should cut
that traffic ~2x. The DCN kernels already compute in bf16 under the
default matmul precision (the table/blend etype), and the banding prep
casts offset/mask fields to f32 internally, so the only NEW
quantization a bf16 cast introduces is on the stored activations and
the offset-conv arithmetic.

Reports, at the flagship (1, 5, 180, 320, 3) window shape:
  - min-of-N latency for the f32 and bf16-cast forwards
  - PSNR of each against a strict-f32 (HIGHEST matmul precision)
    reference forward in the [0,1] image domain — isolating the bf16
    cast's quantization from the default precision's; both must sit
    far below the uint8 rounding floor (~48 dB) for metric-safe
    inference

Usage: python scripts/dev/time_bf16_fwd.py [--runs 4]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--runs', type=int, default=4)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from edvr_tpu.archs.edvr_arch import EDVR

    model = EDVR(num_feat=64, num_frame=5, deformable_groups=8,
                 num_extract_block=5, num_reconstruct_block=10,
                 center_frame_idx=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)))
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.rand(1, 5, 180, 320, 3).astype(np.float32))
          for _ in range(args.runs + 1)]

    p_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    fwd_f32 = jax.jit(lambda p, x: model.apply(p, x))
    fwd_bf16 = jax.jit(
        lambda p, x: model.apply(p, x.astype(jnp.bfloat16))
        .astype(jnp.float32))

    tiny = jax.jit(lambda v: (v * 2).mean())
    ones = jnp.ones((8, 128))
    float(tiny(ones))
    overhead = min(
        (lambda t0: (float(tiny(ones)), time.time() - t0)[1])(time.time())
        for _ in range(5))

    def bench(fwd, p, label):
        float(fwd(p, xs[0]).mean())  # compile
        times = []
        for x in xs[1:]:
            t0 = time.time()
            float(fwd(p, x).mean())
            times.append(time.time() - t0 - overhead)
        ms = min(times) * 1e3
        print(f'{label}: {ms:.1f} ms/window ({1e3 / ms:.2f} fps)',
              flush=True)
        return ms

    ms_f32 = bench(fwd_f32, params, 'f32 params, default precision')
    ms_bf16 = bench(fwd_bf16, p_bf16, 'bf16 params + activations  ')

    # strict-f32 reference: HIGHEST matmul precision pins every MXU
    # pass to f32, so the comparison isolates each fast path's total
    # quantization (not run through `bench`: the band kernel requires
    # the bf16 etype, so the strict forward takes the gather path and
    # its latency is not comparable)
    with jax.default_matmul_precision('highest'):
        fwd_ref = jax.jit(lambda p, x: model.apply(p, x))
        ref = np.clip(np.asarray(fwd_ref(params, xs[1])), 0, 1)

    def psnr_vs_ref(out, label):
        mse = float(np.mean((np.clip(out, 0, 1) - ref) ** 2))
        psnr = 10 * np.log10(1.0 / mse) if mse else float('inf')
        print(f'{label} vs strict-f32 reference: {psnr:.1f} dB',
              flush=True)
        return psnr

    a = np.asarray(fwd_f32(params, xs[1]))
    b = np.asarray(fwd_bf16(p_bf16, xs[1]))
    psnr_vs_ref(a, 'f32/default-precision output')
    psnr_vs_ref(b, 'bf16 output                 ')
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    psnr = 10 * np.log10(1.0 / mse) if mse else float('inf')
    print(f'bf16-vs-f32 output PSNR: {psnr:.1f} dB  '
          f'(speedup {ms_f32 / ms_bf16:.2f}x)')


if __name__ == '__main__':
    main()
