"""Sweep the banded-DCN kernel's (r, bw, J) knobs on the real TPU.

Times a 5-frame EDVR L1-shaped DCN (the dominant geometry) per config.
Each config is a fresh jit compile (~1-3 min through the remote compile
service), so keep the grid small.

Usage: python scripts/dev/tune_dcn_band.py [train|infer]
"""

import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import numpy as np

CONFIGS = [
    # (r, bw, J) — bw % 8 == 0 AND NC = r*bw a multiple of 128
    # (Mosaic partial-vreg lane dims fail to lower), NC <= 1024.
    # Measured at the v4 flagship L1 (2026-08-19, sweep below):
    #   r8/bw64  W=240 NC=512  -> 24.8 ms  (shipped)
    #   r16/bw64 W=368 NC=1024 -> 29.4 ms  (halved steps did NOT pay)
    #   r8/bw128 W=480 NC=1024 -> 33.9 ms
    # Linear fit: time ~ 15.7 ms + 0.038*W — a large W-INDEPENDENT
    # term that scales with total points, pointing at the per-tap
    # (1, NC) coefficient row algebra (1/8 sublane efficiency), not
    # per-step overhead. bw=56 zero-drift configs are Mosaic-illegal
    # (NC=448/896 lane dims... 896 is 7x128 but spans stay 16 anyway;
    # 448 measured-crashed), so they are out.
    (8, 64, 2),      # shipped default (v4 span 16, W=240, NC=512)
    (8, 128, 2),     # NC=1024, half the grid steps
    (16, 64, 2),     # NC=1024, half the grid steps, taller bands
]


def main():
    shape = sys.argv[1] if len(sys.argv) > 1 else 'infer'
    import jax
    import jax.numpy as jnp
    from edvr_tpu.ops import dcn, dcn_band

    rng = np.random.RandomState(0)
    if shape == 'train':
        n, h, w = 20, 64, 64
    else:
        n, h, w = 5, 180, 320
    cin = cout = 64
    dg, K = 8, 9
    off = jnp.asarray(
        rng.uniform(-2, 2, size=(n, h, w, dg * 2 * K)).astype(np.float32))
    mask = jnp.asarray(
        (1 / (1 + np.exp(-rng.randn(n, h, w, dg * K)))).astype(np.float32))
    weight = jnp.asarray(
        (rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32))
    xs = [jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
          for _ in range(5)]

    tiny = jax.jit(lambda v: (v * 2).mean())
    ones = jnp.ones((8, 128))
    float(tiny(ones))
    overhead = min(
        (lambda t0: (float(tiny(ones)), time.time() - t0)[1])(time.time())
        for _ in range(5))

    for r, bw, J in CONFIGS:
        os.environ['EDVR_TPU_DCN_BAND'] = '1'
        os.environ['EDVR_TPU_DCN_BAND_R'] = str(r)
        os.environ['EDVR_TPU_DCN_BAND_BW'] = str(bw)
        os.environ['EDVR_TPU_DCN_BAND_J'] = str(J)
        SX = 128 // (2 * (cin // dg)) - 1
        tiles_x = (w - 1) // SX + 1
        g = dcn_band.BandGeom(n, h, tiles_x, h, w, 3, 3, dg, cin // dg,
                              cout, 1, 1, 1, r=r, bw=bw, J=J)
        fn = jax.jit(lambda *a: dcn.modulated_deform_conv(
            *a, None, stride=1, padding=1, dilation=1, groups=1,
            deformable_groups=dg).mean())
        t0 = time.time()
        float(fn(xs[0], off, mask, weight))
        compile_s = time.time() - t0
        times = []
        for x in xs[1:]:
            t0 = time.time()
            float(fn(x, off, mask, weight))
            times.append(time.time() - t0 - overhead)
        print(f'r={r} bw={bw} J={J}: span_y={g.span_y} '
              f'span_tx={g.span_tx} W={g.W} NC={g.NC} '
              f'-> {min(times) * 1000:.1f} ms  (compile {compile_s:.0f}s)',
              flush=True)


if __name__ == '__main__':
    main()
