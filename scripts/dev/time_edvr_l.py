"""EDVR-L x4 forward latency + band-vs-gather output PSNR on the TPU.

EDVR-L: 128 feat (c_per=16, PX=4, SX=3 packing), 40 recon blocks.
Also reports the image-domain PSNR between the banded-kernel forward
and the gather forward of EDVR-M, quantifying the bf16-level numeric
difference at the model output.

Usage: python scripts/dev/time_edvr_l.py
"""

import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import numpy as np


def time_fwd(net, params, xs, fwd):
    import jax
    import jax.numpy as jnp
    tiny = jax.jit(lambda v: (v * 2).mean())
    ones = jnp.ones((8, 128))
    float(tiny(ones))
    overhead = min(
        (lambda t0: (float(tiny(ones)), time.time() - t0)[1])(time.time())
        for _ in range(5))
    float(fwd(params, xs[0]).mean())
    times = []
    for x in xs[1:]:
        t0 = time.time()
        float(fwd(params, x).mean())
        times.append(time.time() - t0 - overhead)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from edvr_tpu.archs import define_network

    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.rand(1, 5, 180, 320, 3).astype(np.float32))
          for _ in range(5)]

    # EDVR-L latency (band on)
    net_l = define_network(
        dict(type='EDVR', num_in_ch=3, num_out_ch=3, num_feat=128,
             num_frame=5, deformable_groups=8, num_extract_block=5,
             num_reconstruct_block=40, center_frame_idx=2, hr_in=False,
             with_predeblur=False, with_tsa=True))
    params_l = net_l.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 5, 16, 16, 3)))['params']
    fwd_l = jax.jit(lambda p, x: net_l.apply({'params': p}, x))
    for band in ('0', '1'):
        os.environ['EDVR_TPU_DCN_BAND'] = band
        fwd = jax.jit(lambda p, x, _b=band: net_l.apply({'params': p}, x))
        t = time_fwd(net_l, params_l, xs, fwd)
        print(f'EDVR-L x4 (1,5,180,320,3) band={band}: {t * 1000:.1f} ms '
              f'({1 / t:.2f} fps)', flush=True)

    # EDVR-M band-vs-gather output PSNR
    net_m = define_network(
        dict(type='EDVR', num_in_ch=3, num_out_ch=3, num_feat=64,
             num_frame=5, deformable_groups=8, num_extract_block=5,
             num_reconstruct_block=10, center_frame_idx=2, hr_in=False,
             with_predeblur=False, with_tsa=True))
    params_m = net_m.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 5, 16, 16, 3)))['params']
    outs = {}
    for band in ('0', '1'):
        os.environ['EDVR_TPU_DCN_BAND'] = band
        fwd = jax.jit(lambda p, x, _b=band: net_m.apply({'params': p}, x))
        outs[band] = np.asarray(fwd(params_m, xs[0]))
    a = np.clip(outs['0'], 0, 1)
    b = np.clip(outs['1'], 0, 1)
    mse = float(np.mean((a - b) ** 2)) + 1e-20
    print(f'EDVR-M band-vs-gather output PSNR: '
          f'{10 * np.log10(1.0 / mse):.1f} dB', flush=True)


if __name__ == '__main__':
    main()
