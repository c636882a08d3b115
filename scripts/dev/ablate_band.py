"""Intra-kernel ablation of the banded DCN forward (dev tool).

Times stripped-down variants of dcn_band.band_forward on the EDVR-M L1
geometry to attribute the per-grid-step cost to its components (window
DMA, one-hot build, gather matmul, coefficient math, tap GEMM).  The
variants are NOT exact DCNs — they only preserve shapes and memory
traffic so the timing deltas isolate each component.

Usage: python scripts/dev/ablate_band.py [r bw J]
"""

import functools
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import numpy as np


def build_variant(geom, mode):
    """band_forward clone with components stripped per `mode`."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from edvr_tpu.ops.dcn_band import _div_magic

    g_ = geom
    NC, W, K, cout = g_.NC, g_.W, g_.K, g_.cout
    r, bw, dg = g_.r, g_.bw, g_.dg
    By, Bx = g_.By, g_.Bx
    span_y, span_tx = g_.span_y, g_.span_tx
    c_per = g_.c_per
    PX = g_.SX + 1
    w_pix = g_.w_pix
    div_mul = _div_magic(g_.SX)
    bw_shift = bw.bit_length() - 1

    start_y = jnp.asarray(g_.start_y)
    start_tx8 = jnp.asarray(g_.start_tx // 8)
    nsteps = g_.n * By * Bx * dg

    def kernel(sy_ref, stx_ref, oxm_ref, w_ref, tab_ref, out_ref,
               win_ref, sem_ref):
        etype = win_ref.dtype
        ni = pl.program_id(0)
        by = pl.program_id(1)
        bx = pl.program_id(2)
        gi = pl.program_id(3)
        step = ((ni * By + by) * Bx + bx) * dg + gi

        def copy_for(ni2, by2, bx2, gi2, slot):
            return pltpu.make_async_copy(
                tab_ref.at[ni2, gi2, pl.ds(sy_ref[by2], span_y),
                           pl.ds(stx_ref[bx2] * 8, span_tx), :],
                win_ref.at[slot], sem_ref.at[slot])

        def copy_step(st, slot):
            gi2 = jax.lax.rem(st, dg)
            r1 = jax.lax.div(st, dg)
            bx2 = jax.lax.rem(r1, Bx)
            r2 = jax.lax.div(r1, Bx)
            by2 = jax.lax.rem(r2, By)
            ni2 = jax.lax.div(r2, By)
            return copy_for(ni2, by2, bx2, gi2, slot)

        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _bootstrap():
            copy_for(ni, by, bx, gi, slot).start()

        @pl.when(step + 1 < nsteps)
        def _prefetch():
            copy_step(step + 1, 1 - slot).start()

        copy_for(ni, by, bx, gi, slot).wait()
        win = win_ref[slot].reshape(W, 128)

        pn = jax.lax.broadcasted_iota(jnp.int32, (1, NC), 1)
        yo = by * r + (pn >> bw_shift)
        xo = bx * bw + (pn & (bw - 1))
        posy = (yo * g_.stride - g_.padding).astype(jnp.float32)
        posx = (xo * g_.stride - g_.padding).astype(jnp.float32)
        sy_b = sy_ref[by]
        stx_b = stx_ref[bx] * 8

        iota_y = jax.lax.broadcasted_iota(jnp.int32, (span_y, NC), 0)
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (span_tx, NC), 0)

        acc = jnp.zeros((NC, cout), jnp.float32)
        for k in range(K):
            if mode == 'dma_only':
                break
            i, j = divmod(k, g_.kw)
            dy = oxm_ref[0, 0, 0, 0, 2 * k, :].reshape(1, NC)
            dx = oxm_ref[0, 0, 0, 0, 2 * k + 1, :].reshape(1, NC)
            m = oxm_ref[0, 0, 0, 0, 2 * K + k, :].reshape(1, NC)
            cy = posy + i * g_.dilation + dy
            cx = posx + j * g_.dilation + dx
            y0 = jnp.floor(cy)
            x0 = jnp.floor(cx)
            fy = cy - y0
            fx = cx - x0
            y0i = y0.astype(jnp.int32)
            x0i = x0.astype(jnp.int32)
            ty = jnp.clip(y0i, 0, g_.h - 1)
            xc = jnp.clip(x0i, 0, 8191)
            tx = jnp.minimum((xc * div_mul) >> 16, g_.tiles_x - 1)
            ry0 = y0i - ty
            px0 = x0i - g_.SX * tx
            vy0 = ((y0i >= 0) & (y0i <= g_.h - 1)).astype(jnp.float32)
            vy1 = ((y0i + 1 >= 0) &
                   (y0i + 1 <= g_.h - 1)).astype(jnp.float32)
            vx0 = ((x0i >= 0) & (x0i <= w_pix - 1)).astype(jnp.float32)
            vx1 = ((x0i + 1 >= 0) &
                   (x0i + 1 <= w_pix - 1)).astype(jnp.float32)
            wy0 = (1 - fy) * vy0 * m
            wy1 = fy * vy1 * m
            wx0 = (1 - fx) * vx0
            wx1 = fx * vx1

            if mode == 'rows_only':
                # per-point math only; fold rows into acc cheaply
                # (broadcast over the cout lanes; no minor-dim insert)
                val = (wy0 + wy1 + wx0 + wx1 +
                       ry0.astype(jnp.float32) +
                       px0.astype(jnp.float32))          # (1, NC)
                acc = acc + jax.lax.dot_general(
                    val, jnp.ones((1, cout), jnp.float32),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (NC, cout)
                continue

            if mode == 'no_product':
                onehot = jnp.broadcast_to(
                    (iota_y == (ty - sy_b)).astype(etype)[:, None, :],
                    (span_y, span_tx, NC)).reshape(W, NC)
            else:
                oy = (iota_y == (ty - sy_b)).astype(etype)
                ox = (iota_x == (tx - stx_b)).astype(etype)
                onehot = (oy[:, None, :] * ox[None, :, :]).reshape(W, NC)

            if mode == 'onehot_only':
                # reduce the one-hot without the MXU gather
                val = jnp.sum(onehot.astype(jnp.float32), axis=0,
                              keepdims=True)             # (1, NC)
                acc = acc + jax.lax.dot_general(
                    val, jnp.ones((1, cout), jnp.float32),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                continue

            gT = jax.lax.dot_general(
                win, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (128, NC)

            if mode == 'no_coef':
                blendT = gT.astype(etype)
            else:
                ay0 = wy0 + jnp.where(ry0 == -1, wy1, 0.0)
                ay1 = jnp.where(ry0 == 0, wy1, 0.0)
                cparts = []
                for ayr in (ay0, ay1):
                    for ps in range(PX):
                        bxp = jnp.where(px0 == ps, wx0, 0.0) + \
                            jnp.where(px0 == ps - 1, wx1, 0.0)
                        coef = ayr * bxp
                        cparts.append(
                            jnp.broadcast_to(coef, (c_per, NC)))
                cfullT = jnp.concatenate(cparts, axis=0)
                blendT = (gT * cfullT).astype(etype)
            acc = acc + jax.lax.dot_general(
                blendT, w_ref[k, 0], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (NC, cout)

        acc = acc.reshape(1, 1, 1, NC, cout)

        @pl.when(gi == 0)
        def _init():
            out_ref[...] = acc

        @pl.when(gi != 0)
        def _acc():
            out_ref[...] = out_ref[...] + acc

    def run(tab4, oxm, wexp):
        if g_.tiles_x_pad != g_.tiles_x:
            tab4 = jnp.pad(tab4, ((0, 0), (0, 0), (0, 0),
                                  (0, g_.tiles_x_pad - g_.tiles_x),
                                  (0, 0)))
        grid = (g_.n, By, Bx, dg)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, 1, 3 * K, NC),
                             lambda n, y, x, g: (g, n, y, x, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, 1, 128, cout),
                             lambda n, y, x, g: (0, g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, NC, cout),
                                   lambda n, y, x, g: (n, y, x, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (g_.n, By, Bx, NC, cout), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, span_y, span_tx, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(start_y, start_tx8, oxm, wexp, tab4)

    return run


def main_v5():
    """Ablate the REAL shipped v5 kernel via band_forward(_ablate=...):
    locates the cost of the in-kernel NHWC handling (field select-
    transposes, inw indicator output) and prices the integer-offset
    blend (the EDVR_TPU_DCN_QUANT=int fast-path upper bound)."""
    import time as _t

    import jax
    import jax.numpy as jnp
    from edvr_tpu.ops import dcn_band

    n, h, w = 5, 180, 320
    cin = cout = 64
    dg, K = 8, 9
    c_per = cin // dg
    SX = 128 // (2 * c_per) - 1
    tiles_x = (w - 1) // SX + 1
    g = dcn_band.BandGeom(n, h, tiles_x, h, w, 3, 3, dg, c_per, cout,
                          1, 1, 1, r=8, bw=64, J=2, w_pix=w)
    assert g.eligible()
    print(f'v5 geom: span_y={g.span_y} span_tx={g.span_tx} W={g.W} '
          f'NC={g.NC} steps={n * g.By * g.Bx * dg}', flush=True)

    rng = np.random.RandomState(0)
    tab4 = jnp.asarray(rng.randn(n, dg, h, g.tiles_x_pad, 128)
                       .astype(np.float32)).astype(jnp.bfloat16)
    offs = [jnp.asarray(rng.uniform(-2, 2, (n, h, w, dg * 2 * K))
                        .astype(np.float32)) for _ in range(4)]
    msk = jnp.asarray(rng.rand(n, h, w, dg * K).astype(np.float32))
    wexp = jnp.asarray(rng.randn(K, dg, 128, cout)
                       .astype(np.float32)).astype(jnp.bfloat16)

    tiny = jax.jit(lambda v: (v * 2).mean())
    ones = jnp.ones((8, 128))
    float(tiny(ones))
    overhead = min(
        (lambda t0: (float(tiny(ones)), _t.time() - t0)[1])(_t.time())
        for _ in range(5))

    for mode in ('', 'no_inw', 'noselect', 'no_inw,noselect',
                 'int_coef', 'no_inw,noselect,int_coef'):
        fn = jax.jit(lambda t, o, m, w_, _m=mode: dcn_band.band_forward(
            g, t, o, m, w_, _ablate=_m)[0].mean())
        t0 = _t.time()
        float(fn(tab4, offs[0], msk, wexp))
        compile_s = _t.time() - t0
        times = []
        for o in offs[1:]:
            t0 = _t.time()
            float(fn(tab4, o, msk, wexp))
            times.append(_t.time() - t0 - overhead)
        label = mode or 'v5_full'
        print(f'{label:28s}: {min(times) * 1000:7.1f} ms '
              f'(compile {compile_s:.0f}s)', flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from edvr_tpu.ops import dcn_band

    r, bw, J = 8, 64, 2
    if len(sys.argv) > 3:
        r, bw, J = map(int, sys.argv[1:4])

    n, h, w = 5, 180, 320
    cin = cout = 64
    dg, K = 8, 9
    c_per = cin // dg
    SX = 128 // (2 * c_per) - 1
    tiles_x = (w - 1) // SX + 1
    g = dcn_band.BandGeom(n, h, tiles_x, h, w, 3, 3, dg, c_per, cout,
                          1, 1, 1, r=r, bw=bw, J=J, w_pix=w)
    assert g.eligible()
    print(f'geom: r={r} bw={bw} J={J} span_y={g.span_y} '
          f'span_tx={g.span_tx} W={g.W} NC={g.NC} '
          f'steps={n * g.By * g.Bx * dg}', flush=True)

    rng = np.random.RandomState(0)
    tab4 = jnp.asarray(rng.randn(n, dg, h, tiles_x, 128)
                       .astype(np.float32)).astype(jnp.bfloat16)
    dy = rng.uniform(-2, 2, (n, dg, K, h * w)).astype(np.float32)
    dx = rng.uniform(-2, 2, (n, dg, K, h * w)).astype(np.float32)
    msk = rng.rand(n, dg, K, h * w).astype(np.float32)
    # local oxm pack (the library moved to split banded off/msk fields;
    # the variant kernels here still use the combined 3K layout)
    def pack(g_, dy_, dx_, msk_):
        n_, dg_, K_, P_ = dy_.shape
        off_ = np.stack([dy_, dx_], axis=3).reshape(n_, dg_, 2 * K_, P_)
        oxm_ = np.concatenate([off_, msk_], axis=2)
        oxm_ = oxm_.reshape(n_, dg_, 3 * K_, g_.out_h, g_.out_w)
        Hp, Wp = g_.By * g_.r, g_.Bx * g_.bw
        if Hp != g_.out_h or Wp != g_.out_w:
            oxm_ = np.pad(oxm_, ((0, 0), (0, 0), (0, 0),
                                 (0, Hp - g_.out_h), (0, Wp - g_.out_w)))
        oxm_ = oxm_.reshape(n_, dg_, 3 * K_, g_.By, g_.r, g_.Bx, g_.bw)
        return jnp.asarray(oxm_.transpose(1, 0, 3, 5, 2, 4, 6).reshape(
            dg_, n_, g_.By, g_.Bx, 3 * K_, g_.NC))

    oxm = pack(g, dy, dx, msk)
    wexp = jnp.asarray(rng.randn(K, dg, 128, cout)
                       .astype(np.float32)).astype(jnp.bfloat16)

    tiny = jax.jit(lambda v: (v * 2).mean())
    ones = jnp.ones((8, 128))
    float(tiny(ones))
    overhead = min(
        (lambda t0: (float(tiny(ones)), time.time() - t0)[1])(time.time())
        for _ in range(5))

    oxms = [oxm, oxm * 1.0001, oxm * 0.9999, oxm * 1.0002, oxm * 0.9998]
    for mode in ('full', 'no_coef', 'onehot_only', 'no_product',
                 'rows_only', 'dma_only'):
        run = build_variant(g, mode)
        fn = jax.jit(lambda t, o, w_: run(t, o, w_).mean())
        t0 = time.time()
        float(fn(tab4, oxms[0], wexp))
        compile_s = time.time() - t0
        times = []
        for o in oxms[1:]:
            t0 = time.time()
            float(fn(tab4, o, wexp))
            times.append(time.time() - t0 - overhead)
        print(f'{mode:12s}: {min(times) * 1000:7.1f} ms '
              f'(compile {compile_s:.0f}s)', flush=True)


if __name__ == '__main__':
    if '--v5' in sys.argv:
        main_v5()
    else:
        main()
