"""Banded one-hot Pallas kernel for the packed deformable conv.

The packed DCN formulation (edvr_tpu/ops/dcn.py `_mdcn_packed`) turns
every (deformable-group, kernel-tap) stream into one wide row-gather
from a 128-lane tile table followed by a lane-select bilinear blend and
a tap-concat GEMM.  On v5e the gathers run at ~100 GB/s with 4x read
amplification (512-byte rows fetched for 128 bytes of corner data), and
they dominate EDVR end to end (docs/TPUDesign.md).

This kernel removes the gather primitive entirely by exploiting the
raster structure of the sample positions: the output pixels of a small
2-D band (r rows x bw cols) sample, for every tap, table rows inside a
window whose start is STATIC (known at trace time) — the learned
offsets only jitter the row within the window (J pixels of headroom).
Per (image, band, group) grid step the kernel:

  1. DMAs the (span_y, span_tx, 128) table window HBM->VMEM once,
     shared by all K taps;
  2. builds each tap's (W, NC) one-hot selection matrix in VMEM from an
     iota/compare against the window-relative row indices (never
     touching HBM — the reason this must be Pallas and not XLA, which
     would materialize M*W one-hot bytes);
  3. gathers by MXU contraction onehot^T x window -> (NC, 128) rows;
  4. expands the compact 16-slot blend coefficients to 128 lanes with a
     constant one-hot matmul and applies the bilinear blend;
  5. contracts against the tap's slot-tiled weights, accumulating the
     (NC, cout) band output across taps and groups in VMEM (revisited
     output block), written to HBM once per band.

Points whose learned offset exceeds the J-pixel headroom fall outside
the window, produce an all-zero one-hot row, and contribute 0; the
caller patches them up exactly with a compacted gather/scatter pass
(`outlier_patch` below), so the result is exact for every input.

Replaces the gather's O(M * 512 B) HBM traffic with O(M/NC * W * 256 B)
window traffic (shared across taps) + a dense MXU term 2*M*W*128 FLOPs.

Reference semantics: basicsr/models/ops/dcn/src/deform_conv_cuda_kernel.cu
(modulated deformable im2col + GEMM); parity is tested against the XLA
gather path, itself golden-tested against the reference CUDA oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class BandGeom:
    """Static geometry of the banded DCN kernel (hashable)."""

    def __init__(self, n, h, tiles_x, out_h, out_w, kh, kw, dg, c_per,
                 cout, stride, padding, dilation, r=4, bw=112, J=8):
        SX = 128 // (2 * c_per) - 1
        self.n, self.h, self.tiles_x = n, h, tiles_x
        self.out_h, self.out_w = out_h, out_w
        self.kh, self.kw, self.K = kh, kw, kh * kw
        self.dg, self.c_per, self.cout = dg, c_per, cout
        self.stride, self.padding, self.dilation = stride, padding, dilation
        self.SX = SX
        r = min(r, out_h)
        bw = min(bw, out_w)
        self.r, self.bw, self.J = r, bw, J
        self.By = -(-out_h // r)
        self.Bx = -(-out_w // bw)
        self.NC = r * bw
        self.span_y = min(
            (r - 1) * stride + dilation * (kh - 1) + 2 * J + 2, h)
        span_tx = (-(-((bw - 1) * stride + dilation * (kw - 1) + 2 * J + 2)
                     // SX) + 1)
        # Mosaic requires window slices on the sublane (tile) dim to be
        # 8-aligned in both offset and extent: the kernel table is
        # padded to a multiple of 8 tiles, starts are floored to 8, and
        # the span absorbs the up-to-7-tile flooring drift
        self.tiles_x_pad = -(-tiles_x // 8) * 8
        self.span_tx = min(-(-(span_tx + 7) // 8) * 8, self.tiles_x_pad)
        self.W = self.span_y * self.span_tx
        # static per-band window starts
        self.start_y = np.clip(
            np.arange(self.By) * r * stride - padding - J,
            0, h - self.span_y).astype(np.int32)
        raw_tx = np.clip(
            (np.arange(self.Bx) * bw * stride - padding - J) // SX,
            0, self.tiles_x_pad - self.span_tx)
        self.start_tx = ((raw_tx // 8) * 8).astype(np.int32)

    def key(self):
        return (self.n, self.h, self.tiles_x, self.out_h, self.out_w,
                self.kh, self.kw, self.dg, self.c_per, self.cout,
                self.stride, self.padding, self.dilation, self.r,
                self.bw, self.J)

    def __hash__(self):
        return hash(self.key())

    def __eq__(self, other):
        return isinstance(other, BandGeom) and self.key() == other.key()

    def eligible(self):
        """Whether the banded kernel applies.

        Needs enough rows/tiles to window, bands small enough for VMEM,
        and a LARGE spatial problem: at train-crop sizes (64px, P=4k)
        the gather path wins — band prep/patch fixed costs exceed the
        gather saving and the extra graphs push the train-step compile
        from ~10 to ~19 min (measured 378 vs 356 ms/step). At
        inference sizes (P>=16k) band wins (80 vs 100 ms at the EDVR-M
        L1 shape).
        """
        return (self.h >= self.span_y
                and self.tiles_x_pad >= self.span_tx
                and self.out_h * self.out_w >= 16384
                and self.W <= 4096 and self.NC <= 1024)


def band_prep(geom, rows, cs):
    """Re-band the stacked row/coefficient streams for the kernel.

    Args:
        geom: BandGeom.
        rows: (T, n, P) int32 absolute table rows, T = dg*K g-major.
        cs: (T, n, P, 2*PX) blend coefficients (etype).

    Returns:
        rel: (n, dg, By, Bx, K, NC) int32 window-relative row index,
            -1 for out-of-window (outlier) or grid-padding points.
        csb: (n, dg, By, Bx, K, NC, 2*PX) etype coefficients.
        inw: (T, n, P) bool in-window mask (False = needs patch).
    """
    g_ = geom
    n, dg, K = g_.n, g_.dg, g_.K
    PX = g_.SX + 1
    P = g_.out_h * g_.out_w

    blk = g_.h * g_.tiles_x
    rows_blk = rows % blk                                   # strip (n, g)
    ty = rows_blk // g_.tiles_x
    tx = rows_blk - ty * g_.tiles_x
    sy = jnp.asarray(np.repeat(g_.start_y, g_.r)[:g_.out_h])
    stx = jnp.asarray(np.repeat(g_.start_tx, g_.bw)[:g_.out_w])
    sy = jnp.broadcast_to(sy[:, None], (g_.out_h, g_.out_w)).reshape(P)
    stx = jnp.broadcast_to(stx[None, :], (g_.out_h, g_.out_w)).reshape(P)
    ry = ty - sy
    rx = tx - stx
    inw = ((ry >= 0) & (ry < g_.span_y) & (rx >= 0) & (rx < g_.span_tx))
    rel = jnp.where(inw, ry * g_.span_tx + rx, -1)

    # (T, n, P) -> (n, dg, K, out_h, out_w) -> banded
    rel = rel.reshape(dg, K, n, g_.out_h, g_.out_w).transpose(2, 0, 1, 3, 4)
    csb = cs.reshape(dg, K, n, g_.out_h, g_.out_w, 2 * PX)
    csb = csb.transpose(2, 0, 1, 3, 4, 5)
    Hp, Wp = g_.By * g_.r, g_.Bx * g_.bw
    if Hp != g_.out_h or Wp != g_.out_w:
        pad = ((0, 0),) * 3 + ((0, Hp - g_.out_h), (0, Wp - g_.out_w))
        rel = jnp.pad(rel, pad, constant_values=-1)
        csb = jnp.pad(csb, pad + ((0, 0),))
    rel = rel.reshape(n, dg, K, g_.By, g_.r, g_.Bx, g_.bw)
    rel = rel.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
        n, dg, g_.By, g_.Bx, K, g_.NC)
    csb = csb.reshape(n, dg, K, g_.By, g_.r, g_.Bx, g_.bw, 2 * PX)
    csb = csb.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        n, dg, g_.By, g_.Bx, K, g_.NC, 2 * PX)
    return rel, csb, inw


def unband(geom, out5):
    """(n, By, Bx, NC, cout) -> (n, out_h, out_w, cout)."""
    g_ = geom
    out = out5.reshape(g_.n, g_.By, g_.Bx, g_.r, g_.bw, g_.cout)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
        g_.n, g_.By * g_.r, g_.Bx * g_.bw, g_.cout)
    return out[:, :g_.out_h, :g_.out_w]


@functools.partial(jax.jit, static_argnames=('geom', 'interpret'))
def band_forward(geom, tab4, rel, csb, wexp, interpret=False):
    """Banded DCN forward: one-hot select + blend + tap GEMM, in VMEM.

    Args:
        geom: BandGeom.
        tab4: (n, dg, h, tiles_x, 128) tile table (etype).
        rel: (n, dg, By, Bx, K, NC) int32 window-relative rows (-1=skip).
        csb: (n, dg, By, Bx, K, NC, 16) etype compact blend coeffs.
        wexp: (K, dg, 128, cout) slot-tiled weights (etype).

    Returns:
        (n, By, Bx, NC, cout) float32 banded output (see `unband`).
    """
    g_ = geom
    NC, W, K, cout = g_.NC, g_.W, g_.K, g_.cout
    slots = 2 * (g_.SX + 1)
    etype = tab4.dtype

    expand = np.zeros((slots, 128), np.float32)
    for s in range(slots):
        expand[s, s * g_.c_per:(s + 1) * g_.c_per] = 1.0
    expand = jnp.asarray(expand, etype)

    if g_.tiles_x_pad != g_.tiles_x:
        tab4 = jnp.pad(tab4, ((0, 0), (0, 0), (0, 0),
                              (0, g_.tiles_x_pad - g_.tiles_x), (0, 0)))

    start_y = jnp.asarray(g_.start_y)
    # starts on the tiled dim are 8-aligned by construction; pass them
    # divided by 8 and rescale in-kernel so Mosaic can PROVE the slice
    # offset divisible by the tiling
    start_tx8 = jnp.asarray(g_.start_tx // 8)

    def kernel(sy_ref, stx_ref, rel_ref, cs_ref, w_ref, e_ref, tab_ref,
               out_ref, win_ref, sem_ref):
        ni = pl.program_id(0)
        by = pl.program_id(1)
        bx = pl.program_id(2)
        gi = pl.program_id(3)
        copy = pltpu.make_async_copy(
            tab_ref.at[ni, gi, pl.ds(sy_ref[by], g_.span_y),
                       pl.ds(stx_ref[bx] * 8, g_.span_tx), :],
            win_ref, sem_ref)
        copy.start()
        copy.wait()
        win = win_ref[:].reshape(W, 128)

        acc = jnp.zeros((NC, cout), jnp.float32)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, NC), 0)
        for k in range(K):
            rel_k = rel_ref[0, 0, 0, 0, k, :]                 # (NC,)
            onehot_t = (iota_w == rel_k[None, :]).astype(etype)  # (W, NC)
            g_rows = jax.lax.dot_general(
                onehot_t, win, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (NC, 128)
            cfull = jnp.dot(cs_ref[0, 0, 0, 0, k], e_ref[:],
                            preferred_element_type=jnp.float32)
            blend = (g_rows * cfull).astype(etype)
            acc = acc + jnp.dot(blend, w_ref[k, 0],
                                preferred_element_type=jnp.float32)
        acc = acc.reshape(1, 1, 1, NC, cout)

        @pl.when(gi == 0)
        def _init():
            out_ref[...] = acc

        @pl.when(gi != 0)
        def _acc():
            out_ref[...] = out_ref[...] + acc

    grid = (g_.n, g_.By, g_.Bx, g_.dg)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, 1, K, NC),
                         lambda n, y, x, g: (n, g, y, x, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, K, NC, slots),
                         lambda n, y, x, g: (n, g, y, x, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, 128, cout),
                         lambda n, y, x, g: (0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, NC, cout),
                               lambda n, y, x, g: (n, y, x, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (g_.n, g_.By, g_.Bx, NC, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((g_.span_y, g_.span_tx, 128), etype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(start_y, start_tx8, rel, csb, wexp, expand, tab4)
    return out


def outlier_patch(geom, out_flat, tab, rows, cs, inw, wexp, etype, cap):
    """Add the contributions of points the banded kernel skipped.

    Compacts the out-of-window points across every (group, tap) stream
    with a fixed-capacity nonzero, regathers their table rows with the
    plain row gather, blends, and applies each stream's weights via
    masked matmuls, scatter-adding into the flat output. Exact for ANY
    outlier count: points are ranked (cumsum over the outlier mask) and
    a lax.while_loop processes successive rank windows of `cap` points,
    so the patch graph appears ONCE in the HLO no matter how
    pathological the offset field (an earlier design guarded overflow
    with a dense-recompute lax.cond branch, which doubled the DCN's HLO
    and pushed EDVR train-step compiles past 25 minutes).

    Args:
        out_flat: (n*P, cout) float32 kernel output (unbanded, flat).
        rows: (T, n, P) int32 absolute rows; cs: (T, n, P, 16) coeffs.
        inw: (T, n, P) bool from band_prep.
    Returns:
        patched (n*P, cout) float32.
    """
    g_ = geom
    M = g_.n * g_.out_h * g_.out_w
    T = g_.dg * g_.K
    cout = g_.cout
    flat_mask = ~inw.reshape(T * M)
    n_out = jnp.sum(flat_mask)
    rank = jnp.cumsum(flat_mask) - 1          # rank among outliers
    rows_flat = rows.reshape(T * M)
    cs_flat = cs.reshape(T * M, -1)

    def body(carry):
        out_pad, i = carry
        sel = (flat_mask & (rank >= i * cap) & (rank < (i + 1) * cap))
        pos = jnp.nonzero(sel, size=cap, fill_value=T * M)[0]
        valid = pos < T * M
        cp = jnp.clip(pos, 0, T * M - 1)
        s_e = cp // M
        pt_e = cp % M
        G = jnp.take(tab, rows_flat[cp], axis=0).astype(etype)
        cf = jnp.repeat(cs_flat[cp], g_.c_per, axis=1)
        blend = G * cf.astype(etype) * valid[:, None].astype(etype)
        contrib = jnp.zeros((cap, cout), jnp.float32)
        for g in range(g_.dg):
            for k in range(g_.K):
                s = g * g_.K + k
                bmask = (s_e == s).astype(etype)
                contrib = contrib + jnp.dot(
                    blend * bmask[:, None], wexp[k, g],
                    preferred_element_type=jnp.float32)
        fb = jnp.where(valid, pt_e, M)
        return out_pad.at[fb].add(contrib), i + 1

    out_pad = jnp.concatenate(
        [out_flat, jnp.zeros((1, cout), out_flat.dtype)])
    out_pad, _ = jax.lax.while_loop(
        lambda c: c[1] * cap < n_out, body, (out_pad, 0))
    return out_pad[:M]
