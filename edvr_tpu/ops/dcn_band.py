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

  1. DMAs the (span_y, span_tx, 128) table window HBM->VMEM, shared by
     all K taps and double-buffered across grid steps (the window start
     is element-granular and band windows overlap, which BlockSpec
     pipelining cannot express — hence the manual descriptors);
  2. computes, from the raw offsets/mask block, the fractional sample
     position, tile coordinates, bilinear weights, and window-relative
     indices of each tap IN-KERNEL (earlier versions materialized
     per-(group, tap) index/coefficient streams in HBM — 763 MB at the
     EDVR-M L1 shape, ~28 ms/call of pure layout copies, and enough
     buffers to OOM HBM at batch 5). The offset/mask fields arrive in
     their NATIVE NHWC conv layout: the kernel extracts its group's
     per-tap (1, NC) rows with one exact one-hot MXU select-transpose
     per (band, group) step (float32 @ Precision.HIGHEST — bit-exact,
     verified), replacing the v2 design's XLA banding transpose of the
     whole field (~16 ms and ~500 MB of HBM round-trip per EDVR-M L1
     call — as much as the kernel itself);
  3. builds each tap's (W, NC) one-hot selection matrix in VMEM as the
     outer product of a y-row one-hot and an x-tile one-hot (the
     iota/compares cost (span_y + span_tx) * NC instead of W * NC and
     the product is one VPU multiply pass); the one-hot never touches
     HBM — the reason this must be Pallas and not XLA;
  4. gathers by MXU contraction onehot^T x window -> (NC, 128) rows;
  5. expands the bilinear weights over the 128 (row, pixel, channel)
     lane slots with constant lane masks (pure broadcasts — no
     relayouts), blends, and contracts against the tap's slot-tiled
     weights, accumulating the (r, bw, cout) band output across taps
     and groups in a revisited VMEM output block.

Points whose learned offset exceeds the J-pixel headroom fall outside
the window, produce an all-zero one-hot row, and contribute 0; the
caller patches them up exactly with `outlier_patch` (rank-windowed
while_loop -> exact for ANY outlier count with one patch graph in the
HLO), so the result is exact for every input.

Mosaic constraints (discovered the hard way, see docs/TPUDesign.md):
window slices on the tiled tile-column dim must be 8-aligned in offset
and extent — the table is padded to a multiple of 8 tiles, starts are
floored to 8 with the span absorbing the drift, and start/8 is passed
through SMEM so the divisibility is provable; the table must be pinned
to pltpu.HBM or the compiler VMEM-places it and the unaligned dynamic
slice fails to lower; block shapes must keep their trailing dims
(8, 128)-divisible or span the array dim (the NHWC field blocks span
the channel dim). Blocks need NOT divide the array: edge bands read
undefined rows and write masked stores — the kernel zeroes the
undefined offset/mask rows at band-padding points (pad_pt), so no NaN
from uninitialized memory can propagate into real outputs.

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


# trace-time call counters: parity tests assert the band kernels were
# actually engaged (a silent fallback to the gather path once turned
# the whole test file vacuous)
TRACE_COUNTS = {'fwd': 0, 'bwd': 0}


class BandGeom:
    """Static geometry of the banded DCN kernel (hashable)."""

    def __init__(self, n, h, tiles_x, out_h, out_w, kh, kw, dg, c_per,
                 cout, stride, padding, dilation, r=8, bw=64, J=4,
                 w_pix=None):
        SX = 128 // (2 * c_per) - 1
        self.n, self.h, self.tiles_x = n, h, tiles_x
        self.w_pix = w_pix if w_pix is not None else SX * tiles_x
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
        # 8-aligned in both offset and extent. Starts are floored to 8
        # and the span absorbs the flooring drift — but the drift is
        # MEASURED from the actual static start sequence, not assumed
        # worst-case 7: when the per-band tile advance bw*stride/SX is
        # itself a multiple of 8 (e.g. bw=56 at SX=7), every band start
        # shares one residue, and a LEFT table pad of (8 - residue) % 8
        # tiles shifts them all onto the 8-grid — drift 0, so the span
        # is the bare receptive extent rounded up once (co-designed
        # band/tile grid; kills the up-to-36% alignment waste of the
        # worst-case formula, docs/TPUDesign.md "Speed-of-light
        # accounting" item 3).
        raw_tx = (np.arange(self.Bx) * bw * stride - padding - J) // SX
        if len(raw_tx) and np.all((raw_tx - raw_tx[0]) % 8 == 0):
            self.pad_tx_l = int((-raw_tx[0]) % 8)
        else:
            self.pad_tx_l = 0
        # negative raw starts clamp to 0 (the table has no tiles below
        # 0; points left of the window are handled by corner validity
        # or the outlier patch), so they contribute no flooring drift
        raw_tx = np.maximum(raw_tx + self.pad_tx_l, 0)
        self.tiles_x_pad = -(-(tiles_x + self.pad_tx_l) // 8) * 8
        floored = (raw_tx // 8) * 8
        drift = int(np.max(raw_tx - floored)) if len(raw_tx) else 0
        self.span_tx = min(-(-(span_tx + drift) // 8) * 8,
                           self.tiles_x_pad)
        self.W = self.span_y * self.span_tx
        # static per-band window starts
        self.start_y = np.clip(
            np.arange(self.By) * r * stride - padding - J,
            0, h - self.span_y).astype(np.int32)
        self.start_tx = np.clip(
            floored, 0, self.tiles_x_pad - self.span_tx).astype(np.int32)

    def key(self):
        return (self.n, self.h, self.tiles_x, self.w_pix, self.out_h,
                self.out_w, self.kh, self.kw, self.dg, self.c_per,
                self.cout, self.stride, self.padding, self.dilation,
                self.r, self.bw, self.J)

    def __hash__(self):
        return hash(self.key())

    def __eq__(self, other):
        return isinstance(other, BandGeom) and self.key() == other.key()

    def eligible(self):
        """Whether the banded kernel applies.

        Geometric legality only (rows/tiles fit a window, VMEM
        bounds, exact in-kernel integer division). The PROBLEM-SIZE
        policy (which shapes actually profit) lives in the caller's
        EDVR_TPU_DCN_BAND_MIN_P gate.
        """
        return (self.h >= self.span_y
                and self.tiles_x_pad >= self.span_tx
                and self.W <= 4096 and self.NC <= 1024
                # the in-kernel mul-shift floordiv is exact to 8191
                and self.SX * self.tiles_x <= 8191
                # row-space point decode: power-of-2 bw uses shifts,
                # anything else the exact mul-shift division (range
                # NC <= 1024 < 8191 covered); bw % 8 == 0 keeps the
                # (NC, c) <-> (1, r, bw, c) sublane splits free views
                and self.bw % 8 == 0
                # Mosaic cannot lower (span_y, NC)->(span_y, 1, NC)
                # broadcasts when the lane dim is a partial vreg:
                # measured "infer-vector-layout: unsupported shape
                # cast" at NC=448 (r=8, bw=56) on v5e — NC must fill
                # whole 128-lane registers
                and self.NC % 128 == 0)


# magic multiplier for exact floor(x / SX) on 0 <= x <= 8191 via
# (x * _DIV_MUL[SX]) >> 16
def _div_magic(sx, max_x=8191):
    m = -(-(1 << 16) // sx)
    assert all((x * m) >> 16 == x // sx
               for x in range(0, max_x + 1)), (sx, max_x)
    return m


def _point_decoders(bw, max_pn):
    """Row-space decode pn -> (row, col) within a band, for any bw.

    Power-of-two bw uses shift/mask; anything else the exact mul-shift
    division, whose 16-bit magic is verified over the actual point
    range (pn <= NC - 1 <= 1023 by eligibility — far inside the range
    where the magic stays exact).
    """
    if bw & (bw - 1) == 0:
        shift = bw.bit_length() - 1
        return (lambda pn: pn >> shift), (lambda pn, y: pn & (bw - 1))
    mul = _div_magic(bw, max_x=max_pn)
    return (lambda pn: (pn * mul) >> 16), (lambda pn, y: pn - y * bw)


def band_field(geom, arr, nch):
    """(n, out_h, out_w, dg*nch) NHWC field -> banded kernel layout.

    The kernel computes everything in "row space" — every per-tap
    quantity is a (1, NC) lane row, so the channel extraction is a
    plain sublane slice and NO vector relayouts happen in-kernel. That
    requires the points of a band contiguous on the minor dim, hence
    this banded layout: ONE pad+transpose per field (offsets, mask),
    straight from the conv's native NHWC output. Channel order within
    a group is preserved, so for the offset field channel 2k/2k+1 is
    tap k's dy/dx and for the mask field channel k is tap k's m —
    exactly the kernel's slicing convention.

    Returns:
        (dg, n, By, Bx, nch, NC) float32.
    """
    g_ = geom
    n = arr.shape[0]
    Hp, Wp = g_.By * g_.r, g_.Bx * g_.bw
    arr = arr.astype(jnp.float32)
    if Hp != g_.out_h or Wp != g_.out_w:
        arr = jnp.pad(arr, ((0, 0), (0, Hp - g_.out_h),
                            (0, Wp - g_.out_w), (0, 0)))
    a = arr.reshape(n, g_.By, g_.r, g_.Bx, g_.bw, g_.dg, nch)
    a = a.transpose(5, 0, 1, 3, 6, 2, 4).reshape(
        g_.dg, n, g_.By, g_.Bx, nch, g_.NC)
    return a


def unband_field(geom, a):
    """Banded (dg, n, By, Bx, nch, NC) -> (n, out_h, out_w, dg*nch)."""
    g_ = geom
    dg, n, By, Bx, nch, NC = a.shape
    a = a.reshape(dg, n, By, Bx, nch, g_.r, g_.bw)
    a = a.transpose(1, 2, 5, 3, 6, 0, 4).reshape(
        n, By * g_.r, Bx * g_.bw, dg * nch)
    return a[:, :g_.out_h, :g_.out_w]


def point_coeffs(geom, dy, dx, m, pos_y, pos_x):
    """Bilinear/mask weights + slot indices for a flat batch of points.

    Same math as the kernel and the gather path, vectorized over any
    leading shape. Used by the outlier patch and the backward.

    Returns dict with fy, fx, y0i, x0i, ty, tx, px0, wy0, wy1, wx0,
    wx1 (floats in dy's dtype) — cslot[rs, ps] =
    wy_sel(rs) * wx_sel(ps) with wy_sel = [wy0 at ry0, wy1 at ry0+1],
    wx_sel = [wx0 at px0, wx1 at px0+1].
    """
    g_ = geom
    cy = pos_y + dy
    cx = pos_x + dx
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = cy - y0
    fx = cx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    ty = jnp.clip(y0i, 0, g_.h - 1)
    tx = jnp.clip(jnp.floor_divide(x0i, g_.SX), 0, g_.tiles_x - 1)
    ry0 = y0i - ty
    px0 = x0i - g_.SX * tx
    vy0 = ((y0i >= 0) & (y0i <= g_.h - 1)).astype(fy.dtype)
    vy1 = ((y0i + 1 >= 0) & (y0i + 1 <= g_.h - 1)).astype(fy.dtype)
    vx0 = ((x0i >= 0) & (x0i <= g_.w_pix - 1)).astype(fy.dtype)
    vx1 = ((x0i + 1 >= 0) & (x0i + 1 <= g_.w_pix - 1)).astype(fy.dtype)
    return dict(fy=fy, fx=fx, ty=ty, tx=tx, ry0=ry0, px0=px0,
                vy0=vy0, vy1=vy1, vx0=vx0, vx1=vx1,
                wy0=(1 - fy) * vy0 * m, wy1=fy * vy1 * m,
                wx0=(1 - fx) * vx0, wx1=fx * vx1)


@functools.partial(jax.jit,
                   static_argnames=('geom', 'interpret', '_ablate'))
def band_forward(geom, tab4, off, msk, wexp, interpret=False,
                 _ablate=''):
    """Banded DCN forward: in-kernel coefficients + one-hot MXU select.

    _ablate (dev-only, scripts/dev/ablate_band.py --v5): comma-set of
    trace-time switches producing WRONG but shape/traffic-preserving
    kernels whose timing deltas attribute the per-call cost:
    'no_inw' drops the in-window indicator output, 'noselect' fakes
    the NHWC field select-transposes, 'int_coef' prices the
    integer-offset blend (single corner, half-width blend multiply).

    Fully "row-space": every per-tap quantity lives as a (1, NC) or
    (x, NC) array with band points on lanes, the bilinear lane-slot
    expansion uses sublane-iota selects on the TRANSPOSED gather result
    (128, NC), and both MXU contractions keep NC on the non-contracted
    side — zero vector relayouts in the whole kernel.  The offset/mask
    fields arrive in their native NHWC layout; the kernel's own
    one-hot select-transpose (exact: float32 MXU @ HIGHEST) extracts
    the group's per-tap rows, so the caller does NO banding transpose,
    NO band padding, and NO output crop (edge bands use Pallas'
    masked partial blocks).

    Args:
        geom: BandGeom.
        tab4: (n, dg, h, tiles_x_pad, 128) tile table (etype), built
            at the 8-aligned padded tile width.
        off: (n, out_h, out_w, dg*2K) float32 NHWC offsets.
        msk: (n, out_h, out_w, dg*K) float32 NHWC mask (sigmoided).
        wexp: (K, dg, 128, cout) slot-tiled weights (etype).

    Returns:
        out: (n, out_h, out_w, cout) float32 NHWC output.
        inw: (dg, n, By, Bx, K, NC) float32 in-window indicator (1.0
            where the tap's one-hot row is nonzero OR the point is
            band padding). Computing this IN-KERNEL from the kernel's
            own ty/tx makes it consistent-by-construction with the
            one-hot (the patch must cover exactly the zero rows) and
            deletes the equivalent XLA elementwise graph, which
            compiled to ~17 ms of loop/dynamic-update-slice ops per
            EDVR-M L1 call — as much as the kernel itself.
    """
    TRACE_COUNTS['fwd'] += 1
    abl = frozenset(filter(None, _ablate.split(',')))
    assert not abl - {'no_inw', 'noselect', 'int_coef'}, abl
    g_ = geom
    NC, W, K, cout = g_.NC, g_.W, g_.K, g_.cout
    r, bw, dg = g_.r, g_.bw, g_.dg
    By, Bx = g_.By, g_.Bx
    span_y, span_tx = g_.span_y, g_.span_tx
    c_per = g_.c_per
    PX = g_.SX + 1
    etype = tab4.dtype
    w_pix = g_.w_pix
    div_mul = _div_magic(g_.SX)
    div_kw = _div_magic(g_.kw, max_x=K - 1)
    dec_y, dec_x = _point_decoders(bw, NC - 1)
    pad_tx_l = g_.pad_tx_l
    assert tab4.shape[3] == g_.tiles_x_pad, 'table must be pre-padded'
    Coff, Cmsk = dg * 2 * K, dg * K

    start_y = jnp.asarray(g_.start_y)
    # tiled-dim starts are 8-aligned by construction; pass them divided
    # by 8 and rescale in-kernel so Mosaic can PROVE divisibility
    start_tx8 = jnp.asarray(g_.start_tx // 8)
    nsteps = g_.n * By * Bx * dg

    out_h, out_w = g_.out_h, g_.out_w

    def kernel(sy_ref, stx_ref, off_ref, msk_ref, w_ref, tab_ref,
               out_ref, *rest):
        if 'no_inw' in abl:
            inw_ref = None
            win_ref, sem_ref = rest
        else:
            inw_ref, win_ref, sem_ref = rest
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

        # static output-pixel base positions of this band (row space)
        pn = jax.lax.broadcasted_iota(jnp.int32, (1, NC), 1)
        yo_b = dec_y(pn)
        yo = by * r + yo_b
        xo = bx * bw + dec_x(pn, yo_b)
        posy = (yo * g_.stride - g_.padding).astype(jnp.float32)
        posx = (xo * g_.stride - g_.padding).astype(jnp.float32)
        sy_b = sy_ref[by]
        stx_b = stx_ref[bx] * 8

        iota_y = jax.lax.broadcasted_iota(jnp.int32, (span_y, NC), 0)
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (span_tx, NC), 0)

        # band-padding points (beyond out_h/out_w): in-window by fiat
        # so the outlier patch never touches them (their output rows
        # fall outside the array and Pallas masks the store)
        pad_pt = (yo >= out_h) | (xo >= out_w)           # (1, NC)

        # group row extraction = one exact one-hot select-transpose on
        # the MXU per field: sel[a, c] = (c == gi*nch + a); float32 @
        # HIGHEST is bit-exact (each output is a sum of exact mantissa
        # segments of a single element). Replaces the v2 XLA banding
        # transpose of the whole field.
        blk_o = off_ref[...].reshape(NC, Coff)
        blk_m = msk_ref[...].reshape(NC, Cmsk)
        if 'noselect' in abl:
            # ablation: fake the select-transposes with a scalar-
            # dependent broadcast — keeps the field DMA, drops the dots
            dep = blk_o[0, 0] * 1e-6
            rows_o = jnp.zeros((2 * K, NC), jnp.float32) + dep
            rows_m = jnp.ones((K, NC), jnp.float32) + dep
        else:
            ia_o = jax.lax.broadcasted_iota(jnp.int32, (2 * K, Coff), 0)
            ic_o = jax.lax.broadcasted_iota(jnp.int32, (2 * K, Coff), 1)
            # v5: the select PERMUTES the interleaved (dy0, dx0, dy1,
            # ...) field rows into [all K dy rows; all K dx rows] so
            # the batched algebra below can slice them as contiguous
            # (K, NC) sublane blocks
            ia_perm = jnp.where(ia_o < K, 2 * ia_o, 2 * (ia_o - K) + 1)
            sel_o = (ic_o == gi * (2 * K) + ia_perm).astype(jnp.float32)
            ia_m = jax.lax.broadcasted_iota(jnp.int32, (K, Cmsk), 0)
            ic_m = jax.lax.broadcasted_iota(jnp.int32, (K, Cmsk), 1)
            sel_m = (ic_m == gi * K + ia_m).astype(jnp.float32)
            rows_o = jax.lax.dot_general(
                sel_o, blk_o, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)      # (2K, NC)
            rows_m = jax.lax.dot_general(
                sel_m, blk_m, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)      # (K, NC)
        # edge bands read undefined memory at band-padding points:
        # zero those rows (select, not multiply — NaN*0 is NaN) so no
        # NaN from uninitialized memory can reach the selects/dots
        rows_o = jnp.where(pad_pt, 0.0, rows_o)
        rows_m = jnp.where(pad_pt, 0.0, rows_m)

        # v5: TAP-BATCHED coefficient algebra. The per-tap version ran
        # every scalar row op on (1, NC) shapes — 1/8 VPU sublane
        # efficiency — and measured as a ~16 ms W-INDEPENDENT floor of
        # the L1 call (tune_dcn_band sweep fit: t ≈ 15.7 ms + 0.038*W,
        # docs/TPUDesign.md). All K taps' rows are computed in one
        # (K, NC) pass; the per-tap loop below only slices.
        k_i = jax.lax.broadcasted_iota(jnp.int32, (K, NC), 0)
        i_e = (k_i * div_kw) >> 16                       # k // kw
        j_e = k_i - g_.kw * i_e
        cy = posy + i_e * g_.dilation + rows_o[:K]       # (K, NC)
        cx = posx + j_e * g_.dilation + rows_o[K:]
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
        vx0 = ((x0i >= 0) & (x0i <= w_pix - 1)).astype(jnp.float32)
        if 'int_coef' in abl:
            # ablation: price the integer-offset blend — one corner,
            # no fractional algebra, half-width slot expansion
            wy0 = vy0 * rows_m
            wx0 = vx0
            wy1 = wx1 = None
        else:
            vy1 = ((y0i + 1 >= 0) &
                   (y0i + 1 <= g_.h - 1)).astype(jnp.float32)
            vx1 = ((x0i + 1 >= 0) &
                   (x0i + 1 <= w_pix - 1)).astype(jnp.float32)
            wy0 = (1 - fy) * vy0 * rows_m
            wy1 = fy * vy1 * rows_m
            wx0 = (1 - fx) * vx0
            wx1 = fx * vx1

        ry = ty - sy_b                                   # (K, NC)
        rx = tx + pad_tx_l - stx_b
        if inw_ref is not None:
            inw_ref[0, 0, 0, 0, :, :] = (
                ((ry >= 0) & (ry < span_y) &
                 (rx >= 0) & (rx < span_tx)) | pad_pt).astype(jnp.float32)

        # Lane-slot expansion via slot-coefficient rows. Nonzero
        # bilinear weights can only land on row-slot 0/1 and
        # pixel-slot 0..PX-1: wy0 != 0 requires vy0 = 1, which forces
        # ty = y0i i.e. ry0 = 0; wy1 != 0 lands on slot ry0 + 1 which
        # is 1 interior and 0 exactly when y0i = -1 (ry0 = -1); same
        # algebra for x. The keyed selects collapse to row algebra +
        # 2*PX sublane broadcasts + ONE full multiply per tap.
        # Coefficients round to etype on the rows — the same rounding
        # the gather path applies.
        if 'int_coef' in abl:
            ay0 = wy0                                    # (K, NC)
            ay1 = None
            bxp = [jnp.where(px0 == ps, wx0, 0.0)
                   for ps in range(PX)]                  # PX x (K, NC)
        else:
            ay0 = wy0 + jnp.where(ry0 == -1, wy1, 0.0)   # (K, NC)
            ay1 = jnp.where(ry0 == 0, wy1, 0.0)
            bxp = [jnp.where(px0 == ps, wx0, 0.0) +
                   jnp.where(px0 == ps - 1, wx1, 0.0)
                   for ps in range(PX)]                  # PX x (K, NC)

        acc = jnp.zeros((NC, cout), jnp.float32)
        for k in range(K):
            oy = (iota_y == ry[k:k + 1]).astype(etype)   # (span_y, NC)
            ox = (iota_x == rx[k:k + 1]).astype(etype)   # (span_tx, NC)
            onehot = (oy[:, None, :] * ox[None, :, :]).reshape(W, NC)
            # emit the gather in etype: the one-hot selects a single
            # etype table value per output, so the post-accumulate
            # cast is EXACT (Mosaic requires a 32-bit matmul
            # accumulator) and the (128, NC) blend runs at
            # packed-etype VPU rate
            gT = jax.lax.dot_general(
                win, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(etype)

            half = PX * c_per
            ayrs = (ay0,) if 'int_coef' in abl else (ay0, ay1)
            cparts = []
            for ayr in ayrs:
                for ps in range(PX):
                    coef = (ayr[k:k + 1] *
                            bxp[ps][k:k + 1]).astype(etype)  # (1, NC)
                    cparts.append(jnp.broadcast_to(coef, (c_per, NC)))
            cfullT = jnp.concatenate(cparts, axis=0)
            gTs = gT[:half] if 'int_coef' in abl else gT
            wks = (w_ref[k, 0, :half] if 'int_coef' in abl
                   else w_ref[k, 0])
            blendT = gTs * cfullT
            acc = acc + jax.lax.dot_general(
                blendT, wks, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (NC, cout)

        # (NC, cout) -> (1, r, bw, cout): splitting NC into (r, bw)
        # keeps the minor dims' layout — a free view, giving NHWC
        # output blocks with no caller-side unbanding transpose
        acc = acc.reshape(1, r, bw, cout)

        @pl.when(gi == 0)
        def _init():
            out_ref[...] = acc

        @pl.when(gi != 0)
        def _acc():
            out_ref[...] = out_ref[...] + acc

    grid = (g_.n, By, Bx, dg)
    out_specs = [
        pl.BlockSpec((1, r, bw, cout),
                     lambda n, y, x, g: (n, y, x, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, 1, K, NC),
                     lambda n, y, x, g: (g, n, y, x, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((g_.n, out_h, out_w, cout), jnp.float32),
        jax.ShapeDtypeStruct((dg, g_.n, By, Bx, K, NC), jnp.float32),
    ]
    if 'no_inw' in abl:
        out_specs, out_shapes = out_specs[:1], out_shapes[:1]
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # NHWC field blocks: the index map ignores g, so the DMA
            # runs once per band and the block is revisited across the
            # dg innermost grid steps
            pl.BlockSpec((1, r, bw, Coff),
                         lambda n, y, x, g: (n, y, x, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, bw, Cmsk),
                         lambda n, y, x, g: (n, y, x, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, 128, cout),
                         lambda n, y, x, g: (0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, span_y, span_tx, 128), etype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(start_y, start_tx8, off, msk, wexp, tab4)
    if 'no_inw' in abl:
        return res[0], None
    return res[0], res[1]


@functools.partial(jax.jit, static_argnames=('geom', 'interpret'))
def band_backward(geom, tab4, off, msk, doutp, wexp,
                  interpret=False):
    """Banded DCN backward: table-gradient windows + analytic
    coordinate/mask gradients + weight gradient, all in VMEM.

    Replaces the gather path's backward — 72 stream regathers plus an
    XLA scatter-add running at ~17 GB/s (the dominant cost of an EDVR
    train step) — with the forward kernel's machinery transposed:

      * regather by one-hot MXU contraction (as forward);
      * the table gradient of a band accumulates into its static
        window by ONE (W, NC) x (NC, 128) MXU contraction per tap;
        windows are written per (band, group) and overlap-added into
        the table by the caller at STATIC offsets — no scatter;
      * the coordinate/mask gradient (reference col2im_coord) comes
        from masked sublane reductions of the transposed products;
      * the weight gradient accumulates in a VMEM-resident
        (K, dg, 128, cout) output block across all grid steps;
      * offset/mask fields arrive NHWC (one-hot select-transpose per
        step, as the forward) and the offset/mask GRADIENTS leave NHWC
        too: the per-tap (1, NC) gradient rows are re-transposed by
        the same exact one-hot contraction and accumulated across the
        dg grid steps in the revisited output block — the v2 design's
        banded-gradient unbanding transpose (another ~500 MB HBM
        round-trip per L1 call) is gone.

    Out-of-window points contribute zero to every output here and are
    patched exactly by `outlier_patch_bwd`.

    Args:
        geom: BandGeom.
        tab4: (n, dg, h, tiles_x_pad, 128) tile table (etype),
            pre-padded.
        off: (n, out_h, out_w, dg*2K) float32 NHWC offsets.
        msk: (n, out_h, out_w, dg*K) float32 NHWC mask.
        doutp: (n, out_h, out_w, cout) float32 NHWC output cotangent.
        wexp: (K, dg, 128, cout) slot-tiled weights (etype).

    Returns:
        wg: (n, By, Bx, dg, span_y, span_tx, 128) float32 per-band
            table-gradient windows (fold at geom.start_y/start_tx).
        d_off: (n, out_h, out_w, dg*2K) float32 NHWC.
        d_msk: (n, out_h, out_w, dg*K) float32 NHWC.
        dwexp: (K, dg, 128, cout) float32.
    """
    TRACE_COUNTS['bwd'] += 1
    g_ = geom
    NC, W, K, cout = g_.NC, g_.W, g_.K, g_.cout
    r, bw, dg = g_.r, g_.bw, g_.dg
    By, Bx = g_.By, g_.Bx
    span_y, span_tx = g_.span_y, g_.span_tx
    c_per = g_.c_per
    PX = g_.SX + 1
    etype = tab4.dtype
    w_pix = g_.w_pix
    div_mul = _div_magic(g_.SX)
    dec_y, dec_x = _point_decoders(bw, NC - 1)
    pad_tx_l = g_.pad_tx_l
    assert tab4.shape[3] == g_.tiles_x_pad, 'table must be pre-padded'
    Coff, Cmsk = dg * 2 * K, dg * K
    out_h, out_w = g_.out_h, g_.out_w

    start_y = jnp.asarray(g_.start_y)
    start_tx8 = jnp.asarray(g_.start_tx // 8)
    nsteps = g_.n * By * Bx * dg

    def kernel(sy_ref, stx_ref, off_ref, msk_ref, dout_ref, w_ref,
               tab_ref, wg_ref, doff_ref, dmsk_ref, dw_ref, win_ref,
               sem_ref):
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
            dw_ref[...] = jnp.zeros(dw_ref.shape, jnp.float32)

        @pl.when(step + 1 < nsteps)
        def _prefetch():
            copy_step(step + 1, 1 - slot).start()

        copy_for(ni, by, bx, gi, slot).wait()
        win = win_ref[slot].reshape(W, 128)

        pn = jax.lax.broadcasted_iota(jnp.int32, (1, NC), 1)
        yo_b = dec_y(pn)
        yo = by * r + yo_b
        xo = bx * bw + dec_x(pn, yo_b)
        posy = (yo * g_.stride - g_.padding).astype(jnp.float32)
        posx = (xo * g_.stride - g_.padding).astype(jnp.float32)
        sy_b = sy_ref[by]
        stx_b = stx_ref[bx] * 8
        pad_pt = (yo >= out_h) | (xo >= out_w)           # (1, NC)

        # NHWC (1, r, bw, cout) block -> (NC, cout): free sublane
        # merge. Edge bands read undefined rows — select-zero them in
        # point-on-sublane orientation before anything contracts over
        # the NC dim (a NaN there would poison wg/dwexp globally).
        pn_s = jax.lax.broadcasted_iota(jnp.int32, (NC, 1), 0)
        yo_s = dec_y(pn_s)
        pad_s = (((by * r + yo_s) >= out_h) |
                 ((bx * bw + dec_x(pn_s, yo_s)) >= out_w))
        dout_e = jnp.where(pad_s, 0,
                           dout_ref[...].reshape(NC, cout)).astype(etype)

        iota_y = jax.lax.broadcasted_iota(jnp.int32, (span_y, NC), 0)
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (span_tx, NC), 0)

        # group row extraction: exact one-hot select-transpose (see
        # band_forward)
        blk_o = off_ref[...].reshape(NC, Coff)
        blk_m = msk_ref[...].reshape(NC, Cmsk)
        ia_o = jax.lax.broadcasted_iota(jnp.int32, (2 * K, Coff), 0)
        ic_o = jax.lax.broadcasted_iota(jnp.int32, (2 * K, Coff), 1)
        sel_o = (ic_o == gi * (2 * K) + ia_o).astype(jnp.float32)
        ia_m = jax.lax.broadcasted_iota(jnp.int32, (K, Cmsk), 0)
        ic_m = jax.lax.broadcasted_iota(jnp.int32, (K, Cmsk), 1)
        sel_m = (ic_m == gi * K + ia_m).astype(jnp.float32)
        rows_o = jax.lax.dot_general(
            sel_o, blk_o, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # (2K, NC)
        rows_m = jax.lax.dot_general(
            sel_m, blk_m, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # (K, NC)
        rows_o = jnp.where(pad_pt, 0.0, rows_o)
        rows_m = jnp.where(pad_pt, 0.0, rows_m)

        doff_rows = []
        dmsk_rows = []
        wg_acc = jnp.zeros((W, 128), jnp.float32)
        for k in range(K):
            i, j = divmod(k, g_.kw)
            dy = rows_o[2 * k:2 * k + 1, :]
            dx = rows_o[2 * k + 1:2 * k + 2, :]
            m = rows_m[k:k + 1, :]
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

            oy = (iota_y == (ty - sy_b)).astype(etype)
            ox = (iota_x == (tx + pad_tx_l - stx_b)).astype(etype)
            onehot = (oy[:, None, :] * ox[None, :, :]).reshape(W, NC)
            gT = jax.lax.dot_general(
                win, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (128, NC)

            # (1, NC) slot-coefficient rows (see band_forward): build
            # the expansions as 2*PX sublane broadcasts instead of
            # four (128, NC) keyed selects + a full multiply
            ay = (wy0 + jnp.where(ry0 == -1, wy1, 0.0),  # row-slot 0
                  jnp.where(ry0 == 0, wy1, 0.0))         # row-slot 1
            bx = [jnp.where(px0 == ps, wx0, 0.0) +
                  jnp.where(px0 == ps - 1, wx1, 0.0)
                  for ps in range(PX)]
            cfullT = jnp.concatenate(
                [jnp.broadcast_to(ay[rs] * bx[ps], (c_per, NC))
                 for rs in range(2) for ps in range(PX)], axis=0)
            wyE = jnp.concatenate(
                [jnp.broadcast_to(ay[rs], (PX * c_per, NC))
                 for rs in range(2)], axis=0)            # (128, NC)
            wxE = jnp.concatenate(
                [jnp.broadcast_to(bx[ps], (c_per, NC))
                 for rs in range(2) for ps in range(PX)], axis=0)

            # upstream piece gradient, transposed
            dpieceT = jax.lax.dot_general(
                w_ref[k, 0], dout_e, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (128, NC)

            # weight gradient (accumulated across every grid step)
            blendT = (gT * cfullT).astype(etype)
            dw_ref[k, gi] = dw_ref[k, gi] + jnp.dot(
                blendT, dout_e, preferred_element_type=jnp.float32)

            # table gradient into this band's window (NO scatter)
            dGT = (dpieceT * cfullT).astype(etype)       # (128, NC)
            wg_acc = wg_acc + jax.lax.dot_general(
                onehot, dGT, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (W, 128)

            # analytic coordinate/mask gradient (col2im_coord):
            # dcslot contracted over channels happens implicitly in the
            # slot-block sublane reductions below
            prodT = dpieceT * gT                         # (128, NC)
            twy = prodT * wxE
            twx = prodT * wyE
            # static per-slot-block sublane sums, then (1, NC) row
            # selects keyed on the data-dependent slot: the slot
            # holding wy0 is ry0[p] (0 interior, SHIFTED when y0 clips
            # at the border) — fixed-slot reductions pass every
            # interior-only test and silently corrupt border gradients
            sy0 = jnp.sum(twy[:PX * c_per], axis=0,
                          keepdims=True)                 # (1, NC)
            sy1 = jnp.sum(twy[PX * c_per:], axis=0, keepdims=True)
            sx = [jnp.sum(twx[ps * c_per:(ps + 1) * c_per], axis=0,
                          keepdims=True) +
                  jnp.sum(twx[(PX + ps) * c_per:
                              (PX + ps + 1) * c_per], axis=0,
                          keepdims=True)
                  for ps in range(PX)]                   # PX x (1, NC)
            dwy0 = (jnp.where(ry0 == 0, sy0, 0.0) +
                    jnp.where(ry0 == 1, sy1, 0.0))
            dwy1 = (jnp.where(ry0 == -1, sy0, 0.0) +
                    jnp.where(ry0 == 0, sy1, 0.0))
            dwx0 = sum(jnp.where(px0 == ps, sx[ps], 0.0)
                       for ps in range(PX))
            dwx1 = sum(jnp.where(px0 == ps - 1, sx[ps], 0.0)
                       for ps in range(PX))
            d_dy = (-dwy0 * vy0 + dwy1 * vy1) * m
            d_dx = -dwx0 * vx0 + dwx1 * vx1
            d_m = dwy0 * (1 - fy) * vy0 + dwy1 * fy * vy1
            doff_rows.append(d_dy)
            doff_rows.append(d_dx)
            dmsk_rows.append(d_m)

        wg_ref[...] = wg_acc.reshape(1, 1, 1, 1, span_y, span_tx, 128)

        # NHWC gradient emission: re-transpose the (nch, NC) gradient
        # rows back to (NC, nch) channel-minor blocks with the same
        # exact one-hot contraction (sel also places the group's
        # channels), and accumulate across the dg grid steps in the
        # revisited output block
        drows_o = jnp.concatenate(doff_rows, axis=0)     # (2K, NC)
        drows_m = jnp.concatenate(dmsk_rows, axis=0)     # (K, NC)
        dblk_o = jax.lax.dot_general(
            drows_o, sel_o, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # (NC, Coff)
        dblk_m = jax.lax.dot_general(
            drows_m, sel_m, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # (NC, Cmsk)
        dblk_o = dblk_o.reshape(1, r, bw, Coff)
        dblk_m = dblk_m.reshape(1, r, bw, Cmsk)

        @pl.when(gi == 0)
        def _init_doff():
            doff_ref[...] = dblk_o
            dmsk_ref[...] = dblk_m

        @pl.when(gi != 0)
        def _acc_doff():
            doff_ref[...] = doff_ref[...] + dblk_o
            dmsk_ref[...] = dmsk_ref[...] + dblk_m

    grid = (g_.n, By, Bx, dg)
    wg, d_off, d_msk, dwexp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, r, bw, Coff),
                         lambda n, y, x, g: (n, y, x, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, bw, Cmsk),
                         lambda n, y, x, g: (n, y, x, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, bw, cout),
                         lambda n, y, x, g: (n, y, x, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, 128, cout),
                         lambda n, y, x, g: (0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, 1, span_y, span_tx, 128),
                         lambda n, y, x, g: (n, y, x, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, bw, Coff),
                         lambda n, y, x, g: (n, y, x, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, bw, Cmsk),
                         lambda n, y, x, g: (n, y, x, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, dg, 128, cout),
                         lambda n, y, x, g: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (g_.n, By, Bx, dg, span_y, span_tx, 128), jnp.float32),
            jax.ShapeDtypeStruct(
                (g_.n, out_h, out_w, Coff), jnp.float32),
            jax.ShapeDtypeStruct(
                (g_.n, out_h, out_w, Cmsk), jnp.float32),
            jax.ShapeDtypeStruct((K, dg, 128, cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, span_y, span_tx, 128), etype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(start_y, start_tx8, off, msk, doutp, wexp, tab4)
    return wg, d_off, d_msk, dwexp


def fold_windows(geom, wg, tab_shape):
    """Overlap-add the per-band gradient windows into the tile table.

    Window starts are STATIC, so this is By*Bx dynamic-update-adds at
    fixed offsets — no scatter.

    Args:
        wg: (n, By, Bx, dg, span_y, span_tx, 128) float32.
        tab_shape: (n, dg, h, tiles_x_pad, 128) — the PADDED table
            shape (the padded tile columns carry zero gradient; the
            caller's table-build autodiff discards them).
    Returns:
        (n, dg, h, tiles_x_pad, 128) float32 table gradient.
    """
    g_ = geom
    n, dg, h, tiles_x_pad, lanes = tab_shape
    assert tiles_x_pad == g_.tiles_x_pad
    acc = jnp.zeros((n, dg, h, tiles_x_pad, lanes), jnp.float32)
    for by in range(g_.By):
        sy = int(g_.start_y[by])
        for bx in range(g_.Bx):
            sx = int(g_.start_tx[bx])
            acc = acc.at[:, :, sy:sy + g_.span_y,
                         sx:sx + g_.span_tx, :].add(wg[:, by, bx])
    return acc


def _decode_points(geom, cp):
    """Flat banded (dg, n, By, Bx, K, NC) outlier index -> coordinates.

    The outlier mask lives in banded layout (the forward kernel's
    second output), so the compacted indices decode band-first.
    Returns dict with img, y, x, g, k (int32 vectors).
    """
    g_ = geom
    t, pc = jnp.divmod(cp, g_.NC)
    t, k_e = jnp.divmod(t, g_.K)
    t, bx_e = jnp.divmod(t, g_.Bx)
    t, by_e = jnp.divmod(t, g_.By)
    g_e, img_e = jnp.divmod(t, g_.n)
    y_e = by_e * g_.r + pc // g_.bw
    x_e = bx_e * g_.bw + pc % g_.bw
    return dict(img=img_e, y=y_e, x=x_e, g=g_e, k=k_e)


def outlier_patch_bwd(geom, grads, tab, off, msk, inw, doutp, wexp,
                      etype, cap):
    """Backward counterpart of `outlier_patch`.

    Adds the (rare) out-of-window points' contributions to the table
    gradient (flat scatter — exact), the NHWC offset/mask gradients,
    and the weight gradient, with the same rank-windowed while_loop
    (one patch graph, exact for any outlier count).

    Args:
        grads: (dtab_flat (nrows, 128) f32, d_off f32 NHWC, d_msk f32
            NHWC, dwexp f32).
        off, msk: (n, out_h, out_w, dg*2K) / (n, out_h, out_w, dg*K)
            float32 NHWC fields.
        inw: (dg, n, By, Bx, K, NC) float32 in-window indicator
            (second `band_forward` output).
        doutp: (n, out_h, out_w, cout) float32 NHWC cotangent.
    Returns:
        patched (dtab_flat, d_off, d_msk, dwexp).
    """
    g_ = geom
    K = g_.K
    PX = g_.SX + 1
    Mtot = inw.size
    flat_mask = inw.reshape(Mtot) < 0.5
    n_out = jnp.sum(flat_mask)
    # leading-dim merges only (layout-free); see outlier_patch
    off2 = off.reshape(-1, off.shape[-1])
    msk2 = msk.reshape(-1, msk.shape[-1])
    dout_flat = doutp.reshape(-1, g_.cout)     # NHWC pixels, flat
    slot_r = jnp.arange(2, dtype=jnp.int32)[None, :, None]
    slot_p = jnp.arange(PX, dtype=jnp.int32)[None, None, :]

    def body(carry):
        (dtab, d_off, d_msk, dwexp), it = carry
        rank = jnp.cumsum(flat_mask) - 1
        sel = (flat_mask & (rank >= it * cap) & (rank < (it + 1) * cap))
        pos = jnp.nonzero(sel, size=cap, fill_value=Mtot)[0]
        valid = pos < Mtot
        cp = jnp.clip(pos, 0, Mtot - 1)
        d = _decode_points(g_, cp)
        img_e, y_e, x_e, g_e, k_e = (d['img'], d['y'], d['x'], d['g'],
                                     d['k'])
        s_e = g_e * K + k_e
        pix = (img_e * g_.out_h + y_e) * g_.out_w + x_e

        dy_e = off2[pix, g_e * 2 * K + 2 * k_e]
        dx_e = off2[pix, g_e * 2 * K + 2 * k_e + 1]
        m_e = msk2[pix, g_e * K + k_e]
        i_e = (k_e // g_.kw).astype(jnp.float32) * g_.dilation
        j_e = (k_e % g_.kw).astype(jnp.float32) * g_.dilation
        pos_y_e = (y_e * g_.stride - g_.padding).astype(jnp.float32)
        pos_x_e = (x_e * g_.stride - g_.padding).astype(jnp.float32)
        pc = point_coeffs(g_, dy_e + i_e, dx_e + j_e, m_e,
                          pos_y_e, pos_x_e)
        rows_e = ((img_e * g_.dg + g_e) * (g_.h * g_.tiles_x_pad) +
                  pc['ty'] * g_.tiles_x_pad + pc['tx'] + g_.pad_tx_l)
        wy_sel = jnp.where(
            slot_r == pc['ry0'][:, None, None], pc['wy0'][:, None, None],
            jnp.where(slot_r == pc['ry0'][:, None, None] + 1,
                      pc['wy1'][:, None, None], 0.0))    # (cap, 2, 1)
        wx_sel = jnp.where(
            slot_p == pc['px0'][:, None, None], pc['wx0'][:, None, None],
            jnp.where(slot_p == pc['px0'][:, None, None] + 1,
                      pc['wx1'][:, None, None], 0.0))    # (cap, 1, PX)
        cf = jnp.repeat((wy_sel * wx_sel).reshape(cap, -1),
                        g_.c_per, axis=1)                # (cap, 128)

        dout_e = (dout_flat[pix] *
                  valid[:, None].astype(jnp.float32))    # (cap, cout)
        G = jnp.take(tab, rows_e, axis=0).astype(jnp.float32)
        # per-stream weights via masked matmuls (as the forward patch)
        dpiece = jnp.zeros((cap, 128), jnp.float32)
        for g in range(g_.dg):
            for k in range(g_.K):
                s = g * g_.K + k
                bmask = (s_e == s).astype(jnp.float32)
                dpiece = dpiece + jnp.dot(
                    dout_e * bmask[:, None], wexp[k, g].T.astype(
                        jnp.float32),
                    preferred_element_type=jnp.float32)
                blend_s = (G * cf) * bmask[:, None]
                dwexp = dwexp.at[k, g].add(jnp.dot(
                    blend_s.T, dout_e,
                    preferred_element_type=jnp.float32))

        # table gradient: exact scatter of the compacted rows (invalid
        # slots add zero — dpiece carries the `valid` factor)
        dG = dpiece * cf
        dtab = dtab.at[jnp.where(valid, rows_e, 0)].add(dG)

        # coordinate/mask gradient chain
        dcslot = (dpiece * G).reshape(cap, -1, g_.c_per).sum(-1)
        dcslot = dcslot.reshape(cap, 2, PX)
        dwy = (dcslot * wx_sel).sum(2)                   # (cap, 2)
        dwx = (dcslot * wy_sel).sum(1)                   # (cap, PX)
        rs = jnp.arange(2, dtype=jnp.int32)[None, :]
        ps = jnp.arange(PX, dtype=jnp.int32)[None, :]
        dwy0 = (dwy * (rs == pc['ry0'][:, None])).sum(1)
        dwy1 = (dwy * (rs == pc['ry0'][:, None] + 1)).sum(1)
        dwx0 = (dwx * (ps == pc['px0'][:, None])).sum(1)
        dwx1 = (dwx * (ps == pc['px0'][:, None] + 1)).sum(1)
        d_dy = (-dwy0 * pc['vy0'] + dwy1 * pc['vy1']) * m_e
        d_dx = -dwx0 * pc['vx0'] + dwx1 * pc['vx1']
        d_m = (dwy0 * (1 - pc['fy']) * pc['vy0'] +
               dwy1 * pc['fy'] * pc['vy1'])
        # NHWC gradient scatters with (row, channel) index pairs into
        # leading-dim-merged views (free reshapes, no relayout); d_dy /
        # d_dx / d_m are zero on invalid slots (dout_e carries `valid`)
        pix_c = jnp.where(valid, pix, 0)
        d_off2 = d_off.reshape(-1, d_off.shape[-1])
        for c_e, val in ((2 * k_e, d_dy), (2 * k_e + 1, d_dx)):
            d_off2 = d_off2.at[pix_c, g_e * 2 * K + c_e].add(val)
        d_msk2 = d_msk.reshape(-1, d_msk.shape[-1])
        d_msk2 = d_msk2.at[pix_c, g_e * K + k_e].add(d_m)
        return ((dtab, d_off2.reshape(d_off.shape),
                 d_msk2.reshape(d_msk.shape), dwexp), it + 1)

    carry, _ = jax.lax.while_loop(
        lambda c: c[1] * cap < n_out, body, (grads, 0))
    return carry


def outlier_patch(geom, out_flat, tab, off, msk, inw, wexp, etype, cap):
    """Add the contributions of points the banded kernel skipped.

    Compacts the out-of-window points across every (group, tap) stream
    with a fixed-capacity nonzero, regathers their table rows with the
    plain row gather, recomputes their bilinear coefficients from the
    NHWC offsets, and applies each stream's weights via masked
    matmuls, scatter-adding into the flat output. Exact for ANY outlier
    count: points are ranked (cumsum over the outlier mask) and a
    lax.while_loop processes successive rank windows of `cap` points,
    so the patch graph appears ONCE in the HLO no matter how
    pathological the offset field (an earlier design guarded overflow
    with a dense-recompute lax.cond branch, which doubled the DCN's HLO
    and pushed EDVR train-step compiles past 25 minutes).

    Args:
        out_flat: (n*out_h*out_w, cout) float32 NHWC kernel output,
            flat over pixels.
        off, msk: (n, out_h, out_w, dg*2K) / (n, out_h, out_w, dg*K)
            float32 NHWC fields.
        inw: (dg, n, By, Bx, K, NC) float32 in-window indicator
            (second `band_forward` output).
    Returns:
        patched (n*out_h*out_w, cout) float32.
    """
    g_ = geom
    K = g_.K
    cout = g_.cout
    Mtot = inw.size
    flat_mask = inw.reshape(Mtot) < 0.5
    n_out = jnp.sum(flat_mask)
    # merge leading dims only (layout-free view) and gather with
    # (row, channel) index pairs — a full 1-D flatten forces a linear
    # relayout copy of the whole field (~2 ms at the EDVR-M L1 shape)
    off2 = off.reshape(-1, off.shape[-1])
    msk2 = msk.reshape(-1, msk.shape[-1])
    slot_r = jnp.arange(2, dtype=jnp.int32)[None, :, None]
    slot_p = jnp.arange(g_.SX + 1, dtype=jnp.int32)[None, None, :]

    def body(carry):
        out_flat2, i = carry
        # rank-window compaction lives INSIDE the body so the common
        # no-outlier call never pays the cumsum/nonzero scans
        rank = jnp.cumsum(flat_mask) - 1      # rank among outliers
        sel = (flat_mask & (rank >= i * cap) & (rank < (i + 1) * cap))
        pos = jnp.nonzero(sel, size=cap, fill_value=Mtot)[0]
        valid = pos < Mtot
        cp = jnp.clip(pos, 0, Mtot - 1)
        d = _decode_points(g_, cp)
        img_e, y_e, x_e, g_e, k_e = (d['img'], d['y'], d['x'], d['g'],
                                     d['k'])
        s_e = g_e * K + k_e
        pix = (img_e * g_.out_h + y_e) * g_.out_w + x_e

        dy_e = off2[pix, g_e * 2 * K + 2 * k_e]
        dx_e = off2[pix, g_e * 2 * K + 2 * k_e + 1]
        m_e = msk2[pix, g_e * K + k_e]
        i_e = (k_e // g_.kw).astype(jnp.float32) * g_.dilation
        j_e = (k_e % g_.kw).astype(jnp.float32) * g_.dilation
        pos_y_e = (y_e * g_.stride - g_.padding).astype(jnp.float32)
        pos_x_e = (x_e * g_.stride - g_.padding).astype(jnp.float32)
        pc = point_coeffs(g_, dy_e + i_e, dx_e + j_e, m_e,
                          pos_y_e, pos_x_e)
        rows_e = ((img_e * g_.dg + g_e) * (g_.h * g_.tiles_x_pad) +
                  pc['ty'] * g_.tiles_x_pad + pc['tx'] + g_.pad_tx_l)
        cslot = (jnp.where(slot_r == pc['ry0'][:, None, None],
                           pc['wy0'][:, None, None],
                           jnp.where(slot_r == pc['ry0'][:, None, None] + 1,
                                     pc['wy1'][:, None, None], 0.0)) *
                 jnp.where(slot_p == pc['px0'][:, None, None],
                           pc['wx0'][:, None, None],
                           jnp.where(slot_p == pc['px0'][:, None, None] + 1,
                                     pc['wx1'][:, None, None], 0.0)))
        cf = jnp.repeat(cslot.reshape(cap, -1), g_.c_per, axis=1)
        G = jnp.take(tab, rows_e, axis=0).astype(etype)
        blend = G * cf.astype(etype) * valid[:, None].astype(etype)
        contrib = jnp.zeros((cap, cout), jnp.float32)
        for g in range(g_.dg):
            for k in range(g_.K):
                s = g * g_.K + k
                bmask = (s_e == s).astype(etype)
                contrib = contrib + jnp.dot(
                    blend * bmask[:, None], wexp[k, g],
                    preferred_element_type=jnp.float32)
        # invalid slots scatter a zero contribution (blend carries the
        # `valid` factor) at index 0 — no sentinel-row concat/slice,
        # which copied the full output twice even with zero outliers
        fb = jnp.where(valid, pix, 0)
        return out_flat2.at[fb].add(contrib), i + 1

    out_flat, _ = jax.lax.while_loop(
        lambda c: c[1] * cap < n_out, body, (out_flat, 0))
    return out_flat
