"""Modulated deformable convolution (DCNv2) for TPU.

Semantics match the reference CUDA extension exactly
(reference: basicsr/models/ops/dcn/src/deform_conv_cuda_kernel.cu:
modulated_deformable_im2col kernel; python API
basicsr/models/ops/dcn/deform_conv.py:111-185):

* offset layout: channel ``g * 2K + 2k`` is the **y** offset and
  ``g * 2K + 2k + 1`` the **x** offset for deformable group ``g`` and
  kernel tap ``k = i * kw + j`` (deform_conv_cuda_kernel.cu:
  data_offset_h_ptr/data_offset_w_ptr indexing).
* mask layout: channel ``g * K + k``, already sigmoid-ed by the caller
  (arch_util.py:247).
* sampling: bilinear with per-tap zero boundary — taps whose 4
  neighbours are all outside contribute 0, partial taps use only the
  in-bounds corners (deformable_im2col_bilinear + the
  ``h_im > -1 && h_im < height`` guard).

TPU-first formulation: instead of materializing the im2col buffer
(whose (K, c_per) minor dims would pad 14x under the TPU's (8, 128)
tiling), the kernel taps are statically unrolled; each tap samples the
input with four *row gathers* over a flattened ``(n*dg*h*w, c_per)``
table — ``jnp.take(..., axis=0)`` row gathers hit XLA:TPU's fast
gather path (measured ~25x faster than lane-dim take_along_axis on
v5e) — applies the fused bilinear/mask weights on the VPU, and feeds
one GEMM on the MXU, accumulating the output across taps. Gradients
(including the coordinate gradient, CUDA's col2im_coord) come from XLA
autodiff through the gathers and fractional weights — the same math.

A Pallas kernel path (edvr_tpu/ops/dcn_pallas.py) can further cut HBM
traffic by K*4/1 by keeping the input tile resident in VMEM; this
module is the reference implementation and fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def modulated_deform_conv(x: jnp.ndarray, offset: jnp.ndarray,
                          mask: jnp.ndarray, weight: jnp.ndarray,
                          bias: jnp.ndarray | None = None, stride: int = 1,
                          padding: int = 0, dilation: int = 1,
                          groups: int = 1, deformable_groups: int = 1,
                          use_packed: bool | None = None) -> jnp.ndarray:
    """Modulated deformable conv (NHWC).

    Args:
        x: (n, h, w, cin).
        offset: (n, out_h, out_w, dg*2*K) — interleaved (dy, dx) per tap
            within each deformable-group block (see module docstring).
        mask: (n, out_h, out_w, dg*K), in [0, 1].
        weight: (kh, kw, cin // groups, cout) HWIO.
        bias: (cout,) or None.

    Returns:
        (n, out_h, out_w, cout).
    """
    n, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    K = kh * kw
    dg = deformable_groups
    c_per = cin // dg
    out_h = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    out_w = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    P = out_h * out_w
    assert offset.shape == (n, out_h, out_w, dg * 2 * K), offset.shape
    assert mask.shape == (n, out_h, out_w, dg * K), mask.shape

    c_per_ = cin // dg
    if use_packed is None:
        use_packed = 128 // (2 * c_per_) >= 2
    if use_packed:
        return _mdcn_packed(x, offset, mask, weight, bias, stride, padding,
                            dilation, groups, dg)

    ctype = jnp.promote_types(offset.dtype, jnp.float32)
    acc_type = jnp.promote_types(x.dtype, jnp.float32)

    # static tap base positions
    base_y = np.arange(out_h) * stride - padding
    base_x = np.arange(out_w) * stride - padding
    pos_y0 = np.broadcast_to(base_y[:, None], (out_h, out_w)).reshape(P)
    pos_x0 = np.broadcast_to(base_x[None, :], (out_h, out_w)).reshape(P)
    pos_y0 = jnp.asarray(pos_y0.astype(np.float32), dtype=ctype)
    pos_x0 = jnp.asarray(pos_x0.astype(np.float32), dtype=ctype)

    # offsets/mask to (n, dg, K, P) blocks
    off = offset.reshape(n, P, dg, K, 2)
    dy = off[..., 0].transpose(0, 2, 3, 1).astype(ctype)  # (n, dg, K, P)
    dx = off[..., 1].transpose(0, 2, 3, 1).astype(ctype)
    msk = mask.reshape(n, P, dg, K).transpose(0, 2, 3, 1)  # (n, dg, K, P)

    # flattened row table: row (n_i*dg + g)*h*w + y*w + x holds the c_per
    # channels of group g at pixel (y, x)
    table = x.reshape(n, h * w, dg, c_per).transpose(0, 2, 1, 3).reshape(
        n * dg * h * w, c_per)
    row_base = (np.arange(n * dg, dtype=np.int32) * (h * w)).reshape(n, dg)
    row_base = jnp.asarray(row_base)[:, :, None]  # (n, dg, 1)

    # weight per tap: (K, cin_g, groups, cout_g)
    cout_g = cout // groups
    wk = weight.reshape(K, cin_g, groups, cout_g)

    out = jnp.zeros((n, P, groups, cout_g), dtype=acc_type)
    for k in range(K):
        i, j = divmod(k, kw)
        cy = pos_y0 + i * dilation + dy[:, :, k]  # (n, dg, P)
        cx = pos_x0 + j * dilation + dx[:, :, k]
        y0 = jnp.floor(cy)
        x0 = jnp.floor(cx)
        fy = cy - y0
        fx = cx - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)

        sampled = jnp.zeros((n, dg, P, c_per), dtype=acc_type)
        for (yi, xi, wgt) in ((y0i, x0i, (1 - fy) * (1 - fx)),
                              (y0i, x0i + 1, (1 - fy) * fx),
                              (y0i + 1, x0i, fy * (1 - fx)),
                              (y0i + 1, x0i + 1, fy * fx)):
            valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
            idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
                   + row_base)
            vals = jnp.take(table, idx.reshape(-1), axis=0,
                            unique_indices=False,
                            indices_are_sorted=False)
            vals = vals.reshape(n, dg, P, c_per)
            sampled = sampled + vals * (wgt *
                                        valid.astype(ctype))[..., None]
        sampled = sampled * msk[:, :, k, :, None].astype(acc_type)
        # contract (dg, c_per) against this tap's weights on the MXU
        colk = sampled.reshape(n, dg, P, c_per).transpose(0, 2, 1, 3)
        colk = colk.reshape(n, P, groups, cin_g)
        out = out + jnp.einsum('npgc,cgo->npgo', colk, wk[k],
                               preferred_element_type=acc_type)

    out = out.reshape(n, out_h, out_w, cout).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def deform_im2col(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  kernel_size, stride: int, padding: int, dilation: int,
                  deformable_groups: int) -> jnp.ndarray:
    """Deformable im2col returning (n, out_h*out_w, K, cin).

    Provided for testing/inspection; the conv entry point above never
    materializes this buffer.
    """
    n, h, w, cin = x.shape
    kh, kw = kernel_size
    K = kh * kw
    dg = deformable_groups
    out_h = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    out_w = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    # reuse the conv path with identity weights per (K, cin) slot
    eye = jnp.eye(cin, dtype=x.dtype)
    cols = []
    for k in range(K):
        wk = jnp.zeros((kh * kw, cin, cin), x.dtype).at[k].set(eye)
        wk = wk.reshape(kh, kw, cin, cin)
        cols.append(modulated_deform_conv(x, offset, mask, wk, None, stride,
                                          padding, dilation, 1, dg))
    col = jnp.stack([c.reshape(n, out_h * out_w, cin) for c in cols], axis=2)
    return col


def _mdcn_packed(x, offset, mask, weight, bias, stride, padding, dilation,
                 groups, dg):
    """Packed-tile fast path for the modulated deformable conv.

    The input plane (per deformable group) is re-laid into overlapping
    (2 rows x PX pixels x c_per channels) tiles of exactly 128 lanes,
    so every kernel tap needs ONE wide row gather (XLA:TPU's fast
    gather form) to fetch all four bilinear corners of all its samples;
    the bilinear weights become two lane-selects (row slot, pixel slot),
    and the tap contraction is a dense (P, 128) x (128, cout) MXU GEMM
    whose weights are tiled across the 16 (row, pixel) lane slots.
    Numerics match the reference CUDA semantics exactly: out-of-range
    corners fall outside the tile's lane slots and/or are zeroed by the
    per-corner validity, reproducing the per-tap zero boundary.
    """
    n, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    K = kh * kw
    c_per = cin // dg
    PX = 128 // (2 * c_per)          # pixels per tile row
    SX = PX - 1                      # tile stride (overlap by 1 pixel)
    tiles_x = (w - 1) // SX + 1
    out_h = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    out_w = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    P = out_h * out_w
    lanes = 2 * PX * c_per

    ctype = jnp.promote_types(offset.dtype, jnp.float32)
    acc_type = jnp.promote_types(x.dtype, jnp.float32)

    # ---- build the packed tile table -----------------------------------
    # window column indices (tiles_x * PX,), zero-filled beyond w
    col_idx = (np.arange(tiles_x)[:, None] * SX +
               np.arange(PX)[None, :]).reshape(-1)
    col_valid = jnp.asarray((col_idx < w).astype(np.float32))
    col_idx = jnp.asarray(np.minimum(col_idx, w - 1))
    # (n, h, tiles_x*PX, cin); built directly in the blend dtype so the
    # hot gathers read half the bytes on the fast path
    tab = jnp.take(x, col_idx, axis=2) * col_valid[None, None, :, None]
    # vertical pair: row r=1 is the next image row (zero at the bottom)
    tab_dn = jnp.concatenate(
        [tab[:, 1:], jnp.zeros_like(tab[:, :1])], axis=1)
    # (n, h, 2, tiles_x, PX, dg, c_per)
    tab = jnp.stack([tab, tab_dn], axis=2).reshape(
        n, h, 2, tiles_x, PX, dg, c_per)
    # -> (n, dg, h, tiles_x, 2, PX, c_per) -> rows of `lanes`
    tab = tab.transpose(0, 5, 1, 3, 2, 4, 6).reshape(
        n * dg * h * tiles_x, lanes)

    row_base = (np.arange(n * dg, dtype=np.int32) *
                (h * tiles_x)).reshape(n, dg)[:, :, None]
    row_base = jnp.asarray(row_base)

    # ---- static tap bases ----------------------------------------------
    base_y = np.arange(out_h) * stride - padding
    base_x = np.arange(out_w) * stride - padding
    pos_y0 = np.broadcast_to(base_y[:, None], (out_h, out_w)).reshape(P)
    pos_x0 = np.broadcast_to(base_x[None, :], (out_h, out_w)).reshape(P)
    pos_y0 = jnp.asarray(pos_y0.astype(np.float32), dtype=ctype)
    pos_x0 = jnp.asarray(pos_x0.astype(np.float32), dtype=ctype)

    off = offset.reshape(n, P, dg, K, 2)
    dy = off[..., 0].transpose(0, 2, 3, 1).astype(ctype)  # (n, dg, K, P)
    dx = off[..., 1].transpose(0, 2, 3, 1).astype(ctype)
    msk = mask.reshape(n, P, dg, K).transpose(0, 2, 3, 1)

    # Precision policy: mirror XLA's matmul precision. Under the default
    # (bf16-pass) precision, the sampled table and blend run in bf16 —
    # exactly the quantization every conv in the network already applies
    # to its inputs on the MXU; when float32/highest precision is pinned
    # (e.g. parity tests, strict eval), everything stays f32.
    prec = jax.config.jax_default_matmul_precision
    fast = prec in (None, 'default', 'fastest', 'bfloat16',
                    'tensorfloat32')
    if x.dtype == jnp.bfloat16 or (fast and x.dtype == jnp.float32):
        etype = jnp.bfloat16
    else:
        etype = acc_type
    tab = tab.astype(etype)
    # slot id decomposition at (row, pixel) resolution — the blend
    # coefficient is constant across the c_per channels of a slot, so
    # the compares/selects run at 2*PX width and broadcast up
    slot_r = jax.lax.broadcasted_iota(jnp.int32, (1, 2, PX), 1)
    slot_p = jax.lax.broadcasted_iota(jnp.int32, (1, 2, PX), 2)

    # weights tiled across the (row, pixel) lane slots:
    # wexp[k, g, lane=(r, p, c), o]
    wk = weight.reshape(K, cin_g, groups, cout // groups)
    wfull = jnp.zeros((K, cin, cout), weight.dtype)
    for gi in range(groups):
        wfull = wfull.at[:, gi * cin_g:(gi + 1) * cin_g,
                         gi * (cout // groups):(gi + 1) *
                         (cout // groups)].set(wk[:, :, gi])
    wexp = wfull.reshape(K, dg, c_per, cout)  # channel c of group g
    wexp = jnp.tile(wexp[:, :, None, :, :], (1, 1, 2 * PX, 1, 1)).reshape(
        K, dg, lanes, cout).astype(etype)

    zero = jnp.zeros((), etype)
    # A fused Pallas blend+GEMM kernel exists (edvr_tpu/ops/dcn_pallas.py)
    # but measures ~1.5x SLOWER than this XLA formulation on v5e: XLA
    # already fuses the gathers into the blend, so the kernel cannot cut
    # HBM traffic without an in-kernel gather primitive (which Mosaic
    # does not expose). Kept opt-in for future Mosaic gather support.
    import os
    use_pallas = (os.environ.get('EDVR_TPU_DCN_PALLAS') == '1'
                  and etype == jnp.bfloat16
                  and jax.default_backend() == 'tpu')
    out = jnp.zeros((n * P, cout), dtype=acc_type)
    # statically unrolled (group, tap) loop: each iteration is one wide
    # row-gather + fused slot-select blend; a group's K tap blocks
    # concatenate along lanes into ONE (n*P, K*lanes) MXU GEMM,
    # minimizing accumulator round-trips (measured fastest structure)
    for g in range(dg):
        pieces = []
        cs_pieces = []
        for k in range(K):
            i, j = divmod(k, kw)
            cy = pos_y0 + i * dilation + dy[:, g, k]  # (n, P)
            cx = pos_x0 + j * dilation + dx[:, g, k]
            y0 = jnp.floor(cy)
            x0 = jnp.floor(cx)
            fy = (cy - y0).astype(etype)
            fx = (cx - x0).astype(etype)
            y0i = y0.astype(jnp.int32)
            x0i = x0.astype(jnp.int32)

            ty = jnp.clip(y0i, 0, h - 1)
            tx = jnp.clip(jnp.floor_divide(x0i, SX), 0, tiles_x - 1)
            row = (ty * tiles_x + tx) + row_base[:, g]
            G = jnp.take(tab, row.reshape(-1), axis=0)  # (n*P, lanes)

            ry0 = (y0i - ty).reshape(-1, 1)
            px0 = (x0i - SX * tx).reshape(-1, 1)
            vy0 = ((y0i >= 0) & (y0i <= h - 1)).astype(etype)
            vy1 = ((y0i + 1 >= 0) & (y0i + 1 <= h - 1)).astype(etype)
            vx0 = ((x0i >= 0) & (x0i <= w - 1)).astype(etype)
            vx1 = ((x0i + 1 >= 0) & (x0i + 1 <= w - 1)).astype(etype)
            mg = msk[:, g, k].astype(etype)

            wy0 = ((1 - fy) * vy0 * mg).reshape(-1, 1, 1)
            wy1 = (fy * vy1 * mg).reshape(-1, 1, 1)
            wx0 = ((1 - fx) * vx0).reshape(-1, 1, 1)
            wx1 = (fx * vx1).reshape(-1, 1, 1)
            ry0s = ry0.reshape(-1, 1, 1)
            px0s = px0.reshape(-1, 1, 1)

            # (n*P, 2, PX) slot coefficients -> broadcast over channels
            cslot = (jnp.where(slot_r == ry0s, wy0,
                               jnp.where(slot_r == ry0s + 1, wy1, zero)) *
                     jnp.where(slot_p == px0s, wx0,
                               jnp.where(slot_p == px0s + 1, wx1, zero)))
            if use_pallas:
                pieces.append(G.astype(etype))
                cs_pieces.append(cslot.reshape(-1, 2 * PX))
            else:
                cfull = jnp.broadcast_to(
                    cslot[:, :, :, None],
                    (cslot.shape[0], 2, PX, c_per)).reshape(-1, lanes)
                pieces.append(G.astype(etype) * cfull)
        wexp_g = wexp[:, g].reshape(K * lanes, cout)
        if use_pallas:
            from edvr_tpu.ops.dcn_pallas import blend_matmul_group_ad
            out = blend_matmul_group_ad(
                jnp.concatenate(pieces, axis=1),
                jnp.concatenate(cs_pieces, axis=1), wexp_g, out, c_per)
        else:
            g_blend = jnp.concatenate(pieces, axis=1)  # (n*P, K*lanes)
            out = out + jnp.dot(g_blend, wexp_g,
                                preferred_element_type=acc_type)

    out = out.reshape(n, out_h, out_w, cout).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
