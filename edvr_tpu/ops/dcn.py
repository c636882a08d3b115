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

TPU-first formulation: the deformable im2col is a batched gather over
the flattened spatial plane (per deformable group), the bilinear blend
and mask are fused elementwise, and the conv itself is one large GEMM
``(N*OH*OW) x (K*Cin) @ (K*Cin) x Cout`` that lands on the MXU. All
shapes are static; gradients (including the coordinate gradient,
CUDA's col2im_coord) come from XLA autodiff through the gather and the
fractional weights, which reproduces the same math.

An optional Pallas kernel path (edvr_tpu/ops/dcn_pallas.py) fuses the
gather+blend into VMEM tiles; this module is the reference/fallback
and the custom-vjp host.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def modulated_deform_conv(x: jnp.ndarray, offset: jnp.ndarray,
                          mask: jnp.ndarray, weight: jnp.ndarray,
                          bias: jnp.ndarray | None = None, stride: int = 1,
                          padding: int = 0, dilation: int = 1,
                          groups: int = 1,
                          deformable_groups: int = 1) -> jnp.ndarray:
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
    out_h = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    out_w = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    assert offset.shape == (n, out_h, out_w, dg * 2 * K), offset.shape
    assert mask.shape == (n, out_h, out_w, dg * K), mask.shape

    col = deform_im2col(x, offset, mask, (kh, kw), stride, padding,
                        dilation, dg)  # (n, out_h*out_w, K, cin)

    # grouped GEMM on the MXU: contract (K, cin//groups) per group
    col = col.reshape(n, out_h * out_w, K, groups, cin_g)
    wmat = weight.reshape(K, cin_g, groups, cout // groups)
    out = jnp.einsum('npkgc,kcgo->npgo', col, wmat,
                     preferred_element_type=jnp.promote_types(
                         x.dtype, jnp.float32))
    out = out.reshape(n, out_h, out_w, cout).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def deform_im2col(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  kernel_size, stride: int, padding: int, dilation: int,
                  deformable_groups: int) -> jnp.ndarray:
    """Deformable im2col: sample x at offset-shifted tap positions.

    Returns (n, out_h*out_w, K, cin); cin ordering preserves the input
    channel order (deformable group g owns channels
    [g*cin/dg, (g+1)*cin/dg)).
    """
    n, h, w, cin = x.shape
    kh, kw = kernel_size
    K = kh * kw
    dg = deformable_groups
    c_per = cin // dg
    out_h, out_w = offset.shape[1], offset.shape[2]
    P = out_h * out_w

    # tap base positions (static, computed host-side)
    base_y = np.arange(out_h) * stride - padding  # (out_h,)
    base_x = np.arange(out_w) * stride - padding
    tap_dy = (np.arange(kh) * dilation).repeat(kw)        # (K,) per-tap dy
    tap_dx = np.tile(np.arange(kw) * dilation, kh)        # (K,) per-tap dx
    pos_y = base_y[:, None, None] + tap_dy[None, None, :]  # (out_h, 1, K)
    pos_x = base_x[None, :, None] + tap_dx[None, None, :]  # (1, out_w, K)
    pos_y = np.broadcast_to(pos_y, (out_h, out_w, K)).reshape(P, K)
    pos_x = np.broadcast_to(pos_x, (out_h, out_w, K)).reshape(P, K)
    ctype = jnp.promote_types(offset.dtype, jnp.float32)
    pos_y = jnp.asarray(pos_y, dtype=ctype)
    pos_x = jnp.asarray(pos_x, dtype=ctype)

    off = offset.reshape(n, P, dg, K, 2)
    dy = off[..., 0].astype(ctype)
    dx = off[..., 1].astype(ctype)
    cy = pos_y[None, :, None, :] + dy  # (n, P, dg, K)
    cx = pos_x[None, :, None, :] + dx

    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = cy - y0
    fx = cx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # x grouped by deformable group: (n, dg, h*w, c_per)
    xg = x.reshape(n, h * w, dg, c_per).transpose(0, 2, 1, 3)

    def tap(yi, xi, wgt):
        valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        idx = idx.transpose(0, 2, 1, 3).reshape(n, dg, P * K)
        vals = jnp.take_along_axis(xg, idx[..., None], axis=2)
        wv = (wgt * valid.astype(x.dtype)).transpose(0, 2, 1, 3)
        return vals.reshape(n, dg, P, K, c_per) * wv[..., None]

    col = (tap(y0i, x0i, (1 - fy) * (1 - fx)) +
           tap(y0i, x0i + 1, (1 - fy) * fx) +
           tap(y0i + 1, x0i, fy * (1 - fx)) +
           tap(y0i + 1, x0i + 1, fy * fx))  # (n, dg, P, K, c_per)

    m = mask.reshape(n, P, dg, K).transpose(0, 2, 1, 3)
    col = col * m[..., None].astype(x.dtype)
    # -> (n, P, K, dg*c_per = cin)
    col = col.transpose(0, 2, 3, 1, 4).reshape(n, P, K, cin)
    return col
