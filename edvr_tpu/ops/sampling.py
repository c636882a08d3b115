"""Bilinear sampling at arbitrary fractional coordinates (NHWC).

Shared core for flow warping (torch grid_sample parity,
reference: basicsr/models/archs/arch_util.py:121-163), the deformable
conv reference path, and DUF upsampling. Out-of-bounds handling follows
torch grid_sample: per-tap zeroing for ``padding_mode='zeros'`` and
coordinate clamping for ``'border'``.

Implementation: gathers over the flattened spatial axis via
take_along_axis — static shapes, differentiable (reverse-mode becomes a
scatter-add), vmap-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, coord_y: jnp.ndarray,
                    coord_x: jnp.ndarray,
                    padding_mode: str = 'zeros') -> jnp.ndarray:
    """Sample ``img`` at fractional pixel coordinates.

    Args:
        img: (n, h, w, c).
        coord_y/coord_x: (n, *spatial) absolute pixel coordinates.
        padding_mode: 'zeros' (OOB taps contribute 0) or 'border'
            (coords clamped to the image rect).

    Returns:
        (n, *spatial, c) sampled values.
    """
    n, h, w, c = img.shape
    spatial = coord_y.shape[1:]
    cy = coord_y.reshape(n, -1)
    cx = coord_x.reshape(n, -1)
    if padding_mode == 'border':
        cy = jnp.clip(cy, 0, h - 1)
        cx = jnp.clip(cx, 0, w - 1)
    elif padding_mode != 'zeros':
        raise ValueError(f'Unsupported padding_mode {padding_mode}')

    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = cy - y0
    fx = cx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # flattened row table with per-batch row offsets: row gathers along
    # axis 0 hit XLA:TPU's fast gather path (see ops/dcn.py)
    flat = img.reshape(n * h * w, c)
    row_base = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None]

    def tap(yi, xi, wgt):
        valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1) + row_base
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(n, -1, c)
        return vals * (wgt * valid.astype(img.dtype))[:, :, None]

    out = (tap(y0i, x0i, (1 - fy) * (1 - fx)) +
           tap(y0i, x0i + 1, (1 - fy) * fx) +
           tap(y0i + 1, x0i, fy * (1 - fx)) +
           tap(y0i + 1, x0i + 1, fy * fx))
    return out.reshape(n, *spatial, c)


def _nearest_sample(img, coord_y, coord_x, padding_mode):
    n, h, w, c = img.shape
    spatial = coord_y.shape[1:]
    cy = coord_y.reshape(n, -1)
    cx = coord_x.reshape(n, -1)
    if padding_mode == 'border':
        cy = jnp.clip(cy, 0, h - 1)
        cx = jnp.clip(cx, 0, w - 1)
    # torch grid_sample 'nearest' rounds to nearest (round-half-away
    # handled as rint; ties are measure-zero in practice)
    yi = jnp.rint(cy).astype(jnp.int32)
    xi = jnp.rint(cx).astype(jnp.int32)
    valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
    idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
    vals = jnp.take_along_axis(img.reshape(n, h * w, c), idx[:, :, None],
                               axis=1)
    vals = vals * valid[:, :, None].astype(img.dtype)
    return vals.reshape(n, *spatial, c)


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray,
              interp_mode: str = 'bilinear', padding_mode: str = 'zeros',
              align_corners: bool = True) -> jnp.ndarray:
    """Warp an NHWC image/feature map with optical flow.

    Matches the reference flow_warp (arch_util.py:121-163): the sample
    position for output pixel (i, j) is (i + flow_y, j + flow_x) with
    flow channel order (x, y), fed through grid_sample with
    align_corners=True.

    Args:
        x: (n, h, w, c).
        flow: (n, h, w, 2) displacement in pixels, last dim (dx, dy).
    """
    n, h, w, _ = x.shape
    assert flow.shape[1:3] == (h, w)
    grid_y = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    grid_x = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    cy = grid_y + flow[..., 1]
    cx = grid_x + flow[..., 0]
    if not align_corners:
        # The reference normalizes pixel coords to [-1, 1] with the
        # align_corners=True convention (arch_util.py:152-153) but would
        # unnormalize with the half-pixel convention if grid_sample were
        # called with align_corners=False: p = ((g + 1) * S - 1) / 2.
        gy = 2.0 * cy / max(h - 1, 1) - 1.0
        gx = 2.0 * cx / max(w - 1, 1) - 1.0
        cy = ((gy + 1) * h - 1) / 2
        cx = ((gx + 1) * w - 1) / 2
    if interp_mode == 'bilinear':
        return bilinear_sample(x, cy, cx, padding_mode)
    elif interp_mode == 'nearest':
        return _nearest_sample(x, cy, cx, padding_mode)
    raise ValueError(f'Unsupported interp_mode {interp_mode}')


def resize_flow(flow: jnp.ndarray, size_type: str, sizes,
                interp_mode: str = 'bilinear',
                align_corners: bool = False) -> jnp.ndarray:
    """Resize a flow field and rescale its vectors accordingly
    (reference: arch_util.py:166-209, NHWC here).

    Args:
        flow: (n, h, w, 2) with last dim (dx, dy) in pixels.
        size_type: 'ratio' or 'shape'.
        sizes: [ratio_h, ratio_w] or [out_h, out_w].
    """
    from edvr_tpu.ops.resize import interpolate
    h, w = flow.shape[1:3]
    if size_type == 'ratio':
        out_h, out_w = int(h * sizes[0]), int(w * sizes[1])
    elif size_type == 'shape':
        out_h, out_w = int(sizes[0]), int(sizes[1])
    else:
        raise ValueError(
            f'Size type should be ratio or shape, but got type {size_type}.')
    scale = jnp.asarray([out_w / w, out_h / h], flow.dtype)
    return interpolate(flow * scale, size=(out_h, out_w), mode=interp_mode,
                       align_corners=align_corners)
