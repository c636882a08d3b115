"""Static-shape resize ops, numerically matching torch.nn.functional.

``interpolate`` reproduces ``F.interpolate`` (bilinear/nearest, both
align_corners modes) for static scale factors/sizes: the per-axis
source indices and weights are computed at trace time as Python
constants, so XLA sees only static gathers/adds and fuses them — no
dynamic indexing on the device. EDVR uses bilinear align_corners=False
for the x2 offset/feature upsampling and the x4 base path
(reference: basicsr/models/archs/edvr_arch.py:68-69,417-418).

``pixel_shuffle``/``pixel_unshuffle`` are the NHWC equivalents of
torch.nn.PixelShuffle / the reference's pixel_unshuffle
(reference: basicsr/models/archs/arch_util.py:213-229).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _linear_src(out_size: int, in_size: int, align_corners: bool):
    """Source indices/weights for 1-D linear interpolation, exactly as
    torch computes them (upsample/downsample, both corner modes)."""
    if align_corners:
        if out_size == 1:
            src = np.zeros(1)
        else:
            src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5
        src = np.maximum(src, 0.0)  # torch clamps negative source coords
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    w0 = 1.0 - w1
    return i0, i1, w0, w1


def _nearest_src(out_size: int, in_size: int):
    """torch 'nearest' (legacy floor) source indices."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def interpolate(x: jnp.ndarray, scale_factor=None, size=None,
                mode: str = 'bilinear',
                align_corners: bool = False) -> jnp.ndarray:
    """Resize (..., H, W, C) arrays; torch F.interpolate-compatible.

    Args:
        x: array with layout (..., h, w, c) — NHWC or any leading dims.
        scale_factor: float or (sh, sw). Output size floor(in * scale),
            matching torch.
        size: explicit (out_h, out_w); overrides scale_factor.
        mode: 'bilinear' or 'nearest'.
        align_corners: corner alignment for bilinear.
    """
    h, w = x.shape[-3], x.shape[-2]
    if size is not None:
        out_h, out_w = size
    else:
        if not isinstance(scale_factor, (tuple, list)):
            scale_factor = (scale_factor, scale_factor)
        out_h = int(np.floor(h * scale_factor[0]))
        out_w = int(np.floor(w * scale_factor[1]))

    if mode == 'nearest':
        iy = _nearest_src(out_h, h)
        ix = _nearest_src(out_w, w)
        return x[..., iy, :, :][..., ix, :]

    if mode != 'bilinear':
        raise ValueError(f'Unsupported mode {mode}')

    iy0, iy1, wy0, wy1 = _linear_src(out_h, h, align_corners)
    ix0, ix1, wx0, wx1 = _linear_src(out_w, w, align_corners)
    dtype = x.dtype
    wy0 = jnp.asarray(wy0, dtype)[..., :, None, None]
    wy1 = jnp.asarray(wy1, dtype)[..., :, None, None]
    wx0 = jnp.asarray(wx0, dtype)[..., :, None]
    wx1 = jnp.asarray(wx1, dtype)[..., :, None]

    rows = x[..., iy0, :, :] * wy0 + x[..., iy1, :, :] * wy1
    out = rows[..., ix0, :] * wx0 + rows[..., ix1, :] * wx1
    return out


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC pixel shuffle: (n, h, w, c*r^2) -> (n, h*r, w*r, c).

    Channel interpretation matches torch.nn.PixelShuffle on NCHW
    tensors: input channel index = c * r^2 + ry * r + rx.
    """
    *lead, h, w, c_in = x.shape
    r = scale
    c_out = c_in // (r * r)
    x = x.reshape(*lead, h, w, c_out, r, r)
    # (..., h, w, c, ry, rx) -> (..., h, ry, w, rx, c)
    x = jnp.moveaxis(x, (-3, -2, -1), (-1, -4, -2))
    return x.reshape(*lead, h * r, w * r, c_out)


def pixel_unshuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC pixel unshuffle: (n, h*r, w*r, c) -> (n, h, w, c*r^2)
    (reference: basicsr/models/archs/arch_util.py:213-229; output
    channel index = c * r^2 + ry * r + rx, matching the reference's
    NCHW view/permute)."""
    *lead, hh, ww, c = x.shape
    r = scale
    h, w = hh // r, ww // r
    x = x.reshape(*lead, h, r, w, r, c)
    # (..., h, ry, w, rx, c) -> (..., h, w, c, ry, rx)
    x = jnp.moveaxis(x, (-4, -2, -1), (-2, -1, -3))
    return x.reshape(*lead, h, w, c * r * r)
