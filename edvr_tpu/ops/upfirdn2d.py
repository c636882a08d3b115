"""upfirdn2d: upsample (zero-insertion) -> 2D FIR filter -> downsample.

Behavioral equivalent of the reference's CUDA extension
(reference: basicsr/models/ops/upfirdn2d/upfirdn2d.py:84-117; output
size formula ``(in*up + pad0 + pad1 - k)//down + 1`` at :97-98),
implemented as one `lax.conv_general_dilated` per call: `lhs_dilation`
performs the zero-insertion, asymmetric conv padding absorbs both the
requested pad and the (up-1) trailing zeros the reference's
zero-insertion produces, `window_strides` performs the downsampling,
and the FIR kernel is pre-flipped because XLA convs are correlations.
This maps the whole op onto the TPU conv unit with no materialized
intermediate. Gradients come from XLA autodiff (transposed conv),
matching the reference's flipped-kernel backward
(upfirdn2d.py:10-52).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1,
              down: int = 1, pad=(0, 0)) -> jnp.ndarray:
    """Apply upfirdn to an NHWC batch.

    Args:
        x: (n, h, w, c).
        kernel: (kh, kw) FIR filter.
        up/down: integer resampling factors (same for both axes, as in
            the reference's public wrapper).
        pad: (pad0, pad1) applied to both axes, or a 4-tuple
            (x0, x1, y0, y1) matching the reference's internal order.

    Returns:
        (n, out_h, out_w, c) with out = (in*up + pad0 + pad1 - k)//down + 1.
    """
    if len(pad) == 2:
        px0, px1, py0, py1 = pad[0], pad[1], pad[0], pad[1]
    else:
        px0, px1, py0, py1 = pad
    return _upfirdn2d(x, kernel, up, up, down, down, px0, px1, py0, py1)


def _upfirdn2d(x, kernel, up_x, up_y, down_x, down_y, pad_x0, pad_x1,
               pad_y0, pad_y1):
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    # fold channels into batch; single-channel depthwise FIR
    xb = jnp.transpose(x, (0, 3, 1, 2)).reshape(n * c, h, w, 1)
    # correlation kernel = flip(FIR) so the op is a true convolution
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)[:, :, None, None]
    # zero-insertion via lhs_dilation gives (h-1)*up+1 samples; the
    # reference's insertion yields h*up (with up-1 trailing zeros), so
    # shift those zeros into the high-side padding.
    out = lax.conv_general_dilated(
        xb, k,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    out_h = (h * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
    out_w = (w * up_x + pad_x0 + pad_x1 - kw) // down_x + 1
    out = out.reshape(n, c, out_h, out_w)
    return jnp.transpose(out, (0, 2, 3, 1))


def make_resample_kernel(k) -> jnp.ndarray:
    """Normalized 2-D resampling kernel from a 1-D tap list
    (reference: basicsr/models/archs/stylegan2_arch.py:16-33)."""
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    k = k / jnp.sum(k)
    return k
