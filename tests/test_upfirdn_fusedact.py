"""upfirdn2d vs a direct numpy oracle; fused_leaky_relu vs formula."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edvr_tpu.ops import fused_leaky_relu, upfirdn2d

rng = np.random.RandomState(1)


def upfirdn2d_oracle(x, k, up, down, pad):
    """Direct per-image implementation of the upfirdn definition:
    zero-insert to h*up, pad (crop if negative), convolve (flipped-kernel
    correlation), stride-subsample. x: (n, h, w, c)."""
    if len(pad) == 2:
        px0, px1, py0, py1 = pad[0], pad[1], pad[0], pad[1]
    else:
        px0, px1, py0, py1 = pad
    n, h, w, c = x.shape
    kh, kw = k.shape
    # zero-insert
    up_img = np.zeros((n, h * up, w * up, c), x.dtype)
    up_img[:, ::up, ::up, :] = x
    # pad / crop
    def padcrop(a, p0, p1, axis):
        if p0 > 0:
            pads = [(0, 0)] * 4
            pads[axis] = (p0, 0)
            a = np.pad(a, pads)
        elif p0 < 0:
            a = np.take(a, range(-p0, a.shape[axis]), axis=axis)
        if p1 > 0:
            pads = [(0, 0)] * 4
            pads[axis] = (0, p1)
            a = np.pad(a, pads)
        elif p1 < 0:
            a = np.take(a, range(0, a.shape[axis] + p1), axis=axis)
        return a
    up_img = padcrop(up_img, py0, py1, 1)
    up_img = padcrop(up_img, px0, px1, 2)
    # convolution (flip kernel, correlate)
    kf = k[::-1, ::-1]
    H, W = up_img.shape[1], up_img.shape[2]
    oh, ow = H - kh + 1, W - kw + 1
    out = np.zeros((n, oh, ow, c), np.float64)
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * up_img[:, i:i + oh, j:j + ow, :]
    return out[:, ::down, ::down, :].astype(x.dtype)


@pytest.mark.parametrize('up,down,pad', [
    (1, 1, (1, 1)),
    (2, 1, (2, 1)),
    (1, 2, (1, 1)),
    (2, 2, (1, 2)),
    (1, 1, (-1, 2)),
    (2, 1, (2, 1, 1, 2)),
])
def test_upfirdn2d_matches_oracle(up, down, pad):
    x = rng.rand(2, 7, 9, 3).astype(np.float32)
    k = rng.rand(4, 3).astype(np.float32)
    ref = upfirdn2d_oracle(x, k, up, down, pad)
    out = upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_upfirdn2d_output_size_formula():
    # (in*up + pad0 + pad1 - k) // down + 1 (reference upfirdn2d.py:97-98)
    x = jnp.zeros((1, 8, 8, 1))
    k = jnp.ones((4, 4))
    out = upfirdn2d(x, k, up=2, down=2, pad=(1, 1))
    assert out.shape == (1, (8 * 2 + 2 - 4) // 2 + 1,
                         (8 * 2 + 2 - 4) // 2 + 1, 1)


def test_upfirdn2d_grad_flows():
    x = jnp.asarray(rng.rand(1, 6, 6, 2).astype(np.float32))
    k = jnp.asarray(rng.rand(3, 3).astype(np.float32))
    g = jax.grad(lambda a: jnp.sum(upfirdn2d(a, k, 2, 1, (1, 1))**2))(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


def test_fused_leaky_relu():
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    out = np.asarray(fused_leaky_relu(x, b))
    xb = np.asarray(x) + np.asarray(b)
    ref = np.where(xb >= 0, xb, 0.2 * xb) * np.sqrt(2)
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    # grad-of-grad works (needed for R1 / path-length regularizers)
    f = lambda a: jnp.sum(fused_leaky_relu(a, b)**3)
    gg = jax.grad(lambda a: jnp.sum(jax.grad(f)(a)**2))(x)
    assert np.isfinite(np.asarray(gg)).all()
