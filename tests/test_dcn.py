"""Modulated deformable conv vs a direct numpy oracle of the CUDA math.

The oracle mirrors the reference kernel semantics
(basicsr/models/ops/dcn/src/deform_conv_cuda_kernel.cu): offset channel
g*2K+2k = dy, g*2K+2k+1 = dx; per-tap zero boundary bilinear; mask
multiplies the sampled value.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edvr_tpu.ops import modulated_deform_conv

rng = np.random.RandomState(3)


def bilinear_zero(img, y, x):
    """img: (h, w, c); sample at (y, x) with per-tap zero boundary."""
    h, w, _ = img.shape
    if y <= -1 or y >= h or x <= -1 or x >= w:
        return 0.0
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    val = 0.0
    for (yy, wy) in ((y0, 1 - (y - y0)), (y0 + 1, y - y0)):
        for (xx, wx) in ((x0, 1 - (x - x0)), (x0 + 1, x - x0)):
            if 0 <= yy < h and 0 <= xx < w:
                val = val + wy * wx * img[yy, xx]
    return val


def mdcn_oracle(x, offset, mask, weight, bias, stride, padding, dilation,
                groups, dg):
    """x: (n,h,w,cin); offset: (n,oh,ow,dg*2K); mask: (n,oh,ow,dg*K);
    weight: (kh,kw,cin//groups,cout)."""
    n, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    K = kh * kw
    oh = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    ow = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    c_per = cin // dg
    cout_g = cout // groups
    out = np.zeros((n, oh, ow, cout), np.float64)
    for b in range(n):
        for oy in range(oh):
            for ox in range(ow):
                for g in range(dg):
                    for k in range(K):
                        i, j = divmod(k, kw)
                        dy = offset[b, oy, ox, g * 2 * K + 2 * k]
                        dx = offset[b, oy, ox, g * 2 * K + 2 * k + 1]
                        m = mask[b, oy, ox, g * K + k]
                        y = oy * stride - padding + i * dilation + dy
                        xx = ox * stride - padding + j * dilation + dx
                        sample = bilinear_zero(
                            x[b, :, :, g * c_per:(g + 1) * c_per], y, xx)
                        if np.isscalar(sample):
                            sample = np.zeros(c_per)
                        sample = sample * m
                        for cc in range(c_per):
                            cin_idx = g * c_per + cc
                            wg = cin_idx // cin_g  # weight group
                            out[b, oy, ox, wg * cout_g:(wg + 1) * cout_g] += (
                                sample[cc] * weight[i, j, cin_idx % cin_g,
                                                    wg * cout_g:
                                                    (wg + 1) * cout_g])
    if bias is not None:
        out += bias
    return out


@pytest.mark.parametrize('stride,padding,dilation,groups,dg', [
    (1, 1, 1, 1, 2),
    (2, 1, 1, 1, 1),
    (1, 0, 2, 1, 2),
    (1, 1, 1, 2, 2),
])
def test_mdcn_matches_oracle(stride, padding, dilation, groups, dg):
    n, h, w, cin, cout, kh, kw = 2, 7, 6, 4, 6, 3, 3
    K = kh * kw
    oh = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    ow = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    x = rng.randn(n, h, w, cin).astype(np.float32)
    offset = (rng.randn(n, oh, ow, dg * 2 * K) * 2).astype(np.float32)
    mask = rng.rand(n, oh, ow, dg * K).astype(np.float32)
    weight = rng.randn(kh, kw, cin // groups, cout).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)

    ref = mdcn_oracle(x, offset, mask, weight, bias, stride, padding,
                      dilation, groups, dg)
    out = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), stride, padding, dilation,
        groups, dg)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4)


def test_mdcn_zero_offset_equals_conv():
    """With zero offsets and mask==1, DCN must equal a plain conv."""
    n, h, w, cin, cout = 1, 8, 8, 4, 5
    dg, K = 2, 9
    x = rng.randn(n, h, w, cin).astype(np.float32)
    weight = rng.randn(3, 3, cin, cout).astype(np.float32)
    offset = np.zeros((n, h, w, dg * 2 * K), np.float32)
    mask = np.ones((n, h, w, dg * K), np.float32)
    out = modulated_deform_conv(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), jnp.asarray(weight),
                                None, 1, 1, 1, 1, dg)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize('mode,denom', [
    ('int', 1.0), ('half', 2.0), ('quarter', 4.0)])
def test_mdcn_offset_quant_knob(monkeypatch, mode, denom):
    """EDVR_TPU_DCN_QUANT must equal running the op on pre-rounded
    offsets (the knob is pure offset snapping, nothing else)."""
    n, h, w, cin, cout = 1, 7, 6, 4, 5
    dg, K = 2, 9
    x = rng.randn(n, h, w, cin).astype(np.float32)
    offset = (rng.randn(n, h, w, dg * 2 * K) * 2).astype(np.float32)
    mask = rng.rand(n, h, w, dg * K).astype(np.float32)
    weight = rng.randn(3, 3, cin, cout).astype(np.float32)
    args = (jnp.asarray(mask), jnp.asarray(weight), None, 1, 1, 1, 1, dg)

    monkeypatch.setenv('EDVR_TPU_DCN_QUANT', mode)
    out = modulated_deform_conv(jnp.asarray(x), jnp.asarray(offset),
                                *args)
    monkeypatch.delenv('EDVR_TPU_DCN_QUANT')
    ref = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(np.round(offset * denom) / denom),
        *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)
    # and it must actually differ from the continuous forward
    cont = modulated_deform_conv(jnp.asarray(x), jnp.asarray(offset),
                                 *args)
    assert float(jnp.abs(out - cont).max()) > 1e-4


def test_mdcn_gradients_finite_difference():
    """Autodiff grads (incl. the coordinate gradient, CUDA col2im_coord)
    vs central finite differences in float64."""
    jax.config.update('jax_enable_x64', True)
    try:
        n, h, w, cin, cout, dg = 1, 5, 5, 2, 2, 1
        K = 9
        x = rng.randn(n, h, w, cin)
        offset = rng.randn(n, h, w, dg * 2 * K) * 1.3
        mask = rng.rand(n, h, w, dg * K)
        weight = rng.randn(3, 3, cin, cout)

        def loss(x_, off_, m_, w_):
            out = modulated_deform_conv(x_, off_, m_, w_, None, 1, 1, 1, 1,
                                        dg)
            return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(
                out.shape)))

        args = [jnp.asarray(a) for a in (x, offset, mask, weight)]
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
        eps = 1e-6
        for ai, a in enumerate((x, offset, mask, weight)):
            flat = a.reshape(-1)
            for idx in rng.choice(flat.size, size=6, replace=False):
                ap, am = flat.copy(), flat.copy()
                ap[idx] += eps
                am[idx] -= eps
                argp = list(args)
                argp[ai] = jnp.asarray(ap.reshape(a.shape))
                argm = list(args)
                argm[ai] = jnp.asarray(am.reshape(a.shape))
                fd = (loss(*argp) - loss(*argm)) / (2 * eps)
                ad = np.asarray(grads[ai]).reshape(-1)[idx]
                assert abs(fd - ad) < 1e-4 * max(1.0, abs(fd)), (
                    f'arg {ai} idx {idx}: fd={fd} ad={ad}')
    finally:
        jax.config.update('jax_enable_x64', False)
