"""Pallas kernel: fused bilinear-blend + tap-concat GEMM for the packed
deformable conv.

One deformable group's K gathered tile blocks arrive lane-concatenated
as a (NP, K*lanes) strip; the kernel expands the compact
(row, pixel)-slot blend coefficients (NP, K*slots) to full lane width
with a constant block-diagonal one-hot matmul on the MXU (FLOPs are
cheap; this keeps HBM traffic at the compact size), multiplies, and
contracts against the slot-tiled weights in a single
(BLK, K*lanes) x (K*lanes, cout) matmul, accumulating into the output
block. The blended im2col strip the XLA path writes and re-reads never
touches HBM.

Used by edvr_tpu/ops/dcn.py on TPU; the pure-XLA path remains the
fallback (CPU tests / interpretability).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# trace-time counter so parity tests can assert the kernel path RAN
# (a silently-routed fallback invalidates the test — see the band
# kernel's history in docs/TPUDesign.md)
TRACE_COUNTS = {'blend': 0}


@functools.partial(jax.jit, static_argnames=('c_per', 'block_rows'))
def blend_matmul_group(g_cat, cs_cat, wexp_g, out_prev, c_per: int,
                       block_rows: int = 1024):
    """out_prev + (g_cat * expand(cs_cat)) @ wexp_g.

    Args:
        g_cat: (NP, K*lanes) lane-concatenated gathered tiles (bf16/f32).
        cs_cat: (NP, K*slots) blend coefficients, slots = lanes/c_per.
        wexp_g: (K*lanes, cout) slot-tiled weights (dtype of g_cat).
        out_prev: (NP, cout) float32 accumulator.
        c_per: channels per slot (lane expansion factor).

    Returns:
        (NP, cout) float32.
    """
    TRACE_COUNTS['blend'] += 1
    NP, width = g_cat.shape
    cwidth = cs_cat.shape[-1]
    assert cwidth * c_per == width
    cout = wexp_g.shape[-1]
    dtype = g_cat.dtype

    nblocks = -(-NP // block_rows)
    pad = nblocks * block_rows - NP
    if pad:
        g_cat = jnp.pad(g_cat, ((0, pad), (0, 0)))
        cs_cat = jnp.pad(cs_cat, ((0, pad), (0, 0)))
        out_prev = jnp.pad(out_prev, ((0, pad), (0, 0)))

    # block-diagonal one-hot expansion: slot s -> lanes [s*c, (s+1)*c)
    expand = np.zeros((cwidth, width), np.float32)
    for s in range(cwidth):
        expand[s, s * c_per:(s + 1) * c_per] = 1.0
    expand = jnp.asarray(expand, dtype)

    def kernel(g_ref, cs_ref, w_ref, e_ref, prev_ref, out_ref):
        cfull = jnp.dot(cs_ref[:], e_ref[:],
                        preferred_element_type=jnp.float32).astype(dtype)
        out_ref[:] = prev_ref[:] + jnp.dot(
            g_ref[:] * cfull, w_ref[:],
            preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block_rows, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, cwidth), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cwidth, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * block_rows, cout),
                                       jnp.float32),
        # env read at trace time: CPU parity tests interpret the kernel
        interpret=os.environ.get(
            'EDVR_TPU_DCN_PALLAS_INTERPRET') == '1',
    )(g_cat, cs_cat, wexp_g, expand, out_prev)

    return out[:NP] if pad else out


# ---------------------------------------------------------------------------
# differentiable wrapper: Pallas forward, XLA backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def blend_matmul_group_ad(g_cat, cs_cat, wexp_g, out_prev, c_per):
    return blend_matmul_group(g_cat, cs_cat, wexp_g, out_prev, c_per=c_per)


def _bm_fwd(g_cat, cs_cat, wexp_g, out_prev, c_per):
    out = blend_matmul_group(g_cat, cs_cat, wexp_g, out_prev, c_per=c_per)
    return out, (g_cat, cs_cat, wexp_g)


def _bm_bwd(c_per, res, dout):
    g_cat, cs_cat, wexp_g = res
    dtype = g_cat.dtype
    cs_full = jnp.repeat(cs_cat, c_per, axis=1)
    gw = jnp.dot(dout.astype(dtype), wexp_g.T,
                 preferred_element_type=jnp.float32)  # (NP, width)
    d_g = (gw * cs_full.astype(jnp.float32)).astype(dtype)
    d_cs_full = gw * g_cat.astype(jnp.float32)
    d_cs = d_cs_full.reshape(d_cs_full.shape[0], -1,
                             c_per).sum(-1).astype(cs_cat.dtype)
    blended = (g_cat.astype(jnp.float32) * cs_full.astype(jnp.float32))
    d_w = jnp.dot(blended.T.astype(dtype), dout.astype(dtype),
                  preferred_element_type=jnp.float32).astype(wexp_g.dtype)
    return d_g, d_cs, d_w, dout


blend_matmul_group_ad.defvjp(_bm_fwd, _bm_bwd)
