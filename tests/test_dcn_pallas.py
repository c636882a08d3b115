"""Parity tests for the opt-in Pallas blend+GEMM DCN path.

ops/dcn_pallas.py is a shipped-but-measured-slower alternative kept as
the consumer for a future Mosaic in-VMEM gather (docs/TPUDesign.md
"Pallas blend kernel post-mortem"). It must not drift while it waits:
these tests run the kernel in Pallas interpret mode on CPU — both the
raw blend op against its math contract and the FULL op against the
default path — and assert the kernel actually traced (a silently
routed fallback invalidates a parity test).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edvr_tpu.ops import dcn_pallas
from edvr_tpu.ops.dcn import modulated_deform_conv

rng = np.random.RandomState(7)


def test_blend_matmul_group_math(monkeypatch):
    """Raw kernel vs its documented contract:
    out_prev + (g_cat * expand(cs_cat)) @ wexp_g."""
    monkeypatch.setenv('EDVR_TPU_DCN_PALLAS_INTERPRET', '1')
    NP, K, lanes, c_per, cout = 70, 3, 32, 4, 24
    slots = lanes // c_per
    g_cat = jnp.asarray(rng.randn(NP, K * lanes).astype(np.float32))
    cs_cat = jnp.asarray(rng.randn(NP, K * slots).astype(np.float32))
    wexp = jnp.asarray(rng.randn(K * lanes, cout).astype(np.float32))
    prev = jnp.asarray(rng.randn(NP, cout).astype(np.float32))

    out = dcn_pallas.blend_matmul_group(g_cat, cs_cat, wexp, prev,
                                        c_per=c_per, block_rows=32)
    cs_full = jnp.repeat(cs_cat, c_per, axis=1)
    ref = prev + (g_cat * cs_full) @ wexp
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_full_op_parity_and_grads(monkeypatch):
    """modulated_deform_conv with the Pallas blend forced on (interpret
    mode, bf16 inputs as on TPU) vs the default XLA path on the same
    bf16 inputs; value and gradient parity, with a path-ran assert."""
    n, h, w, cin, cout = 2, 10, 9, 8, 6
    dg, K = 2, 9
    x = (rng.randn(n, h, w, cin) * 0.5).astype(np.float32)
    off = (rng.randn(n, h, w, dg * 2 * K) * 1.5).astype(np.float32)
    msk = rng.rand(n, h, w, dg * K).astype(np.float32)
    wgt = (rng.randn(3, 3, cin, cout) * 0.2).astype(np.float32)
    bf = lambda a: jnp.asarray(a).astype(jnp.bfloat16)  # noqa: E731
    args = (bf(x), jnp.asarray(off), jnp.asarray(msk), bf(wgt), None,
            1, 1, 1, 1, dg)

    def loss(x_, o_, m_, w_):
        out = modulated_deform_conv(x_, o_, m_, w_, *args[4:])
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    ref_grads, ref_out = None, None
    monkeypatch.setenv('EDVR_TPU_DCN_BAND', '0')
    (_, ref_out), ref_grads = jax.value_and_grad(
        loss, argnums=(1, 2, 3), has_aux=True)(*args[:4])

    monkeypatch.setenv('EDVR_TPU_DCN_PALLAS', '1')
    monkeypatch.setenv('EDVR_TPU_DCN_PALLAS_INTERPRET', '1')
    before = dcn_pallas.TRACE_COUNTS['blend']
    (_, out), grads = jax.value_and_grad(
        loss, argnums=(1, 2, 3), has_aux=True)(*args[:4])
    assert dcn_pallas.TRACE_COUNTS['blend'] > before, \
        'Pallas blend path did not run — parity test is vacuous'

    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_out, np.float32),
        rtol=2e-2, atol=2e-2)
    for g, rg, name in zip(grads, ref_grads, ('offset', 'mask', 'w')):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(rg, np.float32),
            rtol=5e-2, atol=5e-2, err_msg=f'grad {name}')
