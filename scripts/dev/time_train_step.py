"""Time one jitted EDVR train step (Charbonnier + Adam) on the real
TPU and account FLOPs/MFU. Used for DCN-backward trade studies and the
production-config step table (docs/TPUDesign.md).

Usage: python scripts/dev/time_train_step.py [--batch 4] [--crop 64]
       [--config edvr_m|edvr_l]
Env: EDVR_TPU_DCN_COL2IM=0|1 selects the DCN backward formulation.
"""

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=4)
    parser.add_argument('--crop', type=int, default=64)
    parser.add_argument('--config', default='edvr_m',
                        choices=['edvr_m', 'edvr_l'])
    parser.add_argument('--ablate', action='store_true',
                        help='also time fwd-only and fwd+bwd variants '
                             'and print the step decomposition '
                             '(fwd / bwd / optimizer)')
    parser.add_argument('--mp', action='store_true',
                        help='mixed-precision step: bf16 compute + '
                             'activations, f32 master params (matches '
                             'train.mixed_precision: bf16 in the engine)')
    parser.add_argument('--remat', action='store_true',
                        help='rematerialize the residual trunks in the '
                             'backward (network_g.remat: true)')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from edvr_tpu.archs import define_network
    from edvr_tpu.models.losses import CharbonnierLoss
    charbonnier_loss = CharbonnierLoss()

    cfgs = {
        # EDVR-M: options/train/EDVR/train_EDVR_M_x4_SR_REDS*.yml
        'edvr_m': dict(num_feat=64, num_extract_block=5,
                       num_reconstruct_block=10),
        # EDVR-L: options/train/EDVR/train_EDVR_L_x4_SR_REDS*.yml
        'edvr_l': dict(num_feat=128, num_extract_block=5,
                       num_reconstruct_block=40),
    }
    net = define_network(
        dict(type='EDVR', num_in_ch=3, num_out_ch=3, num_frame=5,
             deformable_groups=8, center_frame_idx=2, hr_in=False,
             with_predeblur=False, with_tsa=True, remat=args.remat,
             **cfgs[args.config]))
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 5, 16, 16, 3)))['params']
    tx = optax.adam(4e-4)
    opt_state = tx.init(params)

    b, c = args.batch, args.crop

    @jax.jit
    def step(params, opt_state, lq, gt):
        def loss_fn(p):
            x = lq
            if args.mp:
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16), p)
                x = lq.astype(jnp.bfloat16)
            out = net.apply({'params': p}, x).astype(jnp.float32)
            return charbonnier_loss(out, gt)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(0)
    batches = [(jnp.asarray(rng.rand(b, 5, c, c, 3).astype(np.float32)),
                jnp.asarray(rng.rand(b, c * 4, c * 4, 3)
                            .astype(np.float32)))
               for _ in range(6)]

    tiny = jax.jit(lambda v: (v * 2).mean())
    ones = jnp.ones((8, 128))
    float(tiny(ones))
    overhead = min(
        (lambda t0: (float(tiny(ones)), time.time() - t0)[1])(time.time())
        for _ in range(5))

    params, opt_state, loss = step(params, opt_state, *batches[0])
    float(loss)  # compile + warm
    times = []
    for lq, gt in batches[1:]:
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, lq, gt)
        float(loss)
        times.append(time.time() - t0)
    ms = (min(times) - overhead) * 1000

    # FLOP accounting: XLA's own count for the whole compiled step
    # (fwd + bwd + Adam), vs the v5e per-chip peak
    cost = step.lower(params, opt_state, *batches[0]).compile() \
        .cost_analysis()
    tflop = float(cost.get('flops', 0.0)) / 1e12
    peak_bf16 = 197.0  # v5e per-chip bf16 TFLOP/s
    mfu_bf16 = tflop / (ms / 1e3) / peak_bf16 * 100
    import json
    print(json.dumps({
        'config': args.config, 'batch': b, 'crop_gt': c * 4,
        'crop_lq': c,
        'col2im': os.environ.get('EDVR_TPU_DCN_COL2IM', '0'),
        'band_min_p': os.environ.get('EDVR_TPU_DCN_BAND_MIN_P', '4096'),
        'mixed_precision': 'bf16' if args.mp else 'f32',
        'remat': args.remat,
        'ms_step': round(ms, 1),
        'steps_per_s': round(1e3 / ms, 2),
        'step_tflop': round(tflop, 3),
        'mfu_pct_bf16peak': round(mfu_bf16, 1),
        'all_ms': [round((t - overhead) * 1000, 1) for t in times],
    }))

    if not args.ablate:
        return

    # step decomposition (VERDICT r3 weak-item 1): time fwd-only and
    # fwd+bwd closures of the SAME loss; differences isolate the
    # backward pass and the optimizer. The band kernel's own fwd/bwd
    # split at the train geometries comes from
    # scripts/dev/measure_band_dispatch.py (train L1/L2 rows).
    def _apply(p, x):
        if args.mp:
            p = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)
            x = x.astype(jnp.bfloat16)
        return net.apply({'params': p}, x).astype(jnp.float32)

    @jax.jit
    def fwd_only(params, lq, gt):
        return charbonnier_loss(_apply(params, lq), gt)

    @jax.jit
    def fwd_bwd(params, lq, gt):
        def loss_fn(p):
            return charbonnier_loss(_apply(p, lq), gt)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        # pull one scalar that depends on every grad leaf so nothing
        # is dead-code-eliminated
        gsum = sum(jnp.sum(jnp.abs(g) if g.ndim == 0 else jnp.abs(g))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss + 0.0 * gsum

    def time_fn(fn):
        float(fn(params, batches[0][0], batches[0][1]))  # compile+warm
        ts = []
        for lq, gt in batches[1:]:
            t0 = time.time()
            float(fn(params, lq, gt))
            ts.append(time.time() - t0)
        return (min(ts) - overhead) * 1000

    ms_fwd = time_fn(fwd_only)
    ms_fwdbwd = time_fn(fwd_bwd)
    print(json.dumps({
        'ablation_ms': {
            'fwd': round(ms_fwd, 1),
            'bwd (fwdbwd - fwd)': round(ms_fwdbwd - ms_fwd, 1),
            'optimizer (step - fwdbwd)': round(ms - ms_fwdbwd, 1),
            'full_step': round(ms, 1),
        },
        'note': 'band-kernel fwd/bwd split at these geometries: '
                'scripts/dev/measure_band_dispatch.py train rows',
    }))


if __name__ == '__main__':
    main()
