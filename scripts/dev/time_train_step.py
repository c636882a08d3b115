"""Time one jitted EDVR-M train step (Charbonnier + Adam) on the real
TPU. Used for DCN-backward trade studies (docs/TPUDesign.md).

Usage: python scripts/dev/time_train_step.py [--batch 4] [--crop 64]
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
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from edvr_tpu.archs import define_network
    from edvr_tpu.models.losses import CharbonnierLoss
    charbonnier_loss = CharbonnierLoss()

    net = define_network(
        dict(type='EDVR', num_in_ch=3, num_out_ch=3, num_feat=64,
             num_frame=5, deformable_groups=8, num_extract_block=5,
             num_reconstruct_block=10, center_frame_idx=2, hr_in=False,
             with_predeblur=False, with_tsa=True))
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 5, 16, 16, 3)))['params']
    tx = optax.adam(4e-4)
    opt_state = tx.init(params)

    b, c = args.batch, args.crop

    @jax.jit
    def step(params, opt_state, lq, gt):
        def loss_fn(p):
            out = net.apply({'params': p}, lq)
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
    print(f'col2im={os.environ.get("EDVR_TPU_DCN_COL2IM", "0")} '
          f'batch={b} crop={c}: {ms:.1f} ms/step '
          f'(all: {[round((t - overhead) * 1000, 1) for t in times]})')


if __name__ == '__main__':
    main()
