"""Data-parallel correctness: one optimizer step over an 8-device
sharded batch must equal the same step on a single device (the SPMD
partitioner's gradient all-reduce reproduces full-batch training, the
property DDP provided in the reference)."""

import numpy as np

import jax


def _opt(num_gpu):
    return {
        'name': 'dp', 'model_type': 'SRModel', 'scale': 4,
        'num_gpu': num_gpu, 'manual_seed': 0, 'is_train': True,
        'dist': False,
        'network_g': dict(type='MSRResNet', num_in_ch=3, num_out_ch=3,
                          num_feat=8, num_block=1, upscale=4),
        'path': {},
        'train': {
            'optim_g': dict(type='Adam', lr=1e-3, weight_decay=0,
                            betas=[0.9, 0.99]),
            'scheduler': dict(type='ConstantLR'),
            'total_iter': 10, 'warmup_iter': -1,
            'pixel_opt': dict(type='L1Loss', loss_weight=1.0,
                              reduction='mean'),
        },
    }


def test_sharded_step_matches_single_device():
    from edvr_tpu.models import create_model
    rng = np.random.RandomState(0)
    batch = {'lq': rng.rand(8, 16, 16, 3).astype(np.float32),
             'gt': rng.rand(8, 64, 64, 3).astype(np.float32)}

    results = {}
    for num_gpu in (1, 8):
        model = create_model(_opt(num_gpu))
        assert model.num_devices == num_gpu
        model.feed_data(batch)
        for it in (1, 2):
            model.optimize_parameters(it)
        results[num_gpu] = jax.tree_util.tree_map(np.asarray,
                                                  model.params_g)

    flat1 = jax.tree_util.tree_leaves(results[1])
    flat8 = jax.tree_util.tree_leaves(results[8])
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_enlarged_sampler_rank_disjoint():
    from edvr_tpu.data.data_sampler import EnlargedSampler

    class Dummy:
        def __len__(self):
            return 10

    samplers = [EnlargedSampler(Dummy(), 4, r, ratio=2) for r in range(4)]
    for s in samplers:
        s.set_epoch(3)
    idx = [list(iter(s)) for s in samplers]
    # all ranks together cover the enlarged permutation exactly once
    assert sorted(sum(idx, [])) == sorted(
        list(np.random.RandomState(3).permutation(20) % 10))
    # same epoch -> deterministic
    assert list(iter(samplers[0])) == idx[0]
