"""Subprocess worker for the 2-process multi-host tests.

Each worker is one JAX process of a 2-process CPU "pod" (localhost
coordinator). Modes:

* ``unit``      — dist identity, EnlargedSampler host sharding,
                  process_allreduce_sum, and one cross-host SRModel
                  train step whose updated params process 0 dumps for
                  the parent to compare against a single-process step.
* ``video_val`` — the full test CLI on a video dataset: rank-strided
                  VideoBaseModel.dist_validation + allreduce metric
                  aggregation (reference: video_base_model.py:44,109-113).

Usage: multihost_worker.py <mode> <coordinator> <process_id> <nproc> <dir>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

# two local CPU devices per process -> a 4-device global mesh
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=2')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'float32')

import numpy as np  # noqa: E402


def run_unit(coord, pid, nproc, outdir):
    from edvr_tpu.data.data_sampler import EnlargedSampler
    from edvr_tpu.parallel.dist_util import (get_dist_info, init_dist,
                                             process_allreduce_sum)

    init_dist('jax', coordinator_address=coord, num_processes=nproc,
              process_id=pid)
    rank, world = get_dist_info()
    assert (rank, world) == (pid, nproc), (rank, world)
    assert jax.device_count() == 2 * nproc, jax.devices()

    # host sharding: each process sees a disjoint, complete slice
    sampler = EnlargedSampler(list(range(10)), num_replicas=world,
                              rank=rank, ratio=1)
    mine = np.asarray(sorted(sampler), dtype=np.int32)
    from jax.experimental import multihost_utils
    everyone = np.asarray(
        multihost_utils.process_allgather(mine)).reshape(-1)
    assert sorted(everyone.tolist()) == sorted(list(range(10))), everyone

    # rank-strided metric table reassembled by the allreduce helper
    table = np.zeros((6, 2), np.float32)
    for i in range(rank, 6, world):
        table[i] = [i + 1, 10 * (i + 1)]
    full = process_allreduce_sum(table)
    expect = np.stack([np.arange(1, 7), 10 * np.arange(1, 7)],
                      axis=1).astype(np.float32)
    np.testing.assert_array_equal(full, expect)

    # one SRModel train step over the GLOBAL mesh: each process feeds
    # its half of a fixed 4-sample batch; the compiled gradient
    # all-reduce spans both processes
    from edvr_tpu.models import create_model
    opt = _sr_opt(outdir, dist=True, rank=rank, world_size=world)
    model = create_model(opt)
    rng = np.random.RandomState(42)
    gt = rng.rand(4, 32, 32, 3).astype(np.float32)
    lq = rng.rand(4, 8, 8, 3).astype(np.float32)
    sl = slice(rank * 2, rank * 2 + 2)
    model.feed_data({'gt': gt[sl], 'lq': lq[sl]})
    model.optimize_parameters(1)
    loss = model.get_current_log()['l_pix']
    assert np.isfinite(loss)
    if rank == 0:
        leaves = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, model.params_g))
        np.savez(os.path.join(outdir, 'mh_params.npz'), loss=loss,
                 *leaves)
    multihost_utils.sync_global_devices('done')


def _sr_opt(outdir, **over):
    opt = {
        'name': 'mh_unit', 'model_type': 'SRModel', 'scale': 4,
        'num_gpu': 2, 'manual_seed': 0, 'is_train': True, 'dist': False,
        'rank': 0, 'world_size': 1,
        'network_g': {'type': 'MSRResNet', 'num_in_ch': 3, 'num_out_ch': 3,
                      'num_feat': 8, 'num_block': 1, 'upscale': 4},
        'path': {'pretrain_network_g': None, 'strict_load_g': True,
                 'resume_state': None,
                 'models': os.path.join(outdir, 'models'),
                 'training_states': os.path.join(outdir, 'states'),
                 'visualization': os.path.join(outdir, 'vis'),
                 'log': outdir},
        'train': {
            'optim_g': {'type': 'Adam', 'lr': 1e-2, 'weight_decay': 0,
                        'betas': [0.9, 0.99]},
            'scheduler': {'type': 'MultiStepRestartLR', 'milestones': [100],
                          'gamma': 0.5},
            'total_iter': 4, 'warmup_iter': -1,
            'pixel_opt': {'type': 'L1Loss', 'loss_weight': 1.0,
                          'reduction': 'mean'},
        },
        'val': None, 'logger': {'print_freq': 1},
    }
    opt.update(over)
    return opt


def run_video_val(coord, pid, nproc, workdir):
    os.environ['COORDINATOR_ADDRESS'] = coord
    os.environ['NUM_PROCESSES'] = str(nproc)
    os.environ['PROCESS_ID'] = str(pid)
    os.chdir(workdir)

    from edvr_tpu.test import main
    model = main(args=['-opt', os.path.join(workdir, 'opt.yml'),
                       '--launcher', 'jax'])
    assert model.opt['world_size'] == nproc, model.opt['world_size']
    # the allreduce reassembled every rank's strided shard: every
    # frame row of every folder must have been scored (psnr > 0)
    for folder, table in model.metric_results.items():
        assert np.isfinite(table).all(), (folder, table)
        assert (table > 0).all(), (folder, table)
    if pid == 0:
        np.save(os.path.join(workdir, 'video_metrics.npy'),
                model.metric_results['000'])
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices('done')


if __name__ == '__main__':
    mode, coord, pid, nproc, outdir = sys.argv[1:6]
    if mode == 'unit':
        run_unit(coord, int(pid), int(nproc), outdir)
    elif mode == 'video_val':
        run_video_val(coord, int(pid), int(nproc), outdir)
    else:
        raise SystemExit(f'unknown mode {mode}')
    print('WORKER_OK')
