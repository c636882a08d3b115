"""Distributed/process utilities on top of the JAX runtime.

Replaces the reference's torch.distributed/NCCL layer
(reference: basicsr/utils/dist_util.py:10-83). In JAX the collectives
live *inside* compiled programs over the device mesh; the host-side
concerns that remain are process identity (for logging, checkpoint
writes, and data sharding) and multi-host runtime initialization.
"""

from __future__ import annotations

import functools


def init_dist(launcher: str = 'jax', **kwargs) -> None:
    """Initialize the multi-host JAX runtime.

    On a TPU pod slice `jax.distributed.initialize()` discovers peers
    from the TPU environment; single-host runs need no initialization.
    The reference's 'pytorch'/'slurm' launchers (dist_util.py:28-58)
    collapse into this one call.

    Passing ``--launcher jax`` is an explicit request for a multi-host
    run, so a missing/misconfigured coordinator FAILS here (like the
    reference's env-var KeyError under ``--launcher pytorch``) instead
    of silently degrading to a single-host run.
    """
    if launcher in ('none', None):
        return
    import os

    import jax
    # explicit coordination via env (the analogue of the reference's
    # MASTER_ADDR/RANK/WORLD_SIZE contract under --launcher pytorch)
    if 'COORDINATOR_ADDRESS' in os.environ:
        kwargs.setdefault('coordinator_address',
                          os.environ['COORDINATOR_ADDRESS'])
        if 'NUM_PROCESSES' in os.environ:
            kwargs.setdefault('num_processes',
                              int(os.environ['NUM_PROCESSES']))
        if 'PROCESS_ID' in os.environ:
            kwargs.setdefault('process_id', int(os.environ['PROCESS_ID']))
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        raise RuntimeError(
            f'--launcher {launcher} requested a multi-host runtime but '
            f'jax.distributed.initialize() failed ({e}). On a TPU pod the '
            'coordinator is discovered from the TPU environment; elsewhere '
            'set COORDINATOR_ADDRESS / pass coordinator_address, '
            'num_processes and process_id, or use --launcher none for a '
            'single-host run.') from e


def get_dist_info() -> tuple[int, int]:
    """Return (process_index, process_count)
    (reference: basicsr/utils/dist_util.py:61-72 returns (rank, world_size)).

    Note: in JAX, data-parallel "ranks" over a single host's chips are
    handled by sharding, not processes; this is the *host* identity used
    for input sharding and master-only side effects.
    """
    try:
        import jax
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def process_allreduce_sum(x):
    """Sum a host-local numpy metric tensor across all processes.

    The multi-host analogue of the reference's ``dist.reduce`` +
    ``barrier`` over rank-strided validation shards
    (reference: basicsr/models/video_base_model.py:109-113); with one
    process it is the identity.
    """
    import numpy as np
    _, world_size = get_dist_info()
    if world_size == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(
        np.asarray(x)).sum(axis=0))


def master_only(func):
    """Run only on process 0 (reference: basicsr/utils/dist_util.py:75-83)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        rank, _ = get_dist_info()
        if rank == 0:
            return func(*args, **kwargs)

    return wrapper
