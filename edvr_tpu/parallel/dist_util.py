"""Distributed/process utilities on top of the JAX runtime.

Replaces the reference's torch.distributed/NCCL layer
(reference: basicsr/utils/dist_util.py:10-83). In JAX the collectives
live *inside* compiled programs over the device mesh; the host-side
concerns that remain are process identity (for logging, checkpoint
writes, and data sharding) and multi-host runtime initialization.
"""

from __future__ import annotations

import functools
import os


def init_dist(launcher: str = 'jax', **kwargs) -> None:
    """Initialize the multi-host JAX runtime.

    On a TPU pod slice `jax.distributed.initialize()` discovers peers
    from the TPU environment; single-host runs need no initialization.
    The reference's 'pytorch'/'slurm' launchers (dist_util.py:28-58)
    collapse into this one call.
    """
    if launcher in ('none', None):
        return
    import jax
    # Only meaningful when a multi-host environment is present.
    if any(v in os.environ for v in ('COORDINATOR_ADDRESS',
                                     'MEGASCALE_COORDINATOR_ADDRESS')):
        jax.distributed.initialize(**kwargs)


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


def master_only(func):
    """Run only on process 0 (reference: basicsr/utils/dist_util.py:75-83)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        rank, _ = get_dist_info()
        if rank == 0:
            return func(*args, **kwargs)

    return wrapper
