"""Host-side index sampling for distributed training.

Training-loop role (parity with the reference EnlargedSampler,
basicsr/data/data_sampler.py:21-49): each epoch draws one seeded
permutation of a virtually ``ratio``-enlarged index space, and each
rank takes every ``num_replicas``-th entry of it. The enlargement
means a "dataset epoch" spans many passes over the real data, so the
loader never restarts (and never reshuffles) mid-run for small
datasets. In the TPU build the 'rank' is the host process
(jax.process_index()); per-chip sharding within a host happens when
the batch is device_put onto the mesh.
"""

from __future__ import annotations

import numpy as np


class EnlargedSampler:
    """Epoch-seeded, rank-strided sampler over an enlarged index space.

    Args:
        dataset: Sized dataset (only ``len`` is used).
        num_replicas: Number of ranks sharing the index stream.
        rank: This process's stride offset.
        ratio: Virtual enlargement factor (>= 1).
    """

    def __init__(self, dataset, num_replicas: int, rank: int,
                 ratio: int = 1):
        self.dataset = dataset
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        enlarged = len(dataset) * ratio
        self.num_samples = -(-enlarged // num_replicas)
        self.total_size = self.num_samples * num_replicas

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return self.num_samples

    def __iter__(self):
        order = np.random.RandomState(self.epoch).permutation(
            self.total_size)
        mine = order[self.rank::self.num_replicas] % len(self.dataset)
        return iter(mine.tolist())
