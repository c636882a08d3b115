"""Host-side index sampling for distributed training.

Equivalent of the reference EnlargedSampler
(reference: basicsr/data/data_sampler.py:21-49): epoch-seeded
permutation over a virtually ratio-enlarged dataset, rank-strided
slicing. In the TPU build the 'rank' is the host process
(jax.process_index()); per-chip sharding within a host happens when the
batch is device_put onto the mesh.
"""

from __future__ import annotations

import math

import numpy as np


class EnlargedSampler:

    def __init__(self, dataset, num_replicas: int, rank: int,
                 ratio: int = 1):
        self.dataset = dataset
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.num_samples = math.ceil(
            len(dataset) * ratio / self.num_replicas)
        self.total_size = self.num_samples * self.num_replicas

    def __iter__(self):
        g = np.random.RandomState(self.epoch)
        indices = g.permutation(self.total_size).tolist()
        dataset_size = len(self.dataset)
        indices = [v % dataset_size for v in indices]
        indices = indices[self.rank:self.total_size:self.num_replicas]
        assert len(indices) == self.num_samples
        return iter(indices)

    def __len__(self):
        return self.num_samples

    def set_epoch(self, epoch: int):
        self.epoch = epoch
